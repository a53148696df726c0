"""bench.py output contract: the driver parses only the LAST ~2000
characters of stdout, so the single JSON line must stay under the
budget no matter how many queries are registered (round 1 shipped a
~4 KB line and the driver recorded "parsed": null)."""

import json
import random
import sys


def _bench():
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import bench

    return bench


def test_compact_line_fits_budget_at_any_inventory_size():
    bench = _bench()
    rnd = random.Random(7)
    for n in (10, 150, 400, 1000):
        pq = {f"some_quite_long_query_name_{i:04d}": round(rnd.uniform(0.1, 99.9), 3)
              for i in range(n)}
        for q in bench.HEADLINE:
            pq.setdefault(q, 1.234)
        line = bench.compact_line(1234.567, len(pq), pq, 0.1)
        assert len(line) <= bench.LINE_BUDGET
        d = json.loads(line)  # one valid JSON document
        assert d["value"] == 1234.567 and d["unit"] == "sec"
        assert d["n_queries"] == len(pq)
        # headline entries appear most-important-first and are a subset
        assert set(d["queries"]) <= set(pq)
        assert list(d["queries"]) == [q for q in bench.HEADLINE if q in d["queries"]]


def test_headline_names_are_registered():
    bench = _bench()
    from maillogsentinel_spark.plans.queries import QUERIES

    missing = [q for q in bench.HEADLINE if q not in QUERIES]
    assert missing == []


def test_failed_query_timing_serializes_as_null_not_nan():
    """A query that raises in BOTH timed passes must surface as JSON
    null, never a bare NaN (invalid strict JSON → driver 'parsed: null').
    Mirrors the main()-loop rule: per_query gets None when dt != dt."""
    bench = _bench()
    dt = float("nan")
    stored = round(dt, 3) if dt == dt else None
    assert stored is None
    pq = {q: 1.234 for q in bench.HEADLINE}
    pq[bench.HEADLINE[0]] = stored  # failed headline query
    line = bench.compact_line(10.0, len(pq), pq, 0.1)
    d = json.loads(line)
    assert len(line) <= bench.LINE_BUDGET
    if bench.HEADLINE[0] in d["queries"]:
        assert d["queries"][bench.HEADLINE[0]] is None
    # prove neither the line nor the full-map shape needs NaN support:
    # allow_nan=False raises if any bare NaN survived into the payload
    json.dumps({"queries": pq}, allow_nan=False)
    json.dumps(d, allow_nan=False)
