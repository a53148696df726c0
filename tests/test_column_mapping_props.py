"""Model-based property test for column mapping (sources/txstore.py):
ANY interleaving of rename / drop / append / re-add / compact must
leave the store's logical read equal to a pure-Python reference model
that tracks columns by IDENTITY. Hypothesis searches the op space for
a divergence (e.g. a re-added column reading old bytes, a rename
leaking through compaction) instead of waiting for one."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from maillogsentinel_spark.sources.txstore import (
    tx_append_events,
    tx_compact_partitions,
    tx_drop_column,
    tx_read_events,
    tx_rename_column,
    tx_write_events,
)

_BASE_COLS = ["user_id", "event_type", "value"]  # renamable/droppable
_FRESH = ["alpha", "beta", "gamma", "delta"]


def _mk_rows(n, start_eid):
    return [
        {
            "event_id": start_eid + i,
            "ts": datetime.datetime(2025, 3, (start_eid + i) % 3 + 1, 10, 0),
            "user_id": (start_eid + i) * 7,
            "event_type": f"t{(start_eid + i) % 2}",
            "value": float(start_eid + i) * 1.5,
        }
        for i in range(n)
    ]


@settings(deadline=None, max_examples=10, derandomize=True)
@given(data=st.data())
def test_mapping_lifecycle_matches_model(spark, tmp_path_factory, data):
    path = str(tmp_path_factory.mktemp("cmprop") / "store")
    # model: column IDENTITY (stable id) -> current logical name;
    # rows hold values keyed by identity, so a re-added logical name
    # is a NEW identity and old rows must read null there
    ident_name = {c: c for c in _BASE_COLS}  # identity -> logical
    rows = []  # list of {identity: value} + event_id/ts
    eid = [0]

    def model_append(n, extra_ident=None):
        batch_rows = _mk_rows(n, eid[0])
        eid[0] += n
        sdf_rows = []
        for r in batch_rows:
            mrow = {"event_id": r["event_id"], "ts": r["ts"]}
            srow = {"event_id": r["event_id"], "ts": r["ts"]}
            for ident, logical in ident_name.items():
                base = ident.split("#")[0]
                # a re-added identity ("base#N") gets a synthesized
                # value so it can never coincide with the original
                # column's bytes
                val = r[base] if base in r else float(r["event_id"]) + 0.25
                mrow[ident] = val
                srow[logical] = val
            rows.append(mrow)
            sdf_rows.append(srow)
        import pandas as pd

        sdf = spark.createDataFrame(pd.DataFrame(sdf_rows))
        merge = extra_ident is not None
        tx_append_events(spark, path, sdf, merge_schema=merge)

    # seed the store
    first = _mk_rows(3, 0)
    eid[0] = 3
    rows.extend(dict(r) for r in first)
    import pandas as pd

    tx_write_events(spark, path, spark.createDataFrame(pd.DataFrame(first)))

    n_ops = data.draw(st.integers(2, 5), label="n_ops")
    fresh_pool = list(_FRESH)
    for _ in range(n_ops):
        choices = ["append", "compact"]
        renamable = [i for i, n in ident_name.items()]
        if renamable and fresh_pool:
            choices.append("rename")
        if len(ident_name) > 2:
            choices.append("drop")
        readd_candidates = [
            c for c in _BASE_COLS
            if c not in {n for n in ident_name.values()}
        ]
        if readd_candidates:
            choices.append("readd")
        op = data.draw(st.sampled_from(choices), label="op")
        if op == "rename":
            ident = data.draw(st.sampled_from(renamable), label="ren_i")
            new = fresh_pool.pop(0)
            tx_rename_column(spark, path, ident_name[ident], new)
            ident_name[ident] = new
        elif op == "drop":
            ident = data.draw(
                st.sampled_from(list(ident_name)), label="drop_i"
            )
            tx_drop_column(spark, path, ident_name[ident])
            del ident_name[ident]
        elif op == "readd":
            base = readd_candidates[0]
            new_ident = f"{base}#{eid[0]}"
            ident_name[new_ident] = base
            model_append(data.draw(st.integers(1, 2), label="n_re"),
                         extra_ident=new_ident)
        elif op == "append":
            model_append(data.draw(st.integers(1, 2), label="n_ap"))
        else:
            tx_compact_partitions(spark, path)

    got = {
        r["event_id"]: r.asDict()
        for r in tx_read_events(spark, path).collect()
    }
    assert set(got) == {r["event_id"] for r in rows}
    for mrow in rows:
        g = got[mrow["event_id"]]
        for ident, logical in ident_name.items():
            # rows written before an identity existed read null there
            want = mrow.get(ident)
            assert g.get(logical) == want, (
                mrow["event_id"], ident, logical, g.get(logical), want
            )
