"""Round-over-round perf guard: diff two bench JSON files per query.

Usage: python tools/bench_diff.py BENCH_prev.json BENCH_cur.json [ratio]

Lists queries slower than `ratio`× (default 1.5) the previous round,
plus added/removed queries and the total delta. Exit 1 if any query
regressed more than 2× (the unexplained-regression bar from the
round-1 verdict); exit 2 ("rerun required") when >2× regressions
coincide with a loaded box per the cross-run canary — never silently 0.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    d = json.load(open(path))
    # driver files wrap the parsed line; bench.py output IS the line
    for key in ("parsed", "json"):
        if isinstance(d.get(key), dict):
            d = d[key]
    if "queries" not in d and "tail" in d:
        # driver stored raw stdout tail — recover the JSON line
        line = d["tail"].rsplit("{", 1)
        d = json.loads("{" + line[-1]) if len(line) > 1 else {}
    return d


def _num(x) -> bool:
    return isinstance(x, (int, float)) and not isinstance(x, bool) and x == x


def main() -> int:
    prev, cur = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    pq, cq = prev.get("queries", {}), cur.get("queries", {})
    slower, hard_fail, failed = [], [], []
    for name, t in sorted(cq.items()):
        if not _num(t):
            # bench.py stores null for a query whose runs all raised —
            # report it, never arithmetic on it
            failed.append(name)
            continue
        if name not in pq:
            print(f"added    {name}: {t:.2f}s")
            continue
        p = pq[name]
        if not _num(p):
            print(f"fixed    {name}: failed last round, now {t:.2f}s")
            continue
        if p > 0 and t / p > ratio:
            slower.append((t / p, name, p, t))
            if t / p > 2.0 and t - p > 0.5:
                hard_fail.append(name)
    for name in sorted(set(pq) - set(cq)):
        print(f"removed  {name}")
    for name in failed:
        print(f"FAILED   {name}: no timing this round")
    for r, name, p, t in sorted(slower, reverse=True):
        print(f"slower   {name}: {p:.2f}s -> {t:.2f}s ({r:.2f}x)")
    tp, tc = prev.get("value"), cur.get("value")
    if _num(tp) and _num(tc) and tp:
        print(f"total    {tp:.1f}s -> {tc:.1f}s ({tc / tp:.2f}x)")
    # Load calibration: each canary is the same fixed job in both runs
    # (CPU: md5+distinct; IO: write+fsync+read — round 9's driver bench
    # was disk-loaded and the CPU-only canary couldn't see it), so the
    # load ratio CUR vs PREV is hardware-independent — prefer it over
    # each run's ratio-vs-constant (the *_REF_SEC constants are only
    # right on the box they were measured on). The two axes contend
    # independently; the guard takes the MAX. A loaded box never WAIVES
    # a >2x flag: it demands a re-measure (distinct exit code 2) so a
    # real regression can't land silently during a busy bench run.
    def canary_sec(d, key="sec"):
        secs = (d.get("canary") or {}).get(key)
        if isinstance(secs, list) and secs and all(_num(s) for s in secs):
            return max(secs)
        return None

    ratios = []
    for key, ratio_key in (("sec", "ratio"), ("io_sec", "io_ratio")):
        cs, ps = canary_sec(cur, key), canary_sec(prev, key)
        if cs is not None and ps:
            ratios.append(cs / ps)
        elif _num((cur.get("canary") or {}).get(ratio_key)):
            ratios.append((cur.get("canary") or {}).get(ratio_key))
    load_ratio = max(ratios) if ratios else None
    if failed:
        print(f"QUERIES FAILED: {failed}")
        return 1
    if hard_fail:
        if _num(load_ratio) and load_ratio > 1.5:
            print(
                f"RERUN REQUIRED: slower >2x but canary load ratio "
                f"{load_ratio:.2f} (cur vs prev run) shows a loaded box — "
                f"re-measure on an idle box before trusting: {hard_fail}"
            )
            return 2
        print(f"REGRESSED >2x: {hard_fail}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
