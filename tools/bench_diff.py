"""Round-over-round perf guard: diff two bench JSON files per query.

Usage: python tools/bench_diff.py BENCH_prev.json BENCH_cur.json [ratio]

Lists queries slower than `ratio`× (default 1.5) the previous round,
plus added/removed queries and the total delta. Exit 1 if any query
regressed more than 2× (the unexplained-regression bar from the
round-1 verdict).
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
    # Load calibration: when the current run's canary shows the box was
    # >1.5x slower than the committed idle reference, per-query >2x flags
    # are box load, not code — downgrade them to warnings.
    canary_ratio = (cur.get("canary") or {}).get("ratio")
    if failed:
        print(f"QUERIES FAILED: {failed}")
        return 1
    if hard_fail:
        if _num(canary_ratio) and canary_ratio > 1.5:
            print(
                f"slower >2x but canary ratio {canary_ratio:.2f} shows a "
                f"loaded box — downgraded to warnings: {hard_fail}"
            )
            return 0
        print(f"REGRESSED >2x: {hard_fail}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
