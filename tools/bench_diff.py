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


def main() -> int:
    prev, cur = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    pq, cq = prev.get("queries", {}), cur.get("queries", {})
    slower, hard_fail = [], []
    for name, t in sorted(cq.items()):
        if name not in pq:
            print(f"added    {name}: {t:.2f}s")
            continue
        p = pq[name]
        if p > 0 and t / p > ratio:
            slower.append((t / p, name, p, t))
            if t / p > 2.0 and t - p > 0.5:
                hard_fail.append(name)
    for name in sorted(set(pq) - set(cq)):
        print(f"removed  {name}")
    for r, name, p, t in sorted(slower, reverse=True):
        print(f"slower   {name}: {p:.2f}s -> {t:.2f}s ({r:.2f}x)")
    tp, tc = prev.get("value"), cur.get("value")
    if tp and tc:
        print(f"total    {tp:.1f}s -> {tc:.1f}s ({tc / tp:.2f}x)")
    if hard_fail:
        print(f"REGRESSED >2x: {hard_fail}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
