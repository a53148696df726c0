"""Benchmark harness — runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" {name: sec},
"sf"}.

Each query is fully executed (collect) so the number includes the whole
plan, not just planning. A warmup pass on sf0.001 triggers JVM/codegen
warmup outside the timed region.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from maillogsentinel_spark.plans.queries import QUERIES  # noqa: E402
from maillogsentinel_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    # The driver parses stdout as JSON, so stdout must be EXACTLY one line.
    # The JVM / py4j / warning machinery can write to fd 1 directly (bypassing
    # sys.stdout), so dup the real stdout away and point fd 1 at stderr for
    # the whole run; the final JSON line goes to the saved fd.
    real_stdout_fd = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    spark = get_spark(app_name="mls-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup (not timed): small SF through the same plans
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for fn in QUERIES.values():
            try:
                fn(spark, warm_dir).collect()
            except Exception:
                pass

    per_query: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
        # best-of-2: the first pass pays per-query codegen/JIT; the min
        # reflects steady-state plan cost rather than compiler noise
        dt = float("nan")
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).collect()
                run = time.perf_counter() - t0
            except Exception as e:
                print(f"# bench error {name}: {e}", file=sys.stderr)
                break
            dt = run if dt != dt else min(dt, run)
        per_query[name] = round(dt, 3)
        total += dt if dt == dt else 0.0

    line = json.dumps({
        "metric": "total query wall-clock, all registered queries",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
    }) + "\n"
    os.write(real_stdout_fd, line.encode())


if __name__ == "__main__":
    main()
