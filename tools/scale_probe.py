"""One-shot per-query timing at an arbitrary SF dir, for the scaling
differential (SCALE.md). Unlike bench.py (best-of-2, driver contract),
this runs each registered query ONCE with a soft per-query budget: a
watchdog cancels all Spark jobs when the budget expires and the query
records null — so a handful of quadratic-density outliers (the
shared-shingle pair family at a fixed 31-word vocab grows ~n² pairs)
can't stall the whole sweep.

Usage: python tools/scale_probe.py SF_DIR [budget_sec] [out.json] [query ...]
(query names, when given, restrict the probe to that subset — used for
the Spark-side-only timings of queries whose DuckDB oracle cannot run
at the target SF, e.g. the iterative graph CTEs at sf1)
"""

from __future__ import annotations

import json
import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    sf_dir = sys.argv[1]
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 300.0
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    only = set(sys.argv[4:])

    from maillogsentinel_spark.plans.queries import QUERIES
    from maillogsentinel_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    try:
        from bench import prebuild_shared_artifacts, run_canary

        prebuild_shared_artifacts(spark, sf_dir)
        canary = run_canary(spark)
    except Exception as e:
        print(f"# prebuild/canary failed: {e}", file=sys.stderr)
        canary = None

    results: dict[str, float | None] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        done = threading.Event()

        def watchdog():
            if not done.wait(budget):
                print(f"# budget exceeded, cancelling: {name}", file=sys.stderr)
                spark.sparkContext.cancelAllJobs()

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            results[name] = round(time.perf_counter() - t0, 3)
        except Exception:
            results[name] = None
        finally:
            done.set()
        print(f"{name}: {results[name]}", file=sys.stderr)

    line = json.dumps(
        {"sf_dir": sf_dir, "budget": budget, "canary": canary,
         "queries": results}
    )
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
