"""Per-query profile: wall seconds (best of N), Spark job count, stage
count, task count — the job/stage counts expose driver-side sequential
overhead (many small actions) that a single wall number hides.

Usage: python tools/profile_queries.py [sf_dir] [query ...] [--passes N]
Writes tools/profile_<sfname>.json and prints a sorted table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    args = [a for a in sys.argv[1:]]
    passes = 2
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    only = set(args[1:])

    from maillogsentinel_spark.plans.queries import (
        QUERIES,
        prebuild_shared_artifacts,
    )
    from maillogsentinel_spark.session import get_spark

    spark = get_spark(app_name="mls-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warmup at the small SF (same as bench.py) so codegen/JIT is paid
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        for name, fn in QUERIES.items():
            if only and name not in only:
                continue
            try:
                fn(spark, warm).collect()
            except Exception:
                pass
    try:
        prebuild_shared_artifacts(spark, sf_dir)
    except Exception as e:
        print(f"# prebuild error: {e}", file=sys.stderr)

    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        best = None
        for p in range(passes):
            group = f"prof-{name}-{p}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).collect()
            except Exception as e:
                print(f"# error {name}: {e}", file=sys.stderr)
                sc.setJobGroup(None, None)
                break
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jobs = tracker.getJobIdsForGroup(group)
            n_stages = 0
            n_tasks = 0
            for j in jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numTasks
            rec = {
                "sec": round(dt, 3),
                "jobs": len(jobs),
                "stages": n_stages,
                "tasks": n_tasks,
            }
            if best is None or rec["sec"] < best["sec"]:
                best = rec
        if best is not None:
            out[name] = best
            print(
                f"{best['sec']:8.3f}s {best['jobs']:4d} jobs "
                f"{best['stages']:4d} stages {best['tasks']:6d} tasks  {name}",
                file=sys.stderr,
            )

    sfname = os.path.basename(sf_dir.rstrip("/")) or "sf"
    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"profile_{sfname}.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    rows = sorted(out.items(), key=lambda kv: -kv[1]["sec"])
    print(f"{'sec':>8} {'jobs':>5} {'stages':>6} {'tasks':>7}  query")
    for name, r in rows:
        print(f"{r['sec']:8.3f} {r['jobs']:5d} {r['stages']:6d} "
              f"{r['tasks']:7d}  {name}")


if __name__ == "__main__":
    main()
