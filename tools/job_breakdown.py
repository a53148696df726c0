"""Per-JOB time breakdown for one query, from the Spark event log.

Runs the named queries once (after the usual warmup) with event logging
into a temp dir, then prints every job's wall span, gap-to-previous-job
(driver-side latency between jobs), stage/task counts, and the job's
first stage name — so "which of the 26 jobs carries the 4 s" stops
being a guess.

Usage: python tools/job_breakdown.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    evdir = tempfile.mkdtemp(prefix="mls-evlog-")
    from maillogsentinel_spark.plans.queries import (
        QUERIES,
        prebuild_shared_artifacts,
    )
    from maillogsentinel_spark.session import get_spark

    spark = get_spark(
        app_name="mls-jobs",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        for n in names:
            try:
                QUERIES[n](spark, warm).collect()
            except Exception:
                pass
    try:
        prebuild_shared_artifacts(spark, sf_dir)
    except Exception as e:
        print(f"# prebuild error: {e}", file=sys.stderr)

    spans: dict[str, tuple[float, float]] = {}
    for n in names:
        t0 = time.time() * 1000
        QUERIES[n](spark, sf_dir).collect()
        spans[n] = (t0, time.time() * 1000)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):  # Spark 4 rolling event log layout
        v2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
        path = v2 if os.path.isfile(v2) else os.path.join(
            v2, f"events_1_{app_id}"
        )
    jobs: dict[int, dict] = {}
    stage_spans: dict[int, tuple] = {}
    stage_names: dict[int, str] = {}
    stage_tasks: dict[int, int] = {}
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                jobs[jid] = {
                    "start": e["Submission Time"],
                    "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                    "desc": (e.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                }
                for s in e.get("Stage Infos", []):
                    stage_names[s["Stage ID"]] = s.get("Stage Name", "")
                    stage_tasks[s["Stage ID"]] = s.get("Number of Tasks", 0)
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["end"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e.get("Stage Info", {})
                sid = si.get("Stage ID")
                if sid is not None and "Completion Time" in si:
                    stage_spans[sid] = (
                        si.get("Submission Time", 0),
                        si["Completion Time"],
                        si.get("Stage Name", ""),
                        si.get("Number of Tasks", 0),
                    )

    for n in names:
        t0, t1 = spans[n]
        print(f"\n=== {n}  total {(t1 - t0) / 1000:.3f}s ===")
        prev_end = t0
        busy = 0.0
        for jid in sorted(jobs):
            j = jobs[jid]
            if j["start"] < t0 or j["start"] > t1 or "end" not in j:
                continue
            gap = (j["start"] - prev_end) / 1000
            dur = (j["end"] - j["start"]) / 1000
            busy += dur
            prev_end = j["end"]
            sname = stage_names.get(j["stages"][-1], "") if j["stages"] else ""
            ntasks = sum(stage_tasks.get(s, 0) for s in j["stages"])
            print(
                f"job {jid:4d}  gap {gap:6.3f}  dur {dur:6.3f}  "
                f"stages {len(j['stages']):2d}  tasks {ntasks:4d}  {sname[:60]}"
            )
            if dur > 0.3:  # slow job: attribute time to its stages
                for s_ in j["stages"]:
                    sp = stage_spans.get(s_)
                    if not sp:
                        continue
                    sdur = (sp[1] - sp[0]) / 1000
                    if sdur < 0.1:
                        continue
                    print(
                        f"      stage {s_:4d}  dur {sdur:6.3f}  "
                        f"tasks {sp[3]:4d}  {sp[2][:70]}"
                    )
        print(f"jobs busy {busy:.3f}s, driver gaps {(t1 - t0) / 1000 - busy:.3f}s")


if __name__ == "__main__":
    main()
