"""Head-to-head single-node throughput: the reference's own extraction
path versus this engine's Spark pipeline, on the SAME synthetic log
with the SAME injected no-network resolver and no geo manager on
either side (reference: ``ip_info_mgr=None`` ⇒ N/A columns,
log_utils.py:115-123; ours: ``geo_country=None``).

The reference publishes no benchmark — performance testing is an open
roadmap TODO (docs/wiki/Roadmap.md:23-26) — so this script produces
the missing number. The reference code is EXECUTED in place from
/root/reference (read-only), never copied: we import its
``extract_entries`` (parser.py:38) and drive it exactly as
``bin/maillogsentinel.py`` does, stubbing only the network-touching
reverse lookup, identically stubbed on the Spark side.

Both sides do the full job: regex parse of every line, SASL-failure
match, date synthesis, rDNS via the (cached) stub, and a CSV sink.
Timing excludes one-time engine startup on both sides (module import /
SparkSession build) and takes best-of-2 steady-state runs.

Usage: python tools/ref_throughput.py [n_lines]   (default 1_000_000)
Prints one JSON line: lines/s for each engine and the ratio.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

LINE_FAIL = (
    "Aug {d:02d} 06:57:{s:02d} srv1 postfix/smtps/smtpd[{pid}]: warning: "
    "unknown[10.{a}.{b}.{c}]: SASL LOGIN authentication failed: "
    "(reason unavailable), sasl_username=user{u}@example.com\n"
)
LINE_NOISE = (
    "Aug {d:02d} 06:57:{s:02d} srv1 CRON[{pid}]: pam_unix(cron:session): "
    "session opened for user root\n"
)


def gen_log(path: str, n: int) -> None:
    with open(path, "w") as fh:
        for i in range(n):
            d, s, pid = 1 + i % 28, i % 60, 100 + i % 900
            if i % 10 < 7:  # 70% SASL failures over 5000 cycling IPs
                ip = i % 5000
                fh.write(
                    LINE_FAIL.format(
                        d=d, s=s, pid=pid,
                        a=ip // 65536, b=(ip // 256) % 256, c=ip % 256,
                        u=i % 997,
                    )
                )
            else:
                fh.write(LINE_NOISE.format(d=d, s=s, pid=pid))


def run_reference(log_path: str, n: int) -> float:
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/bin")
    sys.path.insert(0, "/root/reference/lib")
    from pathlib import Path

    from lib.maillogsentinel.parser import extract_entries

    logger = logging.getLogger("ref-bench")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False

    def resolver(ip: str, _logger=None) -> tuple[str, None]:
        return f"host-{ip}.example", None

    best = float("inf")
    for _ in range(2):
        out = tempfile.mktemp(suffix=".csv")
        t = time.time()
        extract_entries(
            [Path(log_path)],
            Path(log_path),
            out,
            logger,
            None,  # no ip_info_mgr → N/A geo, same as the Spark side
            resolver,
            lambda p: str(p).endswith(".gz"),
            offset=0,
        )
        best = min(best, time.time() - t)
        os.path.exists(out) and os.remove(out)
    return best


def run_spark(log_path: str, n: int) -> float:
    from maillogsentinel_spark.plans.pipeline import build_events
    from maillogsentinel_spark.session import get_spark
    from maillogsentinel_spark.sources import read_logs, write_events_csv

    spark = get_spark(app_name="ref-throughput")

    def resolver(ip: str) -> tuple[str, None]:
        return f"host-{ip}.example", None

    # warm the Python-worker pool once (excluded: one-time startup)
    read_logs(spark, [log_path]).limit(10).count()
    best = float("inf")
    for _ in range(2):
        out = tempfile.mkdtemp(prefix="spark_csv_")
        t = time.time()
        ev = build_events(read_logs(spark, [log_path]), 2025, resolver, None, None)
        write_events_csv(ev, out)
        best = min(best, time.time() - t)
        shutil.rmtree(out, ignore_errors=True)
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    workdir = tempfile.mkdtemp(prefix="ref_throughput_")
    log_path = os.path.join(workdir, "mail.log")
    gen_log(log_path, n)
    t_ref = run_reference(log_path, n)
    t_spark = run_spark(log_path, n)
    print(
        json.dumps(
            {
                "n_lines": n,
                "log_bytes": os.path.getsize(log_path),
                "reference_sec": round(t_ref, 2),
                "spark_sec": round(t_spark, 2),
                "reference_lines_per_s": int(n / t_ref),
                "spark_lines_per_s": int(n / t_spark),
                "speedup": round(t_ref / t_spark, 2),
            }
        )
    )
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
