"""Structured Streaming ingestion: exactly-once file tracking replaces
the reference's byte-offset/rotation state machine."""

import os

from maillogsentinel_spark.streaming.ingest import (
    start_ingest,
    streaming_daily_user_counts,
)

LINE1 = "Sep 28 00:33:04 srv postfix/smtpd[1]: warning: unknown[1.1.1.1]: SASL fail, sasl_username=alice\n"
LINE2 = "Sep 28 01:00:00 srv postfix/smtpd[2]: warning: unknown[2.2.2.2]: SASL fail, sasl_username=bob\n"
LINE3 = "Sep 29 09:00:00 srv postfix/smtpd[3]: warning: unknown[3.3.3.3]: SASL fail, sasl_username=carol\n"


def _resolver(ip):
    return None, "Timeout"


def test_ingest_exactly_once(spark, tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    (logs / "mail.log").write_text(LINE1 + LINE2)
    q = start_ingest(spark, str(logs), store, ckpt, 2025, _resolver)
    q.awaitTermination(120)
    got = spark.read.parquet(store)
    assert got.count() == 2

    # "rotation": a new file appears; old file unchanged. Re-running with
    # the same checkpoint processes ONLY the new file — no duplicates.
    (logs / "mail.log.1").write_text(LINE3)
    q2 = start_ingest(spark, str(logs), store, ckpt, 2025, _resolver)
    q2.awaitTermination(120)
    rows = spark.read.parquet(store).collect()
    assert len(rows) == 3
    assert sorted(r["user"] for r in rows) == ["alice", "bob", "carol"]

    # third run with nothing new: no-op
    q3 = start_ingest(spark, str(logs), store, ckpt, 2025, _resolver)
    q3.awaitTermination(120)
    assert spark.read.parquet(store).count() == 3
    assert os.path.isdir(ckpt)


def test_streaming_windowed_agg(spark, tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "mail.log").write_text(LINE1 + LINE2 + LINE3)

    from maillogsentinel_spark.operators.parse import parse_sasl_lines

    lines = spark.readStream.text(str(logs))
    events = parse_sasl_lines(lines, year=2025)
    counts = streaming_daily_user_counts(events)
    q = (
        counts.writeStream.format("memory")
        .queryName("daily_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM daily_counts ORDER BY day, user").collect()
    assert [(r["user"], r["cnt"]) for r in rows] == [
        ("alice", 1), ("bob", 1), ("carol", 1),
    ]
    assert rows[0]["day"] != rows[2]["day"]  # two distinct daily windows
