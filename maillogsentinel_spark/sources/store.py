"""Events store — reference S5 (CSV append sink) plus the scale path.

Canonical store: Parquet partitioned by event date. The reference's
report re-reads its entire CSV per run (its own noted bottleneck,
report.py:89-93); date-partitioned Parquet turns the daily report's day
filter into partition pruning — at 100 TB the report touches one
partition, not the store.

Byte-compat CSV emitter kept for parity with the reference's
``maillogsentinel.csv``: ``;`` delimiter, QUOTE_MINIMAL, header, column
order from parser.py:109-121, `dd/MM/yyyy HH:mm` date strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import MAIL_CSV_COLUMNS


def write_events(events: DataFrame, path: str, mode: str = "append") -> None:
    (
        events.withColumn("event_date", F.to_date("ts"))
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_events(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("event_date")


def write_events_csv(events: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Reference-compatible CSV shape (parser.py:106-121): all-string,
    `;`-separated, minimal quoting, header."""
    out = events.select(
        F.col("server"),
        F.date_format("ts", "dd/MM/yyyy HH:mm").alias("date"),
        *[F.col(c) for c in MAIL_CSV_COLUMNS[2:]],
    )
    (
        out.write.mode(mode)
        .option("sep", ";")
        .option("header", "true")
        .option("quoteAll", "false")
        .csv(path)
    )
