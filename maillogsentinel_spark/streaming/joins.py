"""Stream-stream joins (§2.9 generalized): correlate the live failure
stream with a second live stream under event-time bounds.

The canonical security shape: failures ⨝ watchlist — an alert for every
SASL failure from an IP that was put on a watchlist within the
preceding ``retention``. Both sides carry watermarks and the join
condition carries the time bound, which is what lets Spark bound the
join STATE: a watchlist entry is dropped from state once the failure
watermark passes added_ts + retention, and buffered failures age out at
their own watermark — without the interval condition the state store
grows forever, the mistake this module exists to encode correctly.

Scale: state is partitioned by join key (ip) in the state store; the
two shuffles are the same keyed exchanges a batch join would do.
The reference has nothing in this family (single-threaded tail loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_watchlist_join(
    failures: DataFrame,
    watchlist: DataFrame,
    retention: str = "1 hour",
    failure_watermark: str = "30 minutes",
    watchlist_watermark: str = "2 hours",
    ip_col: str = "ip",
) -> DataFrame:
    """(failure ⨝ watchlist within ``retention``) → alert rows
    (ip, user, fail_ts, listed_ts, reason)."""
    f = failures.withWatermark("ts", failure_watermark).alias("f")
    w = watchlist.withWatermark("added_ts", watchlist_watermark).alias("w")
    cond = (
        (F.col(f"f.{ip_col}") == F.col(f"w.{ip_col}"))
        & (F.col("f.ts") >= F.col("w.added_ts"))
        & (F.col("f.ts") <= F.col("w.added_ts") + F.expr(f"INTERVAL {retention}"))
    )
    return f.join(w, cond, "inner").select(
        F.col(f"f.{ip_col}").alias("ip"),
        F.col("f.user").alias("user"),
        F.col("f.ts").alias("fail_ts"),
        F.col("w.added_ts").alias("listed_ts"),
        F.col("w.reason").alias("reason"),
    )
