"""Streaming deduplication with bounded state.

The reference deduplicates only at file granularity (the imported-
filename log, /root/reference/lib/maillogsentinel/sql_importer.py:251-277);
re-sent log LINES (syslog retransmits, replayed batches) are appended
twice. This operator gives row-level exactly-once on the event stream:

``dropDuplicatesWithinWatermark`` keeps one state entry per key and —
unlike plain ``dropDuplicates`` on a streaming DataFrame — EVICTS state
older than the watermark, so state size is bounded by (key cardinality
within the watermark window), not by the lifetime of the stream. That
bound is what makes the operator viable on an unbounded 100 TB/day
stream; the key → state-store partitioning is the same hash shuffle as
a streaming agg.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def streaming_dedup(
    events: DataFrame,
    keys: Sequence[str] = ("ip", "user"),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose key was already seen no longer than ``watermark``
    ago (event time). Exactly-once per key inside the horizon; a key may
    legitimately reappear after its state is evicted — choose the
    watermark to cover the maximum realistic replay delay."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
