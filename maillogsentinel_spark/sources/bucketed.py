"""Bucketed-table storage for shuffle-free co-located joins.

At the 100 TB design point the dominant recurring cost is re-shuffling
the fact table for every keyed join/agg. Spark's answer is bucketing:
write the table hash-partitioned AND sorted by the join key
(``bucketBy(n, key).sortBy(key).saveAsTable``); any later equi-join or
aggregation on that key reuses the on-disk bucketing — the plan shows
SortMergeJoin with NO Exchange on the bucketed side(s). This module
wraps that contract for the events store and verifies it.

Rules that make the optimization actually fire (all encoded here and
asserted in tests/test_bucketed.py):
- both sides bucketed with the SAME bucket count (or one side a
  multiple — Spark 4 coalesces via spark.sql.bucketing.coalesceBucketsInJoin);
- join keys = bucket keys, exactly;
- ``spark.sql.sources.bucketing.enabled`` on (default);
- tables come from the catalog (``spark.table``), not raw parquet paths
  (path reads drop bucket metadata).

The reference has no storage layout control at all (CSV append,
sql files); this is pure Spark-side scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table on the join
    key(s). Sorting within buckets lets SortMergeJoin skip its sort."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for the bucket metadata to survive."""
    return spark.table(table)


def exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle Exchange nodes in the executed plan (bucketing
    verification helper; 0 for a fully co-located join)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    )
