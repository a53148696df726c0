"""Bucketed storage kills the join shuffle: two tables bucketed on the
same key join with ZERO Exchange nodes; the unbucketed control plan
shuffles both sides."""

import pytest
from pyspark.sql import functions as F

from maillogsentinel_spark.sources.bucketed import (
    exchanges_in_plan,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture()
def warehouse_tables(spark, tmp_path):
    ev = spark.range(0, 2000).select(
        (F.col("id") % 97).alias("ip_key"), F.col("id").alias("event_id")
    )
    dim = spark.range(0, 97).select(
        F.col("id").alias("ip_key"), F.concat(F.lit("h"), F.col("id")).alias("host")
    )
    write_bucketed(ev, "ev_bucketed", ["ip_key"], n_buckets=8)
    write_bucketed(dim, "dim_bucketed", ["ip_key"], n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS dim_bucketed")


def test_bucketed_join_has_no_shuffle(spark, warehouse_tables):
    a = read_bucketed(spark, "ev_bucketed")
    b = read_bucketed(spark, "dim_bucketed")
    # disable broadcast so the join must pick SortMergeJoin, the case
    # bucketing exists for (at scale the dim side isn't broadcastable)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "ip_key")
        assert exchanges_in_plan(joined) == 0
        assert joined.count() == 2000
        # aggregation on the bucket key also reuses the layout
        agg = a.groupBy("ip_key").agg(F.count(F.lit(1)).alias("c"))
        assert exchanges_in_plan(agg) == 0
        # control: same data joined from plain (unbucketed) frames shuffles
        plain = a.select("ip_key", "event_id").repartition(8)
        control = plain.join(b.select("ip_key", "host").repartition(8), "ip_key")
        assert exchanges_in_plan(control) > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
