"""Streaming change data feed (txstore_datasource, readChangeFeed=true):
appends stream as 'insert', DV deletes as 'delete' (the sidecar-masked
rows read back as the payload), layout-only maintenance emits nothing,
rewrites stop the feed loudly, and offsets stay exactly-once across
restarts."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row, functions as F

from maillogsentinel_spark.sources.txstore import (
    tx_append_events,
    tx_compact_partitions,
    tx_delete_where,
    tx_upsert_events,
    tx_write_events,
)
from maillogsentinel_spark.sources.txstore_datasource import register


def _ev(eid, day, user, val):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2025, 3, day, 10, 0),
        user_id=user,
        event_type="click",
        value=float(val),
    )


def _drain(spark, path, name, ck):
    q = (
        spark.readStream.format("txstore")
        .option("path", path)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(
        f"select event_id, _change_type, _commit_version from {name}"
    ).collect()


def test_cdf_insert_delete_classification(spark, tmp_path):
    path = str(tmp_path / "s")
    register(spark)
    tx_write_events(spark, path, spark.createDataFrame(
        [_ev(1, 1, 10, 1.0), _ev(2, 1, 11, 2.0)]
    ))  # v1
    tx_append_events(spark, path, spark.createDataFrame(
        [_ev(3, 2, 12, 3.0)]
    ))  # v2
    tx_compact_partitions(spark, path)  # v3: layout-only, silent
    tx_delete_where(spark, path, "event_id = 1")  # v4
    rows = _drain(spark, path, "cdf_cls", str(tmp_path / "ck"))
    ins = sorted(
        (r["event_id"], r["_commit_version"])
        for r in rows if r["_change_type"] == "insert"
    )
    dels = [
        (r["event_id"], r["_commit_version"])
        for r in rows if r["_change_type"] == "delete"
    ]
    assert ins == [(1, 1), (2, 1), (3, 2)]
    assert dels == [(1, 4)]  # the deleted row's values, the delete's version


def test_cdf_exactly_once_across_restarts(spark, tmp_path):
    path = str(tmp_path / "s")
    register(spark)
    tx_write_events(spark, path, spark.createDataFrame(
        [_ev(1, 1, 10, 1.0), _ev(2, 2, 11, 2.0)]
    ))
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("txstore")
            .option("path", path)
            .option("readChangeFeed", "true")
            .load()
            .select("event_id", "_change_type", "_commit_version")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r["event_id"], r["_change_type"])
            for r in spark.read.parquet(out).collect()
        )

    assert run() == [(1, "insert"), (2, "insert")]
    tx_delete_where(spark, path, "event_id = 1")
    # restart from the same checkpoint: ONLY the new delete flows —
    # the seed inserts are not re-emitted
    assert run() == [(1, "delete"), (1, "insert"), (2, "insert")]


def test_cdf_raises_on_rewrite(spark, tmp_path):
    path = str(tmp_path / "s")
    register(spark)
    tx_write_events(spark, path, spark.createDataFrame([_ev(1, 1, 10, 1.0)]))
    tx_upsert_events(spark, path, spark.createDataFrame(
        [_ev(1, 1, 10, 9.0)]
    ))
    q = (
        spark.readStream.format("txstore")
        .option("path", path)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName("cdf_raise")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="row-changing 'upsert'"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()
