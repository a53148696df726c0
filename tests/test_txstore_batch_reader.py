"""Batch read through the txstore Python DataSource:
``spark.read.format("txstore")`` must equal tx_read_events on the same
snapshot — time travel options, DV application, column mapping and
shallow-clone resolution included — and the shared per-file transform
must ship Arrow RecordBatches, not per-row tuples."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row, functions as F

from maillogsentinel_spark.sources.txstore import (
    tx_append_events,
    tx_clone,
    tx_delete_where,
    tx_history,
    tx_read_events,
    tx_rename_column,
    tx_write_events,
)
from maillogsentinel_spark.sources.txstore_datasource import (
    TxStoreDataSource,
    register,
)


def _ev(eid, day, user, val):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2025, 3, day, 10, 0),
        user_id=user,
        event_type="click",
        value=float(val),
    )


@pytest.fixture()
def store(spark, tmp_path):
    path = str(tmp_path / "bstore")
    tx_write_events(spark, path, spark.createDataFrame(
        [_ev(1, 1, 10, 1.0), _ev(2, 2, 11, 2.0)]
    ))  # v1
    tx_append_events(spark, path, spark.createDataFrame(
        [_ev(3, 2, 12, 3.0), _ev(4, 3, 13, 4.0)]
    ))  # v2
    tx_delete_where(spark, path, "event_id = 2")  # v3
    register(spark)
    return path


def _fmt(spark, path, **opts):
    r = spark.read.format("txstore").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_head_equals_tx_read(spark, store):
    got = _fmt(spark, store)
    want = tx_read_events(spark, store)
    assert sorted(r["event_id"] for r in got.collect()) == sorted(
        r["event_id"] for r in want.collect()
    ) == [1, 3, 4]
    # every row tagged with the resolved snapshot version
    assert {r["_commit_version"] for r in got.collect()} == {3}
    # ts round-trips value-exact through the arrow transform
    ts = {r["event_id"]: r["ts"] for r in got.collect()}
    assert ts[1] == datetime.datetime(2025, 3, 1, 10, 0)
    # event_date reconstructed from the dir name
    assert {str(r["event_date"]) for r in got.collect()} == {
        "2025-03-01", "2025-03-02", "2025-03-03"
    }


def test_version_as_of(spark, store):
    v1 = _fmt(spark, store, versionAsOf="1")
    assert sorted(r["event_id"] for r in v1.collect()) == [1, 2]
    v2 = _fmt(spark, store, versionAsOf="2")
    assert sorted(r["event_id"] for r in v2.collect()) == [1, 2, 3, 4]
    with pytest.raises(Exception, match="not in retained"):
        _fmt(spark, store, versionAsOf="9").collect()


def test_timestamp_as_of(spark, store):
    h = {r["version"]: r for r in tx_history(spark, store).collect()}
    ts2 = int(h[2]["committed_at"].timestamp() * 1000)
    got = _fmt(spark, store, timestampAsOf=str(ts2))
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2, 3, 4]
    with pytest.raises(Exception, match="precedes"):
        _fmt(spark, store, timestampAsOf="1").collect()


def test_batch_respects_column_mapping(spark, store):
    tx_rename_column(spark, store, "value", "score")
    got = _fmt(spark, store)
    assert "score" in got.columns and "value" not in got.columns
    assert sorted(r["score"] for r in got.collect()) == [1.0, 3.0, 4.0]
    # versionAsOf below the rename shows the old logical name
    old = _fmt(spark, store, versionAsOf="2")
    assert "value" in old.columns


def test_batch_reads_clone(spark, store, tmp_path):
    dst = str(tmp_path / "cl")
    tx_clone(spark, store, dst)
    got = _fmt(spark, dst)
    assert sorted(r["event_id"] for r in got.collect()) == [1, 3, 4]


def test_sql_using_txstore(spark, store):
    """Pure-SQL access: CREATE TEMPORARY VIEW ... USING txstore routes
    through the batch reader, so spark.sql sees the same DV-applied
    logical snapshot."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW tx_sql_view USING txstore "
        f"OPTIONS (path '{store}')"
    )
    got = spark.sql(
        "SELECT count(*) AS n, sum(event_id) AS s FROM tx_sql_view"
    ).collect()[0]
    assert (got["n"], got["s"]) == (3, 8)  # ids 1,3,4 after the delete


def test_reader_yields_arrow_batches(spark, store):
    """The shared transform must take the columnar path — a silent
    fallback to the row loop would be a 100x scan regression."""
    ds = TxStoreDataSource(options={"path": store})
    sch = ds.schema()
    rd = ds.reader(sch)
    parts = rd.partitions()
    assert parts
    import pyarrow as pa

    for p in parts:
        for out in rd.read(p):
            assert isinstance(out, pa.RecordBatch)
