"""Shallow clone (sources/txstore.py tx_clone): Delta's zero-copy
CLONE. The clone's v1 manifest must reference the SOURCE's immutable
data files (ext / ext_dv maps) with zero bytes copied; writes to the
clone must never touch the source; rewriting maintenance must
gradually localize the clone; and the clone must compose with every
other table-format capability (stats/bloom skipping, DVs, column
mapping, metadata count, the streaming source)."""

from __future__ import annotations

import datetime
import glob
import os

import pytest
from pyspark.sql import Row, functions as F

from maillogsentinel_spark.sources.txstore import (
    _load_manifest,
    tx_add_bloom_filters,
    tx_append_events,
    tx_clone,
    tx_compact_partitions,
    tx_count_events,
    tx_current_version,
    tx_delete_where,
    tx_read_events,
    tx_rename_column,
    tx_scan_events,
    tx_scan_events_eq,
    tx_vacuum,
    tx_write_events,
)


def _ev(eid, day, user, val, typ="click"):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2025, 3, day, 10, 0),
        user_id=user,
        event_type=typ,
        value=float(val),
    )


@pytest.fixture()
def src(spark, tmp_path):
    path = str(tmp_path / "src")
    base = spark.createDataFrame(
        [_ev(1, 1, 10, 1.0), _ev(2, 1, 11, 2.0, "view"),
         _ev(3, 2, 10, 3.0), _ev(4, 3, 12, 4.0, "view")]
    )
    tx_write_events(spark, path, base)
    return path


def _local_parquet(path):
    return glob.glob(f"{path}/data/**/*.parquet", recursive=True)


def test_clone_is_zero_copy_and_reads_equal(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    v = tx_clone(spark, src, dst)
    assert v == 1
    got = sorted(
        (r["event_id"], r["value"])
        for r in tx_read_events(spark, dst).collect()
    )
    want = sorted(
        (r["event_id"], r["value"])
        for r in tx_read_events(spark, src).collect()
    )
    assert got == want
    assert _local_parquet(dst) == []  # not one data byte copied
    m = _load_manifest(spark, dst)
    assert set(m["ext"].values()) == {f"{os.path.abspath(src)}/data"}
    # metadata-only COUNT works off the cloned rows map
    assert tx_count_events(spark, dst) == 4


def test_clone_writes_never_touch_source(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    tx_clone(spark, src, dst)
    src_v = tx_current_version(spark, src)
    tx_append_events(spark, dst, spark.createDataFrame([_ev(5, 1, 13, 5.0)]))
    tx_delete_where(spark, dst, "event_id = 1")
    assert tx_current_version(spark, src) == src_v
    assert tx_read_events(spark, src).count() == 4  # source intact
    assert tx_read_events(spark, dst).count() == 4  # +1 -1
    # the clone's new file is local, the other three still external
    m = _load_manifest(spark, dst)
    assert len(m["ext"]) == 4
    assert sum(len(v) for v in m["files"].values()) == 5


def test_clone_of_snapshot_version(spark, src, tmp_path):
    tx_append_events(spark, src, spark.createDataFrame([_ev(9, 2, 99, 9.0)]))
    dst = str(tmp_path / "dst")
    tx_clone(spark, src, dst, version=1)  # clone the PRE-append state
    assert tx_read_events(spark, dst).count() == 4
    assert tx_read_events(spark, src).count() == 5


def test_clone_carries_dv_and_blooms(spark, src, tmp_path):
    tx_add_bloom_filters(spark, src, "event_type")
    tx_delete_where(spark, src, "event_id = 3")
    dst = str(tmp_path / "dst")
    tx_clone(spark, src, dst)
    got = tx_read_events(spark, dst)
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2, 4]
    assert tx_count_events(spark, dst) == 3  # DV subtraction, metadata-only
    # bloom probe through cloned bitsets + external files
    eq = tx_scan_events_eq(spark, dst, "event_type", "view")
    assert sorted(r["event_id"] for r in eq.collect()) == [2, 4]
    # stats skipping through cloned stats
    sc = tx_scan_events(spark, dst, "value", lo=3.5, hi=9.0)
    assert [r["event_id"] for r in sc.collect()] == [4]


def test_compaction_localizes_clone(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    tx_clone(spark, src, dst)
    tx_compact_partitions(spark, dst)
    m = _load_manifest(spark, dst)
    assert not m.get("ext")  # every external ref folded away
    assert len(_local_parquet(dst)) > 0
    assert tx_read_events(spark, dst).count() == 4
    # and the clone's vacuum sweeps only local orphans — source intact
    tx_vacuum(spark, dst, keep_versions=1, retention_ms=0)
    assert tx_read_events(spark, src).count() == 4


def test_clone_of_clone_carries_original_bases(spark, src, tmp_path):
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    tx_clone(spark, src, d1)
    tx_append_events(spark, d1, spark.createDataFrame([_ev(5, 1, 13, 5.0)]))
    tx_clone(spark, d1, d2)
    m = _load_manifest(spark, d2)
    assert set(m["ext"].values()) == {
        f"{os.path.abspath(src)}/data", f"{os.path.abspath(d1)}/data"
    }
    assert tx_read_events(spark, d2).count() == 5


def test_clone_composes_with_column_mapping(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    tx_clone(spark, src, dst)
    tx_rename_column(spark, dst, "value", "score")
    got = tx_read_events(spark, dst)
    assert "score" in got.columns
    assert sorted(r["score"] for r in got.collect()) == [1.0, 2.0, 3.0, 4.0]
    # the source keeps its own name
    assert "value" in tx_read_events(spark, src).columns


def test_clone_destination_must_be_fresh(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    tx_clone(spark, src, dst)
    with pytest.raises(ValueError, match="already exists"):
        tx_clone(spark, src, dst)


def test_streaming_source_reads_clone(spark, src, tmp_path):
    """The native streaming source's seed snapshot must resolve
    external (cloned) rels and their DV sidecars."""
    from maillogsentinel_spark.sources.txstore_datasource import register

    tx_delete_where(spark, src, "event_id = 2")
    dst = str(tmp_path / "dst")
    tx_clone(spark, src, dst)
    tx_append_events(spark, dst, spark.createDataFrame([_ev(7, 2, 70, 7.0)]))
    register(spark)
    q = (
        spark.readStream.format("txstore")
        .option("path", dst)
        .load()
        .writeStream.format("memory")
        .queryName("clone_tail")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select event_id, _commit_version from clone_tail").collect()
    assert sorted(r["event_id"] for r in rows) == [1, 3, 4, 7]
    # seed rows tagged with the clone's v1, the append with v2
    vers = {r["event_id"]: r["_commit_version"] for r in rows}
    assert vers[7] == 2 and vers[1] == 1


def test_size_targeted_compaction_and_history_bytes(spark, tmp_path):
    """target_mb: per-day file counts derive METADATA-ONLY from the
    manifest's sizes map; DESCRIBE HISTORY reports the table bytes."""
    import math

    from maillogsentinel_spark.sources.txstore import (
        _load_manifest,
        tx_history,
    )

    path = str(tmp_path / "szstore")
    rows = [_ev(i, (i % 2) + 1, i % 5, float(i)) for i in range(400)]
    df = spark.createDataFrame(rows).repartition(8)
    tx_write_events(spark, path, df)
    m = _load_manifest(spark, path)
    sizes = m["sizes"]
    rels = [r for fl in m["files"].values() for r in fl]
    assert set(sizes) == set(rels) and all(v > 0 for v in sizes.values())
    # pick a target that forces >1 file for each day
    day_bytes = {
        d: sum(sizes[r] for r in fl) for d, fl in m["files"].items()
    }
    target_mb = max(day_bytes.values()) / 3 / (1024 * 1024)
    tx_compact_partitions(spark, path, target_mb=target_mb)
    m2 = _load_manifest(spark, path)
    for d, fl in m2["files"].items():
        want = max(1, math.ceil(
            day_bytes[d] / (target_mb * 1024 * 1024)
        ))
        # the target is a bin-packing GOAL (range boundaries are
        # sampled quantiles — Delta's OPTIMIZE is approximate too):
        # the day must split into multiple files, near the target
        assert 1 < len(fl) <= want, (d, len(fl), want)
    assert tx_read_events(spark, path).count() == 400
    # history reports metadata-only table bytes per version
    h = {r["version"]: r for r in tx_history(spark, path).collect()}
    assert h[1]["size_bytes"] == sum(sizes.values())
    assert h[2]["size_bytes"] == sum(m2["sizes"].values()) > 0
