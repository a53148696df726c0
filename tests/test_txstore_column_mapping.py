"""Column mapping (sources/txstore.py): RENAME/DROP COLUMN as
metadata-only commits with frozen physical names — Delta's
column-mapping semantics. Zero data files may be rewritten; every
physically-keyed index (stats, blooms, DV sidecars, row counts) must
survive a rename verbatim; time travel must present each version's own
logical names; and a dropped-then-re-added logical name must get a
fresh physical slot so the old bytes can never bleed through."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row, functions as F

from maillogsentinel_spark.sources.txstore import (
    tx_add_bloom_filters,
    tx_add_constraint,
    tx_append_events,
    tx_changes,
    tx_compact_partitions,
    tx_count_events,
    tx_current_version,
    tx_delete_where,
    tx_drop_column,
    tx_logical_schema,
    tx_read_events,
    tx_read_incremental,
    tx_rename_column,
    tx_restore,
    tx_scan_events,
    tx_scan_events_eq,
    tx_skipping_plan,
    tx_skipping_plan_eq,
    tx_upsert_events,
    tx_write_events,
    _load_manifest,
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
def store(spark, tmp_path):
    path = str(tmp_path / "cmstore")
    base = spark.createDataFrame(
        [_ev(1, 1, 10, 1.0), _ev(2, 1, 11, 2.0, "view"),
         _ev(3, 2, 10, 3.0), _ev(4, 3, 12, 4.0, "view")]
    )
    tx_write_events(spark, path, base)
    return path


def _files(spark, path):
    m = _load_manifest(spark, path)
    return sorted(r for rels in m["files"].values() for r in rels)


def test_rename_is_metadata_only_and_read_back(spark, store):
    before = _files(spark, store)
    v = tx_rename_column(spark, store, "value", "score")
    assert _files(spark, store) == before  # zero files touched
    df = tx_read_events(spark, store)
    assert "score" in df.columns and "value" not in df.columns
    assert sorted(r["score"] for r in df.collect()) == [1.0, 2.0, 3.0, 4.0]
    # time travel: the pre-rename version keeps its own logical name
    old = tx_read_events(spark, store, version=v - 1)
    assert "value" in old.columns and "score" not in old.columns
    # logical schema helper agrees both ways
    assert "score" in tx_logical_schema(spark, store).fieldNames()
    assert "value" in tx_logical_schema(spark, store, v - 1).fieldNames()


def test_append_speaks_new_name_old_name_rejected(spark, store):
    tx_rename_column(spark, store, "value", "score")
    batch_old = spark.createDataFrame([_ev(5, 1, 13, 5.0)])
    with pytest.raises(ValueError, match="does not match"):
        tx_append_events(spark, store, batch_old)
    batch_new = batch_old.withColumnRenamed("value", "score")
    tx_append_events(spark, store, batch_new)
    got = tx_read_events(spark, store)
    assert got.count() == 5
    assert got.where(F.col("score") == 5.0).count() == 1


def test_stats_and_bloom_survive_rename(spark, store):
    # stats/blooms are keyed by PHYSICAL name — attach bloom BEFORE the
    # rename, prune AFTER it via the logical name
    tx_add_bloom_filters(spark, store, "event_type")
    tx_rename_column(spark, store, "event_type", "etype")
    tx_rename_column(spark, store, "value", "score")
    # range skipping via renamed numeric column
    _, total, kept = tx_skipping_plan(spark, store, "score", lo=3.5, hi=9.9)
    assert kept < total  # stats keyed by the frozen physical name prune
    sc = tx_scan_events(spark, store, "score", lo=3.5, hi=9.9)
    assert [r["score"] for r in sc.collect()] == [4.0]
    # bloom skipping via renamed string column, bitsets built pre-rename
    _, totale, kepte = tx_skipping_plan_eq(spark, store, "etype", "view")
    assert kepte < totale  # the click-only files drop
    eq = tx_scan_events_eq(spark, store, "etype", "view")
    assert sorted(r["event_id"] for r in eq.collect()) == [2, 4]


def test_drop_column_hides_data_and_time_travel_restores(spark, store):
    v = tx_drop_column(spark, store, "user_id")
    df = tx_read_events(spark, store)
    assert "user_id" not in df.columns and df.count() == 4
    assert "user_id" in tx_read_events(spark, store, version=v - 1).columns
    # RESTORE resurrects the pre-drop logical schema (mapping rides in
    # the restored schema JSON)
    tx_restore(spark, store, v - 1)
    assert "user_id" in tx_read_events(spark, store).columns


def test_dropped_then_readded_gets_fresh_physical_slot(spark, store):
    tx_drop_column(spark, store, "user_id")
    batch = spark.createDataFrame([_ev(5, 1, 999, 5.0)]).withColumn(
        "user_id", F.lit(999).cast("long")
    )
    tx_append_events(spark, store, batch, merge_schema=True)
    got = tx_read_events(spark, store)
    vals = {r["user_id"] for r in got.collect()}
    # old rows' frozen physical bytes must NOT bleed into the new
    # logical column — they read null; only the new row carries 999
    assert vals == {None, 999}
    # and the physical slot is suffixed, not reused
    import json as _json
    from pyspark.sql.types import StructType
    m = _load_manifest(spark, store)
    phys = [f.name for f in StructType.fromJson(_json.loads(m["schema"])).fields]
    assert "user_id" in phys and "user_id__c1" in phys


def test_rewrites_fold_mapping_through(spark, store):
    tx_rename_column(spark, store, "value", "score")
    tx_drop_column(spark, store, "user_id")
    tx_compact_partitions(spark, store)
    df = tx_read_events(spark, store)
    assert "score" in df.columns and "user_id" not in df.columns
    assert sorted(r["score"] for r in df.collect()) == [1.0, 2.0, 3.0, 4.0]
    # upsert and DV delete through the logical names
    up = spark.createDataFrame(
        [Row(event_id=1, ts=datetime.datetime(2025, 3, 1, 10, 0),
             event_type="click", score=-1.0)]
    )
    tx_upsert_events(spark, store, up)
    assert tx_read_events(spark, store).where(
        F.col("score") == -1.0
    ).count() == 1
    tx_delete_where(spark, store, "score = -1.0")
    assert tx_read_events(spark, store).where(
        F.col("score") == -1.0
    ).count() == 0
    assert tx_count_events(spark, store) == 3


def test_cdf_spans_rename_with_end_version_names(spark, store):
    v1 = tx_current_version(spark, store)
    tx_rename_column(spark, store, "value", "score")
    batch = spark.createDataFrame([_ev(5, 2, 13, 5.0)]).withColumnRenamed(
        "value", "score"
    )
    v3 = tx_append_events(spark, store, batch)
    ch = tx_changes(spark, store, v1, v3)
    assert "score" in ch.columns and "value" not in ch.columns
    rows = ch.collect()
    assert len(rows) == 1
    assert rows[0]["_change_type"] == "insert" and rows[0]["score"] == 5.0


def test_guards(spark, store):
    with pytest.raises(ValueError, match="day layout"):
        tx_rename_column(spark, store, "event_date", "d")
    with pytest.raises(ValueError, match="day layout"):
        tx_drop_column(spark, store, "ts")
    with pytest.raises(ValueError, match="no column"):
        tx_rename_column(spark, store, "nope", "x")
    with pytest.raises(ValueError, match="already names"):
        tx_rename_column(spark, store, "value", "user_id")
    tx_add_constraint(spark, store, "val_pos", "value >= 0")
    with pytest.raises(ValueError, match="constraint"):
        tx_rename_column(spark, store, "value", "score")
    with pytest.raises(ValueError, match="constraint"):
        tx_drop_column(spark, store, "value")


def test_incremental_tail_skips_constraint_ops_raises_on_rename(
    spark, store
):
    v0 = tx_current_version(spark, store)
    tx_add_constraint(spark, store, "val_pos", "value >= 0")
    tx_append_events(spark, store, spark.createDataFrame([_ev(5, 1, 13, 5.0)]))
    # constraint commit skipped silently; the append's row flows
    inc = tx_read_incremental(spark, store, since_version=v0)
    assert [r["event_id"] for r in inc.collect()] == [5]
    # a rename is shape-changing: tailing must stop loudly
    from maillogsentinel_spark.sources.txstore import tx_drop_constraint
    tx_drop_constraint(spark, store, "val_pos")
    tx_rename_column(spark, store, "value", "score")
    with pytest.raises(ValueError, match="rename_column"):
        tx_read_incremental(spark, store, since_version=v0)


def test_rename_rebases_over_concurrent_append(spark, store, monkeypatch):
    """A rename losing the manifest race to an append must rebase and
    commit (metadata composes with appends), preserving the winner's
    rows under the new logical name."""
    from maillogsentinel_spark.sources import txstore as mod

    real_commit = mod._commit
    state = {"raced": False}

    def racing_commit(spark_, root, manifest, prev=None):
        if manifest.get("operation") == "rename_column" and not state["raced"]:
            state["raced"] = True
            tx_append_events(
                spark_, root, spark_.createDataFrame([_ev(9, 2, 77, 9.0)])
            )
        return real_commit(spark_, root, manifest, prev)

    monkeypatch.setattr(mod, "_commit", racing_commit)
    tx_rename_column(spark, store, "value", "score")
    got = tx_read_events(spark, store)
    assert "score" in got.columns
    assert got.where(F.col("event_id") == 9).count() == 1
    assert got.count() == 5


def test_tx_update_copy_on_write(spark, store):
    from maillogsentinel_spark.sources.txstore import tx_update

    tx_rename_column(spark, store, "value", "score")
    v = tx_update(
        spark, store, {"score": "score + 100"}, "event_id <= 2"
    )
    got = {r["event_id"]: r["score"]
           for r in tx_read_events(spark, store).collect()}
    assert got == {1: 101.0, 2: 102.0, 3: 3.0, 4: 4.0}
    # time travel shows pre-update values
    old = {r["event_id"]: r["score"]
           for r in tx_read_events(spark, store, version=v - 1).collect()}
    assert old[1] == 1.0
    # layout keys are frozen
    with pytest.raises(ValueError, match="layout key"):
        tx_update(spark, store, {"ts": "ts"}, "event_id = 1")
    with pytest.raises(ValueError, match="unknown column"):
        tx_update(spark, store, {"value": "1"}, "event_id = 1")


def test_tx_update_enforces_constraints(spark, store):
    from maillogsentinel_spark.sources.txstore import (
        ConstraintViolationError,
        tx_update,
    )

    tx_add_constraint(spark, store, "val_pos", "value >= 0")
    with pytest.raises(ConstraintViolationError):
        tx_update(spark, store, {"value": "-5.0"}, "event_id = 1")
    # nothing committed: value unchanged
    assert tx_read_events(spark, store).where(
        F.col("value") < 0
    ).count() == 0


def test_tx_delete_rewrite_copy_on_write(spark, store):
    from maillogsentinel_spark.sources.txstore import (
        tx_delete_rewrite,
        tx_vacuum,
    )

    # big-fraction delete: the DV path refuses, the rewrite path works
    with pytest.raises(ValueError, match="tx_delete_rewrite"):
        tx_delete_where(spark, store, "event_id <= 4")
    v = tx_delete_rewrite(spark, store, "user_id = 10")  # rows 1, 3
    got = tx_read_events(spark, store)
    assert sorted(r["event_id"] for r in got.collect()) == [2, 4]
    # no deletion vectors involved — pure file replacement
    m = _load_manifest(spark, store)
    assert not m.get("dv")
    # a fully-emptied day vanishes from the manifest (day 2 held only
    # event 3)
    assert "2025-03-02" not in m["files"]
    # time travel still shows everything; vacuum then reclaims
    assert tx_read_events(spark, store, version=v - 1).count() == 4
    tx_vacuum(spark, store, keep_versions=1, retention_ms=0)
    assert tx_read_events(spark, store).count() == 2


def test_tx_delete_rewrite_folds_dvs_and_mapping(spark, store):
    from maillogsentinel_spark.sources.txstore import tx_delete_rewrite

    tx_rename_column(spark, store, "value", "score")
    tx_delete_where(spark, store, "event_id = 2")  # DV first
    tx_delete_rewrite(spark, store, "event_id = 4")
    got = tx_read_events(spark, store)
    assert sorted(r["event_id"] for r in got.collect()) == [1, 3]
    assert "score" in got.columns
