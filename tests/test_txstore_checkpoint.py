"""Manifest log scaling (sources/txstore.py): commits write DELTAS,
every _CKPT_INTERVAL-th version writes a parquet CHECKPOINT, and
readers reconstruct. The load-bearing contract: reconstruction through
ANY route (checkpoint base, delta replay from a full JSON, the
streaming source's pyarrow path) returns a dict EQUAL to what the old
full-snapshot log would have stored — every reader downstream of
_load_manifest is then provably unaffected.

Replaces the O(files) driver-side JSON serialization per commit and
O(files) parse per snapshot read that the full-snapshot log had — the
one 100x-scale ceiling the round-10 audit flagged (at 10^5-10^6 files
with inline bloom bitsets, each commit shipped megabytes of JSON
through the driver)."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import Row

from maillogsentinel_spark.sources import txstore
from maillogsentinel_spark.sources.txstore import (
    tx_add_bloom_filters,
    tx_append_events,
    tx_checkpoint,
    tx_compact_partitions,
    tx_current_version,
    tx_delete_where,
    tx_read_events,
    tx_read_incremental,
    tx_upsert_events,
    tx_vacuum,
    tx_write_events,
)


def _ev(eid, day, user, val):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2025, 3, day, 10, 0),
        user_id=user,
        event_type="click",
        value=float(val) if val is not None else None,
    )


def _long_store(spark, tmp_path, n_appends=11):
    """A store whose history CROSSES the checkpoint interval with every
    delta-producing operation in the mix: appends, an upsert, a DV
    delete, a bloom attach, a compaction."""
    path = str(tmp_path / "ckptstore")
    tx_write_events(
        spark, path, spark.createDataFrame([_ev(1, 1, 10, 1.0), _ev(2, 2, 11, 2.0)])
    )  # v1 (full)
    for i in range(n_appends):  # v2..v(n+1)
        tx_append_events(
            spark, path,
            spark.createDataFrame([_ev(10 + i, 1 + (i % 3), 20 + i, float(i))]),
        )
    tx_upsert_events(
        spark, path, spark.createDataFrame([_ev(1, 1, 10, 99.0)])
    )
    tx_delete_where(spark, path, "event_id = 11")
    tx_add_bloom_filters(spark, path, "user_id")
    tx_compact_partitions(spark, path, target_files_per_day=1)
    return path


def _raw_doc(spark, path, v):
    return json.loads(
        txstore._read_file(spark, txstore._manifest_path(path, v))
    )


def _replay_json_only(spark, path, v):
    """Reference reconstruction that NEVER touches a checkpoint: walk
    the raw JSON chain down to a full doc, apply deltas up."""
    have = set(txstore._list_versions(spark, path))
    assert v in have
    return txstore._reconstruct(
        v, lambda w: _raw_doc(spark, path, w), set(), None
    )


def test_deltas_written_and_checkpoint_exists(spark, tmp_path):
    path = _long_store(spark, tmp_path)
    head = tx_current_version(spark, path)
    assert head == 16
    # v1 is full (no parent), later commits are deltas
    assert _raw_doc(spark, path, 1).get("kind") != "delta"
    d5 = _raw_doc(spark, path, 5)
    assert d5["kind"] == "delta"
    # the delta carries ONLY the changed files — one append file, not
    # the whole snapshot
    assert sum(len(v) for v in d5["files_add"].values()) >= 1
    assert "files" not in d5
    # the interval checkpoint landed at v10
    assert os.path.exists(
        txstore._ckpt_path(path, 10)
    ), "expected the v10 interval checkpoint"
    # every version reconstructs to the same dict the pure-JSON replay
    # produces — with and without the checkpoint in play
    for v in range(1, head + 1):
        via_api = txstore._load_manifest(spark, path, v)
        via_json = _replay_json_only(spark, path, v)
        assert via_api == via_json, f"v{v} reconstruction drift"
        assert via_api["version"] == v


def test_checkpoint_read_equals_delta_replay(spark, tmp_path):
    path = _long_store(spark, tmp_path)
    state = txstore._read_ckpt(path, 10)
    assert state == _replay_json_only(spark, path, 10)


def test_missing_checkpoint_degrades_to_replay(spark, tmp_path):
    path = _long_store(spark, tmp_path)
    before = {
        v: txstore._load_manifest(spark, path, v)
        for v in txstore._list_versions(spark, path)
    }
    os.remove(txstore._ckpt_path(path, 10))
    for v, want in before.items():
        assert txstore._load_manifest(spark, path, v) == want


def test_forced_checkpoint_roundtrip(spark, tmp_path):
    path = _long_store(spark, tmp_path)
    v = tx_checkpoint(spark, path, 7)
    assert v == 7
    assert txstore._read_ckpt(path, 7) == _replay_json_only(spark, path, 7)
    # head checkpoint too
    head = tx_checkpoint(spark, path)
    assert txstore._read_ckpt(path, head) == _replay_json_only(
        spark, path, head
    )


def test_readers_unchanged_through_delta_log(spark, tmp_path):
    """End-to-end: snapshot reads, time travel and incremental tailing
    all read through reconstruction and must agree with the store's
    actual content."""
    path = _long_store(spark, tmp_path)
    head = tx_read_events(spark, path)
    ids = sorted(r.event_id for r in head.collect())
    assert 11 not in ids  # DV delete applied
    assert 1 in ids
    v1_ids = sorted(
        r.event_id for r in tx_read_events(spark, path, version=1).collect()
    )
    assert v1_ids == [1, 2]
    inc = tx_read_incremental(spark, path, since_version=2, to_version=12)
    inc_ids = sorted(r.event_id for r in inc.collect())
    assert inc_ids == [11 + i for i in range(10)]  # appends v3..v12


def test_vacuum_writes_base_and_trims_log(spark, tmp_path):
    path = _long_store(spark, tmp_path)
    states = {
        v: txstore._load_manifest(spark, path, v)
        for v in txstore._list_versions(spark, path)
    }
    # remove the interval checkpoint so vacuum MUST create the base
    os.remove(txstore._ckpt_path(path, 10))
    tx_vacuum(spark, path, keep_versions=3, retention_ms=0)
    kept = txstore._list_versions(spark, path)
    assert kept == [14, 15, 16]
    # the earliest kept version (a delta) got a base checkpoint
    assert os.path.exists(txstore._ckpt_path(path, 14))
    for v in kept:
        assert txstore._load_manifest(spark, path, v) == states[v]
    with pytest.raises(FileNotFoundError):
        txstore._load_manifest(spark, path, 5)
    # dropped versions' checkpoints are swept with their manifests
    assert not os.path.exists(txstore._ckpt_path(path, 10))


def test_streaming_source_reconstruction_matches_jvm_path(spark, tmp_path):
    """The pyarrow-side reconstruction the streaming source uses must
    agree bit-for-bit with the JVM-side batch reader's."""
    from maillogsentinel_spark.sources import txstore_datasource as ds

    path = _long_store(spark, tmp_path)
    for v in txstore._list_versions(spark, path):
        assert ds._load_manifest(path, v) == txstore._load_manifest(
            spark, path, v
        )


def test_metadata_count_exact_with_dv(spark, tmp_path):
    """tx_count_events must answer from the manifest's rows map (zero
    scan) and subtract deletion vectors exactly; a store missing rows
    entries falls back to a scan count, never a wrong number."""
    from maillogsentinel_spark.sources.txstore import (
        tx_count_events,
        tx_delete_where,
    )

    path = str(tmp_path / "cntstore")
    rows = [_ev(i, 1 + i % 3, 10 + i % 4, float(i)) for i in range(40)]
    tx_write_events(spark, path, spark.createDataFrame(rows))
    m = txstore._load_manifest(spark, path)
    rels = [r for fl in m["files"].values() for r in fl]
    assert all(r in m["rows"] for r in rels)
    assert sum(m["rows"].values()) == 40
    assert tx_count_events(spark, path) == 40
    tx_append_events(
        spark, path, spark.createDataFrame([_ev(100, 1, 9, 1.0)])
    )
    assert tx_count_events(spark, path) == 41
    tx_delete_where(spark, path, "event_id % 4 = 0")  # 11 of 41
    assert tx_count_events(spark, path) == 30
    assert tx_count_events(spark, path, version=2) == 41  # time travel
    # legacy store (no rows map): scan fallback still exact
    m3 = txstore._load_manifest(spark, path)
    legacy = {k: v for k, v in m3.items() if k != "rows"}
    legacy["version"] = m3["version"] + 1
    legacy["parent"] = m3["version"]
    legacy["txid"] = "legacy" + "0" * 26
    txstore._commit(spark, path, legacy)
    assert tx_count_events(spark, path) == 30


def test_restore_preserves_history_and_ledger(spark, tmp_path):
    """tx_restore commits the target's state as a NEW version: head
    census equals the target's, intermediate versions stay readable,
    the streaming ledger carries from the current head (monotone batch
    ids survive the restore), and restore-to-current is a no-op."""
    from maillogsentinel_spark.sources.txstore import tx_restore

    path = str(tmp_path / "reststore")
    tx_write_events(
        spark, path,
        spark.createDataFrame([_ev(1, 1, 10, 1.0), _ev(2, 2, 11, 2.0)]),
    )  # v1
    tx_append_events(
        spark, path, spark.createDataFrame([_ev(3, 3, 12, 3.0)]),
        batch_id=7,
    )  # v2 + ledger
    tx_upsert_events(
        spark, path, spark.createDataFrame([_ev(1, 1, 10, 99.0)])
    )  # v3
    v = tx_restore(spark, path, 1)
    assert v == 4
    ids = sorted(
        (r.event_id, r.value)
        for r in tx_read_events(spark, path).collect()
    )
    assert ids == [(1, 1.0), (2, 2.0)]  # exactly v1
    # history intact: v3 still shows the upsert
    v3 = {r.event_id: r.value
          for r in tx_read_events(spark, path, version=3).collect()}
    assert v3[1] == 99.0
    # ledger carried from HEAD (v2's batch 7), not reset to v1's absence
    m = txstore._load_manifest(spark, path)
    assert m["last_batch_id"] == 7
    # restore-to-current is a no-op
    assert tx_restore(spark, path, 4) == 4
    assert tx_current_version(spark, path) == 4
    # incremental tailing treats restore as row-changing
    from maillogsentinel_spark.sources.txstore import tx_read_incremental
    with pytest.raises(ValueError, match="restore"):
        tx_read_incremental(spark, path, 3)


def test_vacuum_dry_run_touches_nothing(spark, tmp_path):
    """dry_run must report exactly what a real vacuum would delete —
    and delete none of it: same file census, same manifests, and the
    subsequent real vacuum removes the reported count."""
    import glob as _glob

    path = str(tmp_path / "drystore")
    tx_write_events(spark, path, spark.createDataFrame([_ev(1, 1, 10, 1.0)]))
    tx_write_events(  # overwrite: v1's files become unreferenced
        spark, path, spark.createDataFrame([_ev(2, 2, 11, 2.0)])
    )
    files_before = sorted(_glob.glob(os.path.join(path, "data", "*", "*")))
    manifests_before = sorted(
        _glob.glob(os.path.join(path, "_manifests", "*"))
    )
    dry = tx_vacuum(spark, path, keep_versions=1, retention_ms=0,
                    dry_run=True)
    assert dry >= 1
    assert sorted(_glob.glob(os.path.join(path, "data", "*", "*"))) \
        == files_before
    assert sorted(_glob.glob(os.path.join(path, "_manifests", "*"))) \
        == manifests_before
    real = tx_vacuum(spark, path, keep_versions=1, retention_ms=0)
    assert real == dry
    assert len(_glob.glob(os.path.join(path, "data", "*", "*"))) \
        == len(files_before) - dry


def test_history_and_timestamp_travel(spark, tmp_path):
    """tx_history walks the retained log; tx_version_at resolves
    commit wall-times to versions with Delta's timestampAsOf rule
    (latest version committed at-or-before the timestamp)."""
    from maillogsentinel_spark.sources.txstore import (
        tx_history,
        tx_version_at,
    )

    path = str(tmp_path / "histstore")
    tx_write_events(spark, path, spark.createDataFrame([_ev(1, 1, 10, 1.0)]))
    tx_append_events(spark, path, spark.createDataFrame([_ev(2, 2, 11, 2.0)]))
    tx_upsert_events(spark, path, spark.createDataFrame([_ev(1, 1, 10, 9.0)]))
    hist = {r["version"]: r for r in tx_history(spark, path).collect()}
    assert set(hist) == {1, 2, 3}
    assert hist[1]["operation"] == "overwrite"
    assert hist[2]["operation"] == "append" and hist[2]["parent"] == 1
    assert hist[3]["operation"] == "upsert"
    assert hist[2]["n_rows_physical"] == 2
    assert hist[2]["committed_at"] is not None
    ts3 = txstore._load_manifest(spark, path, 3)["committed_at_ms"]
    assert tx_version_at(spark, path, ts3 + 10_000) == 3
    ts1 = txstore._load_manifest(spark, path, 1)["committed_at_ms"]
    with pytest.raises(ValueError, match="predates"):
        tx_version_at(spark, path, ts1 - 1)


def test_check_constraints_enforced_on_every_writer(spark, tmp_path):
    """CHECK constraints gate overwrite, append, upsert AND merge
    (output rows, not just the batch), survive overwrite like a table
    property, pass NULLs (SQL CHECK semantics), and validate existing
    data on ADD."""
    from maillogsentinel_spark.sources.txstore import (
        ConstraintViolationError,
        tx_add_constraint,
        tx_drop_constraint,
        tx_merge,
    )

    path = str(tmp_path / "consstore")
    tx_write_events(
        spark, path,
        spark.createDataFrame([_ev(1, 1, 10, 1.0), _ev(2, 2, 11, 2.0)]),
    )
    tx_add_constraint(spark, path, "pos_value", "value >= 0")
    # ADD that existing data violates: rejected, version unchanged
    with pytest.raises(ConstraintViolationError, match="existing data"):
        tx_add_constraint(spark, path, "big", "value > 100")
    assert tx_current_version(spark, path) == 2
    # append / upsert / merge violations all reject before staging
    bad = spark.createDataFrame([_ev(3, 1, 12, -5.0)])
    with pytest.raises(ConstraintViolationError, match="pos_value"):
        tx_append_events(spark, path, bad)
    with pytest.raises(ConstraintViolationError, match="pos_value"):
        tx_upsert_events(spark, path, bad)
    with pytest.raises(ConstraintViolationError, match="pos_value"):
        tx_merge(spark, path, bad)
    assert tx_current_version(spark, path) == 2
    # a merge whose violating source row is DISCARDED by the insert
    # condition passes — enforcement is on the OUTPUT rows
    v = tx_merge(spark, path, bad, when_not_matched_insert="s.value >= 0")
    assert v == 3 and tx_read_events(spark, path).count() == 2
    # constraints survive overwrite (table property semantics)
    with pytest.raises(ConstraintViolationError, match="pos_value"):
        tx_write_events(spark, path, bad)
    # NULL passes (SQL CHECK); drop lifts the gate
    tx_write_events(
        spark, path,
        spark.createDataFrame([_ev(9, 1, 10, None)], bad.schema),
    )
    tx_drop_constraint(spark, path, "pos_value")
    tx_append_events(spark, path, spark.createDataFrame([_ev(3, 1, 12, -5.0)]))
    vals = sorted(
        (r.event_id, r.value)
        for r in tx_read_events(spark, path).collect()
    )
    assert vals == [(3, -5.0), (9, None)]


def test_concurrent_append_rebase_still_deltas(spark, tmp_path, monkeypatch):
    """The rebase path recomputes its delta against the NEW head — the
    loser's committed delta must reconstruct the merged state."""
    path = str(tmp_path / "racestore")
    tx_write_events(spark, path, spark.createDataFrame([_ev(1, 1, 10, 1.0)]))
    real_commit = txstore._commit
    state = {"raced": False}

    def racing_commit(spark_, root, manifest, prev=None):
        if not state["raced"] and manifest["operation"] == "append":
            state["raced"] = True
            tx_append_events(
                spark_, root, spark_.createDataFrame([_ev(6, 2, 14, 6.0)])
            )
        return real_commit(spark_, root, manifest, prev)

    monkeypatch.setattr(txstore, "_commit", racing_commit)
    tx_append_events(spark, path, spark.createDataFrame([_ev(5, 1, 13, 5.0)]))
    monkeypatch.setattr(txstore, "_commit", real_commit)
    ids = sorted(r.event_id for r in tx_read_events(spark, path).collect())
    assert ids == [1, 5, 6]
    assert txstore._load_manifest(spark, path, 3) == _replay_json_only(
        spark, path, 3
    )
