"""Store maintenance: partition-scoped upsert (MERGE) and small-file
compaction over the day-partitioned events store (sources/store.py).

The contract under test is the 100 TB one: only TOUCHED day partitions
are rewritten — untouched days' files must survive byte-identical —
and the merged data always round-trips exactly.
"""

from __future__ import annotations

import datetime
import glob
import os

from pyspark.sql import Row, functions as F

from maillogsentinel_spark.sources.store import (
    compact_partitions,
    upsert_events,
    write_events,
)


def _ev(eid, day, user, val):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2025, 3, day, 10, 0),
        user_id=user,
        event_type="click",
        value=float(val),
    )


def _store(spark, tmp_path):
    path = str(tmp_path / "store")
    base = spark.createDataFrame(
        [_ev(1, 1, 10, 1.0), _ev(2, 1, 11, 2.0), _ev(3, 2, 10, 3.0),
         _ev(4, 3, 12, 4.0)]
    )
    write_events(base, path, mode="overwrite")
    return path


def _files_for_day(path, day):
    return sorted(
        glob.glob(os.path.join(path, f"event_date=2025-03-0{day}", "*.parquet"))
    )


def test_upsert_rewrites_only_touched_days(spark, tmp_path):
    path = _store(spark, tmp_path)
    day3_before = [(f, os.path.getmtime(f), os.path.getsize(f))
                   for f in _files_for_day(path, 3)]
    assert day3_before

    # update event 2 (day 1) and insert event 5 (new, day 2)
    updates = spark.createDataFrame([_ev(2, 1, 11, 20.0), _ev(5, 2, 13, 5.0)])
    n = upsert_events(spark, path, updates)
    assert n == 2  # days 1 and 2 rewritten

    got = {
        (r["event_id"], r["value"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {(1, 1.0), (2, 20.0), (3, 3.0), (4, 4.0), (5, 5.0)}

    # day 3 untouched: same files, same mtimes, same sizes
    day3_after = [(f, os.path.getmtime(f), os.path.getsize(f))
                  for f in _files_for_day(path, 3)]
    assert day3_after == day3_before


def test_upsert_empty_batch_is_noop(spark, tmp_path):
    path = _store(spark, tmp_path)
    empty = spark.createDataFrame([], spark.read.parquet(path).drop(
        "event_date").schema)
    assert upsert_events(spark, path, empty) == 0
    assert spark.read.parquet(path).count() == 4


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "store")
    # simulate many micro-batch appends into one day
    for i in range(5):
        write_events(
            spark.createDataFrame([_ev(100 + i, 1, 10, float(i))]), path
        )
    write_events(spark.createDataFrame([_ev(200, 2, 11, 9.0)]), path)
    assert len(_files_for_day(path, 1)) >= 5
    before = {
        (r["event_id"], r["value"])
        for r in spark.read.parquet(path).collect()
    }

    n = compact_partitions(spark, path, target_files_per_day=1)
    assert n == 2
    assert len(_files_for_day(path, 1)) == 1
    after = {
        (r["event_id"], r["value"])
        for r in spark.read.parquet(path).collect()
    }
    assert after == before


def test_compaction_predicate_scopes_rewrite(spark, tmp_path):
    path = str(tmp_path / "store")
    for i in range(3):
        write_events(
            spark.createDataFrame([_ev(300 + i, 1, 10, float(i))]), path
        )
    write_events(spark.createDataFrame([_ev(400, 2, 11, 9.0)]), path)
    day2_before = [(f, os.path.getmtime(f)) for f in _files_for_day(path, 2)]

    n = compact_partitions(
        spark, path, 1, predicate="event_date = DATE '2025-03-01'"
    )
    assert n == 1
    assert len(_files_for_day(path, 1)) == 1
    assert [(f, os.path.getmtime(f))
            for f in _files_for_day(path, 2)] == day2_before


def test_upsert_dedupes_duplicate_update_keys(spark, tmp_path):
    """MERGE contract: at most one source row per target key. A batch
    carrying the same key twice must collapse to the max-ts winner,
    never insert N rows for the key (round-5 ADVICE defect)."""
    path = _store(spark, tmp_path)
    loser = _ev(2, 1, 11, 50.0)
    winner = Row(
        event_id=2,
        ts=datetime.datetime(2025, 3, 1, 12, 0),  # later same day
        user_id=11,
        event_type="click",
        value=99.0,
    )
    updates = spark.createDataFrame([loser, winner])
    n = upsert_events(spark, path, updates)
    assert n == 1  # only day 1 touched

    rows = spark.read.parquet(path).where("event_id = 2").collect()
    assert len(rows) == 1
    assert rows[0]["value"] == 99.0
    assert spark.read.parquet(path).count() == 4  # 1,2,3,4 — no dup rows


def test_upsert_dup_key_spanning_days(spark, tmp_path):
    """Duplicate update rows for one key landing on DIFFERENT days: the
    winner is the max-ts row, and the target's old row must still be
    removed even though it lives on the losing row's day (the touched-
    day list is derived from the pre-dedupe batch)."""
    path = _store(spark, tmp_path)
    loser = _ev(3, 2, 10, 50.0)  # key 3's old row lives on day 2
    winner = _ev(3, 4, 10, 77.0)  # winner moves the event to day 4
    n = upsert_events(spark, path, spark.createDataFrame([loser, winner]))
    assert n == 2  # days 2 and 4 rewritten

    rows = spark.read.parquet(path).where("event_id = 3").collect()
    assert len(rows) == 1
    assert rows[0]["value"] == 77.0
    assert str(rows[0]["event_date"]) == "2025-03-04"
    assert spark.read.parquet(path).count() == 4


def test_compaction_nonpartition_predicate_is_layout_only(spark, tmp_path):
    """A predicate on a NON-partition column selects which days get
    compacted but must never delete the non-matching rows of those days
    (round-5 ADVICE data-loss defect: the filtered frame was the frame
    that got rewritten)."""
    path = str(tmp_path / "store")
    for i in range(4):  # day 1: values 0..3 across 4 micro-batch files
        write_events(
            spark.createDataFrame([_ev(500 + i, 1, 10, float(i))]), path
        )
    write_events(spark.createDataFrame([_ev(600, 2, 11, 0.5)]), path)
    before = {
        (r["event_id"], r["value"])
        for r in spark.read.parquet(path).collect()
    }
    day2_before = [(f, os.path.getmtime(f)) for f in _files_for_day(path, 2)]

    # matches only value>2 rows, all on day 1 → compact day 1 ONLY,
    # but day 1 keeps ALL its rows (values 0..3)
    n = compact_partitions(spark, path, 1, predicate="value > 2.0")
    assert n == 1
    assert len(_files_for_day(path, 1)) == 1
    after = {
        (r["event_id"], r["value"])
        for r in spark.read.parquet(path).collect()
    }
    assert after == before
    assert [(f, os.path.getmtime(f))
            for f in _files_for_day(path, 2)] == day2_before


def test_compact_store_delegates_and_splits(spark, tmp_path):
    """compact_store is now a thin alias of compact_partitions: a
    target > 1 must actually split a day into multiple files (the old
    standalone body hashed on the day alone and never could)."""
    from maillogsentinel_spark.sources.store import compact_store

    path = str(tmp_path / "store")
    write_events(
        spark.createDataFrame([_ev(i, 1, i % 8, float(i)) for i in range(512)]),
        path,
        mode="overwrite",
    )
    n = compact_store(spark, path, target_files_per_partition=4)
    assert n == 1
    assert 2 <= len(_files_for_day(path, 1)) <= 4
    assert spark.read.parquet(path).count() == 512


def test_compaction_rerun_idempotent_after_partial_overwrite(spark, tmp_path):
    """Crash-recovery statement test: dynamic partition overwrite
    commits per partition, so a crash can leave day A compacted and day
    B not. Simulate the half-done state (compact only day A via a
    predicate), then re-run the full compaction — it must converge to
    the same final state as a never-interrupted run: every day at the
    target file count, data identical."""
    path = str(tmp_path / "store")
    for i in range(3):
        write_events(
            spark.createDataFrame([_ev(700 + i, 1, 10, float(i))]), path
        )
    for i in range(3):
        write_events(
            spark.createDataFrame([_ev(800 + i, 2, 11, float(i))]), path
        )
    before = {
        (r["event_id"], r["value"])
        for r in spark.read.parquet(path).collect()
    }
    # "crash" after day 1's partition committed, day 2 still fragmented
    compact_partitions(spark, path, 1,
                       predicate="event_date = DATE '2025-03-01'")
    assert len(_files_for_day(path, 1)) == 1
    assert len(_files_for_day(path, 2)) == 3
    # recovery: re-run the full compaction
    n = compact_partitions(spark, path, target_files_per_day=1)
    assert n == 2
    assert len(_files_for_day(path, 1)) == 1
    assert len(_files_for_day(path, 2)) == 1
    after = {
        (r["event_id"], r["value"])
        for r in spark.read.parquet(path).collect()
    }
    assert after == before


def test_zordered_write_tightens_rowgroup_stats(spark, tmp_path):
    """Row-group-level evidence via pyarrow: the z-ordered write's
    parquet row groups carry tight user_id min/max boxes, while the
    arrival-order write's row groups each span ~the whole user domain
    (arrival order is time order, so user_id is shuffled through every
    row group). Tight boxes are what predicate pushdown prunes on."""
    import pyarrow.parquet as pq

    from maillogsentinel_spark.sources.store import write_events_zordered

    rows = [
        _ev(i, 1, i % 64, float(i)) for i in range(4096)
    ]  # one day, user_id cycling 0..63 in arrival order
    df = spark.createDataFrame(rows).coalesce(1)

    zpath, apath = str(tmp_path / "z"), str(tmp_path / "a")
    write_events_zordered(df, zpath)
    write_events(df.withColumn("event_date", F.to_date("ts")).drop(
        "event_date"), apath, mode="overwrite")

    def rowgroup_spans(root, day="event_date=2025-03-01"):
        spans = []
        for f in glob.glob(os.path.join(root, day, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for c in range(g.num_columns):
                    col = g.column(c)
                    if col.path_in_schema == "user_id" and col.statistics:
                        s = col.statistics
                        spans.append(int(s.max) - int(s.min))
        return spans

    # Spark's default row groups are large, so 4096 rows may land in a
    # single row group per file — the stats comparison only
    # discriminates with >1 group; otherwise fall back to asserting the
    # physical clustering directly.
    zs, as_ = rowgroup_spans(zpath), rowgroup_spans(apath)
    assert zs and as_
    if len(zs) > 1 or len(as_) > 1:
        assert sum(zs) / len(zs) < sum(as_) / len(as_)
    else:
        # single row group each: verify ordering instead — the z file's
        # first/last pages follow z order (user_id clustered), i.e. the
        # column is NOT in arrival order
        import pyarrow.parquet as pq2

        t = pq2.read_table(
            glob.glob(os.path.join(zpath, "event_date=2025-03-01",
                                   "*.parquet"))[0]
        )
        u = t.column("user_id").to_pylist()
        arrival = [r.user_id for r in rows]
        assert u != arrival
        # clustered: average absolute step between neighbors is far
        # smaller than the arrival-order cycling (which steps by 1 but
        # wraps 63->0 every 64 rows; z order groups equal users)
        runs = sum(1 for i in range(1, len(u)) if u[i] != u[i - 1])
        runs_arrival = sum(
            1 for i in range(1, len(arrival)) if arrival[i] != arrival[i - 1]
        )
        assert runs < runs_arrival / 10


def test_compaction_can_split_a_day(spark, tmp_path):
    """target_files_per_day > 1 must be able to SPLIT a day — hashing
    on the day column alone never could (regression for the salt)."""
    path = str(tmp_path / "store")
    write_events(
        spark.createDataFrame([_ev(i, 1, i % 8, float(i)) for i in range(512)]),
        path,
        mode="overwrite",
    )
    n = compact_partitions(spark, path, target_files_per_day=4)
    assert n == 1
    files = _files_for_day(path, 1)
    assert 2 <= len(files) <= 4
    assert spark.read.parquet(path).count() == 512


def _map_ev(eid, day, props):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2025, 3, day, 10, 0),
        tags=[{"k": str(props)}],  # array<map<string,string>> — nested map
    )


def test_upsert_tolerates_nested_map_columns(spark, tmp_path):
    """Nested maps (array<map>) are as unorderable as top-level maps —
    the dedupe tie-break must skip them instead of throwing at analysis
    time (regression for the round-7 ADVICE finding)."""
    path = str(tmp_path / "store")
    write_events(
        spark.createDataFrame([_map_ev(1, 1, "a"), _map_ev(2, 2, "b")]),
        path,
        mode="overwrite",
    )
    # duplicate key in the batch exercises the tie-break window
    n = upsert_events(
        spark,
        path,
        spark.createDataFrame([_map_ev(1, 1, "x"), _map_ev(1, 1, "y")]),
    )
    assert n == 1
    rows = spark.read.parquet(path).orderBy("event_id").collect()
    assert [r.event_id for r in rows] == [1, 2]
    assert rows[0].tags[0]["k"] in ("x", "y")


def test_compaction_tolerates_map_only_schema(spark, tmp_path):
    """A store with a map column and no event_id must still compact:
    xxhash64 rejects MapType, so the salt must skip map columns (and
    fall back to a row-id salt when nothing hashable remains)."""
    path = str(tmp_path / "store")
    df = spark.createDataFrame(
        [
            Row(
                ts=datetime.datetime(2025, 3, 1, 10, i % 60),
                props={"i": str(i)},
            )
            for i in range(64)
        ]
    ).withColumn("event_date", F.to_date("ts"))
    for chunk in range(4):  # several small files to compact
        df.where(F.minute("ts") % 4 == chunk).write.mode("append").partitionBy(
            "event_date"
        ).parquet(path)
    assert compact_partitions(spark, path, target_files_per_day=1) == 1
    assert len(_files_for_day(path, 1)) == 1
    assert spark.read.parquet(path).count() == 64
