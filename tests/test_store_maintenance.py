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
