"""Events store — reference S5 (CSV append sink) plus the scale path.

Canonical store: Parquet partitioned by event date. The reference's
report re-reads its entire CSV per run (its own noted bottleneck,
report.py:89-93); date-partitioned Parquet turns the daily report's day
filter into partition pruning — at 100 TB the report touches one
partition, not the store.

Byte-compat CSV emitter kept for parity with the reference's
``maillogsentinel.csv``: ``;`` delimiter, QUOTE_MINIMAL, header, column
order from parser.py:109-121, `dd/MM/yyyy HH:mm` date strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import MAIL_CSV_COLUMNS


def write_events(events: DataFrame, path: str, mode: str = "append") -> None:
    (
        events.withColumn("event_date", F.to_date("ts"))
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_events(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("event_date")


def write_events_csv(events: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Reference-compatible CSV shape (parser.py:106-121): all-string,
    `;`-separated, minimal quoting, header."""
    out = events.select(
        F.col("server"),
        F.date_format("ts", "dd/MM/yyyy HH:mm").alias("date"),
        *[F.col(c) for c in MAIL_CSV_COLUMNS[2:]],
    )
    (
        out.write.mode(mode)
        .option("sep", ";")
        .option("header", "true")
        .option("quoteAll", "false")
        .csv(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed, optionally sorted, Parquet table — the co-located-join
    layout for the 100 TB design point.

    Two fact tables bucketed on their join key with the same bucket
    count join WITHOUT a shuffle: each task reads bucket i of both
    sides. With ``sort_cols`` on the join key the merge phase also
    skips its sort. This is the layout choice that removes the
    biggest-ticket exchange (fact⨝fact, e.g. lineitem⨝orders on
    orderkey) from every downstream query, paid once at write time.

    The reference has no analogous concept (single CSV, no partitioning
    — SURVEY §4 "no partitioning/shuffle concept"); this is pure scale
    surface. Requires a catalog table (bucket metadata lives in the
    catalog, not the files): ``path`` pins the data location, and
    ``spark.catalog.dropTable`` does not delete external data.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def compact_store(
    spark: SparkSession,
    path: str,
    partition_col: str = "event_date",
    target_files_per_partition: int = 1,
) -> int:
    """Rewrite each partition of a date-partitioned store into
    ``target_files_per_partition`` files. Returns partitions compacted.

    Streaming appends accrete one small file per micro-batch per day —
    the classic small-files problem: at 100 TB the scan's task count
    (and the namenode/listing load) grows with file count, not data
    size. Compaction is maintenance, not ingestion: run it on cold
    partitions (past days no new batch will touch) so it never races
    the writer; each partition is rewritten via dynamic partition
    overwrite, which commits per-partition atomically."""
    df = spark.read.parquet(path)
    parts = df.select(partition_col).distinct()
    n = parts.count()
    (
        df.repartition(target_files_per_partition * max(n, 1), F.col(partition_col))
        .sortWithinPartitions(partition_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return n


def upsert_events(
    spark: SparkSession, path: str, updates: DataFrame, key: str = "event_id"
) -> int:
    """SCD-1 upsert (MERGE) into the day-partitioned store WITHOUT a
    table format: rewrite ONLY the day partitions the update batch
    touches, via Spark's dynamic partition overwrite.

    Shape: (1) derive the touched day list from the update batch (a
    bounded scalar collect — days, not rows); (2) read back just those
    partitions (partition pruning — at 100 TB this reads the affected
    days, never the store); (3) anti-join the old rows against the
    update keys and union the updates; (4) write with
    ``partitionOverwriteMode=dynamic`` so untouched days' files are
    never rewritten or deleted. The update keys broadcast (an update
    batch ≪ the store); the anti-join is the only join and it is
    map-side. Returns the number of rewritten partitions.

    Atomicity caveat (stated, not hidden): dynamic partition overwrite
    commits per partition directory — a crash mid-commit can leave a
    touched day rewritten and another not. That is the inherent limit
    of MERGE over a raw parquet layout; the transactional version of
    this exact operation is what a table format (Delta/Iceberg MERGE
    INTO) adds, and this function is the drop-in shape for it.

    This is the maintenance operation the reference cannot express at
    all (its store is one append-only CSV; fixing a row means rewriting
    the file, report.py:89-93 re-reads it every run regardless).
    """
    up = updates.withColumn("event_date", F.to_date("ts"))
    days = [r["event_date"] for r in up.select("event_date").distinct().collect()]
    if not days:
        return 0
    old = (
        spark.read.parquet(path)
        .where(F.col("event_date").isin(days))
        .join(F.broadcast(up.select(key)), key, "left_anti")
    )
    merged = old.unionByName(up)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(days)


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_files_per_day: int = 1,
    predicate: str | None = None,
) -> int:
    """Small-file compaction for the streaming-ingest output: rewrite
    each (optionally predicate-selected) day partition into
    ``target_files_per_day`` files via dynamic partition overwrite.

    Streaming file sinks produce one file per micro-batch per
    partition; a year of minutely batches is ~500k tiny files whose
    open/footer overhead dominates the scan. Compaction reads the
    selected days (partition-pruned), repartitions by (day, salt) where
    salt = hash(event_id) % target — hashing on the day alone could
    never split a day across more than one output file — and
    overwrites only those days. Returns the number of compacted
    partitions.
    """
    df = spark.read.parquet(path)
    if predicate:
        df = df.where(predicate)
    days = [r["event_date"] for r in df.select("event_date").distinct().collect()]
    if not days:
        return 0
    salt = F.pmod(F.xxhash64("event_id"), F.lit(target_files_per_day))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.withColumn("__salt", salt)
            .repartitionByRange(
                max(len(days) * target_files_per_day, 1),
                "event_date",
                "__salt",
            )
            .drop("__salt")
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(days)


def write_events_zordered(
    events: DataFrame,
    path: str,
    dims: tuple[str, str] = ("user_id", "ts"),
    mode: str = "overwrite",
    bits: int = 16,
) -> None:
    """Day-partitioned store write with rows Z-ORDERED inside each day
    partition, so every parquet ROW GROUP carries a tight min/max box
    in BOTH layout dimensions — the stats a reader's predicate pushdown
    prunes on (operators/zorder.py has the kernel and the math).

    The sort is `sortWithinPartitions(event_date, z)` — a per-task
    sort, NO global exchange beyond the day partitioning the store
    already pays; at 100 TB the z computation is a map-only expression
    and the sort is the write path's existing spill-aware task sort.
    Dimension ranges are taken from the batch being written (two
    scalars per dim), which is the right granularity: each ingest
    batch's files are boxed against its own value domain.
    """
    from ..operators.zorder import z_interleave, z_normalize

    d0, d1 = dims
    pts = events.withColumn("event_date", F.to_date("ts"))
    a = F.col(d0).cast("long")
    b = F.unix_micros(F.col(d1)) if d1 == "ts" else F.col(d1).cast("long")
    lo0, hi0, lo1, hi1 = pts.select(a.alias("a"), b.alias("b")).agg(
        F.min("a"), F.max("a"), F.min("b"), F.max("b")
    ).collect()[0]
    if None in (lo0, hi0, lo1, hi1):
        lo0 = hi0 = lo1 = hi1 = 0
    z = z_interleave(
        z_normalize(a, int(lo0), int(hi0), bits),
        z_normalize(b, int(lo1), int(hi1), bits),
        bits,
    )
    (
        pts.withColumn("__z", z)
        .sortWithinPartitions("event_date", "__z")
        .drop("__z")
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )
