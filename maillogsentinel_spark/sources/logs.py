"""Log sources — reference S1–S4.

The reference hand-rolls: plain-text read, gzip branch, byte-offset
incremental tail, rotation detection
(/root/reference/lib/maillogsentinel/parser.py:38-217, utils.py:273-307).

Spark replaces all four:
- ``spark.read.text`` accepts a list of paths or a glob and decompresses
  ``*.gz`` transparently (S1+S2, and T3's oldest→newest sweep becomes a
  plain multi-path UNION ALL scan);
- incremental tail + rotation detection (S3+S4) are the Structured
  Streaming file source's per-file tracking — see streaming/ingest.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_logs(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Batch read of syslog files (plain and .gz mixed) → ``value`` lines.

    Matches reference behavior of reading rotated files oldest→newest
    then the live log (bin/maillogsentinel.py:643): order is irrelevant
    to the engine because events carry their own timestamps.
    """
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.text(paths)
