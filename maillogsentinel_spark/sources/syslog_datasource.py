"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) for
syslog files: rows are (path, line_no, value), plain or gzip, one input
partition per file.

Why not just ``spark.read.text``: text() drops the (file, line-number)
provenance that the reference's incremental tail + "file order" sort
rely on (SURVEY §2.6 T3) — recovering it needs
input_file_name() + a monotonic id whose ordering is partition-
dependent. A first-class source yields the stable sort key natively,
streams line-by-line (no whole-file buffering), and demonstrates the
engine's source extension point end to end.

Scale: one partition per file — the natural parallelism for log
directories (the 100 TB layout is many rotated files); a single giant
file should be split upstream (gzip is not splittable anyway).
Registered under the short name "syslog"; gzip detected by magic bytes,
not extension, matching the reference's is_gzip (utils.py)."""

from __future__ import annotations

import glob
import gzip
import io
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyslogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "syslog"

    def schema(self) -> str:
        return "path string, line_no bigint, value string"

    def reader(self, schema) -> "SyslogReader":
        return SyslogReader(self.options)


class SyslogReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("syslog source requires a path")
        if os.path.isdir(path):
            path = os.path.join(path, "*")
        self._files = sorted(
            f for f in glob.glob(path) if os.path.isfile(f)
        )

    def partitions(self):
        return [InputPartition(f) for f in self._files]

    def read(self, partition):
        path = partition.value
        with open(path, "rb") as raw:
            head = raw.read(2)
            raw.seek(0)
            stream = gzip.open(raw, "rb") if head == b"\x1f\x8b" else raw
            text = io.TextIOWrapper(stream, encoding="utf-8", errors="replace")
            for i, line in enumerate(text):
                yield (path, i, line.rstrip("\r\n"))


def register(spark) -> None:
    spark.dataSource.register(SyslogDataSource)
