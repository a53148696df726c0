"""GeoIP dimension loaders — reference S6.

Reference loads sapics/ip-location-db CSVs into sorted in-memory range
lists (/root/reference/bin/ipinfo.py:129-214): country CSV = ≥3 cols
(start, end, country_code), ASN CSV = ≥4 cols (start, end, asn, aso);
malformed rows skipped with a warning (ipinfo.py:200-205).

Spark shape: explicit-schema CSV read; bad rows dropped by a validity
filter (PERMISSIVE parse → nulls). The dims are small (few hundred-k
rows) and are broadcast by the range-join operator; no sort is needed
because the bucketed join replaces binary search (the `bisect` strategy
sorts its own broadcast copy).

The reference's dim *refresh* (S7, HTTP download + atomic replace,
ipinfo.py:44-127) is an out-of-band driver job, not a Spark operator; a
plain urllib fetch before re-reading the dim reproduces it and is
intentionally not implemented here (no network in the test env).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RAW_COUNTRY = T.StructType(
    [
        T.StructField("start_ip", T.StringType()),
        T.StructField("end_ip", T.StringType()),
        T.StructField("country_code", T.StringType()),
    ]
)

_RAW_ASN = T.StructType(
    [
        T.StructField("start_ip", T.StringType()),
        T.StructField("end_ip", T.StringType()),
        T.StructField("asn", T.StringType()),
        T.StructField("aso", T.StringType()),
    ]
)


def _clean(df: DataFrame, payload: list[str]) -> DataFrame:
    # try_cast: ANSI mode (Spark 4 default) would otherwise abort the job
    # on one malformed row; the reference skips such rows (ipinfo.py:200-205)
    out = df.withColumn("start_ip", F.col("start_ip").try_cast("long")).withColumn(
        "end_ip", F.col("end_ip").try_cast("long")
    )
    # malformed rows (unparseable bounds / missing payload) are skipped,
    # mirroring ipinfo.py:200-205
    cond = F.col("start_ip").isNotNull() & F.col("end_ip").isNotNull()
    for c in payload:
        cond = cond & F.col(c).isNotNull()
    return out.filter(cond)


def load_geo_country(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.csv(path, schema=_RAW_COUNTRY, header=False)
    return _clean(df, ["country_code"])


def load_geo_asn(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.csv(path, schema=_RAW_ASN, header=False)
    return _clean(df, ["asn", "aso"])


def refresh_dim(url: str, dest_path: str, logger=None) -> bool:
    """S7 dim refresh: fetch ``url`` (``.gz`` transparently gunzipped)
    and atomically replace ``dest_path`` (reference ipinfo.py:44-127 —
    temp file + ``os.replace``; a failed download never clobbers the
    existing dim).

    Driver-side, out-of-band by design: the dim is then (re)read with
    ``load_geo_country``/``load_geo_asn`` and broadcast. ``file://``
    URLs work, which is what the tests use (no network in CI)."""
    import gzip
    import logging
    import os
    import shutil
    import tempfile
    import urllib.request

    log = logger or logging.getLogger(__name__)
    dest_dir = os.path.dirname(dest_path) or "."
    tmp_path = ""
    try:
        with tempfile.NamedTemporaryFile(
            mode="wb", delete=False, dir=dest_dir,
            prefix=os.path.basename(dest_path) + ".tmp",
        ) as tmp_f:
            tmp_path = tmp_f.name
            with urllib.request.urlopen(url) as resp:
                if url.endswith(".gz"):
                    with gzip.open(resp, "rb") as gz:
                        shutil.copyfileobj(gz, tmp_f)
                else:
                    shutil.copyfileobj(resp, tmp_f)
        os.replace(tmp_path, dest_path)
        return True
    except (OSError, gzip.BadGzipFile, ValueError) as e:
        log.error("dim refresh failed for %s: %s", url, e)
        if tmp_path and os.path.exists(tmp_path):
            os.remove(tmp_path)
        return False
