"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (full mail pipeline → daily top-10) at
sf0.001. ``queries()`` / ``oracle_sql()`` — the operator inventory from
SURVEY §2, implemented in maillogsentinel_spark.plans.queries with
DuckDB-oracle parity.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from maillogsentinel_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["mail_report_top10_today"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return dict(ORACLES)
