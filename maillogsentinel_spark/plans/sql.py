"""SQL query surface (SURVEY §7 Phase 3).

The reference has no query language — its "queries" are CLI modes
(`/root/reference/bin/maillogsentinel.py:93-143`). On Spark the whole
SQL surface is free once the tables are registered; this module is the
thin registration layer that turns the engine's DataFrames into views
so users can `engine.sql("SELECT ... FROM events JOIN ...")` and get
the same Catalyst plans the DataFrame API produces.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def register_views(spark: SparkSession, **tables: DataFrame) -> None:
    """Register DataFrames as temp views: ``register_views(spark,
    events=ev, geo_country=gc)`` → views `events`, `geo_country`."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)


def register_testdata_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every parquet table under ``sf_dir`` as a view (same
    names the DuckDB oracle uses). Returns the registered names."""
    from .queries import _t

    found = []
    for name in TESTDATA_TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            _t(spark, sf_dir, name).createOrReplaceTempView(name)
            found.append(name)
    return found


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run SQL against the registered views. Catalyst applies the same
    pushdown/pruning/join planning as the DataFrame API — there is one
    optimizer, so the SQL surface inherits every physical property the
    plan tests assert."""
    return spark.sql(query)
