"""GROUPED_AGG pandas UDAF + applyInPandas engine surface (§2.10)."""

import pandas as pd
from pyspark.sql import functions as F

from maillogsentinel_spark.operators.udaf import grouped_apply, lower_median


def test_lower_median_even_odd_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
         ("b", 5.0), ("b", None), ("b", 1.0), ("b", 9.0)],
        "g string, v double",
    )
    out = {r["g"]: r["m"] for r in
           df.groupBy("g").agg(lower_median("v").alias("m")).collect()}
    assert out["a"] == 2.0  # lower median of 1,2,3,4
    assert out["b"] == 5.0  # nulls dropped -> 1,5,9


def test_grouped_apply_demean(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "g string, v double"
    )

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    rows = grouped_apply(df.groupBy("g"), demean, "g string, v double").collect()
    got = sorted((r["g"], r["v"]) for r in rows)
    assert got == [("a", -1.0), ("a", 1.0), ("b", 0.0)]
