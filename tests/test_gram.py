"""operators/gram.py — distributed Gram matrix (map-side reduction)."""

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from maillogsentinel_spark.operators.gram import gram_upper_int


def test_gram_matches_numpy_across_partitions(spark):
    rng = np.random.RandomState(7)
    n, d = 37, 5
    q = rng.randint(-127, 128, size=(n, d))
    pdf = pd.DataFrame({"id": range(n), "v": [list(map(int, r)) for r in q]})
    df = spark.createDataFrame(pdf).repartition(4)

    got = {
        (r["i"], r["j"]): r["g"]
        for r in gram_upper_int(df, "v", d).collect()
    }
    want = q.T @ q
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == want[i, j]


def test_gram_empty_input(spark):
    df = spark.createDataFrame([], "v array<int>")
    assert gram_upper_int(df, "v", 3).count() == 0


def test_gram_single_partition_single_row(spark):
    df = spark.createDataFrame([([2, -3],)], "v array<int>").coalesce(1)
    got = {(r["i"], r["j"]): r["g"] for r in gram_upper_int(df, "v", 2).collect()}
    assert got == {(0, 0): 4, (0, 1): -6, (1, 1): 9}
