"""Salted join: equality with the plain join, sound outer semantics."""

import pytest

from maillogsentinel_spark.operators.skew import salted_join


def _dfs(spark):
    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e")], ["k", "v"]
    )
    small = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "w"])
    return big, small


def test_inner_matches_plain_join(spark):
    big, small = _dfs(spark)
    got = sorted((r["k"], r["v"], r["w"])
                 for r in salted_join(big, small, "k", nsalt=4).collect())
    want = sorted((r["k"], r["v"], r["w"])
                  for r in big.join(small, "k").collect())
    assert got == want and len(got) == 4


def test_left_keeps_unmatched_big_rows(spark):
    big, small = _dfs(spark)
    rows = salted_join(big, small, "k", nsalt=4, how="left").collect()
    assert len(rows) == 5
    assert [r["w"] for r in rows if r["k"] == 3] == [None]


def test_right_join_rejected(spark):
    big, small = _dfs(spark)
    with pytest.raises(ValueError):
        salted_join(big, small, "k", how="right")
