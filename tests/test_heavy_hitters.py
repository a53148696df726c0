"""Misra-Gries exact heavy hitters (operators/heavy_hitters.py).

The MG guarantee under test: the candidate union NEVER loses a key
whose global count exceeds N/(k+1), whatever the partitioning or the
arrival order; the recount + threshold then makes the result exactly
equal to the brute-force GROUP BY ... HAVING.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from maillogsentinel_spark.operators.heavy_hitters import (
    _mg_merge,
    heavy_hitters_exact,
    mg_candidates,
)


def _mg_stream(values, k, batch=7):
    s = None
    for i in range(0, len(values), batch):
        s = _mg_merge(s, pd.Series(values[i : i + batch]).value_counts(), k)
    return s


def test_mg_merge_capacity_and_superset():
    # 60x'a', 30x'b', 10 singletons; N=100, k=3 -> threshold N/4=25.
    vals = ["a"] * 60 + ["b"] * 30 + [f"s{i}" for i in range(10)]
    s = _mg_stream(vals, k=3)
    assert len(s) <= 3
    assert {"a", "b"} <= set(s.index)
    # MG counters are lower bounds within error N/(k+1)
    assert s["a"] <= 60 and s["a"] >= 60 - 25
    assert s["b"] <= 30 and s["b"] >= 30 - 25


def test_mg_adversarial_order_keeps_heavy_key():
    # heavy key arrives LAST, after k distinct fillers saturated the
    # summary — the decrement rule must still let it displace them.
    vals = [f"f{i % 5}" for i in range(50)] + ["hh"] * 60
    s = _mg_stream(vals, k=2, batch=5)
    assert "hh" in s.index  # 60 > 110/3 ~ 36.7


def test_mg_tie_eviction_respects_capacity():
    # all counters tie at the subtraction value -> everything drops
    s = _mg_merge(None, pd.Series({"a": 1, "b": 1, "c": 1, "d": 1}), k=3)
    assert len(s) <= 3


def test_candidates_superset_and_exact_result(spark):
    # 3 partitions, heavy key split across them so NO partition-local
    # exact count would find it, but the MG union must.
    rows = (
        [("hh",)] * 40 + [(f"u{i}",) for i in range(30)] + [("mid",)] * 20
    )
    df = spark.createDataFrame(rows, ["k"]).repartition(3)
    cands = {r["k"] for r in mg_candidates(df, "k", 8).distinct().collect()}
    assert "hh" in cands

    hh, n = heavy_hitters_exact(df, "k", k=4)
    got = {(r["k"], r["cnt"]) for r in hh.collect()}
    brute = {
        (r["k"], r["cnt"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * 5 > F.lit(n))
        .collect()
    }
    assert n == 90
    assert got == brute == {("hh", 40), ("mid", 20)}


def test_exact_boundary_is_strict(spark):
    # 25 of 100 with k=3: 25*4 == 100 is NOT > N -> excluded.
    rows = [("x",)] * 25 + [(f"y{i % 75}",) for i in range(75)]
    df = spark.createDataFrame(rows, ["k"]).repartition(2)
    hh, n = heavy_hitters_exact(df, "k", k=3)
    assert n == 100
    assert hh.where(F.col("k") == "x").count() == 0


def test_nulls_excluded_from_n_and_result(spark):
    rows = [("a",)] * 8 + [(None,)] * 4 + [("b",)] * 2
    df = spark.createDataFrame(rows, "k string")
    hh, n = heavy_hitters_exact(df, "k", k=1)
    assert n == 10
    assert {(r["k"], r["cnt"]) for r in hh.collect()} == {("a", 8)}


# --------------------------------------------------------------------------
# Property: the MG candidate union NEVER loses a true heavy hitter, for ANY
# key distribution, partitioning, batch size, and capacity. Pure pandas —
# the invariant the Spark operator's correctness rests on.
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    data=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=300),
    k=st.integers(min_value=1, max_value=6),
    n_parts=st.integers(min_value=1, max_value=5),
    batch=st.integers(min_value=1, max_value=17),
    seed=st.integers(min_value=0, max_value=999),
)
def test_mg_candidates_never_lose_heavy_hitter(data, k, n_parts, batch, seed):
    import random

    rng = random.Random(seed)
    parts = [[] for _ in range(n_parts)]
    for x in data:
        parts[rng.randrange(n_parts)].append(x)

    cands = set()
    for p in parts:
        s = None
        for i in range(0, len(p), batch):
            chunk = pd.Series(p[i : i + batch]).value_counts()
            s = _mg_merge(s, chunk, k)
        if s is not None:
            assert len(s) <= k  # capacity invariant per partition
            cands |= set(s.index)

    n = len(data)
    counts = pd.Series(data).value_counts()
    heavy = {key for key, c in counts.items() if c * (k + 1) > n}
    assert heavy <= cands, (heavy - cands, k, n)
