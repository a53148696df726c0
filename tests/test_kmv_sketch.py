"""KMV (bottom-k theta) sketch (operators/sketches.py): deterministic
given the portable hash, exact below k, mergeable by union+trim, and
the intersection estimator must track the true overlap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from maillogsentinel_spark.operators.sketches import (
    kmv_estimate,
    kmv_intersect_estimate,
    kmv_sketch,
    kmv_union,
)


def _df(spark, group, values):
    return spark.createDataFrame(
        [(group, v) for v in values], "g string, v long"
    )


def test_exact_below_k(spark):
    df = _df(spark, "a", range(40))
    sk = kmv_sketch(df, "g", "v", k=64)
    assert sk.count() == 40
    est = kmv_estimate(sk, "g", k=64).collect()[0]
    assert est["kmv_est"] == 40.0  # whole set seen -> exact


def test_estimate_tracks_cardinality(spark):
    df = _df(spark, "a", range(5000))
    est = kmv_estimate(
        kmv_sketch(df, "g", "v", k=64), "g", k=64
    ).collect()[0]["kmv_est"]
    # bottom-k relative error ~ 1/sqrt(k-2) ≈ 13%; allow 3 sigma
    assert 5000 * 0.6 < est < 5000 * 1.4, est


def test_sketch_is_deterministic_and_k_bounded(spark):
    df = _df(spark, "a", range(1000))
    s1 = sorted(r["h"] for r in kmv_sketch(df, "g", "v", k=32).collect())
    s2 = sorted(r["h"] for r in kmv_sketch(df, "g", "v", k=32).collect())
    assert s1 == s2 and len(s1) == 32


def test_union_equals_sketch_of_union(spark):
    a = _df(spark, "a", range(0, 600))
    b = _df(spark, "a", range(300, 900))
    u = kmv_union(
        kmv_sketch(a, "g", "v", k=64), kmv_sketch(b, "g", "v", k=64),
        "g", k=64,
    )
    direct = kmv_sketch(_df(spark, "a", range(0, 900)), "g", "v", k=64)
    assert sorted(r["h"] for r in u.collect()) == sorted(
        r["h"] for r in direct.collect()
    )


def test_intersection_estimate_tracks_overlap(spark):
    a = kmv_sketch(_df(spark, "p", range(0, 2000)), "g", "v", k=64)
    b = kmv_sketch(_df(spark, "p", range(1000, 3000)), "g", "v", k=64)
    row = kmv_intersect_estimate(a, b, "g", k=64).collect()[0]
    # truth: union 3000, intersection 1000, jaccard 1/3
    assert 3000 * 0.6 < row["union_est"] < 3000 * 1.4
    assert 0.1 < row["jaccard_est"] < 0.6
    assert 300 < row["intersect_est"] < 2000
