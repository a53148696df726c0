"""Count-min sketch as a pure DataFrame program.

A CMS is d hash rows × w counters; point-estimate = min over rows of
the counter at h_r(key). The classic implementation builds per-node
sketches and merges them pairwise — in Spark that whole dance collapses
into ONE keyed aggregation: explode each fact row into its d (row,
counter) cells and ``groupBy(r, c).count()``. Map-side partial
aggregation builds the per-partition sketches, the shuffle merges them
— mergeability falls out of the execution model instead of custom
code, and the result is a (d×w)-row table no matter the input size.

Hash family is arithmetic ((a_r·k + b_r) mod p) mod w over integer
keys — deliberately SQL-expressible, so the DuckDB oracle re-derives
the EXACT estimates (collisions included) and the value hash pins the
whole sketch arithmetic, not just row counts
(plans/queries.events_cms_user_counts).

Scale: the sketch table is d×w rows regardless of corpus size; the
estimate probe joins keys×d against it (broadcast — the sketch is tiny
by construction). The deterministic guarantee est ≥ exact always
holds; est ≤ exact + εN with ε = e/w at confidence 1 − e^−d.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = 2_147_483_647  # 2^31 − 1 (prime)
A = [981_723, 1_299_721, 7_919, 104_729]
B = [12_345, 54_321, 2_468, 13_579]


def _cell(key: Column, r: Column, w: int) -> Column:
    a = F.element_at(F.array(*[F.lit(x) for x in A]), r + 1).cast("long")
    b = F.element_at(F.array(*[F.lit(x) for x in B]), r + 1).cast("long")
    return ((a * key + b) % F.lit(P)) % F.lit(w)


def cms_build(df: DataFrame, key: Column, d: int = 4, w: int = 256) -> DataFrame:
    """(r, c, cnt) sketch table from one pass + one keyed agg."""
    assert d <= len(A), "extend the hash-family constants for d > 4"
    cells = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
        key.cast("long").alias("__k"),
    ).select("r", _cell(F.col("__k"), F.col("r"), w).alias("c"))
    return cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """(key_col, cms_est): min over the key's d counters. The sketch
    side is d×w rows — broadcast by construction."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    ).select(
        key_col, "r", _cell(F.col(key_col).cast("long"), F.col("r"), w).alias("c")
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "c"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# KMV (K-Minimum-Values / bottom-k theta) sketch — distinct-count
# estimation WITH SET OPERATIONS, the capability HLL lacks (an HLL
# union is easy, an intersection is not; a KMV sketch supports both,
# the same reason Druid/Pinot ship theta sketches alongside HLL).
#
# The sketch of a set S is the k smallest values of a uniform hash over
# S's distinct elements. Estimate: (k-1) / u_(k) where u_(k) is the
# k-th minimum normalized to (0,1] — the classic bottom-k estimator.
# Union: merge the two hash sets, keep the k smallest. Intersection:
# within the UNION's k minima, count hashes present in both input
# sketches — that fraction is a Jaccard estimate over a uniform sample
# of the union, so |A∩B| ≈ jaccard × est(A∪B).
#
# Everything is deterministic given the portable hash
# (functions/hashing.hash64 — identical in DuckDB), so the oracle
# re-derives the EXACT sketch and the value hash pins the estimator
# arithmetic itself, not just row counts.
#
# Scale shape: distinct (map-side combine) → per-group rank window
# over the DISTINCT hashes → trim to k. The window sorts only distinct
# values and emits k rows per group; the sketch table is
# O(groups × k) regardless of input size, and every set operation is
# arithmetic over those tiny tables (broadcast by construction).
# ---------------------------------------------------------------------------

_KMV_SPACE = float(1 << 60)  # hash64 is 60-bit — normalizer for (0,1]


def kmv_sketch(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """(group, h, r): the k minimum portable-hash values of the
    DISTINCT ``value_col`` per ``group_col``, rank r = 1..k ascending.
    Mergeable: union two sketches and re-trim (kmv_union)."""
    from pyspark.sql import Window

    from ..functions.hashing import hash64

    hashed = (
        df.select(
            F.col(group_col).alias("g"),
            hash64(F.col(value_col).cast("string"), salt="kmv").alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("h")
    return (
        hashed.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
        .select(F.col("g").alias(group_col), "h", "r")
    )


def kmv_estimate(sketch: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """(group, kmv_est): distinct-count estimate per group. A group
    holding fewer than k hashes saw its whole distinct set — the
    estimate is then EXACT (the count itself)."""
    return sketch.groupBy(group_col).agg(
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise(
            F.lit(float(k - 1)) / (F.max("h").cast("double") / F.lit(_KMV_SPACE))
        )
        .alias("kmv_est")
    )


def kmv_union(a: DataFrame, b: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """Sketch of A ∪ B per group: merge hash sets, keep the k minima —
    the same (group, h, r) shape, so unions chain."""
    from pyspark.sql import Window

    merged = (
        a.select(group_col, "h")
        .unionByName(b.select(group_col, "h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        merged.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
    )


def kmv_intersect_estimate(
    a: DataFrame, b: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """(group, union_est, jaccard_est, intersect_est): the union's
    bottom-k minima are a uniform sample of A ∪ B; the fraction of
    them present in BOTH input sketches estimates the Jaccard, and
    |A∩B| ≈ jaccard × est(A∪B)."""
    u = kmv_union(a, b, group_col, k)
    in_a = a.select(group_col, "h").withColumn("__a", F.lit(1))
    in_b = b.select(group_col, "h").withColumn("__b", F.lit(1))
    tagged = (
        u.join(in_a, [group_col, "h"], "left")
        .join(in_b, [group_col, "h"], "left")
    )
    est_u = kmv_estimate(u, group_col, k).withColumnRenamed(
        "kmv_est", "union_est"
    )
    jac = tagged.groupBy(group_col).agg(
        (
            F.sum(
                (F.col("__a").isNotNull() & F.col("__b").isNotNull())
                .cast("int")
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("jaccard_est")
    )
    return (
        est_u.join(jac, group_col)
        .select(
            group_col,
            "union_est",
            "jaccard_est",
            (F.col("jaccard_est") * F.col("union_est")).alias(
                "intersect_est"
            ),
        )
    )
