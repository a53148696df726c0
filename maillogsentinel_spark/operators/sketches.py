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
