"""Distributed k-means (Lloyd's) over embedding columns.

Not in the reference (its only "clustering" is file-level dedup); this
is LLM-pipeline surface: corpus bucketing / coarse quantization for IVF
indexes and data-mixture analysis.

Spark shape (the one that survives a billion vectors):
- centroids are tiny (k × dims) and live as a k-row DataFrame that is
  **broadcast** into the assignment cross join — the corpus is scanned,
  never shuffled, for assignment;
- the mean recompute keys on (cluster, dim) — k × dims cells, so
  partial aggregation parallelizes regardless of k;
- everything is deterministic: init = the k lowest-id vectors,
  distance ties break to the lowest cluster id, and per-dim means go
  through DECIMAL partials so aggregation order cannot move bits. That
  determinism is what lets a 2-iteration run be verified exactly
  against an unrolled SQL oracle.

For many iterations, `localCheckpoint` the centroid table every few
rounds (same lineage argument as operators/graph.py); at iters=2 the
lineage is shallow and checkpointing would only add latency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import to_double_array


def _assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cid): nearest centroid by squared L2; ties → lowest cid.
    Sequential fold over dims keeps the double sum order identical to
    the oracle's list_reduce."""
    pairs = e.crossJoin(F.broadcast(cents))
    dist = F.aggregate(
        F.zip_with("v", "c", lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    scored = pairs.select("vec_id", "cid", dist.alias("dist"))
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )


def kmeans_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """(cid, c array<double>): centroids after ``iters - 1`` Lloyd mean
    recomputes (init = the k lowest-id vectors; ``iters=1`` returns the
    init centroids untouched). Deterministic end to end."""
    e = emb.select(
        F.col(id_col).alias("vec_id"), to_double_array(F.col(vec_col)).alias("v")
    )
    init = e.orderBy("vec_id").limit(k)
    cents = init.select(
        (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cid"),
        F.col("v").alias("c"),
    )
    for _ in range(iters - 1):
        assigned = _assign(e, cents)
        ex = e.join(assigned, "vec_id").select(
            "cid", F.posexplode("v").alias("pos", "x")
        )
        m = ex.groupBy("cid", "pos").agg(
            (
                F.sum(F.col("x").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mx")
        )
        cents = m.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mx"))), lambda s: s["mx"]
            ).alias("c")
        )
    # materialize the k-row centroid table: every downstream branch
    # (assignment, probing) would otherwise replay the whole training
    # sub-plan — one corpus pass per branch
    return cents.localCheckpoint(eager=True)


def kmeans_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """(vec_id, cid) after ``iters`` Lloyd assignment passes with
    ``iters - 1`` mean recomputes in between. Deterministic end to end
    (see module docstring)."""
    e = emb.select(
        F.col(id_col).alias("vec_id"), to_double_array(F.col(vec_col)).alias("v")
    )
    return _assign(e, kmeans_fit(emb, id_col, vec_col, k, iters))
