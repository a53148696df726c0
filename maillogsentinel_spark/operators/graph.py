"""Distributed connected components — near-dup pairs → dup clusters.

The reference has no graph operator (its dedup story stops at the
filename-set in `/root/reference/lib/maillogsentinel/sql_importer.py:251-277`);
this is part of the LLM-pipeline extension surface: candidate PAIRS from
MinHash-LSH / SimHash become CLUSTERS, and each cluster elects one
survivor (min id) — the last step of every large-scale near-dedup
pipeline.

Algorithm: min-label propagation accelerated by pointer jumping.

- labels start as ``comp = id``; each round every vertex takes the min
  of its own label and its neighbors' labels (one equi-join on the edge
  list + one ``groupBy(id).min(comp)``), then POINTER-JUMPS: ``comp :=
  label(comp)`` via a self-join on the label table. The jump halves the
  remaining label distance, so convergence is O(log diameter) rounds
  instead of O(diameter) — the classic shortcutting from parallel CC
  (cf. Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14, whose star operations are the contraction analogue).
- ``localCheckpoint(eager)`` after every round truncates the lineage;
  without it round *k* replays all *k−1* predecessor shuffles and the
  DAG grows quadratically.
- Convergence is detected with a 1-row aggregate: ``sum(comp)`` is
  strictly decreasing while any label still shrinks (labels only ever
  decrease), so an unchanged sum == fixpoint. No driver-side diff join.

Scale notes (100 TB design point):
- Near-dup clusters are dense quasi-cliques (every member shares LSH
  bands with most others) with diameter 2-4; pointer jumping makes the
  adversarial long-chain case cheap too (log₂ rounds). ``max_iter``
  stays as a hard stop.
- The edge list is persisted once and re-joined per round — the
  upstream pair-generation plan (LSH + verification) never re-executes.
- Per round: three shuffles (edge join, min-agg, jump self-join), each
  keyed on vertex id — wide, AQE-splittable, no single-task stage.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    jump_after: int = 2,
    local_threshold: int = 200_000,
) -> DataFrame:
    """(id, comp) for every vertex of the undirected edge list; ``comp``
    is the minimum vertex id reachable from ``id`` (the canonical
    component label). Vertices with no edges are absent — callers that
    want singletons join the result back to their vertex table and
    ``coalesce(comp, id)``.

    Like a broadcast-join threshold, a deduplicated edge list at or
    under ``local_threshold`` (default 200k edges ≈ a few MB — far
    below driver headroom) short-circuits to a driver-side union-find:
    identical min-id labels, zero iterative rounds. Iterative CC costs
    ~3 shuffles + a convergence probe PER ROUND no matter how small the
    graph — pure fixed overhead in the common case where upstream LSH
    already shrank candidates to thousands of pairs. Above the
    threshold (the 100 TB regime) the distributed label-propagation +
    pointer-jumping path below runs unchanged. Set
    ``local_threshold=0`` to force the distributed path (the
    cross-check tests do)."""
    e = edges.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    )
    und = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if local_threshold and und.count() <= local_threshold:
        rows = und.filter(F.col("s") <= F.col("d")).collect()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        verts: set[int] = set()
        for r in rows:
            verts.add(r.s)
            verts.add(r.d)
            ra, rb = find(r.s), find(r.d)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra  # larger root under smaller → root stays min id
        out = sorted((v, find(v)) for v in verts)
        und.unpersist()
        return edges.sparkSession.createDataFrame(out, "id long, comp long")
    lab = (
        und.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for it in range(max_iter):
        prop = und.join(lab, und["s"] == lab["id"]).select(
            F.col("d").alias("id"), F.col("comp")
        )
        lab = (
            lab.unionByName(prop).groupBy("id").agg(F.min("comp").alias("comp"))
        )
        if it >= jump_after:
            # pointer jump: comp := label(comp). Every comp value is
            # itself a vertex id (labels are always some vertex's id), so
            # the lookup hits; left+coalesce only guards the theoretical
            # miss. label(comp) ≤ comp by monotonicity, hence plain
            # substitution, no least(). Deferred past the first rounds:
            # dense near-dup cliques converge before it engages, so they
            # never pay the extra join; long chains get O(log d) rounds
            # from round jump_after on.
            parent = lab.select(
                F.col("id").alias("__pid"), F.col("comp").alias("__pcomp")
            )
            lab = (
                lab.join(parent, lab["comp"] == parent["__pid"], "left")
                .select("id", F.coalesce("__pcomp", "comp").alias("comp"))
            )
        lab = lab.localCheckpoint(eager=True)
        sig = lab.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]
        if sig == prev_sig:
            break
        prev_sig = sig
    und.unpersist()
    return lab


def dedup_cluster_assign(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(doc_id, cluster_id) for every doc that appears in a near-dup
    pair; cluster_id = min doc id of its connected component (also the
    elected survivor)."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id")
    )


def pagerank(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    iters: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an undirected pair list (each pair contributes an
    edge in both directions), started uniform at 1/N.

    Per iteration: one join of the rank vector onto the edge list keyed
    by source + one keyed sum per destination — the same two-shuffle
    round shape as connected_components, with ``localCheckpoint`` after
    each iteration so round k never replays rounds 1..k−1. Simplified
    variant without dangling-mass redistribution (isolated nodes hold
    the (1−d)/N floor) — stated because the oracle implements the
    identical recurrence, unrolled. Scale: shuffles key on vertex ids;
    rank and degree tables are |V| rows; nothing is ever all-pairs."""
    # edges and deg are loop INVARIANTS read by every iteration (edges
    # twice per round: contrib join + deg join); persisted once, the
    # pair-generation subtree and the degree shuffle run once instead
    # of once per use per round — the same scoped persist
    # connected_components applies to its undirected edge list. The
    # final pr is localCheckpointed (materialized), so both caches can
    # be dropped before returning.
    edges = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionAll(
        pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = nodes.count()
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pr = nodes.select(F.col(id_col).alias("id"), F.lit(1.0 / n).alias("pr"))
    for _ in range(iters):
        contrib = (
            edges.join(pr, edges["src"] == pr["id"])
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("c"))
        )
        pr = (
            nodes.select(F.col(id_col).alias("id"))
            .join(contrib, F.col("id") == F.col("dst"), "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    deg.unpersist()
    edges.unpersist()
    return pr.select(F.col("id").alias(id_col), "pr")
