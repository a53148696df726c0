"""Whole-inventory physical-plan audit: every registered query's plan is
scanned for scale anti-patterns —

- CartesianProduct (unbounded all-pairs);
- BroadcastNestedLoopJoin, except where a deliberate broadcast
  crossJoin against a provably tiny side is the design (whitelist);
- BatchEvalPython (row-at-a-time Python UDF; ArrowEvalPython and
  mapInPandas/Arrow UDTF nodes are the sanctioned Python paths);
- unpartitioned WindowExec over unbounded input (an empty PARTITION BY
  moves every row to ONE task — invisible at test SF, fatal at 100 TB).
  A window whose subtree contains a Limit/TakeOrderedAndProject is
  auto-allowed (its input is provably bounded); anything else needs a
  documented whitelist entry below.

Plans are built at sf0.001 (plan shape is SF-independent; a few queries
materialize gates/counts eagerly, which stays cheap at that SF).
"""

import pytest

from maillogsentinel_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"

# (query, operator) pairs that are deliberate: tiny broadcast side by
# construction, documented in the query/operator docstring.
ALLOWED = {
    ("knn_bruteforce", "BroadcastNestedLoopJoin"),   # broadcast query side
    ("knn_lsh", "BroadcastNestedLoopJoin"),          # broadcast probe rows
    ("knn_ivf", "BroadcastNestedLoopJoin"),          # broadcast probe rows
    ("knn_ivf_kmeans", "BroadcastNestedLoopJoin"),   # broadcast probe rows
    ("kmeans_assign", "BroadcastNestedLoopJoin"),    # broadcast k centroids
    ("knn_label_classify", "BroadcastNestedLoopJoin"),  # broadcast query side
    ("knn_recall_ladder", "BroadcastNestedLoopJoin"),   # composes the knn_*
    # variants above, inheriting their broadcast query/probe sides
    ("dedup_semantic", "BroadcastNestedLoopJoin"),   # broadcast k centroids
    ("embedding_cosine_pairs", "BroadcastNestedLoopJoin"),  # block-pair grid
    ("embedding_cosine_pairs_gemm", "BroadcastNestedLoopJoin"),
    ("doc_tfidf_topk", "BroadcastNestedLoopJoin"),   # broadcast 1-row total
    ("corpus_contamination", "BroadcastNestedLoopJoin"),  # broadcast probe set
    ("customer_rfm", "BroadcastNestedLoopJoin"),     # broadcast 1-row max-date
    ("lineitem_approx_quantile_check", "BroadcastNestedLoopJoin"),  # 1-row stats
    ("tpch_q11_important_parts", "BroadcastNestedLoopJoin"),  # 1-row threshold,
    # inequality join — TPC-H Q11's scalar-subquery shape
    ("doc_bm25_search", "BroadcastNestedLoopJoin"),  # two 1-row stat broadcasts
    ("events_kmv_distinct_setops", "BroadcastNestedLoopJoin"),  # two 1-row
    # pair-sketch stats (union/jaccard estimate + exact intersect count)
    ("doc_hybrid_rrf_search", "BroadcastNestedLoopJoin"),  # same BM25 stats
    # broadcasts + the 1-row query-vector broadcast of the semantic arm
    ("doc_bigram_logprob", "BroadcastNestedLoopJoin"),  # 1-row vocab-size bcast
    ("bpe_encode_compression", "BroadcastNestedLoopJoin"),  # 1-row winning
    # merge pair broadcast per BPE round (the _bpe_shared fold)
    ("dsir_importance_weights", "BroadcastNestedLoopJoin"),  # 1-row totals
    ("corpus_source_mixing", "BroadcastNestedLoopJoin"),  # 1-row weight total
    ("docs_ccnet_buckets", "BroadcastNestedLoopJoin"),  # 1-row vocab size
    # (the _doc_lm_scores bigram model shared with doc_bigram_logprob)
    ("udtf_bigrams_topk", "BatchEvalPython"),        # the UDTF surface demo:
    # BatchEvalPythonUDTF IS the extension point this query exists to prove
    ("dedup_lsh_recall", "BroadcastNestedLoopJoin"),  # two 1-row count
    # aggregates cross-joined into the single recall row
    ("dedup_lsh_band_sweep", "BroadcastNestedLoopJoin"),  # the 1-row
    # exact-pair count broadcast-crossed onto len(geometries) rows
}

FORBIDDEN = ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython"]

# Queries whose unpartitioned windows run over input that is bounded by
# CONSTRUCTION rather than by a Limit node the sweep can see; each entry
# cites the bound (docstrings carry the full argument).
UNPARTITIONED_WINDOW_ALLOWED = {
    "orders_open_backlog",   # calendar-day spine: sequence() over the order
    # date range, ~2,500 rows/decade — grows with TIME, not data volume
    "anonymize_users",       # first_seen_rank: size-gated dense_rank over
    # the DISTINCT-user dim (operators/anonymize.py — gate documented)
    "lineitem_percentiles",  # exact ntile over the distinct value domain
    # (operators/quantiles.py:278 — pre-aggregated before the window)
    "customer_rfm",          # gated_ntile ×3 over the per-CUSTOMER agg:
    # plain window below 2M rows, exact range-partitioned rank + the
    # closed-form bucket above it (operators/quantiles.py:gated_ntile)
}

# Physical nodes that prove the window's input is bounded: an upstream
# top-k/limit (TakeOrderedAndProject, Global/LocalLimit, CollectLimit)
# or a rank-pushdown WindowGroupLimit(Partial) that caps rows per map
# task before the single-partition final pass.
_BOUNDING = ("Limit", "TakeOrdered", "WindowGroupLimit")


def _iter_nodes(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _iter_nodes(children.apply(i))


def _unbounded_global_windows(df):
    """Names of WindowExec nodes with an empty partitionSpec whose
    subtree shows no bounding node (pre-AQE plan: a plain tree)."""
    plan = df._jdf.queryExecution().sparkPlan()
    bad = []
    for n in _iter_nodes(plan):
        if n.getClass().getSimpleName() != "WindowExec":
            continue
        if not n.partitionSpec().isEmpty():
            continue
        subtree = list(_iter_nodes(n))[1:]
        if any(
            any(tag in c.getClass().getSimpleName() for tag in _BOUNDING)
            for c in subtree
        ):
            continue
        bad.append(n.nodeName())
    return bad


def test_window_detector_flags_unbounded_and_accepts_bounded(spark):
    """Self-test of the sweep: a global ntile (no rank-limit pushdown
    possible) must be flagged; a row_number capped by a filter is
    rewritten by LimitPushDownThroughWindow into TakeOrdered→Window and
    must be accepted; an explicit orderBy().limit() rank likewise."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id")
    unbounded = df.select(
        "vec_id", F.ntile(4).over(Window.orderBy("vec_id")).alias("q")
    )
    assert _unbounded_global_windows(unbounded), (
        "detector must flag a global ntile over unbounded input"
    )
    rn = F.row_number().over(Window.orderBy(F.desc("vec_id")))
    pushed = df.select("vec_id", rn.alias("rk")).filter(F.col("rk") <= 20)
    assert not _unbounded_global_windows(pushed)
    explicit = (
        df.orderBy(F.desc("vec_id"))
        .limit(20)
        .select("vec_id", rn.alias("rk"))
    )
    assert not _unbounded_global_windows(explicit)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_antipatterns(spark, name):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for op in FORBIDDEN:
        if op in plan and (name, op) not in ALLOWED:
            lines = [ln for ln in plan.splitlines() if op in ln][:3]
            pytest.fail(f"{name}: {op} in physical plan:\n" + "\n".join(lines))
    if name not in UNPARTITIONED_WINDOW_ALLOWED:
        bad = _unbounded_global_windows(df)
        if bad:
            pytest.fail(
                f"{name}: unpartitioned window over unbounded input "
                f"(single-partition funnel at scale): {bad}"
            )


def test_reader_handle_cache_holds_no_materialized_rows(spark):
    """_RAW_T_CACHE (and the schema memo next to it) must stay a
    catalog-style cache of UNEXECUTED plan handles: no entry may be
    persisted or carry an InMemoryRelation — the line the round-11
    verdict drew for the growing session-cache surface is 'never
    materialized rows'."""
    from pyspark.storagelevel import StorageLevel

    from maillogsentinel_spark.plans import queries as Q

    # populate through the public loader for a couple of tables
    Q._t(spark, SF, "events")
    Q._t(spark, SF, "orders")
    assert Q._RAW_T_CACHE, "cache should be populated by _t"
    for (app, _sf, name), df in Q._RAW_T_CACHE.items():
        assert df.storageLevel == StorageLevel.NONE, (
            f"cached reader handle {name} is persisted"
        )
        plan = df._jdf.queryExecution().analyzed().toString()
        assert "InMemoryRelation" not in plan, (
            f"cached reader handle {name} wraps materialized rows"
        )
    for key, st in Q._RAW_SCHEMA_CACHE.items():
        from pyspark.sql.types import StructType

        assert isinstance(st, StructType)
