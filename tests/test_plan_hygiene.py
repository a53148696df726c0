"""Whole-inventory physical-plan audit: every registered query's plan is
scanned for scale anti-patterns —

- CartesianProduct (unbounded all-pairs);
- BroadcastNestedLoopJoin, except where a deliberate broadcast
  crossJoin against a provably tiny side is the design (whitelist);
- BatchEvalPython (row-at-a-time Python UDF; ArrowEvalPython and
  mapInPandas/Arrow UDTF nodes are the sanctioned Python paths).

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
}

FORBIDDEN = ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython"]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_antipatterns(spark, name):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for op in FORBIDDEN:
        if op in plan and (name, op) not in ALLOWED:
            lines = [ln for ln in plan.splitlines() if op in ln][:3]
            pytest.fail(f"{name}: {op} in physical plan:\n" + "\n".join(lines))
