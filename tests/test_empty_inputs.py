"""Empty-input robustness: every core operator degrades to an empty
(or floor-value) result on zero rows — no exceptions, no div-by-zero.
The 100 TB relevance: a partition/day/source with no matching rows is
routine, and an operator that throws on it kills the whole job."""

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


def _empty_emb(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>")


def test_parse_empty(spark):
    from maillogsentinel_spark.operators.parse import parse_sasl_lines

    lines = spark.createDataFrame([], "value string")
    assert parse_sasl_lines(lines, year=2025).count() == 0


def test_dedup_family_empty(spark):
    from maillogsentinel_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = _empty_docs(spark)
    assert exact_dedup(docs, "doc_id", "text").count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0
    assert ngram_jaccard_pairs(docs, prefix_filter=True).count() == 0
    assert minhash_lsh_pairs(docs).count() == 0


def test_cdc_chunks_empty(spark):
    from maillogsentinel_spark.operators.dedup import cdc_chunk_rows

    assert cdc_chunk_rows(_empty_docs(spark)).count() == 0


def test_similarity_empty_queries(spark):
    from maillogsentinel_spark.operators.similarity import knn_bruteforce, knn_lsh

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    q = spark.createDataFrame([], "query_id long, embedding array<double>")
    assert knn_bruteforce(emb, q, k=3).count() == 0
    assert knn_lsh(emb, q, k=3, dims=2, n_tables=2, multiprobe=1).count() == 0


def test_anonymize_empty(spark):
    from maillogsentinel_spark.operators.anonymize import anonymize

    lines = spark.createDataFrame([], "line_id long, value string")
    assert anonymize(lines).count() == 0


def test_quantiles_and_rank_empty(spark):
    from maillogsentinel_spark.operators.anonymize import first_seen_rank
    from maillogsentinel_spark.operators.quantiles import exact_quantiles

    df = spark.createDataFrame([], "g string, v double")
    assert exact_quantiles(df, ["g"], "v", {"p50": 0.5}).count() == 0
    r = spark.createDataFrame([], "k long")
    assert first_seen_rank(r, ["k"]).count() == 0
    assert first_seen_rank(r, ["k"], local_threshold=0).count() == 0


def test_rdns_and_range_join_empty(spark):
    from maillogsentinel_spark.operators.range_join import range_join
    from maillogsentinel_spark.operators.rdns import enrich_rdns

    ev = spark.createDataFrame([], "ip string")
    assert enrich_rdns(ev, lambda ip: ("h", None)).count() == 0
    pts = spark.createDataFrame([], "ip_long long")
    dim = spark.createDataFrame(
        [(0, 10, "XX")], "range_start long, range_end long, country string"
    )
    assert range_join(pts, "ip_long", dim, start_col="range_start", end_col="range_end").count() == 0


def test_exact_substring_empty_and_short(spark):
    """Zero docs and all-shorter-than-window docs both yield empty
    results (the w-gram window guard, not an exception)."""
    from maillogsentinel_spark.operators.dedup import exact_substring_spans

    assert exact_substring_spans(_empty_docs(spark)).count() == 0
    short = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], ["doc_id", "text"]
    )
    assert exact_substring_spans(short, w=5).count() == 0


def test_gemm_grouped_empty(spark):
    from maillogsentinel_spark.operators.dedup import _cosine_pairs_gemm

    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, cid int"
    )
    assert _cosine_pairs_gemm(
        emb, "vec_id", "embedding", 0.5, group_col="cid"
    ).count() == 0


def test_heavy_hitters_empty(spark):
    from maillogsentinel_spark.operators.heavy_hitters import heavy_hitters_exact

    df = spark.createDataFrame([], "k string")
    hh, n = heavy_hitters_exact(df, "k", k=4)
    assert n == 0 and hh.count() == 0


def test_zorder_layout_empty(spark):
    from maillogsentinel_spark.plans.queries import QUERIES
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(os.path.join(d, "events.parquet"))
        assert QUERIES["events_zorder_layout"](spark, d).count() == 0
