"""The driver grades a bounded prefix of queries() (round 1: first 50).
Pin that the prefix stays exactly GRADED_PREFIX — every §2 row and every
LLM-pipeline family represented — so a stray registration can't push a
family out of the graded window."""

from maillogsentinel_spark.plans.queries import GRADED_PREFIX, ORACLES, QUERIES


def test_prefix_is_first_and_exactly_50():
    assert len(GRADED_PREFIX) == 50
    assert list(QUERIES)[:50] == GRADED_PREFIX


def test_prefix_families_covered():
    p = set(GRADED_PREFIX)
    assert {"sasl_parse", "geo_range_join", "rdns_status_counts",
            "anonymize_users", "sql_cast_normalize"} <= p      # §2 core
    # dedup_simhash rotated just past the window mid-round-5, dedup_exact
    # round 8, embedding_cosine_pairs round 9 (exact-cosine evidence
    # stays via knn_recall_ladder's exact baseline arm); hash-sketch
    # dedup evidence stays via dedup_minhash_lsh, exact-dedup via
    # dedup_clusters' survivor set. Round 9 adds the sf1-exact slice
    # twins (verdict #1: never driver-graded before)
    assert {"dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_clusters",
            "dedup_graph_pagerank_slice",
            "dedup_incremental_new_docs_slice"} <= p           # dedup
    # knn_ivf/knn_lsh rotated out round 5, knn_bruteforce round 8,
    # kmeans_assign round 9: knn_recall_ladder composes IVF/LSH/
    # multiprobe against its own exact top-5 baseline arm; PQ-ADC
    # graded since round 7
    assert {"knn_recall_ladder", "knn_pq_adc"} <= p
    # doc_fingerprint rotated out round 9 (rolling-hash evidence stays
    # via the shingle-based dedup reps in-window)
    assert {"text_lang_quality", "pii_scrub",
            "corpus_gopher_rules"} <= p                        # text
    # round-5 rotation: the compressed-codec decode joins the BMP rep;
    # round-8: the two lossy ADPCM recurrence oracles + the honest-gate
    # policy row; round-9 (verdict #1): the five never-graded r8 codec
    # oracles join and the synthetic multimodal_features rep retires —
    # every graded multimodal row is now a REAL decode. Mid-round-9:
    # the non-integer-sampling JPEG decode (last sampling gate, now
    # closed) joins on arrival; multimodal_bmp_decode retires (real BMP
    # decodes stay graded via the gate registry's bmp rows)
    assert {"multimodal_gif_decode",
            "multimodal_adpcm_decode", "multimodal_ms_adpcm_decode",
            "multimodal_gate_registry", "multimodal_pjpeg_decode",
            "multimodal_jpeg420_decode", "multimodal_jpeg_frac_decode",
            "multimodal_png_subbyte_decode",
            "multimodal_alaw_decode",
            "multimodal_adpcm_stereo_decode"} <= p
    # round-8: the full join-mode matrix is graded — left-outer was the
    # only row never driver-graded
    assert {"events_stream_watermark_append", "events_stream_stream_join",
            "events_stream_full_outer_join",
            "events_stream_left_outer_join"} <= p
    # round-9 (verdict #1, top item): the transactional store's own
    # oracles — the poison-transaction roundtrip, the exactly-once
    # in-manifest streaming sink, and the hash-verified time-travel diff
    assert {"store_maintenance_roundtrip", "store_tx_roundtrip",
            "events_stream_tx_sink", "tx_time_travel_diff"} <= p
    # mid-round-5 new families: exact heavy hitters + z-order layout
    assert {"events_heavy_hitters_exact", "events_zorder_layout"} <= p
    # lineitem_percentiles + events_hll_daily_users rotated out round 9
    # (green since r1); exact-quantile evidence stays via the median
    # UDAF, sketch evidence via heavy hitters in-window + HLL rollup in
    # the full gate
    assert "events_median_by_type" in p
    assert {"udtf_bigrams_topk", "doc_bm25_search"} <= p
    # round-2 family fill: graph / ER / security / embedding stats
    # (pagerank's graded rep is the sliced twin since round 9)
    assert {"entity_resolution_usernames",
            "ip_risk_scores", "embedding_centroids"} <= p


def test_prefix_is_fully_oracle_checked():
    for name in GRADED_PREFIX:
        assert name in ORACLES, name


def test_every_oracle_key_is_a_registered_query():
    """oracle_sql() keys must be a subset of queries() keys — a typo'd
    oracle name would silently downgrade its query to rows-only."""
    extra = set(ORACLES) - set(QUERIES)
    assert extra == set()
    # and the only intentionally rows-only query is the GEMM twin
    assert set(QUERIES) - set(ORACLES) == {"embedding_cosine_pairs_gemm"}
