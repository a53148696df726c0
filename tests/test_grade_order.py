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
    # §2 core surface (json_props_agg retired r10 — F-json stays in the
    # full local gate)
    assert {"sasl_parse", "geo_range_join", "rdns_status_counts",
            "anonymize_users", "sql_cast_normalize",
            "mail_report_top10_today"} <= p
    # dedup: ngram_jaccard + minhash_lsh retired r10 — BOTH arms stay
    # graded via dedup_lsh_recall, whose oracle re-derives the
    # exact-jaccard truth set and the banded-LSH candidate set side by
    # side; exact-dedup evidence stays via dedup_clusters' survivor
    # set; CDC chunking + its cross-source consumer join r10
    assert {"dedup_clusters", "dedup_lsh_recall", "dedup_lsh_band_sweep",
            "dedup_cdc_chunks",
            "dedup_cdc_cross_source", "dedup_exact_substring",
            "dedup_graph_pagerank_slice",
            "dedup_incremental_new_docs_slice"} <= p
    # similarity: knn_recall_ladder composes IVF/LSH/multiprobe against
    # its own exact top-5 baseline arm (knn_pq_adc retired r11 after
    # four green rounds — PQ evidence stays in the full local gate)
    assert {"knn_recall_ladder"} <= p
    # text (text_lang_quality retired r10; quality evidence stays via
    # pii_scrub + corpus_gopher_rules; contamination via the CDC
    # cross-source matrix)
    assert {"pii_scrub", "corpus_gopher_rules"} <= p
    # multimodal: every graded row is a REAL decode; jpeg420 / alaw /
    # adpcm_stereo retired r11 (the family held nine reps — JPEG
    # evidence stays via progressive + fractional-sampling, ADPCM via
    # the two recurrence-oracled decodes, policy via the gate registry)
    assert {"multimodal_adpcm_decode", "multimodal_ms_adpcm_decode",
            "multimodal_gate_registry", "multimodal_pjpeg_decode",
            "multimodal_jpeg_frac_decode",
            "multimodal_png_subbyte_decode"} <= p
    # streaming: watermark_append retired r10 — the family keeps the
    # full join-mode matrix (all watermark-driven) + the tx sink, and
    # r11 adds the tx store as a NATIVE streaming source
    assert {"events_stream_stream_join",
            "events_stream_full_outer_join",
            "events_stream_left_outer_join",
            "events_stream_tx_sink",
            "events_stream_tx_source"} <= p
    # transactional store: the round-9 flagships joined r10; r11 adds
    # the five mid-round-10 flagships (CDF, bloom skipping,
    # incremental tail, deletion vectors) — store_maintenance_roundtrip
    # retired r11 (maintenance evidence stays via store_tx_roundtrip)
    assert {"store_tx_roundtrip",
            "tx_time_travel_diff", "tx_schema_evolution",
            "tx_stats_skipping", "tx_cdc_changes", "tx_bloom_skipping",
            "tx_incremental_tail", "tx_deletion_vectors"} <= p
    # TPC-H correlated/semi/anti evidence (never driver-graded r1-r9)
    assert {"tpch_q2_min_cost_supp", "tpch_q11_important_parts",
            "tpch_q16_supplier_cnt", "tpch_q17_small_qty",
            "tpch_q20_qty_suppliers", "tpch_q21_waiting_supp"} <= p
    # sketches / windows / UDAF-UDTF / IR / graph-ER / security /
    # embeddings each keep a rep
    assert {"events_heavy_hitters_exact", "events_scd2_type_history",
            "events_asof_join", "events_median_by_type",
            "udtf_bigrams_topk", "doc_bm25_search",
            "entity_resolution_usernames", "ip_risk_scores"} <= p
    # embedding_centroids retired r10 for the band sweep — embedding-
    # table evidence stays via knn_recall_ladder + knn_pq_adc in-window


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
