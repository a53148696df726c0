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
    # §2 core surface: sasl_parse / geo_range_join / rdns_status_counts
    # retired in the second r11 rotation after TEN green rounds each —
    # their operators stay driver-graded composed end-to-end inside
    # mail_report_top10_today (parse → rDNS → geo range join ×2 → day
    # filter → top-10), standalone oracles in the full local gate
    assert {"anonymize_users", "sql_cast_normalize",
            "mail_report_top10_today"} <= p
    # dedup: ngram_jaccard + minhash_lsh retired r10 (both arms stay
    # graded via dedup_lsh_recall's side-by-side oracle);
    # dedup_exact_substring (second r11 rotation) and dedup_clusters
    # (third, after TEN green rounds — survivor evidence via the
    # pagerank slice) retired; the family keeps six reps incl. the
    # newly graded SemDeDup arm
    assert {"dedup_lsh_recall", "dedup_lsh_band_sweep",
            "dedup_cdc_chunks", "dedup_cdc_cross_source",
            "dedup_graph_pagerank_slice",
            "dedup_incremental_new_docs_slice",
            "dedup_semantic"} <= p
    # similarity: the formerly never-graded ANN tail (second r11
    # rotation): multiprobe / multi-table LSH, IVF over trained
    # centroids, distance-weighted kNN classify (knn_recall_ladder
    # retired third r11 after seven green rounds — its exact-baseline
    # recall contract stays in the full gate)
    assert {"knn_lsh_multiprobe",
            "knn_lsh_multitable", "knn_ivf_kmeans",
            "knn_label_classify"} <= p
    # text (corpus_gopher_rules retired in the second r11 rotation
    # after nine green rounds; quality evidence stays via pii_scrub)
    assert {"pii_scrub"} <= p
    # multimodal: every graded row is a REAL decode; png_subbyte +
    # ms_adpcm (second r11 rotation) and adpcm (third) retired — JPEG
    # evidence via progressive + fractional-sampling, every retired
    # codec policy-graded via the gate registry, ADPCM recurrence
    # oracles in the full gate
    assert {"multimodal_gate_registry",
            "multimodal_pjpeg_decode",
            "multimodal_jpeg_frac_decode"} <= p
    # streaming: full_outer + tx_sink retired in the second r11
    # rotation — the join matrix keeps inner + left-outer in-window,
    # exactly-once delivery stays graded via the NATIVE tx source
    assert {"events_stream_stream_join",
            "events_stream_left_outer_join",
            "events_stream_tx_source"} <= p
    # transactional store: the five round-10 flagships, the six
    # mid-round-11 capabilities (metadata count, restore, MERGE
    # clauses, history audit, CHECK constraints, string z-order
    # skipping), and the four session capstones (column mapping,
    # shallow clone, format-API batch read, streaming CDF);
    # tx_time_travel_diff and store_tx_roundtrip retired (restore +
    # history + merge + the compaction legs carry their evidence)
    assert {"tx_schema_evolution",
            "tx_stats_skipping", "tx_cdc_changes", "tx_bloom_skipping",
            "tx_incremental_tail", "tx_deletion_vectors",
            "tx_metadata_count", "tx_restore_roundtrip",
            "tx_merge_clauses", "tx_history_audit",
            "tx_constraints_gate", "tx_zorder_string_skipping",
            "tx_column_mapping", "tx_shallow_clone",
            "tx_format_batch_read", "events_stream_tx_cdf"} <= p
    # TPC-H correlated/semi/anti evidence (never driver-graded r1-r9)
    assert {"tpch_q2_min_cost_supp", "tpch_q11_important_parts",
            "tpch_q16_supplier_cnt", "tpch_q17_small_qty",
            "tpch_q20_qty_suppliers", "tpch_q21_waiting_supp"} <= p
    # sketches / windows / UDAF-UDTF / IR / graph-ER / security each
    # keep a rep (events_asof_join retired in the second r11 rotation
    # after ten green rounds — windowed evidence via SCD-2)
    assert {"events_heavy_hitters_exact", "events_scd2_type_history",
            "events_median_by_type",
            "udtf_bigrams_topk", "doc_bm25_search",
            "entity_resolution_usernames", "ip_risk_scores"} <= p


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
