"""Corpus-quality / anomaly / retention operator semantics.

Oracle parity is covered by tools/check_correctness.py; these tests pin
the *semantics* on tiny hand-built inputs (written as parquet so the
registered queries run unchanged against a synthetic sf_dir).
"""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from maillogsentinel_spark.plans.queries import (
    QUERIES,
    _PII_EMAIL_RE,
    _PII_IP_RE,
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_pii_scrub_expressions(spark):
    line = ("Aug 12 06:01:02 srv1 postfix/smtps/smtpd[123]: warning: "
            "unknown[45.3.2.1]: SASL LOGIN authentication failed: "
            "(reason unavailable), sasl_username=alice@example.com,")
    df = spark.createDataFrame([(line,)], ["value"])
    out = df.select(
        F.regexp_replace(
            F.regexp_replace("value", _PII_IP_RE, "<IP>"), _PII_EMAIL_RE, "<EMAIL>"
        ).alias("s"),
        F.size(F.regexp_extract_all("value", F.lit(_PII_EMAIL_RE), F.lit(0))).alias("ne"),
        F.size(F.regexp_extract_all("value", F.lit(_PII_IP_RE), F.lit(0))).alias("ni"),
    ).collect()[0]
    assert out["ne"] == 1 and out["ni"] == 1
    assert "<IP>" in out["s"] and "<EMAIL>" in out["s"]
    assert "45.3.2.1" not in out["s"] and "alice@example.com" not in out["s"]
    # timestamps must NOT be redacted
    assert "06:01:02" in out["s"]


def test_zscore_outliers_flags_the_planted_spike(spark, tmp_path):
    t0 = dt.datetime(2025, 8, 1, 12, 0, 0)
    rows = []
    eid = 0
    for uid in range(20):
        rows.append((eid, t0, uid, "view", 10.0, "{}")); eid += 1
    # user 99: one extreme total
    rows.append((eid, t0, 99, "view", 100000.0, "{}")); eid += 1
    sf_dir = _write_events(spark, tmp_path, rows)
    out = QUERIES["events_zscore_outliers"](spark, sf_dir).collect()
    flagged = {(r.event_type, r.user_id) for r in out}
    assert ("view", 99) in flagged
    r99 = next(r for r in out if r.user_id == 99)
    assert r99.total_cents == 10_000_000 and r99.z > 2.0


def test_daily_retention_half(spark, tmp_path):
    d1 = dt.datetime(2025, 8, 1, 9, 0, 0)
    d2 = dt.datetime(2025, 8, 2, 9, 0, 0)
    rows = [
        (0, d1, 1, "view", 1.0, "{}"),
        (1, d1, 1, "view", 1.0, "{}"),   # dup activity same day — one distinct
        (2, d1, 2, "view", 1.0, "{}"),
        (3, d2, 1, "view", 1.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {r.day: r for r in QUERIES["events_daily_retention"](spark, sf_dir).collect()}
    day1 = out[dt.date(2025, 8, 1)]
    assert day1.active == 2 and day1.retained_next_day == 1
    assert math.isclose(day1.retention, 0.5)
    day2 = out[dt.date(2025, 8, 2)]
    assert day2.active == 1 and day2.retained_next_day == 0


def test_repetition_ratio_bounds_and_extremes(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam", "en", "srcA", 29),
            (1, "all words here are fully distinct tokens", "en", "srcA", 40),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in QUERIES["doc_repetition_ratio"](spark, str(tmp_path)).collect()}
    r = out["srcA"]
    assert r.n_docs == 2
    # doc0: 1/6 distinct, dup-bigram frac 0.8 (>0.25) → exactly one repetitive doc
    assert r.n_repetitive == 1
    assert math.isclose(r.avg_distinct_ratio, (1 / 6 + 1.0) / 2, rel_tol=1e-6)


def test_stratified_sample_is_consistent_under_growth(spark, tmp_path):
    def docs_df(n):
        return spark.createDataFrame(
            [(i, f"text {i}", ["en", "zh", "de"][i % 3], "s0", 6) for i in range(n)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    for sub, n in (("a", 60), ("b", 120)):
        (tmp_path / sub).mkdir()
        docs_df(n).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / sub / "documents.parquet")
        )
    small = {(r.lang, r.source): r for r in
             QUERIES["docs_stratified_sample"](spark, str(tmp_path / "a")).collect()}
    big = {(r.lang, r.source): r for r in
           QUERIES["docs_stratified_sample"](spark, str(tmp_path / "b")).collect()}
    # growing the corpus never changes an existing doc's fate: the first
    # kept id per stratum is stable, and kept counts only grow
    for k, s in small.items():
        b = big[k]
        assert b.n_kept >= s.n_kept
        if s.first_kept_id is not None:
            assert b.first_kept_id == s.first_kept_id
    # en keeps ~5x the 'de' rate by construction; with 40 docs/stratum the
    # gap must be visible
    assert big[("en", "s0")].n_kept > big[("de", "s0")].n_kept


@pytest.mark.parametrize("name", [
    "doc_repetition_ratio", "pii_scrub", "events_zscore_outliers",
    "events_daily_retention", "docs_stratified_sample",
])
def test_new_queries_run_at_sf0001(spark, name):
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    assert df.count() >= 0


def test_basket_pairs_tiny(spark, tmp_path):
    rows = [
        # order 1: parts 10, 20, 30 ; order 2: parts 10, 20 ; order 3: part 10 (+dup line)
        (1, 10), (1, 20), (1, 30), (2, 10), (2, 20), (3, 10), (3, 10),
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = [(r.p1, r.p2, r.cnt) for r in
           QUERIES["basket_pair_counts"](spark, str(tmp_path)).collect()]
    # only (10,20) co-occurs twice; duplicate lineitem rows must not inflate
    assert out == [(10, 20, 2)]


def test_conversion_funnel_orders_steps(spark, tmp_path):
    t = dt.datetime(2025, 8, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        (0, t, 1, "signup", 0.0, "{}"),
        (1, t + 2 * h, 1, "purchase", 5.0, "{}"),     # converts in 2h
        (2, t, 2, "purchase", 5.0, "{}"),             # purchase BEFORE signup
        (3, t + h, 2, "signup", 0.0, "{}"),           # → not converted
        (4, t + h, 3, "signup", 0.0, "{}"),           # never purchases
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = QUERIES["events_conversion_funnel"](spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r.cohort_day == dt.date(2025, 8, 1)
    assert r.n_signups == 3 and r.n_converted == 1
    assert r.total_convert_us == 2 * 3600 * 1_000_000


def test_hll_daily_users_bound_and_exactness(spark, tmp_path):
    t0 = dt.datetime(2025, 8, 1, 0, 0, 0)
    rows = [(i, t0, i % 37, "view", 1.0, "{}") for i in range(200)]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = QUERIES["events_hll_daily_users"](spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r.exact_users == 37 and bool(r.hll_within_5pct)


def test_wau_fanout_semantics(spark, tmp_path):
    d = dt.datetime(2025, 8, 1, 12, 0, 0)
    rows = [
        (0, d, 1, "view", 1.0, "{}"),                       # day 1: user 1
        (1, d + dt.timedelta(days=3), 2, "view", 1.0, "{}"),  # day 4: user 2
        (2, d + dt.timedelta(days=9), 2, "view", 1.0, "{}"),  # day 10: user 2
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {r.day: r.wau for r in
           QUERIES["events_weekly_active_users"](spark, sf_dir).collect()}
    # only days present in the data are reported
    assert set(out) == {dt.date(2025, 8, 1), dt.date(2025, 8, 4), dt.date(2025, 8, 10)}
    assert out[dt.date(2025, 8, 1)] == 1      # trailing window: just user 1
    assert out[dt.date(2025, 8, 4)] == 2      # user 1 (day1 ≤ 6 back) + user 2
    assert out[dt.date(2025, 8, 10)] == 1     # day-4 activity fell out of window


def test_rfm_quartiles_tiny(spark, tmp_path):
    t = dt.datetime(2025, 8, 1)
    rows = []
    # 4 customers with strictly increasing frequency/monetary and
    # strictly decreasing recency → quartiles are forced
    for c in range(1, 5):
        for k in range(c):
            rows.append((c * 100 + k, c, "O", 10.0 * c,
                         t + dt.timedelta(days=c), "1-URGENT"))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r.custkey: r for r in QUERIES["customer_rfm"](spark, str(tmp_path)).collect()}
    assert out[4].recency_days == 0 and out[1].recency_days == 3
    assert out[4].frequency == 4 and out[4].monetary_cents == 4 * 4000
    assert out[4].r_quartile == 1 and out[4].f_quartile == 1 and out[4].m_quartile == 1
    assert out[1].r_quartile == 4 and out[1].f_quartile == 4 and out[1].m_quartile == 4


def test_shard_packing_budget_and_determinism(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "w " * 500, "en", "s0", 1000) for i in range(10)],  # 500 tokens each
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["corpus_shard_packing"](spark, str(tmp_path)).collect()
    # 10 docs × 500 tok / 2000-budget → shards of 4 docs (start-offset rule)
    assert [r.n_docs for r in out] == [4, 4, 2]
    assert sum(r.shard_tokens for r in out) == 5000
    out2 = QUERIES["corpus_shard_packing"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in out2]


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_shingle_novelty_first_seen_wins(spark, tmp_path):
    sf_dir = _write_docs(spark, tmp_path, [
        (0, "alpha beta gamma delta", "en", "sA", 22),   # 2 shingles, both novel
        (1, "alpha beta gamma delta", "en", "sB", 22),   # same text → fully seen
        (2, "epsilon zeta eta theta", "en", "sB", 22),   # all novel
    ])
    out = {r.source: r for r in
           QUERIES["doc_shingle_novelty"](spark, sf_dir).collect()}
    assert out["sA"].novel_shingles == 2 and out["sA"].fully_seen_docs == 0
    assert out["sB"].total_shingles == 4 and out["sB"].novel_shingles == 2
    assert out["sB"].fully_seen_docs == 1


def test_contamination_flags_shared_shingles(spark, tmp_path):
    sf_dir = _write_docs(spark, tmp_path, [
        (0, "the quick brown fox jumps", "en", "src0", 25),  # held-out set
        (1, "a quick brown fox appeared here", "en", "sX", 31),  # shares shingle
        (2, "completely unrelated training text body", "en", "sX", 39),
        (3, "the quick brown cat sat", "en", "sY", 23),  # shares "the quick brown"
        (4, "nothing in common at all", "en", "sZ", 24),
    ])
    out = {r.source: r for r in
           QUERIES["corpus_contamination"](spark, sf_dir).collect()}
    # sX: only doc 1 (shares "quick brown fox"); doc 2 is clean
    assert out["sX"].n_contaminated == 1 and out["sX"].first_doc == 1
    assert out["sY"].n_contaminated == 1
    assert "sZ" not in out


def test_type_transitions_sequence(spark, tmp_path):
    t = dt.datetime(2025, 8, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (0, t, 1, "view", 1.0, "{}"),
        (1, t + m, 1, "click", 1.0, "{}"),
        (2, t + 2 * m, 1, "view", 1.0, "{}"),
        (3, t, 2, "view", 1.0, "{}"),          # single event → no transition
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {(r.prev_type, r.next_type): r.cnt for r in
           QUERIES["events_type_transitions"](spark, sf_dir).collect()}
    assert out == {("view", "click"): 1, ("click", "view"): 1}


def test_full_outer_reconcile_presence(spark, tmp_path):
    t = dt.datetime(2025, 8, 1)
    rows = [
        (0, t, 1, "signup", 0.0, "{}"),
        (1, t, 1, "purchase", 1.0, "{}"),
        (2, t, 2, "signup", 0.0, "{}"),
        (3, t, 3, "purchase", 1.0, "{}"),
        (4, t, 3, "purchase", 2.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {r.user_id: r for r in
           QUERIES["events_full_outer_reconcile"](spark, sf_dir).collect()}
    assert out[1].presence == "both" and out[1].n_purchase == 1
    assert out[2].presence == "signup_only" and out[2].n_purchase == 0
    assert out[3].presence == "purchase_only" and out[3].n_purchase == 2


def test_open_backlog_sweep_line(spark, tmp_path):
    t = dt.datetime
    orders = spark.createDataFrame(
        [(1, 10, "O", 1.0, t(2025, 8, 1), "1"), (2, 11, "O", 1.0, t(2025, 8, 2), "1")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(1, 5, 5, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t(2025, 8, 3)),
         (2, 6, 6, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t(2025, 8, 2))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    orders.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    li.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r.day: r.open_orders for r in
           QUERIES["orders_open_backlog"](spark, str(tmp_path)).collect()}
    # Aug1: order1 opens; Aug2: order2 opens AND ships (still open that day);
    # Aug3: order2 closed, order1 ships; Aug4: empty
    assert out[dt.date(2025, 8, 1)] == 1
    assert out[dt.date(2025, 8, 2)] == 2
    assert out[dt.date(2025, 8, 3)] == 1
    assert out[dt.date(2025, 8, 4)] == 0


def test_new_vs_returning_split(spark, tmp_path):
    d1 = dt.datetime(2025, 8, 1); d2 = dt.datetime(2025, 8, 2)
    rows = [
        (0, d1, 1, "view", 1.0, "{}"),
        (1, d2, 1, "view", 1.0, "{}"),   # returning on day 2
        (2, d2, 2, "view", 1.0, "{}"),   # new on day 2
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {r.day: r for r in
           QUERIES["events_new_vs_returning"](spark, sf_dir).collect()}
    assert out[dt.date(2025, 8, 1)].new_users == 1
    assert out[dt.date(2025, 8, 2)].new_users == 1
    assert out[dt.date(2025, 8, 2)].returning_users == 1


def test_triangle_census_counts_each_once(spark, tmp_path):
    # Edges are the verified MinHash-LSH pairs (the session-shared
    # artifact the whole dedup-graph family uses). Docs 0,1,2 have
    # IDENTICAL text → identical signatures → all three pairs are
    # candidates in every band and verify at jaccard 1.0, so the edge
    # set is deterministic regardless of hash values; doc 3 overlaps a
    # little (jaccard < 0.3 → verification kills it even if a band
    # collides); doc 4 unrelated. One triangle, counted once by the
    # two-hop + closing-edge join.
    base = "alpha beta gamma delta epsilon zeta eta theta"
    sf_dir = _write_docs(spark, tmp_path, [
        (0, base, "en", "s", len(base)),
        (1, base, "en", "s", len(base)),
        (2, base, "en", "s", len(base)),
        (3, "alpha beta gamma unrelated tail words apart", "en", "s", 43),
        (4, "totally different words here now", "en", "s", 32),
    ])
    out = QUERIES["dedup_graph_triangles"](spark, sf_dir).collect()[0]
    assert out.n_edges == 3 and out.n_triangles == 1


def test_gopher_rules_matrix(spark, tmp_path):
    sf_dir = _write_docs(spark, tmp_path, [
        (0, "the cat sat on a mat with food", "en", "s", 30),          # passes all
        (1, "a b", "en", "s", 3),                                      # too few words
        # 5 words but >20% symbol characters
        (2, "the cat sat on mat !!!!!!!!!!!!!!!!!!!!!!!!!!!!", "en", "s", 47),
    ])
    out = QUERIES["corpus_gopher_rules"](spark, sf_dir).collect()[0]
    assert out.n_docs == 3
    assert out.pass_nwords == 2          # doc1 fails length (doc2's 5 words pass)
    assert out.pass_symbols == 2         # doc2 fails symbol ratio
    assert out.pass_all == 1             # only doc0


def test_entity_resolution_edit_distance_one(spark, tmp_path):
    t = dt.datetime(2025, 8, 1)
    # user100/user101/user110 are pairwise distance ≤2; user345 is far
    rows = [(i, t, uid, "view", 1.0, "{}")
            for i, uid in enumerate([100, 101, 110, 345])]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {(r.user_a, r.user_b) for r in
           QUERIES["entity_resolution_usernames"](spark, sf_dir).collect()}
    assert ("user100@example.com", "user101@example.com") in out
    assert ("user100@example.com", "user110@example.com") in out
    # distance-2 pair must NOT appear
    assert ("user101@example.com", "user110@example.com") not in out
    assert all("user345" not in a and "user345" not in b for a, b in out)


def test_cohort_matrix_triangle(spark, tmp_path):
    # week1 (Mon 2025-08-04): users 1,2 ; week2: user 1 only ; user 3 starts week2
    w1 = dt.datetime(2025, 8, 4, 10, 0, 0)
    w2 = dt.datetime(2025, 8, 11, 10, 0, 0)
    rows = [
        (0, w1, 1, "view", 1.0, "{}"),
        (1, w1, 2, "view", 1.0, "{}"),
        (2, w2, 1, "view", 1.0, "{}"),
        (3, w2, 3, "view", 1.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {(r.cohort_week, r.week_offset): r for r in
           QUERIES["events_cohort_retention_matrix"](spark, sf_dir).collect()}
    c1 = dt.date(2025, 8, 4)
    c2 = dt.date(2025, 8, 11)
    assert out[(c1, 0)].active == 2 and out[(c1, 0)].cohort_size == 2
    assert out[(c1, 1)].active == 1 and math.isclose(out[(c1, 1)].retention, 0.5)
    assert out[(c2, 0)].active == 1 and out[(c2, 0)].cohort_size == 1


def test_gapfill_materializes_silent_days(spark, tmp_path):
    rows = [
        (0, dt.datetime(2025, 8, 1), 1, "purchase", 1.0, "{}"),
        (1, dt.datetime(2025, 8, 4), 1, "purchase", 1.0, "{}"),
        (2, dt.datetime(2025, 8, 2), 1, "view", 1.0, "{}"),  # other type ignored
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {r.day: r for r in
           QUERIES["events_daily_gapfill"](spark, sf_dir).collect()}
    assert len(out) == 4  # dense Aug 1-4
    assert out[dt.date(2025, 8, 2)].n_purchases == 0 and out[dt.date(2025, 8, 2)].is_gap
    assert out[dt.date(2025, 8, 4)].n_purchases == 1 and not out[dt.date(2025, 8, 4)].is_gap


def test_weighted_median_pulls_toward_heavy_rows(spark, tmp_path):
    t = dt.datetime
    # flag A: prices 1.00 (weight 1) and 9.00 (weight 10) → weighted median 9.00
    rows = [
        (1, 1, 1, 1, 1.0, 1.00, 0.0, 0.0, "A", "O", t(2025, 8, 1)),
        (2, 2, 2, 1, 10.0, 9.00, 0.0, 0.0, "A", "O", t(2025, 8, 1)),
        # flag B: symmetric weights → lower weighted median 2.00
        (3, 3, 3, 1, 5.0, 2.00, 0.0, 0.0, "B", "O", t(2025, 8, 1)),
        (4, 4, 4, 1, 5.0, 4.00, 0.0, 0.0, "B", "O", t(2025, 8, 1)),
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
              "l_quantity double, l_extendedprice double, l_discount double, "
              "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r.flag: r for r in
           QUERIES["lineitem_weighted_median"](spark, str(tmp_path)).collect()}
    assert out["A"].weighted_median_cents == 900 and out["A"].total_weight == 1100
    assert out["B"].weighted_median_cents == 200


def test_hll_weekly_rollup_dedups_across_days(spark, tmp_path):
    """A user active on two days of one week must count ONCE in the
    weekly union (HLL registers max-merge), and the audit flag must
    hold at exact-mode cardinalities."""
    base = dt.datetime(2025, 3, 3)  # a Monday
    rows = [
        # user 1 on Mon + Tue (same week), user 2 on Mon, user 3 next week
        (1, base, 1, "click", 1.0, "{}"),
        (2, base + dt.timedelta(days=1), 1, "click", 1.0, "{}"),
        (3, base, 2, "view", 1.0, "{}"),
        (4, base + dt.timedelta(days=7), 3, "view", 1.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {
        r["week"].isoformat(): (r["exact_users"], r["union_within_5pct"])
        for r in QUERIES["events_hll_weekly_rollup"](spark, sf_dir).collect()
    }
    assert out == {"2025-03-03": (2, True), "2025-03-10": (1, True)}


def test_dedup_survivorship_keeps_cluster_min(spark, tmp_path):
    """Three near-identical docs collapse to one survivor (the min id);
    a unique doc survives untouched; keep_rate reflects both."""
    dup = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, dup, "en", "srcA", len(dup)),
            (2, dup, "en", "srcA", len(dup)),
            (3, dup + " extra", "en", "srcB", len(dup) + 6),
            (4, "completely different content about spark shuffle plans",
             "en", "srcB", 54),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.source: r
        for r in QUERIES["docs_dedup_survivorship"](
            spark, str(tmp_path)
        ).collect()
    }
    # cluster {1,2,3}: survivor is doc 1 (srcA); docs 2 (srcA) and 3
    # (srcB) are dropped; doc 4 (srcB) is untouched
    assert (out["srcA"].n_docs, out["srcA"].n_kept) == (2, 1)
    assert (out["srcB"].n_docs, out["srcB"].n_kept) == (2, 1)
    assert out["srcB"].chars_kept == 54
    assert out["srcA"].keep_rate == 0.5


def test_zipf_slope_uniform_vs_skewed(spark, tmp_path):
    """A perfectly uniform vocabulary fits slope ~0; a geometric
    frequency profile fits a clearly negative slope."""
    uniform = " ".join(f"word{i}" for i in range(20))
    skewed = " ".join(
        w for i in range(8) for w in [f"tok{i}"] * (2 ** (8 - i))
    )
    docs = spark.createDataFrame(
        [
            (1, uniform, "uu", "s", len(uniform)),
            (2, skewed, "ss", "s", len(skewed)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.lang: r
        for r in QUERIES["corpus_zipf_slope"](spark, str(tmp_path)).collect()
    }
    assert out["uu"].n_types == 20 and out["uu"].zipf_slope == 0.0
    assert out["ss"].n_types == 8 and out["ss"].zipf_slope < -0.5


def test_trend_decimal_widths_are_exact(spark):
    """events_value_trend's exactness contract rests on decimal widths:
    (18,6)×(18,6) → (37,12) stays under Spark's 38-digit cap, so y² is
    EXACT even with 6 fractional digits (a (21,6) operand would make
    the product (38,7)-lossy and silently round). Pin it with a value
    whose square needs all 12 places."""
    from decimal import Decimal

    y = Decimal("0.123457")
    df = spark.createDataFrame([(y,)], "y decimal(18,6)")
    [r] = df.select((F.col("y") * F.col("y")).alias("p")).collect()
    assert r["p"] == y * y  # 0.015241630849 — all 12 places survive
    # and the x·y product path: day-index cast decimal(4,0) keeps the
    # product at (23,6), exact, instead of a lossy (39,6) from long×dec
    df2 = spark.createDataFrame([(29, y)], "x long, y decimal(18,6)")
    [r2] = df2.select(
        (F.col("x").cast("decimal(4,0)") * F.col("y")).alias("p")
    ).collect()
    assert r2["p"] == 29 * y
