"""Text-analysis expression semantics."""

from pyspark.sql import functions as F

from maillogsentinel_spark.operators.textstats import (
    lang_id,
    min_shingle_fingerprint,
    quality_score,
    simhash32,
    token_count,
    tokens,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(col.alias("v")).collect()[0]["v"]


def test_tokens_and_count(spark):
    assert _one(spark, "Hello, World!  foo_bar", F.array_join(tokens(F.col("text")), "|")) == "hello|world|foo_bar"
    assert _one(spark, "a b  c", token_count(F.col("text"))) == 3
    assert _one(spark, "", token_count(F.col("text"))) == 0


def test_lang_id(spark):
    assert _one(spark, "the cat sat on the mat and the dog", lang_id(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze und das haus", lang_id(F.col("text"))) == "de"
    assert _one(spark, "xyzzy qwerty plugh", lang_id(F.col("text"))) == "unknown"


def test_quality_bounds(spark):
    for text in ["short", "the " * 500, "aaaa bbbb cccc dddd!!!! 1234"]:
        v = _one(spark, text, quality_score(F.col("text")))
        assert 0.0 <= v <= 1.0


def test_simhash_properties(spark):
    a = _one(spark, "spark engine query plan", simhash32(tokens(F.col("text"))))
    b = _one(spark, "spark engine query plan", simhash32(tokens(F.col("text"))))
    c = _one(spark, "totally different words here", simhash32(tokens(F.col("text"))))
    assert a == b            # deterministic
    assert 0 <= a < 2 ** 32  # 32-bit
    assert a != c


def test_fingerprint_null_for_short_docs(spark):
    assert _one(spark, "one two", min_shingle_fingerprint(F.col("text"), k=3)) is None
    assert _one(spark, "one two three four", min_shingle_fingerprint(F.col("text"), k=3)) is not None


def test_tfidf_topk(spark):
    from maillogsentinel_spark.operators.textstats import tfidf_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry durian cherry durian"),
        ],
        ["doc_id", "text"],
    )
    rows = tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score"]))
    # doc 1: apple (tf=2, df=1) beats banana (tf=1, df=2)
    assert by_doc[1][0][1] == "apple"
    # ubiquitous-ish terms score lower than rare ones at equal tf
    import math
    apple_score = dict((t, s) for _, t, s in by_doc[1])["apple"]
    assert abs(apple_score - round(2 * math.log(3 / 1), 6)) < 1e-9
    # every doc has at most k=2 entries, ranks are 1..k
    assert all(sorted(r for r, _, _ in v) == list(range(1, len(v) + 1))
               for v in by_doc.values())


def test_signature_map_pass_matches_expression_forms(spark):
    """The map-only Arrow signature pass (fingerprint_simhash_table,
    simhash_table) must be bit-identical to the expression forms —
    including the edge semantics the old explode/agg tables encoded via
    left joins: simhash 0 for zero-token docs, fingerprint NULL below k
    tokens."""
    from maillogsentinel_spark.operators.signatures import (
        fingerprint_simhash_table,
        simhash_table,
    )

    rows = [
        (1, "spark engine query plan spark engine"),
        (2, "one two"),            # < k tokens: fingerprint NULL
        (3, ""),                   # zero tokens: simhash 0
        (4, None),                 # NULL text behaves like empty
        (5, "The, Cat; SAT__on the mat!"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    expr = docs.select(
        "doc_id",
        min_shingle_fingerprint(F.col("text"), k=3).alias("fingerprint"),
        simhash32(tokens(F.col("text"))).alias("simhash"),
    ).orderBy("doc_id")
    combo = (
        fingerprint_simhash_table(docs, "doc_id", "text", k=3)
        .select(F.col("id").alias("doc_id"), "fingerprint", "simhash")
        .orderBy("doc_id")
    )
    sim_only = simhash_table(docs, "doc_id", "text").orderBy("id")
    e = expr.collect()
    assert [tuple(r) for r in combo.collect()] == [tuple(r) for r in e]
    assert [(r["id"], r["simhash"]) for r in sim_only.collect()] == [
        (r["doc_id"], r["simhash"]) for r in e
    ]


def test_signature_map_pass_matches_expression_forms_non_ascii(spark):
    """Round-11 verdict item 9: the Python twin's tokenizer must agree
    with the JVM expression forms on NON-ASCII input too. Both sides
    split on ASCII \\W (Java regex \\W is ASCII by default; the Python
    twin passes re.ASCII explicitly), so non-ASCII letters are token
    CONTENT, not separators — and the lowercase step is where the
    engines could diverge (İ, ß, Σ-final are the classic cases). The
    fixtures pin each of those plus an emoji and combining accents."""
    from maillogsentinel_spark.operators.signatures import (
        fingerprint_simhash_table,
        simhash_table,
    )

    rows = [
        (1, "İstanbul DİYARBAKIR işlem"),        # dotted capital I
        (2, "STRASSE straße gross GROß"),        # sharp s
        (3, "ΟΔΟΣ οδος ΤΕΛΟΣ"),                 # final sigma on lower()
        (4, "café CAFÉ café"),             # precomposed vs combining
        (5, "emoji 🚀 rocket 🚀🚀 done"),         # astral-plane symbols
        (6, "ЛОГ лог Запись журнала ошибок"),    # cyrillic
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    expr = docs.select(
        "doc_id",
        min_shingle_fingerprint(F.col("text"), k=3).alias("fingerprint"),
        simhash32(tokens(F.col("text"))).alias("simhash"),
    ).orderBy("doc_id")
    combo = (
        fingerprint_simhash_table(docs, "doc_id", "text", k=3)
        .select(F.col("id").alias("doc_id"), "fingerprint", "simhash")
        .orderBy("doc_id")
    )
    sim_only = simhash_table(docs, "doc_id", "text").orderBy("id")
    e = expr.collect()
    assert [tuple(r) for r in combo.collect()] == [tuple(r) for r in e]
    assert [(r["id"], r["simhash"]) for r in sim_only.collect()] == [
        (r["doc_id"], r["simhash"]) for r in e
    ]
