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
