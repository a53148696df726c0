"""Text-analysis operators for LLM training-data pipelines.

All pure Column expressions (whole-stage codegen, no Python in the hot
path), each with an exact DuckDB-SQL mirror so the driver's oracle can
verify them bit-for-bit:

- tokenization (regex word split)
- language-ID (stopword-ratio heuristic over tiny per-language lists)
- quality scoring (length / distinctness / alphabetic-ratio mix)
- SimHash document signature (32-bit, portable hash)
- MinHash-style fingerprint (min portable hash over k-shingles)

At 100 TB these run as a single scan projection: no shuffle, no UDF.
SimHash is the most expression-heavy (32 array folds per row); if ever
hot, swap to a Pandas UDF — semantics are fixed by the oracle either way.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.hashing import hash64

TOKEN_SPLIT_RE = r"\W+"

# tiny deterministic stopword lists (order = tie-break priority)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit"],
    "es": ["el", "los", "y", "que", "por", "con", "una"],
    "fr": ["le", "les", "et", "des", "une", "dans", "pour"],
}


def tokens(text: Column) -> Column:
    """lower → split on non-word runs → drop empties.
    DuckDB mirror: list_filter(string_split_regex(lower(t),'\\W+'), x -> x <> '')"""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda x: x != "")


def shingles(toks: Column, k: int) -> Column:
    """word k-grams joined by spaces; [] when fewer than k tokens.
    DuckDB mirror: list_transform(range(len(t)-k+1), i ->
                   array_to_string(list_slice(t, i+1, i+k), ' '))"""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.when(F.size(toks) >= k, grams).otherwise(F.array().cast("array<string>"))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def lang_scores(toks: Column) -> dict[str, Column]:
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words)))
        for lang, words in LANG_STOPWORDS.items()
    }


# priority encodes the tie-break: higher wins ties (en > de > es > fr)
LANG_PRIORITY = {"en": 4, "de": 3, "es": 2, "fr": 1}


def lang_id(text: Column) -> Column:
    """argmax stopword-hit count; ties broken by LANG_PRIORITY; zero hits
    everywhere → 'unknown'. Encoded as score*10+priority so a single
    `greatest` resolves both (portable to the SQL oracle verbatim)."""
    toks = tokens(text)
    scores = lang_scores(toks)
    combined = {
        lang: scores[lang] * 10 + LANG_PRIORITY[lang] for lang in LANG_STOPWORDS
    }
    g = F.greatest(*combined.values())
    out = F.when(g < 10, F.lit("unknown"))  # winner scored 0 hits
    for lang in LANG_STOPWORDS:
        out = out.when(g == combined[lang], F.lit(lang))
    return out


def quality_score(text: Column) -> Column:
    """0..1 heuristic: token volume, lexical diversity, alphabetic ratio
    — emitted as an EXACT micro-rounded score. quality =
    round_half_up(1e6·(0.4·min(1,n/100) + 0.3·d/n + 0.3·a/c)) / 1e6,
    computed entirely in int64 over the common denominator n·c, with one
    exact (remainder-subtracted) decimal division at the end. Both
    engines evaluate the same integers, so the 6th digit can never
    straddle a float-rounding boundary — the sf1 differential surfaced a
    doc whose double-sum sat exactly on a half-ulp of the 6th digit and
    Spark/DuckDB rounded it apart. int64-safe while n·c ≤ ~4.6e12 (a
    single document of ~2M tokens × ~2M chars); ANSI mode makes any
    overflow loud, never wrong."""
    toks = tokens(text)
    one = F.lit(1).cast("long")
    n = F.size(toks).cast("long")
    d = F.size(F.array_distinct(toks)).cast("long")
    c = F.length(text).cast("long")
    a = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("long")
    m = F.least(F.lit(100).cast("long"), n)
    n1, c1 = F.greatest(n, one), F.greatest(c, one)
    # micro-score numerator over den = n1*c1:
    #   0.4*min(1,n/100) -> 4000*m, 0.3*d/n -> 300000*d/n1,
    #   0.3*a/c -> 300000*a/c1   (d=0 when n=0, a=0 when c=0)
    num = F.lit(4000) * m * n1 * c1 + F.lit(300_000) * (d * c1 + a * n1)
    den = n1 * c1
    total = F.lit(2) * num + den           # round-half-up: (2*num+den)
    twod = F.lit(2) * den                  #                 div (2*den)
    micro = (
        (total - total % twod).cast("decimal(38,0)")
        / twod.cast("decimal(38,0)")       # exactly divisible -> exact
    ).cast("long")
    return micro.cast("double") / F.lit(1_000_000.0)


def simhash32(toks: Column) -> Column:
    """32-bit SimHash over the token multiset with the portable hash.
    bit b set iff sum over tokens of (bit_b(hash(token)) ? +1 : -1) > 0."""
    hashes = F.transform(toks, lambda t: hash64(t))

    def bit_contrib(b: int) -> Column:
        vote = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        return F.when(vote > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))

    return reduce(lambda a, b: a + b, [bit_contrib(b) for b in range(32)])


def tfidf_topk(docs, id_col: str = "doc_id", text_col: str = "text", k: int = 3):
    """Top-k TF-IDF terms per document: score = tf · ln(N/df), ranked by
    (score desc, term asc) for a deterministic cut.

    Scale shape: the tf groupBy keys on (doc, term) — high cardinality,
    parallel everywhere; the df table is vocabulary-sized and joins back
    on term (AQE broadcasts it when the vocabulary fits, falls back to a
    shuffle join for heavy-tailed corpora — no manual hint on purpose);
    N arrives via a 1-row broadcast cross join, not a driver collect;
    the final window partitions by doc_id, so no single-task sort."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(total)).withColumn(
        "score",
        F.round(F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "score", "rank")
    )


def min_shingle_fingerprint(text: Column, k: int = 3) -> Column:
    """Document fingerprint: min portable hash over k-shingles (a 1-perm
    MinHash); NULL for docs shorter than k tokens."""
    sh = shingles(tokens(text), k)
    return F.array_min(F.transform(sh, lambda s: hash64(s)))
