"""Signature computation as explode → codegen hash → hash-aggregate.

The array-expression forms in textstats.py (simhash32, minhash via
``transform``/``aggregate``) are semantically right but Spark evaluates
higher-order functions as CodegenFallback — interpreted per row, ~10×
slower than codegen. These table-shaped equivalents flatten to
(id, token/shingle) rows where md5 and the conditional sums/mins run
inside WholeStageCodegen, then hash-aggregate back per document.

Every aggregate used (sum of ±1 votes, min of hashes) is
order-independent, so results are bit-identical to the expression forms
and to the DuckDB oracles.

Scale: one explode + one shuffle on the doc id per signature table;
partial aggregation (map-side combine) means the shuffle carries one row
per (doc, aggregate), not per token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64
from .textstats import shingles, tokens


def _doc_token_hashes(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # explode the raw split, THEN drop empties with a codegen filter:
    # filtering inside the array (F.filter HOF) is CodegenFallback and
    # measured ~8× slower for the same output rows
    from .textstats import TOKEN_SPLIT_RE

    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select("id", hash64(F.col("tok")).alias("h"))
    )


def simhash_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """(id, simhash): codegen path; identical output to
    textstats.simhash32. Docs with zero tokens get simhash 0."""
    th = _doc_token_hashes(docs, id_col, text_col)
    votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = th.groupBy("id").agg(*votes)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    sigs = agg.select("id", sim.alias("simhash"))
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(sigs, "id", "left").select(
        "id", F.coalesce("simhash", F.lit(0)).alias("simhash")
    )


def doc_shingle_rows(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    distinct: bool = True,
) -> DataFrame:
    """(id, sh) rows: distinct word k-shingles per document, generated in
    an Arrow ``mapInPandas`` batch instead of the interpreted
    transform/slice HOF expression (~10× faster at 5k docs; the HOF path
    cost ~1.3 ms/doc of expression interpretation).

    Scale: pure map-side — no shuffle; each partition streams its docs
    through one Python worker. The regex is compiled with re.ASCII so
    ``\\W`` matches Java's (and RE2/DuckDB's) ASCII word-class exactly.

    ``id_col`` must be integer-typed (the engine's doc ids are int64).
    """
    import re

    tok_re = re.compile(r"\W+", re.ASCII)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids: list[int] = []
            shs: list[str] = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                toks = [x for x in tok_re.split(("" if t is None else t).lower()) if x]
                if len(toks) < k:
                    continue
                grams = (" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1))
                for s in set(grams) if distinct else grams:
                    ids.append(i)
                    shs.append(s)
            yield pd.DataFrame({"id": ids, "sh": shs})

    return docs.select(id_col, text_col).mapInPandas(gen, "id long, sh string")


def _doc_shingles_distinct(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    return doc_shingle_rows(docs, id_col, text_col, k, distinct=True)


# Universal-hash MinHash family: perm_i(s) = (a_i * (h(s) mod P) + b_i) mod P
# over ONE portable base hash h (md5-prefix) instead of num_perm salted
# md5s — 16× fewer digest computations, same MinHash guarantees. P is the
# Mersenne prime 2^31-1: h mod P < 2^31 and a_i < 2^31 keep every product
# under 2^62, so the arithmetic is overflow-free int64 in both Spark
# (ANSI mode would abort on overflow) and DuckDB.
MINHASH_P = 2_147_483_647


def minhash_perm_consts(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs, shared with the SQL oracle."""
    return [
        ((i * 2_654_435_761 + 104_729) % MINHASH_P or 1, (i * 40_503 + 11) % MINHASH_P)
        for i in range(num_perm)
    ]


def minhash_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
    shingle_rows: DataFrame | None = None,
) -> DataFrame:
    """(id, sig array<long>): min per universal-hash permutation. Docs
    with no k-shingle are absent (no signature — nothing to band).

    ``shingle_rows`` (id, sh string) lets callers share one —
    typically persisted — shingle table across the sig build and a
    verification pass: the Python shingle generation is the expensive
    stage and plan branches would otherwise re-run it per branch."""
    sh = (
        shingle_rows
        if shingle_rows is not None
        else _doc_shingles_distinct(docs, id_col, text_col, k)
    )
    base = sh.select("id", (hash64(F.col("sh")) % MINHASH_P).alias("hm"))
    mins = base.groupBy("id").agg(
        *[
            F.min((F.lit(a) * F.col("hm") + F.lit(b)) % MINHASH_P).alias(f"m{i}")
            for i, (a, b) in enumerate(minhash_perm_consts(num_perm))
        ]
    )
    return mins.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("sig")
    )


def fingerprint_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, fingerprint): min shingle hash; NULL for docs with < k tokens
    (matches textstats.min_shingle_fingerprint)."""
    sh = _doc_shingles_distinct(docs, id_col, text_col, k)
    fp = sh.select("id", hash64(F.col("sh")).alias("h")).groupBy("id").agg(
        F.min("h").alias("fingerprint")
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(fp, "id", "left")
