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
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select("id", hash64(F.col("tok")).alias("h"))


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


def _doc_shingles_distinct(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles(tokens(F.col(text_col)), k))).alias("sh"),
    )


def minhash_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
) -> DataFrame:
    """(id, sig array<long>): min per salted hash family. Docs with no
    k-shingle are absent (no signature — nothing to band)."""
    sh = _doc_shingles_distinct(docs, id_col, text_col, k)
    hashed = sh.select(
        "id", *[hash64(F.col("sh"), salt=f"mh{i}").alias(f"h{i}") for i in range(num_perm)]
    )
    mins = hashed.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(num_perm)]
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
