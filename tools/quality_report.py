"""Approximation-quality report: measured recall/precision of the
approximate operators against their exact counterparts.

Prints one JSON line: ANN recall@5 of LSH / multi-probe LSH / IVF vs
brute-force cosine, and MinHash-LSH pair recall vs exact n-gram Jaccard
pairs at the same threshold (precision is 1.0 by construction — LSH
candidates are exact-verified). Run at any SF dir:

    python tools/quality_report.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, sys.path[0].rsplit("/", 1)[0] if "/" in sys.path[0] else ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from maillogsentinel_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from maillogsentinel_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivf,
        knn_lsh,
    )
    from maillogsentinel_spark.session import get_spark

    spark = get_spark(app_name="quality-report")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = emb.filter(F.col("vec_id") < 50).withColumnRenamed("vec_id", "query_id")

    def pairs(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    exact = pairs(knn_bruteforce(emb, q, k=5))
    out = {"sf_dir": sf_dir, "n_queries": 50, "k": 5}
    for name, df in [
        ("lsh", knn_lsh(emb, q, k=5)),
        ("lsh_multiprobe3", knn_lsh(emb, q, k=5, multiprobe=3)),
        ("lsh_tables3", knn_lsh(emb, q, k=5, n_tables=3)),
        ("lsh_tables3_probe2", knn_lsh(emb, q, k=5, n_tables=3, multiprobe=2)),
        ("ivf_nprobe2", knn_ivf(emb, q, k=5)),
    ]:
        got = pairs(df)
        out[f"recall@5_{name}"] = round(len(got & exact) / len(exact), 4)

    truth = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    lsh_pairs = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    out["dedup_pair_recall"] = round(
        len(lsh_pairs & truth) / max(len(truth), 1), 4
    )
    out["dedup_pair_precision"] = round(
        len(lsh_pairs & truth) / max(len(lsh_pairs), 1), 4
    )
    out["dedup_truth_pairs"] = len(truth)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
