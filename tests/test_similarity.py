"""Similarity-search operators: exact top-k and LSH recall."""

from pyspark.sql import functions as F

from maillogsentinel_spark.operators.similarity import knn_bruteforce, knn_lsh


def _emb(spark, n=60, dims=8):
    import math
    rows = []
    for i in range(n):
        # points on a ring → known neighbor structure
        ang = 2 * math.pi * i / n
        rows.append((i, [math.cos(ang), math.sin(ang)] + [0.1] * (dims - 2)))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_knn_bruteforce_exact(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") == 0).withColumnRenamed("vec_id", "query_id")
    res = knn_bruteforce(emb, q, k=3).collect()
    assert [r["rank"] for r in res] == [1, 2, 3]
    # ring neighbors 1 and 59 are the closest two
    assert {res[0]["neighbor_id"], res[1]["neighbor_id"]} == {1, 59}
    assert all(r["query_id"] == 0 for r in res)
    assert res[0]["cosine"] >= res[1]["cosine"] >= res[2]["cosine"]


def test_knn_lsh_high_recall_on_self_bucket(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    exact = knn_bruteforce(emb, q, k=1).collect()
    approx = {r["query_id"]: r for r in knn_lsh(emb, q, k=1, n_planes=2, dims=8).collect()}
    # with 2 planes the nearest ring-neighbor shares the bucket for most queries
    hits = sum(
        1 for r in exact
        if r["query_id"] in approx
        and approx[r["query_id"]]["neighbor_id"] == r["neighbor_id"]
    )
    assert hits >= 3  # recall ≥ 60% on this structured set


def test_knn_lsh_never_beats_exact(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    exact = {(r["query_id"], r["rank"]): r["cosine"]
             for r in knn_bruteforce(emb, q, k=3).collect()}
    for r in knn_lsh(emb, q, k=3, n_planes=2, dims=8).collect():
        assert r["cosine"] <= exact[(r["query_id"], 1)] + 1e-9


def test_knn_ivf_recall_and_shape(spark):
    from maillogsentinel_spark.operators.similarity import knn_ivf

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    exact = {r["query_id"]: r["neighbor_id"]
             for r in knn_bruteforce(emb, q, k=1).collect()}
    # stride 7 → 9 centroids over the ring; probing 3 lists must recover
    # the true nearest neighbor for most queries
    res = knn_ivf(emb, q, k=1, centroid_stride=7, nprobe=3).collect()
    approx = {r["query_id"]: r["neighbor_id"] for r in res}
    hits = sum(1 for qid, nid in exact.items() if approx.get(qid) == nid)
    assert hits >= 3
    # every result ranked, no self-matches
    assert all(r["rank"] == 1 and r["neighbor_id"] != r["query_id"] for r in res)


def test_knn_ivf_probe_narrowing(spark):
    from maillogsentinel_spark.operators.similarity import knn_ivf

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") == 0).withColumnRenamed("vec_id", "query_id")
    # nprobe = all lists ≡ brute force
    all_lists = knn_ivf(emb, q, k=3, centroid_stride=7, nprobe=10**6).collect()
    exact = knn_bruteforce(emb, q, k=3).collect()
    assert [(r["neighbor_id"], r["cosine"]) for r in all_lists] == [
        (r["neighbor_id"], r["cosine"]) for r in exact
    ]


def test_knn_ivf_kmeans_shape_and_determinism(spark):
    from maillogsentinel_spark.operators.similarity import knn_ivf_kmeans

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 5").withColumnRenamed("vec_id", "query_id")

    def run():
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
            for r in knn_ivf_kmeans(emb, q, k=3, nlist=4, nprobe=2).collect()
        )

    a = run()
    assert a == run()                      # deterministic end to end
    per_q = {}
    for qid, rank, nid, cos in a:
        per_q.setdefault(qid, []).append((rank, cos))
        assert nid != qid
    for ranks in per_q.values():
        assert [r for r, _ in ranks] == list(range(1, len(ranks) + 1))
        sims = [c for _, c in ranks]
        assert sims == sorted(sims, reverse=True)


def test_multiprobe_recall_dominates_single_bucket(spark):
    """Hamming-1 probing can only ADD candidates, so multiprobe recall
    vs the exact top-5 is >= single-bucket recall, strictly more
    candidates scored."""
    from maillogsentinel_spark.operators.similarity import knn_bruteforce, knn_lsh

    emb = _emb(spark)
    q = emb.filter("vec_id < 5").withColumnRenamed("vec_id", "query_id")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(emb, q, k=5).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_lsh(emb, q, k=5, n_planes=6, dims=8).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_lsh(emb, q, k=5, n_planes=6, dims=8, multiprobe=3).collect()
    }
    assert len(multi & exact) >= len(single & exact)
    assert len(multi) >= len(single)


def test_knn_pq_adc_approximates_exact(spark):
    """PQ-ADC ranking on a structured set: neighbors it returns must be
    reasonably close to the exact top-k (ADC is a lossy but monotone-ish
    distance), ranks contiguous, self excluded."""
    from maillogsentinel_spark.operators.similarity import knn_bruteforce, knn_pq_adc

    emb = _emb(spark, n=64, dims=16)
    q = emb.filter("vec_id < 4").withColumnRenamed("vec_id", "query_id")
    res = knn_pq_adc(emb, q, k=5, m_sub=4, sublen=4, ncodes=8).collect()
    per_q = {}
    for r in res:
        assert r["neighbor_id"] != r["query_id"]
        assert r["adc_dist"] >= 0.0
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["adc_dist"]))
    for ranks in per_q.values():
        assert [x for x, _ in ranks] == list(range(1, len(ranks) + 1))
        dists = [d for _, d in ranks]
        assert dists == sorted(dists)  # ascending distance
    # ADC with 8 codes per 4-dim subspace on a ring: the exact nearest
    # neighbor should appear within the ADC top-5 for most queries
    exact1 = {r["query_id"]: r["neighbor_id"]
              for r in knn_bruteforce(emb, q, k=1).collect()}
    got = {r["query_id"]: {x["neighbor_id"] for x in res if x["query_id"] == r["query_id"]}
           for r in res}
    hits = sum(1 for qid, nid in exact1.items() if nid in got.get(qid, set()))
    assert hits >= 2


def test_knn_classify_majority_and_tiebreak(spark):
    from maillogsentinel_spark.operators.similarity import knn_classify

    # 3 tight clusters with labels 0/1/2; one query per cluster
    rows = []
    import math
    for c in range(3):
        base = [0.0] * 6
        base[c * 2] = 1.0
        for i in range(5):
            v = list(base)
            v[c * 2 + 1] = 0.01 * i
            rows.append((c * 10 + i, c, v))
    emb = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    q = emb.filter(F.col("vec_id") % 10 == 0).withColumnRenamed("vec_id", "query_id")
    out = knn_classify(emb, q, k=3).collect()
    assert len(out) == 3
    for r in out:
        assert r["pred_label"] == r["true_label"]
        assert r["votes"] >= 2
