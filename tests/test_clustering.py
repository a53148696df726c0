"""Deterministic k-means semantics on a tiny separable dataset."""

from maillogsentinel_spark.operators.clustering import kmeans_assign


def test_two_separable_clusters(spark):
    # ids 0,1 seed the two centroids; points near each seed stay together
    rows = [
        (0, [0.0, 0.0]), (1, [10.0, 10.0]),
        (2, [0.5, 0.1]), (3, [9.5, 10.2]), (4, [0.2, 0.4]), (5, [10.3, 9.9]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: r["cid"] for r in kmeans_assign(emb, k=2, iters=2).collect()}
    assert got[0] == got[2] == got[4]
    assert got[1] == got[3] == got[5]
    assert got[0] != got[1]


def test_deterministic_across_runs(spark):
    rows = [(i, [float((i * 7) % 13), float((i * 3) % 11)]) for i in range(30)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a = sorted((r["vec_id"], r["cid"]) for r in kmeans_assign(emb, k=4, iters=3).collect())
    b = sorted((r["vec_id"], r["cid"]) for r in kmeans_assign(emb, k=4, iters=3).collect())
    assert a == b
