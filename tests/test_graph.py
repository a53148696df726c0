"""Connected-components operator semantics on tiny in-memory graphs."""

from maillogsentinel_spark.operators.graph import (
    connected_components,
    dedup_cluster_assign,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["id"]: r["comp"] for r in connected_components(df).collect()
    }


def test_two_components(spark):
    # {1,2,3} via 1-2, 2-3 and {10,11}
    comp = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_needs_multiple_rounds(spark):
    # a path graph: min label must propagate hop by hop
    comp = _cc(spark, [(i, i + 1) for i in range(1, 9)])
    assert comp == {i: 1 for i in range(1, 10)}


def test_direction_and_duplicates_irrelevant(spark):
    comp = _cc(spark, [(5, 2), (2, 5), (2, 7), (7, 2), (5, 2)])
    assert comp == {2: 2, 5: 2, 7: 2}


def test_self_loop_singleton(spark):
    comp = _cc(spark, [(4, 4), (1, 2)])
    assert comp == {1: 1, 2: 1, 4: 4}


def test_cluster_assign_columns(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    rows = dedup_cluster_assign(pairs).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["cluster_id"]) for r in rows] == [
        (1, 1), (2, 1), (3, 1)
    ]


def test_long_chain_pointer_jumping(spark):
    # 40-node path: O(log d) rounds must still reach the fixpoint well
    # inside max_iter
    comp = _cc(spark, [(i, i + 1) for i in range(1, 40)])
    assert comp == {i: 1 for i in range(1, 41)}


def test_empty_edges(spark):
    from pyspark.sql import types as T

    empty = spark.createDataFrame(
        [], T.StructType([T.StructField("src", T.LongType()),
                          T.StructField("dst", T.LongType())])
    )
    assert connected_components(empty).count() == 0


def test_random_graphs_match_union_find(spark):
    """Seeded random graphs: distributed CC must equal a reference
    union-find on every vertex."""
    import random

    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(5, 40)
        edges = [(rng.randint(0, n), rng.randint(0, n))
                 for _ in range(rng.randint(3, 60))]

        parent = {}
        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        for a, b in edges:
            union(a, b)
        want = {v: find(v) for v in parent}

        got = _cc(spark, edges)
        assert got == want, f"trial {trial}: {sorted(edges)}"


def test_local_and_distributed_paths_agree(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(400)]
    df = spark.createDataFrame(edges, "src long, dst long")
    local = {r.id: r.comp for r in connected_components(df).collect()}
    dist = {r.id: r.comp
            for r in connected_components(df, local_threshold=0).collect()}
    assert local == dist and len(local) > 0
