"""Similarity search over embedding columns (array<float>).

- ``knn_bruteforce``: exact top-k cosine per query. The query side is
  broadcast (queries ≪ corpus); the corpus side is scanned once with the
  dot product in codegen, then per-query top-k via window row_number —
  at 100 TB this is one scan + one small shuffle of per-partition
  survivors.
- ``knn_lsh``: random-hyperplane LSH bucketing as the scale path: only
  corpus vectors in the query's bucket are scored. Hyperplanes are
  *deterministic* (integer-arithmetic pseudo-random), so results are
  reproducible anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, to_double_array


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors (cosine desc, neighbor id asc; self excluded
    when ids collide)."""
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_double_array(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), to_double_array(F.col(vec_col)).alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = F.round(cosine_similarity(F.col("cv"), F.col("qv")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("query_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hyperplane(plane: int, dim: int) -> float:
    """Deterministic pseudo-random component in [-1, 1)."""
    return ((plane * 73856093 + dim * 19349663) % 2000 - 1000) / 1000.0


def _bucket_expr(vec_col: str, n_planes: int, dims: int, plane_offset: int = 0):
    """Sign-bit bucket id from n_planes deterministic hyperplanes.

    Shaped as per-plane zip_with/aggregate folds over *flat* array
    literals: a chained per-component Add expression (depth ~dims) makes
    every Catalyst rule traversal quadratic-ish and costs seconds of
    planning per run; the flat fold analyzes in milliseconds and the
    sequential sum matches the DuckDB oracle's list_reduce bit-for-bit."""
    # The whole expression is built as ONE SQL string parsed JVM-side in
    # a single py4j call. The per-component Column form (dims F.lit
    # calls per plane, one HOF-builder call per fold) cost one py4j
    # round-trip PER NODE — at 3 tables x 6 planes x 64 dims x 2 join
    # sides that was ~2,300 round-trips, measured as 1.3-1.6 s of pure
    # driver time per ANN query construction. The parsed tree is the
    # same arithmetic: per plane the sequential zip_with/aggregate dot,
    # then a (1 << p)-weighted sum of the sign bits (pow(2, p) is exact
    # in double for these plane counts); repr() round-trips every
    # hyperplane double exactly through the SQL parser's decimal-to-
    # nearest-double literal, so buckets are bit-identical.
    planes_sql = ",".join(
        "array("
        + ",".join(
            f"{hyperplane(plane_offset + p, d)!r}D" for d in range(dims)
        )
        + ")"
        for p in range(n_planes)
    )
    return F.expr(
        "aggregate(transform(array("
        + planes_sql
        + "), (plane, i) -> CASE WHEN aggregate(zip_with("
        f"cast(`{vec_col}` as array<double>), plane, (x, y) -> x * y), "
        "0.0D, (acc, x) -> acc + x) > 0 "
        "THEN cast(pow(2.0D, i) as int) ELSE 0 END), "
        "0, (acc, x) -> acc + x)"
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 6,
    dims: int = 64,
    multiprobe: int = 0,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing the query's
    hyperplane-sign bucket. Equi-join on the bucket id replaces the
    cross join — the candidate set shrinks ~2^n_planes-fold.

    Two standard recall levers, composable:
    - ``multiprobe`` > 0 additionally probes the buckets at Hamming
      distance 1 on the first ``multiprobe`` planes (query side only —
      the corpus keeps one bucket row per table, so probe cost scales
      with |queries|, not corpus size). Near-boundary neighbors whose
      sign flipped on one plane become reachable.
    - ``n_tables`` > 1 indexes the corpus in L independent hash tables
      (disjoint plane sets); a pair is a candidate if ANY table
      collides. Recall ≈ 1−(1−p)^L for per-table collision p, at the
      classic L× index-size cost; candidates are deduped before
      scoring so each pair is scored once."""
    from pyspark.sql import Window

    tables = [
        _bucket_expr(vec_col, n_planes, dims, plane_offset=t * n_planes)
        for t in range(n_tables)
    ]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        to_double_array(F.col(vec_col)).alias("cv"),
        F.posexplode(F.array(*tables)).alias("t", "bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qv"),
        F.posexplode(F.array(*tables)).alias("t", "bucket"),
    )
    if multiprobe > 0:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(min(multiprobe, n_planes))
            ],
        )
        q = q.select("query_id", "qv", "t", F.explode(probes).alias("bucket"))
    cand = c.join(F.broadcast(q), ["t", "bucket"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = F.round(cosine_similarity(F.col("cv"), F.col("qv")), 6)
    scored = cand.select("query_id", "neighbor_id", sim.alias("cosine"))
    if n_tables > 1:
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroid_stride: int = 23,
    nprobe: int = 3,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the other classic ANN
    scale path beside hyperplane LSH.

    Structure mirrors a production IVF index:
    1. coarse quantizer: deterministic seed centroids (every
       ``centroid_stride``-th corpus id — no Lloyd iterations, so the
       whole index is reproducible and SQL-oracle-checkable);
    2. inverted lists: each corpus vector is assigned to its nearest
       centroid (rounded cosine, centroid id as tie-break);
    3. probe: each query scores only the lists of its ``nprobe``
       nearest centroids.

    Scale: the centroid set is tiny and broadcast everywhere; corpus
    assignment is one scan + one shuffle on centroid id; a query
    touches nprobe/nlist of the corpus. Recall is tunable via nprobe.
    """
    from pyspark.sql import Window

    from ..functions.vectors import dot
    from .dedup import _normalized_vectors

    # pre-normalize once per row: every pair similarity below is then a
    # single sequential-fold dot instead of dot + two norms (3× fewer
    # interpreted fold evaluations — assignment is |corpus| × nlist pairs)
    nv = _normalized_vectors(corpus, id_col, vec_col)
    c = nv.select(F.col("id").alias("neighbor_id"), F.col("nv").alias("cv"))
    cent = nv.filter((F.col("id") % centroid_stride) == 0).select(
        F.col("id").alias("centroid_id"), F.col("nv").alias("centv")
    )

    # inverted lists: nearest centroid per corpus vector
    csim = F.round(dot(F.col("cv"), F.col("centv")), 6)
    wassign = Window.partitionBy("neighbor_id").orderBy(
        F.desc("csim"), "centroid_id"
    )
    assigned = (
        c.crossJoin(F.broadcast(cent))
        .select("neighbor_id", "cv", "centroid_id", csim.alias("csim"))
        .withColumn("__r", F.row_number().over(wassign))
        .filter(F.col("__r") == 1)
        .select("neighbor_id", "cv", "centroid_id")
    )

    # probe: nprobe nearest centroids per query
    q = _normalized_vectors(queries, query_id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("nv").alias("qv")
    )
    qsim = F.round(dot(F.col("qv"), F.col("centv")), 6)
    wprobe = Window.partitionBy("query_id").orderBy(F.desc("qsim"), "centroid_id")
    probed = (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", "qv", "centroid_id", qsim.alias("qsim"))
        .withColumn("__r", F.row_number().over(wprobe))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )

    # search only the probed lists
    scored = assigned.join(F.broadcast(probed), "centroid_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = F.round(dot(F.col("cv"), F.col("qv")), 6)
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("query_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def sqdist(a, b):
    """Sequential-order squared L2 distance (matches the DuckDB
    list_reduce fold bit-for-bit)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def knn_pq_adc(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    m_sub: int = 8,
    sublen: int = 8,
    ncodes: int = 16,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC) — the memory-compressed scale path beside LSH/IVF: the corpus
    is stored as ``m_sub`` small integer codes per vector (here 8 codes
    ≈ 8 bytes vs 256 bytes of float32), and a query scores the whole
    corpus through a tiny per-query lookup table without touching the
    original vectors.

    Deterministic codebooks (the ``ncodes`` lowest-id corpus vectors,
    sliced per subspace — same seeding idea as knn_ivf's stride
    quantizer) keep the whole index SQL-oracle-checkable; a trained
    variant would swap in per-subspace k-means without changing any
    join shape.

    Scale shape: the codebook (m_sub × ncodes subvectors) broadcasts
    everywhere; encoding is one corpus scan + a keyed (id, subspace)
    min-by agg; the per-query LUT (queries × m_sub × ncodes rows)
    broadcasts; search is a broadcast equi-join of the codes table on
    (subspace, code) + one keyed sum — the corpus vectors themselves
    are read exactly once, at index-build time.

    Distance partials are quantized to DECIMAL(18,9) before the final
    per-pair sum so the ADC total is bit-identical regardless of
    partial-sum order (engine parity rule, see module docstring in
    plans/queries.py)."""
    from pyspark.sql import Window

    e = corpus.select(
        F.col(id_col).alias("vec_id"), to_double_array(F.col(vec_col)).alias("v")
    )
    seeds = (
        e.orderBy("vec_id")
        .limit(ncodes)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("code_id"),
            "v",
        )
    )
    sub_ix = F.explode(F.array(*[F.lit(m) for m in range(m_sub)])).alias("m")
    codebook = seeds.select(
        "code_id", "v", sub_ix
    ).select(
        "m", "code_id",
        F.slice(F.col("v"), F.col("m") * sublen + 1, sublen).alias("c"),
    )

    # encode: nearest codebook entry per (vector, subspace); min over a
    # (dist, code_id) struct = lexicographic argmin with code tie-break,
    # no window needed
    subs = e.select(
        "vec_id", "v", sub_ix
    ).select(
        "vec_id", "m",
        F.slice(F.col("v"), F.col("m") * sublen + 1, sublen).alias("s"),
    )
    d_enc = F.round(sqdist(F.col("s"), F.col("c")), 9)
    codes = (
        subs.join(F.broadcast(codebook), "m")
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct(d_enc.alias("d"), F.col("code_id"))).alias("best"))
        .select("vec_id", "m", F.col("best.code_id").alias("code_id"))
    )

    # per-query LUT: distance from each query subvector to every
    # codebook entry, quantized for order-independent summation
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qv"),
    )
    qsubs = q.select(
        "query_id", "qv", sub_ix
    ).select(
        "query_id", "m",
        F.slice(F.col("qv"), F.col("m") * sublen + 1, sublen).alias("qs"),
    )
    d_lut = F.round(sqdist(F.col("qs"), F.col("c")), 9).cast("decimal(18,9)")
    lut = qsubs.join(F.broadcast(codebook), "m").select(
        "query_id", "m", "code_id", d_lut.alias("d")
    )

    adc = (
        codes.join(F.broadcast(lut), ["m", "code_id"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").cast("decimal(28,9)").alias("adc"))
    )
    wk = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("adc").cast("double").alias("adc_dist"), "rank",
        )
        .orderBy("query_id", "rank")
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """k-NN majority-vote classification: each query's label is the
    modal label among its k exact-cosine nearest corpus neighbors
    (vote-count desc, smaller label as tie-break). Returns one row per
    query with the true and predicted label plus the winning vote
    count — the evaluation artifact a labeling/QA pipeline consumes.

    Composition: knn_bruteforce (broadcast query side, corpus scanned
    once) → broadcast label join → tiny keyed vote agg. Nothing beyond
    the base knn shuffles the corpus."""
    nn = knn_bruteforce(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    )
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nl")
    )
    votes = (
        nn.join(labels, "neighbor_id")
        .groupBy("query_id", "nl")
        .agg(F.count(F.lit(1)).alias("votes"))
        .groupBy("query_id")
        .agg(
            F.max(
                F.struct(F.col("votes"), (-F.col("nl")).alias("negl"))
            ).alias("best")
        )
        .select(
            "query_id",
            (-F.col("best.negl")).cast("int").alias("pred_label"),
            F.col("best.votes").cast("long").alias("votes"),
        )
    )
    truth = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(label_col).cast("int").alias("true_label"),
    )
    return (
        votes.join(truth, "query_id")
        .select("query_id", "true_label", "pred_label", "votes")
        .orderBy("query_id")
    )


def knn_ivf_kmeans(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nlist: int = 8,
    nprobe: int = 2,
    train_iters: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF with a TRAINED coarse quantizer: clustering.kmeans_fit
    learns the nlist centroids (deterministically), inverted lists are
    the Lloyd assignment, queries probe their nprobe nearest centroids
    (squared-L2, the training metric) and candidates are re-ranked by
    exact cosine. Pass ``centroids`` (cid, c array<double>) to reuse an
    already-trained quantizer instead of refitting.

    Scale: identical roles to knn_ivf — centroids broadcast everywhere,
    corpus touched by one scan + one shuffle for list assignment, a
    query scans nprobe/nlist of the corpus. The trained quantizer packs
    lists by actual data density instead of id-stride, which is what
    keeps probe recall stable when the corpus is not uniformly
    distributed."""
    from pyspark.sql import Window

    from ..functions.vectors import dot
    from .clustering import _assign, kmeans_fit

    cents = (
        centroids
        if centroids is not None
        else kmeans_fit(corpus, id_col, vec_col, k=nlist, iters=train_iters)
    )
    e = corpus.select(
        F.col(id_col).alias("vec_id"), to_double_array(F.col(vec_col)).alias("v")
    )
    lists = _assign(e, cents)
    inv = e.join(lists, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "cid"
    )

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qv"),
    )
    qdist = F.aggregate(
        F.zip_with("qv", "c", lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    wprobe = Window.partitionBy("query_id").orderBy("qdist", "cid")
    probed = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "cid", qdist.alias("qdist"))
        .withColumn("__r", F.row_number().over(wprobe))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "qv", "cid")
    )

    scored = inv.join(F.broadcast(probed), "cid").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = F.round(
        dot(F.col("cv"), F.col("qv"))
        / (
            F.sqrt(dot(F.col("cv"), F.col("cv")))
            * F.sqrt(dot(F.col("qv"), F.col("qv")))
        ),
        6,
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
