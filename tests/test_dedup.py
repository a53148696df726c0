"""Dedup operator semantics on tiny in-memory corpora."""

from maillogsentinel_spark.operators.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
    (3, "the quick brown fox jumps over the sleepy dog"),        # near dup of 1
    (4, "completely different content about spark engines here"),
    (5, "unrelated short text"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup(spark):
    groups = exact_dedup_groups(_docs(spark), "doc_id", "text").collect()
    by_keep = {r["keep_id"]: r["n_dups"] for r in groups}
    assert by_keep[1] == 2  # docs 1+2 collapse, min id kept
    assert set(by_keep) == {1, 3, 4, 5}
    survivors = exact_dedup(_docs(spark), "doc_id", "text")
    assert sorted(r["doc_id"] for r in survivors.collect()) == [1, 3, 4, 5]


def test_ngram_jaccard(spark):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(_docs(spark), k=3, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0                      # identical
    assert (1, 3) in pairs and 0.3 <= pairs[(1, 3)] < 1.0  # near dup
    assert not any(4 in p or 5 in p for p in pairs)


def test_containment_catches_quote_inclusion(spark):
    # doc 11 is doc 10's opening quoted wholesale inside a longer doc:
    # containment = 1.0 (every shingle of 11 is in 10's superset doc)
    # while jaccard is diluted below 0.3 — the asymmetric measure's
    # whole reason to exist
    from maillogsentinel_spark.operators.dedup import containment_pairs

    short = "the quick brown fox jumps over the lazy dog"
    long = short + (
        " and then continues with a very much longer tail of words"
        " that keeps adding fresh material sentence after sentence"
        " so the union grows while the intersection stays fixed"
    )
    docs = spark.createDataFrame([(10, long), (11, short)], ["doc_id", "text"])
    cont = {(r["id_a"], r["id_b"]): r["containment"]
            for r in containment_pairs(docs, k=3, threshold=0.8).collect()}
    assert cont[(10, 11)] == 1.0
    jac = {(r["id_a"], r["id_b"]) for r in
           ngram_jaccard_pairs(docs, k=3, threshold=0.3).collect()}
    assert (10, 11) not in jac


def test_minhash_lsh_subset_of_exact(spark):
    lsh = {(r["id_a"], r["id_b"]) for r in
           minhash_lsh_pairs(_docs(spark), k=3, threshold=0.3).collect()}
    exact = {(r["id_a"], r["id_b"]) for r in
             ngram_jaccard_pairs(_docs(spark), k=3, threshold=0.3).collect()}
    assert lsh <= exact          # LSH never invents pairs (verified)
    assert (1, 2) in lsh         # identical docs always collide


def test_simhash(spark):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_pairs(_docs(spark), max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0    # identical text → identical signature


def test_df_cap_drops_hot_shingles(spark):
    # a shingle present in every doc is dropped by the frequency cap
    docs = spark.createDataFrame(
        [(i, f"common shared prefix unique{i} word{i} tail{i}") for i in range(5)],
        ["doc_id", "text"],
    )
    capped = ngram_jaccard_pairs(docs, k=3, threshold=0.01, df_cap=4).collect()
    uncapped = ngram_jaccard_pairs(docs, k=3, threshold=0.01).collect()
    assert len(capped) < len(uncapped)


def _jac_set(df):
    return {(r["id_a"], r["id_b"]): r["jaccard"] for r in df.collect()}


def test_prefix_filter_matches_naive(spark):
    # the prefix-filtered path must be RESULT-IDENTICAL to the naive
    # shingle self-join on a corpus built to stress its pruning rules:
    # heavy shared boilerplate (df skew → short prefixes), df ties
    # (order degeneracy), and a subset pair sitting exactly on the
    # length-filter boundary
    docs = spark.createDataFrame(
        [(i, f"shared boilerplate header text unique{i} tail{i} extra{i} more{i}")
         for i in range(8)]
        + [
            (100, "alpha beta gamma delta epsilon zeta eta theta"),
            (101, "alpha beta gamma delta epsilon"),   # subset of 100
            (102, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 100
        ],
        ["doc_id", "text"],
    )
    for t in (0.2, 0.3, 0.5, 0.8):
        fast = _jac_set(
            ngram_jaccard_pairs(docs, k=3, threshold=t, prefix_filter=True)
        )
        naive = _jac_set(ngram_jaccard_pairs(docs, k=3, threshold=t))
        assert fast == naive, f"threshold {t}: {fast} != {naive}"


def test_prefix_filter_pair_found_via_common_shingles_only(spark):
    # a qualifying pair whose ONLY shared shingles are the corpus's
    # most frequent ones — a df-cap would lose it, prefix filtering
    # must not (the shared shingles still head the prefix when the
    # docs contain nothing rarer in front of them)
    docs = spark.createDataFrame(
        [(i, "very common phrase here indeed") for i in (1, 2, 3, 4)]
        + [(5, "totally different words elsewhere now")],
        ["doc_id", "text"],
    )
    pairs = _jac_set(
        ngram_jaccard_pairs(docs, k=3, threshold=0.9, prefix_filter=True)
    )
    assert pairs[(1, 2)] == 1.0 and pairs[(3, 4)] == 1.0
    assert not any(5 in p for p in pairs)


def _cdc(spark, texts, **kw):
    from maillogsentinel_spark.operators.dedup import cdc_chunk_rows

    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = cdc_chunk_rows(docs, **kw).orderBy("doc_id", "i").collect()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(r["chunk"])
    return out


def test_cdc_chunks_partition_and_short_doc(spark):
    long = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running through fields of data while the chunker follows "
            "content defined boundaries wherever the rolling hash says "
            "so and nowhere else at all") * 2
    out = _cdc(spark, [long, "tiny", ""])
    # chunks partition the text exactly, in order
    assert "".join(out[0]) == long
    assert len(out[0]) >= 2  # expected chunk ~32 chars over ~400 chars
    # sub-window doc -> one whole-document chunk; empty text dropped
    assert out[1] == ["tiny"]
    assert 2 not in out


def test_cdc_chunks_resynchronize_after_insertion(spark):
    # THE content-defined property: prepending bytes only perturbs the
    # chunk(s) touching the edit — every later boundary is the same
    # content position, so the chunk tails are string-identical (what
    # fixed-size blocking can never do)
    base = ("content defined chunking finds the same boundaries in the "
            "same content no matter where that content sits inside the "
            "file which is exactly why rsync and lbfs use it for dedup "
            "across shifted copies of the data")
    out = _cdc(spark, [base, "XYZW " + base])
    a, b = out[0], out[1]
    assert len(a) >= 3
    tail = len(a) - 1  # all chunks after the first re-synchronize
    assert a[-tail:] == b[-tail:]
    assert "".join(b) == "XYZW " + base


def test_embedding_pairs(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [1.0, 0.001, 0.0]),   # ~same direction
            (3, [0.0, 1.0, 0.0]),     # orthogonal
        ],
        ["vec_id", "embedding"],
    )
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_cosine_pairs(emb, threshold=0.9).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] > 0.999


def test_gemm_is_lazy_and_distributed(spark):
    """Building the GEMM plan must launch NO Spark jobs (the old design
    collect()ed the whole embedding table to the driver at plan-build
    time) and must execute as a cogrouped pandas op, not a broadcast of
    a driver-side matrix."""
    from maillogsentinel_spark.operators.dedup import _cosine_pairs_gemm

    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(8)]
        + [(100, [1.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    df = _cosine_pairs_gemm(emb, "vec_id", "embedding", threshold=0.9)
    assert len(tracker.getJobIdsForGroup(None)) == before  # fully lazy
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    rows = {(r["id_a"], r["id_b"]): r["cosine"] for r in df.collect()}
    # ids 0 and 100 are parallel unit vectors — must be found whether or
    # not they hash to the same block
    assert rows == {(0, 100): 1.0}


def test_gemm_matches_expr_path(spark):
    """Distributed block-tiled GEMM finds exactly the pairs of the exact
    fold-based path (values equal to 1e-6 rounding)."""
    import random

    rnd = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(60)],
        ["vec_id", "embedding"],
    )
    gemm = {(r["id_a"], r["id_b"]): r["cosine"]
            for r in embedding_cosine_pairs(emb, threshold=0.5, method="gemm").collect()}
    expr = {(r["id_a"], r["id_b"]): r["cosine"]
            for r in embedding_cosine_pairs(emb, threshold=0.5, method="expr").collect()}
    assert set(gemm) == set(expr)
    for k in gemm:
        assert abs(gemm[k] - expr[k]) <= 2e-6


def test_exact_substring_spans(spark):
    """Known construction: two docs share an exact 8-token substring →
    one diagonal run of 4 matching 5-gram windows (span 8); unrelated
    docs produce nothing."""
    from maillogsentinel_spark.operators.dedup import exact_substring_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {shared} closing remarks"),
            (2, f"other opening {shared} different tail content"),
            (3, "totally unrelated text about distributed joins"),
            (4, "short"),
        ],
        ["doc_id", "text"],
    )
    rows = exact_substring_spans(docs, w=5, min_run=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["max_run"] == 4          # 8-token run = 4 windows of 5
    assert r["span_tokens"] == 8
    assert r["n_matches"] == 4


def test_exact_substring_df_cap(spark):
    """A window repeated in > df_cap docs is boilerplate and must not
    create pairs on its own."""
    from maillogsentinel_spark.operators.dedup import exact_substring_spans

    boiler = "all rights reserved by the site owner"  # > 5 tokens
    docs = spark.createDataFrame(
        [(i, f"doc number {i} unique words {boiler}") for i in range(10)],
        ["doc_id", "text"],
    )
    # every boilerplate window occurs 10 > 3 times → dropped → no pairs
    assert exact_substring_spans(docs, w=5, min_run=2, df_cap=3).count() == 0
    # with the cap lifted the clique appears
    assert exact_substring_spans(docs, w=5, min_run=2, df_cap=100).count() == 45


def test_gemm_group_col_isolates_groups(spark):
    """group_col: identical vectors in DIFFERENT groups must NOT pair;
    identical vectors in the same group must."""
    from maillogsentinel_spark.operators.dedup import _cosine_pairs_gemm

    v = [1.0, 0.0, 0.0, 0.0]
    emb = spark.createDataFrame(
        [(1, v, 0), (2, v, 0), (3, v, 1)],
        ["vec_id", "embedding", "cid"],
    )
    rows = _cosine_pairs_gemm(
        emb, "vec_id", "embedding", threshold=0.9, group_col="cid"
    ).collect()
    assert {(r["g"], r["id_a"], r["id_b"]) for r in rows} == {(0, 1, 2)}


def test_gemm_group_col_drops_null_groups(spark):
    """A NULL group id (e.g. an unmatched join row) must be skipped, not
    crash the executor with int(None) inside the cogroup fn."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, LongType, StructField, StructType,
    )

    from maillogsentinel_spark.operators.dedup import _cosine_pairs_gemm

    v = [1.0, 0.0, 0.0, 0.0]
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
        StructField("cid", IntegerType()),
    ])
    emb = spark.createDataFrame(
        [(1, v, 0), (2, v, 0), (3, v, None), (4, v, None)], schema
    )
    rows = _cosine_pairs_gemm(
        emb, "vec_id", "embedding", threshold=0.9, group_col="cid"
    ).collect()
    # the null-group twins (3, 4) pair with nothing; the job completes
    assert {(r["g"], r["id_a"], r["id_b"]) for r in rows} == {(0, 1, 2)}


def test_dup_window_coverage_counts_positions(spark):
    """Two docs sharing an 8-token substring: 4 shared 5-gram windows
    cover exactly 8 positions in each; a unique doc has coverage 0."""
    from maillogsentinel_spark.operators.dedup import dup_window_coverage

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {shared} closing remarks"),   # 13 tokens
            (2, f"other opening {shared} different tail words"), # 13 tokens
            (3, "nothing here matches any other document text"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["id"]: r for r in dup_window_coverage(docs, w=5).collect()}
    assert rows[1]["covered_tokens"] == 8
    assert rows[2]["covered_tokens"] == 8
    assert rows[3]["covered_tokens"] == 0 and rows[3]["coverage"] == 0.0
    assert abs(rows[1]["coverage"] - 8 / 13) < 1e-6


def test_exact_substring_matches_bruteforce(spark):
    """Randomized cross-check: the join/islands implementation agrees
    with a direct Python brute force on a small random corpus (fixed
    seed) — pairs, n_matches, and max_run all equal."""
    import random
    import re
    from collections import Counter, defaultdict

    from maillogsentinel_spark.operators.dedup import exact_substring_spans

    rnd = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]  # small vocab -> real collisions
    docs = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(3, 30))))
        for i in range(18)
    ]
    W, CAP = 3, 25

    tok = lambda s: [t for t in re.split(r"\W+", s.lower()) if t]  # noqa: E731
    wins = {
        i: [tuple(ts[p:p + W]) for p in range(len(ts) - W + 1)]
        for i, ts in ((i, tok(t)) for i, t in docs)
    }
    df = Counter(g for ws in wins.values() for g in ws)
    expected = {}
    for a in wins:
        for b in wins:
            if a >= b:
                continue
            runs = defaultdict(list)
            for ia, ga in enumerate(wins[a]):
                if df[ga] > CAP:
                    continue
                for jb, gb in enumerate(wins[b]):
                    if ga == gb:
                        runs[ia - jb].append(ia)
            n_matches, max_run = 0, 0
            for ias in runs.values():
                ias.sort()
                run = 1
                for prev, cur in zip(ias, ias[1:]):
                    run = run + 1 if cur == prev + 1 else 1
                    max_run = max(max_run, run)
                max_run = max(max_run, 1)
                n_matches += len(ias)
            if max_run >= 2:
                expected[(a, b)] = (n_matches, max_run)

    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): (r["n_matches"], r["max_run"])
        for r in exact_substring_spans(
            sdf, w=W, min_run=2, df_cap=CAP
        ).collect()
    }
    assert got == expected
