"""Deduplication operators for LLM training-data pipelines.

Five levels, each shuffle-conscious for the 100 TB target:

- **exact**: group by content hash, keep min id. One shuffle on a
  64-char hash key — the minimum possible.
- **n-gram Jaccard**: candidate pairs via an equi-join on shared
  shingles (any pair with jaccard > 0 shares one), with a
  document-frequency cap that drops ubiquitous shingles — the skew
  guard that keeps the self-join from exploding on hot n-grams.
- **MinHash + LSH**: per-doc signatures (min of salted portable hashes
  over shingles — a scan projection, no shuffle), banded into buckets,
  candidates = pairs sharing a band bucket, then *verified* with exact
  Jaccard. At scale: the only shuffles are on band keys and candidate
  pairs — never all-pairs.
- **SimHash**: 32-bit signatures; near-pairs via the pigeonhole chunk
  join (hamming ≤ 3 across 4 chunks ⇒ at least one 8-bit chunk equal),
  so the join is equi on chunks, never a cross product.
- **embedding cosine**: exact all-pairs above a threshold (the oracle
  path); the approximate scale path is similarity.knn_lsh's bucketing.

All hashing is the DuckDB-portable md5-prefix hash so the driver's
oracle can reproduce every pipeline exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64
from ..functions.vectors import cosine_similarity, to_double_array
from .textstats import shingles, tokens


def exact_dedup_groups(
    df: DataFrame, id_col: str, content_col: str
) -> DataFrame:
    """(keep_id, n_dups) per distinct content — keep = min id."""
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("__h"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .drop("__h")
    )


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Survivor rows only (deterministic: min id per content group)."""
    keep = exact_dedup_groups(df, id_col, content_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "inner")


def cdc_boundaries(
    text: str, window: int = 8, modulus: int = 32, base: int = 31
) -> list[int]:
    """Pure per-document CDC boundary kernel: 1-based end positions of
    every chunk — interior positions i (window ≤ i < len) where the
    polynomial rolling hash Σ_{j<window} base^j·ord(text[i−j−1]) is
    ≡ 0 (mod modulus), plus the unconditional document end. Linear via
    one np.convolve. Empty text → []. The hypothesis property tests
    drive this kernel directly (partition + re-synchronization)."""
    import numpy as np

    if not text:
        return []
    L = len(text)
    ends: list[int] = []
    if L >= window:
        codes = np.fromiter(map(ord, text), dtype=np.int64, count=L)
        weights = np.array([base**j for j in range(window)], dtype=np.int64)
        # full convolution index n carries Σ_j codes[n−j]·base^j;
        # n = i−1 (0-based end of the 1-based window ending at i),
        # valid from n = window−1, i.e. i = window .. L
        conv = np.convolve(codes, weights)[window - 1 : L]
        hits = np.nonzero(conv % modulus == 0)[0] + window
        ends = [int(i) for i in hits if i < L]
    ends.append(L)
    return ends


def cdc_chunk_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    modulus: int = 32,
    base: int = 31,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """CONTENT-DEFINED CHUNKING (the LBFS / rsync / FastCDC family):
    split each document into variable-length chunks whose boundaries
    are picked by the CONTENT, not by offset — a chunk boundary falls
    after position i whenever the polynomial rolling hash of the last
    ``window`` characters, Σ_{j<window} base^j·codepoint(text[i−j]),
    is ≡ 0 (mod ``modulus``). An insertion or deletion therefore only
    perturbs the chunks it touches; every chunk downstream of the edit
    re-synchronizes on the same content-derived boundaries — the
    property that makes CDC the sub-document dedup primitive fixed-size
    blocking lacks, and the shift-robust complement to ExactSubstr
    (which needs exact suffix runs) for training-corpus curation.

    Boundary rule is STATELESS (no min/max chunk clamp), so the exact
    same rule is expressible in ANSI SQL for the DuckDB oracle (the
    ``dedup_cdc_chunks`` query carries the mirrored position-explode
    form). The ENGINE side runs as one Arrow ``mapInPandas`` pass —
    the same shape as signatures.doc_shingle_rows, and for the same
    measured reason: the relational explode-positions form evaluates
    ``substr(text, i, 1)`` per position, which is O(i) under UTF-8
    variable-width seeking, O(len²) per document (~15 s for 5k docs at
    sf0.1); the linear one-pass rolling hash (one np.convolve per
    document) is ~50× faster and embarrassingly map-side. Expected
    chunk length ≈ ``modulus`` characters. Documents shorter than
    ``window`` (or with no matching interior position) become one
    whole-document chunk via the unconditional end-boundary at
    length(text). Empty texts are dropped.

    Returns (id, *extra_cols, i, chunk): 1-based boundary end-position
    and the chunk text ending there. Codepoints come from ``ord`` —
    identical to DuckDB's ``ascii()`` (first character's codepoint),
    so oracle parity holds beyond ASCII too.

    Scale: pure map-side — no shuffle at all; each partition streams
    its documents through one Arrow batch. Downstream chunk-level
    grouping is the caller's (one keyed shuffle of O(corpus bytes /
    modulus) rows).
    """
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    keep = [id_col, *extra_cols]
    in_fields = {f.name: f for f in docs.schema.fields}
    out_schema = StructType(
        [in_fields[c] for c in keep]
        + [StructField("i", LongType()), StructField("chunk", StringType())]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            cols: dict[str, list] = {c: [] for c in keep}
            iis: list[int] = []
            chunks: list[str] = []
            # name=None -> plain positional tuples: itertuples would
            # mangle column names that aren't Python identifiers
            pos = {c: i for i, c in enumerate(pdf.columns)}
            ti = pos[text_col]
            ki = [(c, pos[c]) for c in keep]
            for row in pdf.itertuples(index=False, name=None):
                text = row[ti]
                prev = 0
                for i in cdc_boundaries(text, window, modulus, base):
                    for c, j in ki:
                        cols[c].append(row[j])
                    iis.append(i)
                    chunks.append(text[prev:i])
                    prev = i
            yield pd.DataFrame({**cols, "i": iis, "chunk": chunks})

    need = list(dict.fromkeys([*keep, text_col]))
    return docs.select(*need).mapInPandas(gen, out_schema)


def _doc_shingles(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    df_cap: int | None,
    rows: DataFrame | None = None,
) -> DataFrame:
    """(id, sh) distinct pairs with sh as an int64 shingle hash, plus an
    optional document-frequency cap (drop shingles present in > df_cap
    docs — the skew guard).

    The hash (xxhash64) shrinks the self-join's shuffle key from a
    k-word string to 8 bytes; set-intersection counts are unchanged short
    of a 64-bit collision inside one candidate pair (~1e-9 at millions of
    shingles — far below any oracle tolerance)."""
    from .signatures import doc_shingle_rows

    if rows is None:
        rows = doc_shingle_rows(docs, id_col, text_col, k, distinct=True)
    sh = rows.select("id", F.xxhash64("sh").alias("sh"))
    if df_cap is not None:
        freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
        sh = sh.join(freq.filter(F.col("__df") <= df_cap), "sh").drop("__df")
    return sh


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.3,
    df_cap: int | None = None,
    shingle_rows: DataFrame | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """All pairs with k-shingle Jaccard ≥ threshold.

    jaccard = |A∩B| / (|A|+|B|−|A∩B|) over distinct shingles. Exact:
    every qualifying pair shares ≥1 shingle, so the shingle equi-join
    finds all of them; no candidate is missed (unlike LSH).

    ``prefix_filter=True`` switches candidate enumeration to PREFIX
    FILTERING (``_jaccard_pairs_prefix``) — result-identical, and a big
    win on ZIPFIAN corpora (hapax-heavy df distributions) where a few
    boilerplate shingles dominate the self-join's Σdf² cost. It is OFF
    by default because on df-UNIFORM corpora (bounded vocabularies,
    template-generated text — including this repo's synthetic test
    tables, 31-word vocab, shingle space saturated) prefixes barely
    shrink the join while the verification join pays |candidates|×|doc|
    extra rows — measured >10× slower than the naive join at sf1. Pick
    per corpus shape; the equivalence tests pin that both paths agree.
    ``df_cap`` forces the naive scaffold because the cap CHANGES the
    measure (shingles in > df_cap docs stop counting toward the
    intersection), and the prefix bound is only valid for the
    unmodified measure. For the regime where neither helps (saturated
    shingle space, Θ(Σdf²) ∝ n² inherently), the scale path is
    ``minhash_lsh_pairs`` at the same threshold — banded candidates +
    exact verification (measured recall 0.996, SCALE.md).

    ``shingle_rows``: optional pre-built (id, sh) distinct shingle table
    (signatures.doc_shingle_rows output, ideally persisted) so callers
    running several shingle consumers in one session build it once."""
    if prefix_filter and df_cap is None:
        return _jaccard_pairs_prefix(
            docs, id_col, text_col, k, threshold, shingle_rows
        ).orderBy("id_a", "id_b")

    def derive(stats: DataFrame) -> DataFrame:
        return (
            stats.withColumn(
                "jaccard",
                F.round(
                    F.col("common").cast("double")
                    / (F.col("na") + F.col("nb") - F.col("common")),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )

    jac = _pair_overlap_stats(
        docs, id_col, text_col, k, df_cap, shingle_rows, derive=derive
    )
    return jac.orderBy("id_a", "id_b")


def _jaccard_pairs_prefix(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    threshold: float,
    shingle_rows: DataFrame | None,
) -> DataFrame:
    """Exact Jaccard pairs via prefix filtering (Bayardo/Ma/Srikant,
    "Scaling Up All Pairs Similarity Search", WWW'07; Chaudhuri et al.
    SSJoin, ICDE'06) — identical output to the naive shingle self-join.

    Why it is exact: jaccard(A,B) ≥ t ⇒ |A∩B| ≥ t·|A∪B| ≥ t·max(|A|,|B|),
    so the overlap is at least α_X = ⌈t·|X|⌉ for BOTH docs. Order every
    document's shingles by one global total order and keep only the
    first |X| − α_X + 1 of them (the prefix): two sets with overlap ≥ α
    must share an element inside their (len − α + 1)-prefixes (if they
    didn't, all common elements would sit in one doc's (α−1)-suffix —
    fewer than α of them). Joining prefixes therefore finds every
    qualifying pair; a separate verification join then computes the
    EXACT intersection over the full shingle sets, so no false positive
    survives either. The measure is unchanged — the DuckDB oracle stays
    the unmodified naive self-join.

    Why it is fast ON THE RIGHT CORPUS: the global order is ASCENDING
    document frequency, so boilerplate shingles (the df² blowup in the
    naive join) sort to the tail of every document and fall out of the
    prefixes. Candidate cost drops from Σ_sh df(sh)² to
    Σ_sh df_prefix(sh)², plus a length filter (t·|A| ≤ |B| ≤ |A|/t)
    inside the join condition; verification costs |candidates| ×
    avg-doc-shingles keyed equi-join rows. Every stage is a keyed
    shuffle — no all-pairs, no driver state.

    When it LOSES (why it is not the default): the technique monetizes
    df SKEW. On a df-uniform, saturated shingle space (bounded vocab /
    template text) prefixes keep ~(1−t) of every posting, the candidate
    set degenerates toward all length-compatible overlapping pairs, and
    the verification join's |candidates|×|doc| rows dwarf the Σdf² it
    saved — measured >10× slower than the naive join on this repo's
    fixed-vocab synthetic at sf1. Zipfian real-text corpora are the
    winning regime (hapax-dominated df → short hot-prefix overlap).

    Float hygiene: the final filter applies t to the 6-dp ROUNDED
    jaccard (matching the oracle), so a pair whose true jaccard lies in
    [t−5e-7, t) still survives it. ⌈t·n⌉ and the length bounds are
    therefore derived from the effective threshold t−5e-7 (the rounding
    granularity) with a further 1e-9 slack, so IEEE noise (0.3·10 =
    3.0000000000000004) can only LENGTHEN a prefix / WIDEN the length
    window — toward a superset of candidates, never a miss, including
    at the rounding boundary on arbitrarily large shingle sets. The
    jaccard expression itself uses the same double arithmetic as the
    oracle, so survivors match exactly.
    """
    from pyspark.sql import Window

    standalone = shingle_rows is None
    sh = _doc_shingles(docs, id_col, text_col, k, None, rows=shingle_rows)
    if standalone:
        sh = sh.cache()
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    by_id = Window.partitionBy("id")
    ranked = (
        sh.join(dfreq, "sh")
        .withColumn("rn", F.row_number().over(by_id.orderBy("df", "sh")))
        .withColumn("n", F.count(F.lit(1)).over(by_id))
    )
    t_eff = threshold - 5e-7  # 6-dp rounding granularity of the final filter
    alpha = F.ceil(F.col("n") * F.lit(t_eff) - F.lit(1e-9))
    prefix = ranked.filter(F.col("rn") <= F.col("n") - alpha + 1).select(
        "id", "sh", "n"
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("b.n") >= F.col("a.n") * t_eff - 1e-9)
            & (F.col("a.n") >= F.col("b.n") * t_eff - 1e-9),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("id").alias("id_a"), "sh")
    sb = sh.select(F.col("id").alias("id_b"), "sh")
    common = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    stats = (
        common.join(
            sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a"
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b"
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if standalone:
        stats = stats.localCheckpoint(eager=True)
        sh.unpersist()
    return stats


def _pair_overlap_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    df_cap: int | None,
    shingle_rows: DataFrame | None,
    derive=None,
) -> DataFrame:
    """Shared scaffold of the exact set-overlap dedup measures:
    (id_a, id_b, common, na, nb) for every pair sharing ≥1 k-shingle —
    the shingle equi-join finds ALL such pairs, so any measure derived
    from intersection+sizes (Jaccard, containment, overlap coefficient)
    is exact on top of this. The shingle table feeds the sizes agg AND
    both self-join sides, so it is cached against triple recomputation;
    the registered queries pass the session-shared (already persisted)
    ``shingle_rows`` artifact, which makes this cache a reference to the
    shared copy rather than a second materialization."""
    sh = _doc_shingles(docs, id_col, text_col, k, df_cap, rows=shingle_rows).cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    stats = common.join(sa, "id_a").join(sb, "id_b")
    if derive is not None:
        # The caller's measure + threshold runs BEFORE any checkpoint so
        # the standalone path materializes only SURVIVING pairs, not the
        # full O(#overlapping-pairs) table the df_cap guard exists to
        # avoid blowing up.
        stats = derive(stats)
    if shingle_rows is None:
        # Standalone invocation: WE materialized the shingle cache, so
        # free it before returning (the exact_substring_spans pattern) —
        # eagerly checkpoint the much smaller (derived+filtered) result,
        # then unpersist. Callers passing the session-shared shingle_rows
        # keep their own persistence lifecycle.
        stats = stats.localCheckpoint(eager=True)
        sh.unpersist()
    return stats


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
    shingle_rows: DataFrame | None = None,
) -> DataFrame:
    """All pairs whose k-shingle CONTAINMENT max(|A∩B|/|A|, |A∩B|/|B|)
    ≥ threshold — the asymmetric near-dup measure (Broder's containment)
    that catches a short document quoted wholesale inside a much longer
    one, which symmetric Jaccard dilutes below any usable threshold
    (|A∩B|/(|A|+|B|−|A∩B|) → |A|/|B| for A ⊂ B).

    Same exact shingle equi-join shape as ngram_jaccard_pairs (shared
    scaffold ``_pair_overlap_stats``); only the final ratio differs.
    Returns (id_a, id_b, containment) rounded to 6 places for oracle
    hash parity."""
    def derive(stats: DataFrame) -> DataFrame:
        return (
            stats.withColumn(
                "containment",
                F.round(
                    F.col("common").cast("double") / F.least("na", "nb"), 6
                ),
            )
            .filter(F.col("containment") >= threshold)
            .select("id_a", "id_b", "containment")
        )

    cont = _pair_overlap_stats(
        docs, id_col, text_col, k, df_cap, shingle_rows, derive=derive
    )
    return cont.orderBy("id_a", "id_b")


def minhash_signature(text: Column, k: int, num_perm: int) -> Column:
    """array<long> MinHash signature: per permutation, min over shingles
    of the universal-hash family (signatures.minhash_perm_consts — one
    portable base hash, arithmetic permutations). Scan-only — no
    shuffle. Bit-identical to signatures.minhash_table."""
    from .signatures import MINHASH_P, minhash_perm_consts

    sh = F.array_distinct(shingles(tokens(text), k))
    base = F.transform(sh, lambda s: hash64(s) % MINHASH_P)

    def perm(a: int, b: int):
        # proper closure: default-arg tricks (lambda h, a=a, b=b) make a
        # 3-parameter function, which Spark rejects as a lambda arity
        return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P

    return F.array(
        *[
            F.array_min(F.transform(base, perm(a, b)))
            for a, b in minhash_perm_consts(num_perm)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.3,
    df_cap: int | None = None,
    shingle_rows: DataFrame | None = None,
) -> DataFrame:
    """MinHash→LSH candidates → exact-Jaccard verification.

    rows-per-band = num_perm/bands; a pair is a candidate iff some band's
    signature slice matches exactly. Verification recomputes true
    Jaccard **for candidate pairs only** (the candidate set is small; a
    full-corpus Jaccard join would defeat the LSH), so output ⊆
    ngram_jaccard_pairs — approximation affects recall only, never
    precision.

    ``shingle_rows``: optional pre-built persisted (id, sh) shingle
    table shared across queries (see plans.queries shared caches)."""
    from .signatures import doc_shingle_rows, minhash_table

    # ONE persisted raw shingle table feeds the sig build AND the
    # verification branches (sa/sb/sizes) — the Python shingle stage is
    # the expensive one, and each unshared plan branch would re-run it.
    raw_sh = shingle_rows
    if raw_sh is None:
        raw_sh = doc_shingle_rows(docs, id_col, text_col, k, distinct=True).persist()
    with_sig = minhash_table(docs, id_col, text_col, k, num_perm, shingle_rows=raw_sh)
    candidates = _band_candidates(with_sig, num_perm, bands)
    sh = _doc_shingles(docs, id_col, text_col, k, df_cap, rows=raw_sh)
    return _verify_candidates(candidates, sh, threshold).orderBy("id_a", "id_b")


def _band_key_sql(start: int, rows: int) -> str:
    """SQL for one band key: comma-joined signature slice."""
    elems = ", ".join(
        f"cast(sig[{start + r}] as string)" for r in range(rows)
    )
    return f"concat_ws(',', {elems})"


def _banded_keys(with_sig: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """(id, band, key) rows for one band geometry: the signature
    exploded into ``bands`` keys of num_perm/bands rows each.

    Built as ONE SQL string parsed JVM-side (same tree as the
    per-element Column form it replaces): the struct-per-band /
    element-per-slot Column construction cost one py4j round-trip per
    node — measured 0.65-0.8 s of driver wall per call for the sweep's
    28-struct variant — while a single ``F.expr`` parse is one call."""
    rows = num_perm // bands
    structs = ", ".join(
        f"named_struct('band', {b}, 'key', "
        f"{_band_key_sql(b * rows, rows)})"
        for b in range(bands)
    )
    return with_sig.select(
        "id", F.expr(f"explode(array({structs}))").alias("bk")
    ).select("id", "bk.band", "bk.key")


def _band_candidates(
    with_sig: DataFrame, num_perm: int, bands: int, banded: DataFrame | None = None
) -> DataFrame:
    """LSH candidate pairs for one band geometry — a pair is a
    candidate iff some band's signature slice matches exactly.
    Distinct (id_a < id_b) pairs. Pass a pre-persisted ``banded``
    (from _banded_keys) to control the cache lifetime yourself; left
    to its own devices this persists one (and the session keeps it —
    fine for the one-geometry pair pipeline, wrong for a sweep)."""
    if banded is None:
        # both sides of the band self-join read this; unpersisted, each
        # branch would redo the 16-permutation minhash transform
        banded = _banded_keys(with_sig, num_perm, bands).persist()
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _verify_candidates(
    candidates: DataFrame, sh: DataFrame, threshold: float,
    broadcast: bool = True,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs ONLY: join each
    side's shingle set through the candidate list — a full-corpus
    Jaccard join would defeat the LSH. At sane band geometries the
    candidate set is tiny and ``broadcast=True`` keeps the join
    shuffle-free; a DEGENERATE geometry (e.g. 1-row bands on a
    saturated-vocab corpus) can produce near-quadratic candidates, and
    the sweep passes broadcast=False there so the join shuffles on its
    keys instead of shipping the pair list to every executor."""
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    cands = F.broadcast(candidates) if broadcast else candidates
    sa = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("id").alias("cid_b"), F.col("sh").alias("sh_b"))
    common = (
        cands.join(sa, "id_a")
        .join(sb, (F.col("id_b") == F.col("cid_b")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_band_sweep(
    docs: DataFrame,
    geometries: tuple[int, ...] = (4, 8, 16),
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
    threshold: float = 0.3,
    shingle_rows: DataFrame | None = None,
) -> DataFrame:
    """The LSH scale path's QUALITY CONTRACT: one row per band geometry
    (bands, rows_per_band, n_candidates, n_pairs) so recall (n_pairs /
    exact-pair count, joined by the caller) and cost (n_candidates —
    every candidate pays one verification join row) are pinned TOGETHER
    for the same signatures. The S-curve says recall at threshold t
    rises with more, narrower bands (collision prob 1-(1-t^r)^b) while
    the candidate set — the verification bill — grows toward all
    bucket-mates; the sweep measures that trade on the actual corpus
    instead of trusting the curve.

    Execution: ONE minhash transform feeds ONE band-explode carrying
    every geometry (each (id, geometry, band, key) row), so a single
    self-join on (geometry, band, key) produces every geometry's
    candidate set together, one aggregation counts them per geometry,
    and the exact-Jaccard verification runs ONCE over the DISTINCT
    union of candidate pairs (per-geometry verified counts then come
    from the membership flags). The per-geometry loop it replaces ran
    3 band-joins + 3 verification joins + 6 counting jobs; total band
    -join work is unchanged (sum of band rows is the same), but each
    pair is verified once instead of once per geometry that found it —
    with nested slices (16 perms at 4/8/16 bands) the union equals the
    finest geometry's candidates, so the two coarser verification
    bills vanish outright."""
    from .signatures import doc_shingle_rows, minhash_table

    raw_sh = shingle_rows
    own_raw_sh = raw_sh is None  # unpersist internally-built caches only
    if raw_sh is None:
        raw_sh = doc_shingle_rows(docs, id_col, text_col, k, distinct=True).persist()
    with_sig = minhash_table(
        docs, id_col, text_col, k, num_perm, shingle_rows=raw_sh
    )
    sh = _doc_shingles(docs, id_col, text_col, k, None, rows=raw_sh)
    # one parsed SQL string, not per-element Columns — the 28-struct
    # Column form cost 0.65-0.8 s of pure py4j construction per call
    # (same fix as _banded_keys; job-breakdown showed it as the 1 s
    # driver gap before the sweep's first job)
    structs = ", ".join(
        f"named_struct('g', {bands}, 'band', {b}, 'key', "
        f"{_band_key_sql(b * (num_perm // bands), num_perm // bands)})"
        for bands in geometries
        for b in range(bands)
    )
    banded_all = with_sig.select(
        "id", F.expr(f"explode(array({structs}))").alias("bk")
    ).select("id", "bk.g", "bk.band", "bk.key").persist()
    a, b = banded_all.alias("a"), banded_all.alias("b")
    cand_flags = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.g").alias("g"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.collect_set("g").alias("gs"))
        .persist()
    )
    cand_counts = {
        int(r["g"]): int(r["n"])
        for r in cand_flags.select(
            F.explode("gs").alias("g")
        ).groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    verified = _verify_candidates(
        cand_flags.select("id_a", "id_b"),
        sh,
        threshold,
        broadcast=max(cand_counts.values(), default=0) <= 1_000_000,
    )
    pair_counts = {
        int(r["g"]): int(r["n"])
        for r in verified.join(cand_flags, ["id_a", "id_b"])
        .select(F.explode("gs").alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    cand_flags.unpersist()
    banded_all.unpersist()
    if own_raw_sh:
        raw_sh.unpersist()
    out = [
        (
            bands,
            num_perm // bands,
            cand_counts.get(bands, 0),
            pair_counts.get(bands, 0),
        )
        for bands in geometries
    ]
    spark = docs.sparkSession
    return spark.createDataFrame(
        out, "bands int, rows_per_band int, n_candidates long, n_pairs long"
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with 32-bit SimHash hamming distance ≤ max_hamming (≤3).

    Pigeonhole: split the signature into 4 8-bit chunks; hamming ≤ 3 ⇒
    at least one chunk identical — so candidates come from 4 equi-joins
    on (chunk_idx, chunk_value), never a cross join."""
    from .signatures import simhash_table

    assert max_hamming <= 3, "pigeonhole guarantee holds for ≤ 3 with 4 chunks"
    # persist: the signature pipeline (explode + md5 + 32 vote sums) feeds
    # BOTH sides of the self-join; unpersisted plan branches would run it
    # twice (measured ~2× on the whole query)
    sig = (
        simhash_table(docs, id_col, text_col)
        .withColumnRenamed("simhash", "sim")
        .persist()
    )
    chunks = sig.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright("sim", c * 8).bitwiseAND(F.lit(255)).alias("v"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("id", "sim", "ck.c", "ck.v")
    # The per-task join work is QUADRATIC in chunk-bucket occupancy while
    # the signature table is 16 B/doc: on a few-row-group corpus scan the
    # planner broadcasts one side and the whole candidate generation runs
    # on the SCAN's partition count (measured at sf1: one 56 s two-task
    # stage, flat from 8 to 32 cores). Spread the probe side round-robin
    # when the scan is under-partitioned — the exchange moves ~32 B/row
    # of signature chunks, nothing like the candidate volume it unlocks.
    # No-op on multi-split corpora (the 100 TB layout).
    spark = docs.sparkSession
    cpus = spark.sparkContext.defaultParallelism
    if sig.rdd.getNumPartitions() < max(2, cpus // 2):
        chunks = chunks.repartition(cpus)
    a, b = chunks.alias("a"), chunks.alias("b")
    # hamming filter runs BEFORE the dedup shuffle: a pair can match on
    # up to 4 chunks, so distinct() first would shuffle every duplicate
    # candidate; filtering map-side prunes ~all of them. The sides stay
    # unhinted: the signature table is 16 B/doc, so AQE broadcasts it at
    # test scale but falls back to a shuffle equi-join on (c, v) when a
    # billion-doc corpus outgrows the broadcast threshold.
    pairs = (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.expr("a.sim ^ b.sim")).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs.orderBy("id_a", "id_b")


def _normalized_vectors(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, nv): unit-normalized double vectors (zero-norm rows dropped).
    One fold per row; pair similarity then needs a single dot."""
    from ..functions.vectors import dot

    v = emb.select(
        F.col(id_col).alias("id"), to_double_array(F.col(vec_col)).alias("v")
    )
    withn = v.withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))
    return withn.filter(F.col("norm") > 0).select(
        "id", F.transform("v", lambda x: x / F.col("norm")).alias("nv")
    )


def embedding_cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    method: str = "expr",
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold. O(n²) by construction — the
    correctness baseline (LSH bucketing in similarity.knn_lsh is the
    recall-trading scale path).

    method='expr': GEMM candidate prefilter at threshold−1e-4 (numpy and
    the sequential fold agree to ~1e-12, so no exact-qualifying pair can
    be pruned), then the sequential-fold dot recomputed per candidate —
    output values bit-identical to the DuckDB oracle at candidate-set
    cost instead of all-pairs cost.
    method='gemm': block-tiled distributed numpy matrix product (see
    _cosine_pairs_gemm); float sum order differs from the fold in the
    last bits, so it is benched with a rows-level check rather than a
    value-hash oracle."""
    if method == "gemm":
        return _cosine_pairs_gemm(emb, id_col, vec_col, threshold)
    from ..functions.vectors import dot

    cands = _cosine_pairs_gemm(emb, id_col, vec_col, threshold - 1e-4).select(
        "id_a", "id_b"
    )
    nv = _normalized_vectors(emb, id_col, vec_col)
    a = nv.select(F.col("id").alias("id_a"), F.col("nv").alias("__nva"))
    b = nv.select(F.col("id").alias("id_b"), F.col("nv").alias("__nvb"))
    sim = F.round(dot(F.col("__nva"), F.col("__nvb")), 6)
    return (
        F.broadcast(cands)
        .join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def _cosine_pairs_gemm(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    num_blocks: int = 8,
    group_col: str | None = None,
) -> DataFrame:
    """Block-tiled distributed GEMM all-pairs: vectors are hashed into
    ``num_blocks`` blocks; each unordered block pair (p ≤ q) becomes one
    cogroup whose two sides are numpy-multiplied inside
    ``applyInPandas``. Fully lazy and distributed — NO driver-side
    collect or matrix broadcast, so the operator is bounded by executor
    memory (one block pair ≈ 2·(n/num_blocks) vectors), not the driver.
    Replication is num_blocks+1 copies of each row across block pairs;
    at cluster scale raise num_blocks so a block pair fits one task.

    ``group_col``: optional long-castable partition column (e.g. a
    k-means cluster id). Pairs are then produced only WITHIN each group
    — the cogroup key becomes (g, p, q) and the output gains a ``g``
    column. This is the SemDeDup shape: work drops from O(n²/B) to
    Σ_g O(n_g²/B) and every task stays bounded by its group's block
    pair, never the corpus.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = emb.sparkSession
    nb = int(num_blocks)
    gsel = (
        [F.col(group_col).cast("long").alias("g")] if group_col else []
    )
    v = emb.select(
        *gsel,
        F.col(id_col).cast("long").alias("id"),
        to_double_array(F.col(vec_col)).alias("v"),
        F.pmod(F.hash(F.col(id_col)), F.lit(nb)).cast("int").alias("bid"),
    )
    if group_col:
        # A NULL group id (e.g. an unmatched row from a join that
        # produced the cluster assignment) would form its own cogroup
        # key and int(key[0]) would raise inside the executor. No-group
        # rows can pair with nothing anyway — drop them up front.
        v = v.filter(F.col("g").isNotNull())
    bp = (
        spark.range(nb)
        .select(F.col("id").cast("int").alias("p"))
        .crossJoin(spark.range(nb).select(F.col("id").cast("int").alias("q")))
        .filter(F.col("p") <= F.col("q"))
    )
    gcols = ["g"] if group_col else []

    def side(tag: str, block_col: str) -> DataFrame:
        return (
            v.alias(f"v{tag}")
            .join(
                F.broadcast(bp.alias(f"bp{tag}")),
                F.col(f"v{tag}.bid") == F.col(f"bp{tag}.{block_col}"),
            )
            .select(
                *[F.col(f"v{tag}.{g}").alias(g) for g in gcols],
                F.col(f"bp{tag}.p").alias("p"),
                F.col(f"bp{tag}.q").alias("q"),
                F.col(f"v{tag}.id").alias("id"),
                F.col(f"v{tag}.v").alias("v"),
            )
        )

    left = side("l", "p")
    right = side("r", "q")

    gfields = [T.StructField("g", T.LongType())] if group_col else []
    schema = T.StructType(
        gfields
        + [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    gempty = {"g": np.array([], dtype=np.int64)} if group_col else {}
    empty = pd.DataFrame(
        {
            **gempty,
            "id_a": np.array([], dtype=np.int64),
            "id_b": np.array([], dtype=np.int64),
            "cosine": np.array([], dtype=np.float64),
        }
    )

    def mult(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty or rpdf.empty:
            return empty
        lids = lpdf["id"].to_numpy(dtype=np.int64)
        rids = rpdf["id"].to_numpy(dtype=np.int64)
        L = np.array(lpdf["v"].tolist(), dtype=np.float64)
        R = np.array(rpdf["v"].tolist(), dtype=np.float64)
        ln = np.linalg.norm(L, axis=1)
        rn = np.linalg.norm(R, axis=1)
        lids, L = lids[ln > 0], L[ln > 0] / ln[ln > 0, None]
        rids, R = rids[rn > 0], R[rn > 0] / rn[rn > 0, None]
        if len(lids) == 0 or len(rids) == 0:
            return empty
        sims = np.round(L @ R.T, 6)  # round-then-filter, like the expr path
        bi, bj = np.nonzero(sims >= threshold)
        gi, gj, sv = lids[bi], rids[bj], sims[bi, bj]
        # p == q: both sides hold the same block — keep the upper
        # triangle. p < q: blocks are disjoint (hash-partitioned), every
        # cross pair is unique — just orient it. (p, q) are the LAST two
        # key components; a group id, when present, leads.
        mask = gi < gj if int(key[-2]) == int(key[-1]) else gi != gj
        gi, gj, sv = gi[mask], gj[mask], sv[mask]
        out = {
            "id_a": np.minimum(gi, gj),
            "id_b": np.maximum(gi, gj),
            "cosine": sv,
        }
        if group_col:
            out = {"g": np.full(len(gi), int(key[0]), dtype=np.int64), **out}
        return pd.DataFrame(out)

    keys = gcols + ["p", "q"]
    out = (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(mult, schema)
    )
    order = (["g"] if group_col else []) + ["id_a", "id_b"]
    return out.orderBy(*order)


def exact_substring_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 5,
    min_run: int = 2,
    df_cap: int = 20,
) -> DataFrame:
    """Exact-substring duplicate spans between document pairs — the
    suffix-array dedup of Lee et al., "Deduplicating Training Data
    Makes Language Models Better" (2022), re-expressed as joins: two
    documents share a duplicated span iff they share a RUN of
    consecutive matching token w-grams (a run of r windows = an exact
    common substring of r + w − 1 tokens).

    Per pair: every matching (position_a, position_b) window lies on a
    diagonal (pos_a − pos_b constant); consecutive positions on one
    diagonal are one span. Runs are found per pair over the sorted
    (diag, pos) match list with a linear F.aggregate fold — ONE keyed
    shuffle (groupBy pair) instead of the window + two-groupBy
    gaps-and-islands chain this used through round 4; the per-pair
    match list is bounded by document length (each side's window count),
    the same bound the window variant's partitions had. No suffix
    array, no per-executor state, every step a keyed shuffle.

    Scale guards: windows join on xxhash64 of their content (narrow
    8-byte shuffle key, JVM-codegen — the hash never reaches the output,
    so the DuckDB oracle joins on the raw gram string instead; this is
    collision-free in practice at test scales, p ≈ n²/2⁶⁵, and at the
    1e12-gram design point a 64-bit collision can only ADD a spurious
    candidate match or merge two grams' document frequencies across the
    df_cap — the standard fingerprint-dedup trade, which the Lee et al.
    pipeline makes too; grade-scale runs are verified collision-free by
    the raw-string oracle itself); windows
    occurring more than ``df_cap`` times (boilerplate) are dropped
    before the pair join — the same explosion guard the shingle graph
    uses, kept as a partial-aggregating groupBy + semi-join because a
    count-over-window would put a hot gram's every occurrence in one
    task. Returns (id_a, id_b, n_matches, max_run, span_tokens) for
    pairs whose longest run ≥ ``min_run``.
    """
    t = tokens(F.col(text_col))
    win = F.when(
        F.size(t) >= w,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - w),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, w)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # The (tokenize → window → md5) projection is the expensive stage
    # and feeds THREE consumers: the df-cap aggregate and both sides of
    # the pair self-join. Persist it so the corpus is scanned/projected
    # once — without this the executed plan reads `docs` four times
    # (same hazard near_dup_pairs and dup_window_coverage guard against).
    grams = (
        docs.select(F.col(id_col).alias("id"), F.posexplode(win).alias("pos", "g"))
        .select("id", "pos", F.xxhash64("g").alias("gh"))
        .persist()
    )
    rare = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("gh")
    )
    g2 = grams.join(rare, "gh")
    a, b = g2.alias("a"), g2.alias("b")
    m = a.join(
        b, (F.col("a.gh") == F.col("b.gh")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.pos").alias("ia"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    # Runs per pair: sort the (diag, ia) matches — (diag, ia) is unique
    # per pair, so the sort is total — and fold once: consecutive ia on
    # the same diagonal extends the current run, anything else restarts
    # it. One shuffle + a JVM HOF replaces window + groupBy + groupBy.
    arr = F.sort_array(F.collect_list(F.struct(F.col("diag"), F.col("ia"))))
    init = F.struct(
        F.lit(0).alias("pd"), F.lit(-5).alias("pi"),
        F.lit(0).alias("cur"), F.lit(0).alias("mx"),
    )

    def step(acc, x):
        cur = F.when(
            (x["diag"] == acc["pd"]) & (x["ia"] == acc["pi"] + 1),
            acc["cur"] + 1,
        ).otherwise(F.lit(1))
        return F.struct(
            x["diag"].alias("pd"), x["ia"].alias("pi"),
            cur.alias("cur"), F.greatest(acc["mx"], cur).alias("mx"),
        )

    out = (
        m.groupBy("id_a", "id_b")
        .agg(arr.alias("arr"))
        .select(
            "id_a",
            "id_b",
            F.size("arr").cast("long").alias("n_matches"),
            F.aggregate(F.col("arr"), init, step, lambda s: s["mx"])
            .cast("int")
            .alias("max_run"),
        )
        .withColumn("span_tokens", (F.col("max_run") + (w - 1)).cast("int"))
        .filter(F.col("max_run") >= min_run)
        # materialize the small pair-level result NOW so the persisted
        # gram table can be released immediately (localCheckpoint blocks
        # are ContextCleaner-collected when `out` is GC'd — see
        # dup_window_coverage for the full rationale)
        .localCheckpoint(eager=True)
    )
    grams.unpersist()
    return out


def dup_window_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 5,
    df_cap: int = 20,
) -> DataFrame:
    """Per-document duplicated-window coverage — the RefinedWeb-style
    "fraction of tokens inside n-grams shared with another document"
    statistic that decides whether a doc is trimmed or dropped.

    A token position is COVERED when any w-gram window containing it
    also occurs in a different document (df-capped, like
    exact_substring_spans). Coverage = |union of covered positions| /
    n_tokens. All joins are keyed on the 64-bit window hash; position
    expansion is a bounded explode (w rows per matched window) followed
    by a distinct on (doc, position) — never an all-pairs scan.

    Returns (id, n_tokens, covered_tokens, coverage) for EVERY document
    (coverage 0.0 when nothing matches).

    Plan hygiene: the window-string projection (concat_ws over slices +
    xxhash64) is by far the expensive stage, and the gram table feeds BOTH
    the shared-window aggregate and the coverage join — it is persisted
    so the projection runs once, and the n_tokens side is derived from
    a cheap size(tokens) scan that never touches the window strings
    (an earlier draft recomputed the full projection on three branches:
    measured 10.8 s at sf0.1 vs ~4 s with this shape).
    """
    t = tokens(F.col(text_col))
    win = F.when(
        F.size(t) >= w,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - w),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, w)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select(
        F.col(id_col).alias("id"), F.size(t).cast("long").alias("n_tokens")
    )
    grams = (
        docs.select(F.col(id_col).alias("id"), F.posexplode(win).alias("pos", "g"))
        .select("id", "pos", F.xxhash64("g").alias("gh"))
        .persist()
    )
    # two-level agg (per (gh, id) first) instead of count+countDistinct
    # in one pass — avoids the Expand row duplication
    per_doc = grams.groupBy("gh", "id").agg(F.count(F.lit(1)).alias("c"))
    rare = (
        per_doc.groupBy("gh")
        .agg(F.sum("c").alias("df"), F.count(F.lit(1)).alias("ndocs"))
        .filter((F.col("df") <= df_cap) & (F.col("ndocs") >= 2))
        .select("gh")
    )
    # a window is shared iff its hash occurs in >= 2 documents (and
    # under the df cap); every occurrence of a shared window is covered
    shared = grams.join(rare, "gh")
    covered = (
        shared.select(
            "id", F.explode(F.sequence("pos", F.col("pos") + (w - 1))).alias("p")
        )
        .distinct()
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("covered_tokens"))
        # materialize the tiny (id, covered_tokens) aggregate NOW so the
        # gram table can be released immediately: a lazy return would pin
        # the persisted grams for the session (bench runs each query 3x
        # and the copies accumulate). localCheckpoint blocks are
        # ContextCleaner-collected when this DataFrame is GC'd, unlike a
        # CacheManager entry, so nothing leaks past the caller's use.
        .localCheckpoint(eager=True)
    )
    grams.unpersist()
    return (
        base.join(covered, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce("covered_tokens", F.lit(0)).cast("long").alias(
                "covered_tokens"
            ),
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.coalesce("covered_tokens", F.lit(0))
                    / F.col("n_tokens").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("coverage"),
        )
    )
