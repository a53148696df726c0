"""Z-order layout kernel (operators/zorder.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from maillogsentinel_spark.operators.zorder import z_interleave, z_normalize


def _morton_py(u: int, v: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((u >> i) & 1) << (2 * i + 1)
        z |= ((v >> i) & 1) << (2 * i)
    return z


def test_interleave_matches_python_reference(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (65535, 0), (0, 65535),
             (12345, 54321), (65535, 65535)]
    df = spark.createDataFrame(pairs, ["u", "v"])
    got = {
        (r["u"], r["v"]): r["z"]
        for r in df.select(
            "u", "v", z_interleave(F.col("u"), F.col("v")).alias("z")
        ).collect()
    }
    for u, v in pairs:
        assert got[(u, v)] == _morton_py(u, v), (u, v)


def test_normalize_bounds_and_degenerate_span(spark):
    df = spark.createDataFrame([(0,), (50,), (100,)], ["x"])
    vals = [
        r["n"]
        for r in df.select(z_normalize(F.col("x"), 0, 100).alias("n"))
        .orderBy("x")
        .collect()
    ]
    assert vals[0] == 0 and vals[-1] == 65535 and 0 < vals[1] < 65535
    # min == max must not divide by zero
    one = spark.createDataFrame([(5,)], ["x"]).select(
        z_normalize(F.col("x"), 5, 5).alias("n")
    )
    assert one.collect()[0]["n"] == 0


def test_normalize_exact_at_huge_spans(spark):
    """Long/long `/` in Spark evaluates in DOUBLE and goes off-by-one
    past 2^53 — the normalize must floor-divide EXACTLY for spans like
    epoch-micros or 64-bit ids (regression for the decimal-division
    fix; e.g. v*65535 = 27519*420410398235 rounds to 27518 in double)."""
    cases = [
        (27519 * 420410398235 // 65535 + 1, 420410398235),
        (10**12 - 1, 10**12),
        (123456789012, 999999999999),
    ]
    df = spark.createDataFrame(cases, ["v", "mx"])
    rows = df.collect()
    for v, mx in [(r["v"], r["mx"]) for r in rows]:
        got = (
            spark.range(1)
            .select(z_normalize(F.lit(v), 0, mx).alias("n"))
            .collect()[0]["n"]
        )
        assert got == (v * 65535) // mx, (v, mx)


def test_normalize_no_overflow_past_int64_multiply(spark):
    """The `(v - min) * 65535` multiply must not wrap in int64 once the
    span exceeds ~1.4e14 (2^63 / 65535) — e.g. epoch-micros spanning a
    DECADE, the module's own motivating domain (regression for the
    round-5 ADVICE finding: the division was decimal but the multiply
    still ran in long and silently wrapped in non-ANSI mode)."""
    decade_us = 10 * 365 * 24 * 3600 * 1_000_000  # ≈ 3.15e14 > 2^48
    base = 1_700_000_000_000_000  # a plausible epoch-micros origin
    cases = [
        (base, base, base + decade_us),
        (base + decade_us // 3, base, base + decade_us),
        (base + decade_us, base, base + decade_us),
        # span just past the wrap threshold, value near the top
        (2**48 - 1, 0, 2**48),
        # negative min with a huge span
        (5_000_000_000, -(2**47), 2**47),
    ]
    for v, lo, hi in cases:
        got = (
            spark.range(1)
            .select(z_normalize(F.lit(v), lo, hi).alias("n"))
            .collect()[0]["n"]
        )
        want = ((v - lo) * 65535) // (hi - lo)
        assert got == want, (v, lo, hi, got, want)
        assert 0 <= got <= 65535


def test_sql_normalize_mirror_matches_spark_at_huge_spans():
    """The DuckDB mirror (HUGEINT path) floor-divides identically to
    z_normalize's decimal path on the same huge-span inputs."""
    import duckdb

    from maillogsentinel_spark.operators.zorder import sql_z_normalize

    decade_us = 10 * 365 * 24 * 3600 * 1_000_000
    base = 1_700_000_000_000_000
    cases = [
        (base + decade_us // 3, base, base + decade_us),
        (2**48 - 1, 0, 2**48),
        (5_000_000_000, -(2**47), 2**47),
    ]
    con = duckdb.connect()
    for v, lo, hi in cases:
        expr = sql_z_normalize(str(v), lo, hi)
        got = con.execute(f"SELECT {expr}").fetchone()[0]
        assert got == ((v - lo) * 65535) // (hi - lo), (v, lo, hi)


def test_zorder_write_prunes_both_dims(spark, tmp_path):
    """Executed data-skipping evidence: write the same points as 16
    z-ordered files vs 16 u-sorted files; a selective box predicate on
    (u, v) must intersect the min/max stats of FEWER z-ordered files,
    and a v-only predicate must prune z-ordered files at all (u-sorted
    files can never prune on v)."""
    import glob

    pts = [(u, v) for u in range(64) for v in range(64)]
    df = spark.createDataFrame(pts, ["u", "v"])
    z = z_interleave(
        z_normalize(F.col("u"), 0, 63), z_normalize(F.col("v"), 0, 63)
    )

    zdir, udir = str(tmp_path / "zord"), str(tmp_path / "uord")
    df.withColumn("z", z).repartitionByRange(16, "z").drop("z") \
        .write.parquet(zdir)
    df.repartitionByRange(16, "u").write.parquet(udir)

    def files_hit(d, lo_u, hi_u, lo_v, hi_v):
        hit = 0
        for f in glob.glob(d + "/part-*.parquet"):
            stats = spark.read.parquet(f).agg(
                F.min("u"), F.max("u"), F.min("v"), F.max("v")
            ).collect()[0]
            if stats[0] <= hi_u and stats[1] >= lo_u \
                    and stats[2] <= hi_v and stats[3] >= lo_v:
                hit += 1
        return hit

    # 1/16th box in both dims: z-layout touches a handful of files
    assert files_hit(zdir, 0, 15, 0, 15) <= 4
    # v-only predicate: u-sorted layout reads EVERY file, z-layout skips
    assert files_hit(udir, 0, 63, 0, 15) == 16
    assert files_hit(zdir, 0, 63, 0, 15) <= 8


def test_zorder_buckets_shrink_both_dims(spark):
    # uniform grid: a z-bucket's box must be tight in BOTH dims, unlike
    # a row-order layout which is tight in at most one.
    pts = [(u, v) for u in range(32) for v in range(32)]
    df = spark.createDataFrame(pts, ["u", "v"])
    z = z_interleave(
        z_normalize(F.col("u"), 0, 31), z_normalize(F.col("v"), 0, 31)
    )
    boxes = (
        df.select("u", "v", F.shiftright(z, 26).alias("b"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.max("u") - F.min("u")).alias("us"),
            (F.max("v") - F.min("v")).alias("vs"),
        )
        .collect()
    )
    assert sum(r["n"] for r in boxes) == 1024
    assert len(boxes) == 64  # all top-6-bit buckets hit on a full grid
    # every bucket's box spans <= 1/4 of each dimension's full range
    assert all(r["us"] <= 8 and r["vs"] <= 8 for r in boxes)


def test_normalize_out_of_contract_inputs_clamp_consistently(spark):
    """Inputs below minv are OUT of z_normalize's contract; both Spark
    kernels and the DuckDB mirror must still agree (clamp to 0) rather
    than silently diverge — the long path's truncating `div` rounds
    toward zero while the decimal/HUGEINT paths floor (regression for
    the round-7 ADVICE finding)."""
    import duckdb

    from maillogsentinel_spark.operators.zorder import sql_z_normalize

    con = duckdb.connect()
    cases = [
        # (v, lo, hi): long kernel (small span) and decimal kernel (huge span)
        (-100, 0, 1000),                     # long path, v < minv
        (-1, 0, 2**48),                      # decimal path, v < minv
        (0, 5, 1000),                        # long path, just below
    ]
    for v, lo, hi in cases:
        got_spark = (
            spark.range(1)
            .select(z_normalize(F.lit(v), lo, hi).alias("n"))
            .collect()[0]["n"]
        )
        got_duck = con.execute(
            f"SELECT {sql_z_normalize(str(v), lo, hi)}"
        ).fetchone()[0]
        assert got_spark == got_duck == 0, (v, lo, hi, got_spark, got_duck)
