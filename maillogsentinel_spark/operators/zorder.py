"""Z-order (Morton) interleave for multi-dimensional data layout.

At 100 TB the cheapest scan is the one that never happens: parquet
row-group min/max stats prune a predicate only along the sort
dimension, so a store sorted by day answers day filters and nothing
else. Writing files in Z-VALUE order gives every file a tight
min/max box in ALL interleaved dimensions at once — a predicate on
either dimension (or both) skips most files. This module provides the
deterministic integer kernel for that writer: normalize each dimension
to a fixed bit budget over its observed [min, max], then interleave
the bits. Everything is integer arithmetic expressible identically in
Spark Column algebra and ANSI SQL, so the layout query's DuckDB oracle
re-derives the exact z-values and bucket boundaries
(plans/queries.events_zorder_layout pins all 2*bits interleave terms).

The normalize-then-interleave shape is the standard one (Bayer's UB-
tree lineage; Delta/Iceberg OPTIMIZE ZORDER does the same rank-or-
range normalization before interleaving). Range normalization is used
here because it needs only two scalars per dimension — rank
normalization would need a per-dimension global sort.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_normalize(col: Column, minv: int, maxv: int, bits: int = 16) -> Column:
    """Map an integer column from [minv, maxv] onto [0, 2^bits - 1]
    by exact integer scaling.

    Two arithmetic hazards rule out the naive `(col-min)*top/span`:
    (1) long/long `/` in Spark evaluates in DOUBLE, off-by-one once the
    numerator passes 2^53; (2) the `* top` multiply in int64 silently
    wraps (non-ANSI mode) once the span exceeds ~1.4e14 at 16 bits —
    e.g. epoch-micros spanning more than ~4.5 years, exactly the
    timestamp domains this module is for. The span is a plan-time
    scalar, so the plan picks the cheapest EXACT kernel: when
    span * top fits in int64, everything stays in long with Spark's
    integral `div` (pure whole-stage-codegen long ops — measured ~1.5×
    faster than the decimal path at sf1); for huge spans the multiply,
    remainder, and division run in decimal(38,0) (good to ~2^126).
    Both paths floor-divide exactly and match the DuckDB mirror's
    integer `//` bit-for-bit at any span. Inputs below ``minv``
    (out of contract) are clamped to the lower edge in BOTH kernels
    and in the SQL mirror, so the long path's truncating `div` and the
    floor-dividing decimal/DuckDB paths can never disagree on sign."""
    top = (1 << bits) - 1
    span = max(maxv - minv, 1)
    if span <= (2**63 - 1) // top:
        diff = F.greatest(col.cast("long") - F.lit(minv), F.lit(0))
        scaled = diff * F.lit(top)
        # IntegralDivide: exact long floor-division — operands are
        # non-negative after the clamp, so div == floor-div
        return F.call_function("div", scaled, F.lit(span))
    span_d = F.lit(span).cast("decimal(38,0)")
    diff = F.greatest(
        col.cast("decimal(38,0)") - F.lit(minv).cast("decimal(38,0)"),
        F.lit(0).cast("decimal(38,0)"),
    )
    scaled = diff * F.lit(top).cast("decimal(38,0)")
    exact = scaled - scaled % span_d
    return (exact / span_d).cast("long")


def sql_z_normalize(expr: str, minv: int, maxv: int, bits: int = 16) -> str:
    """DuckDB mirror of z_normalize: the multiply runs in HUGEINT
    (int128) so huge spans don't overflow DuckDB's checked int64
    either; the result is ≤ 2^bits - 1 so the BIGINT cast is safe."""
    top = (1 << bits) - 1
    span = max(maxv - minv, 1)
    return (
        f"CAST(GREATEST(CAST(({expr}) AS HUGEINT) - ({minv}), 0)"
        f" * {top} // {span} AS BIGINT)"
    )


def z_interleave(u: Column, v: Column, bits: int = 16) -> Column:
    """Morton code of two normalized ints: u's bit i lands at 2i+1,
    v's at 2i. A flat sum of shift/mask terms — one codegen'd
    expression, no UDF, no shuffle."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(u.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(v.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def sql_z_interleave(u: str, v: str, bits: int = 16) -> str:
    """DuckDB mirror of z_interleave over the same normalized ints."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({u}) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((({v}) >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def z_prefix_int(col: Column, nbytes: int = 7) -> Column:
    """Order-embedding int64 key for a STRING dimension: the first
    ``nbytes`` characters packed base-256 (7 chars × 8 bits = 56 bits,
    safely inside int64). Missing positions read 0 — the same
    pad-with-\\x00 rule parquet's truncated string stats use — and
    codepoints are clamped to 255, so multibyte characters stay
    DETERMINISTIC (identical on the Spark and DuckDB sides, which is
    what the oracle needs) even though only single-byte text keeps the
    strict order-embedding. For ASCII data the mapping is strictly
    monotone wrt string order, so a z-box over the packed key prunes
    string RANGES exactly like an integer dimension — what
    tx_optimize_zorder uses to cluster a store by a string column.
    Flat codegen'd arithmetic: no UDF, no shuffle."""
    total = F.lit(0).cast("long")
    for i in range(1, nbytes + 1):
        cp = F.least(
            F.coalesce(F.ascii(F.substring(col, i, 1)), F.lit(0)),
            F.lit(255),
        ).cast("long")
        total = total + cp * F.lit(256 ** (nbytes - i)).cast("long")
    return total


def sql_z_prefix_int(expr: str, nbytes: int = 7) -> str:
    """DuckDB mirror of z_prefix_int (ascii('') is 0 in DuckDB, so the
    short-string rule matches Spark's empty-substring behavior)."""
    terms = " + ".join(
        f"LEAST(COALESCE(ascii(substr({expr}, {i}, 1)), 0), 255)"
        f" * {256 ** (nbytes - i)}"
        for i in range(1, nbytes + 1)
    )
    return f"CAST({terms} AS BIGINT)"
