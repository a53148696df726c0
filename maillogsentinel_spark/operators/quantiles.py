"""Exact distributed quantiles (linear interpolation, type 7 / SQL
``percentile_cont`` semantics).

Spark's built-in exact ``percentile`` aggregate buffers EVERY value of a
group inside one aggregation buffer (partial maps merged onto a single
reducer per group) — fine at test scale, an OOM at the 100 TB design
point where one group can hold billions of rows. This operator instead
computes the same number via a distributed sort:

    sort by (group, value)  →  range-partitioned, fully parallel
    row_number / count      →  one WindowExec over that sort, no extra
                               shuffle
    pick the two bracketing rows per quantile, interpolate

Peak memory per task is one sort run (spillable), never a whole group.

Interpolation uses the exact expression shape ``lo + frac * (hi - lo)``
that both Spark's Percentile and DuckDB's quantile_cont use, so results
are bit-identical to the builtin (verified in tests and against the
DuckDB oracle).

Reference parity: the reference has no quantile operator at all
(report.py's aggregations are counts and top-k only); this is part of
the generalized analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: dict[str, float],
) -> DataFrame:
    """Per-group exact interpolated quantiles.

    ``quantiles`` maps output column name → q in [0, 1]. Returns one row
    per group with the quantile columns (double). NULL values in
    ``value_col`` are excluded, matching percentile_cont.
    """
    for name, q in quantiles.items():
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {name}={q} outside [0, 1]")

    src = df.select(*group_cols, F.col(value_col).alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    wg = Window.partitionBy(*group_cols)
    ws = wg.orderBy("_v")
    # row_number and count share the sort produced by one exchange; the
    # unordered count window reuses the same partitioning.
    ranked = src.select(
        *group_cols,
        "_v",
        (F.row_number().over(ws) - 1).alias("_rn"),
        F.count(F.lit(1)).over(wg).alias("_n"),
    )

    # A row survives if it brackets any requested quantile position:
    # pos_q = q*(n-1); keep rn == floor(pos_q) and rn == floor(pos_q)+1.
    keep = F.lit(False)
    for q in quantiles.values():
        pos = F.lit(q) * (F.col("_n") - 1)
        lo = F.floor(pos)
        keep = keep | (F.col("_rn") == lo) | (F.col("_rn") == lo + 1)
    picked = ranked.filter(keep)

    aggs = []
    for name, q in quantiles.items():
        pos = F.lit(q) * (F.col("_n") - 1)
        lo = F.floor(pos)
        vlo = F.max(F.when(F.col("_rn") == lo, F.col("_v"))).alias(f"_lo_{name}")
        vhi = F.max(F.when(F.col("_rn") == lo + 1, F.col("_v"))).alias(f"_hi_{name}")
        aggs += [vlo, vhi]
    out = picked.groupBy(*group_cols).agg(
        F.max("_n").alias("_n"), *aggs
    )
    proj = [F.col(c) for c in group_cols]
    for name, q in quantiles.items():
        pos = F.lit(q) * (F.col("_n") - 1).cast("double")
        frac = pos - F.floor(pos)
        vlo = F.col(f"_lo_{name}").cast("double")
        vhi = F.coalesce(F.col(f"_hi_{name}").cast("double"), vlo)
        # exact builtin/DuckDB expression shape: lo + frac * (hi - lo)
        proj.append((vlo + frac * (vhi - vlo)).alias(name))
    return out.select(*proj)


__all__ = ["exact_quantiles"]
