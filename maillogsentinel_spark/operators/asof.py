"""As-of (temporal) join — an operator the reference lacks but any
time-series log pipeline needs: for each left row, the most recent
right row with ``right_ts <= left_ts`` per key.

Spark has no built-in as-of join. The idiomatic scale-safe composition
(used here) is union-tag + one window pass:

  1. tag left rows side=1, right rows side=0, union on (key, ts, side)
  2. window PARTITION BY key ORDER BY (ts, side) carrying
     ``last(right_payload, ignorenulls=True)`` forward
  3. keep side=1 rows

Cost = ONE shuffle on the key (identical to a plain equi-join shuffle)
plus an in-partition sort — never the range-condition nested-loop a
naive ``left.join(right, key & (rts <= lts))`` + row_number would plan,
and no per-key skew beyond what the key distribution already has.
Sorting (ts, side) with right-before-left at equal ts makes the match
inclusive (``>=``), mirroring DuckDB ASOF / pandas ``merge_asof``
backward semantics.

Determinism caveat: if the right side has several rows per (key, ts)
the carried row is whichever sorts last — pre-aggregate the right side
to one row per (key, ts) for reproducible output (the contract query
does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``{right_ts}_asof`` and the
    payload of the latest right row with ``right_ts <= left_ts`` for the
    same key (nulls when no such row). Payload columns come back
    suffixed ``_asof``."""
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (key, right_ts)]
    carried_names = ["__asof_ts"] + [f"{c}_asof" for c in payload_cols]
    carried_src = [right_ts] + payload_cols

    lhs = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__row"),
        *[
            F.lit(None).cast(right.schema[src].dataType).alias(name)
            for src, name in zip(carried_src, carried_names)
        ],
    )
    rhs = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lhs.schema["__row"].dataType).alias("__row"),
        *[
            F.col(src).alias(name)
            for src, name in zip(carried_src, carried_names)
        ],
    )
    unioned = lhs.unionByName(rhs)

    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__side",
        "__row",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried_names],
    )
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        F.col("__asof_ts").alias(f"{right_ts}_asof"),
        *[F.col(f"{c}_asof") for c in payload_cols],
    )
