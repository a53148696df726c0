"""Exact distributed heavy hitters: Misra-Gries candidates + recount.

``groupBy(key).count()`` is exact but shuffles the FULL key
cardinality — at 100 TB with billions of distinct keys that shuffle is
the job. The classical fix keeps the result exact while shuffling
almost nothing (Misra & Gries 1982; mergeability per Agarwal et al.,
"Mergeable Summaries", PODS 2012):

pass 1 — per-partition capacity-k Misra-Gries summaries via
``mapInPandas`` (the legitimately-imperative per-partition case; the
Python cost is one vectorized ``value_counts`` per Arrow batch, never
per row). A batch's exact value_counts IS an error-free MG summary, so
batches merge into the partition summary by the add-then-subtract rule:
add counters, and when more than k survive, subtract the (k+1)-st
largest counter value from all and drop the non-positive ones. A key
whose global count exceeds N/(k+1) must exceed n_p/(k+1) in at least
one partition (pigeonhole over sum n_p = N), so the union of partition
summaries — at most k rows per partition — is a guaranteed superset of
every global heavy hitter.

pass 2 — broadcast the <= k*P candidate keys back onto the stream as a
left-semi join (a map-side filter; the stream itself never shuffles),
exact-count only the surviving rows (a keyed shuffle over <= k*P
distinct keys), and keep cnt*(k+1) > N. The threshold discards every
false candidate, so the output is bit-identical to the one-shuffle
``GROUP BY ... HAVING count(*)*(k+1) > N`` — which is exactly what the
DuckDB oracle runs (plans/queries.events_heavy_hitters_exact).

Reference parity: the reference's report aggregations are top-10
counts over a day's events (report.py:152 `_sum_by`); this operator is
the scale path for the same "who dominates" question when the key
domain itself is too large to shuffle.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(
    summary: Optional[pd.Series], batch_counts: pd.Series, k: int
) -> pd.Series:
    """Merge a batch's exact counts into a capacity-k MG summary.

    Add counters; if more than k remain, subtract the (k+1)-st largest
    value from every counter and drop the non-positive ones — at most k
    counters can be strictly larger than the (k+1)-st largest, so the
    capacity bound holds even under ties.
    """
    s = batch_counts if summary is None else summary.add(batch_counts, fill_value=0)
    if len(s) > k:
        kth = s.nlargest(k + 1).iloc[-1]
        s = s - kth
        s = s[s > 0]
    return s


def mg_candidates(keyed: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries survivor keys (<= k rows/partition).

    `keyed` must be a single-column DataFrame of non-null keys; the
    output has the same schema. Null keys would be dropped silently by
    pandas ``value_counts`` — filter them upstream so the contract is
    explicit.
    """
    schema = keyed.select(key_col).schema

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: Optional[pd.Series] = None
        for pdf in batches:
            if len(pdf):
                summary = _mg_merge(summary, pdf[key_col].value_counts(), k)
        if summary is not None and len(summary):
            yield pd.DataFrame({key_col: summary.index})

    return keyed.select(key_col).mapInPandas(part, schema)


def heavy_hitters_exact(
    df: DataFrame, key_col: str, k: int, total: Optional[int] = None
) -> Tuple[DataFrame, int]:
    """(hh, N): every key with exact count*(k+1) > N, and N itself.

    N (the non-null key count) is one projected single-column scan —
    the price of the classic two-pass algorithm; it is a bounded scalar
    (same posture as the report's max-day scalar). Pass ``total`` when
    the caller can count more cheaply than ``df`` itself (e.g. ``df``
    carries a repartition exchange the count doesn't need). The
    candidate ``distinct()`` shuffles <= k*P rows; the recount
    semi-join broadcasts the candidates, so the fact stream is
    filtered map-side and only candidate rows reach the final keyed
    agg.
    """
    keyed = df.select(key_col).where(F.col(key_col).isNotNull())
    n = keyed.count() if total is None else total
    cands = mg_candidates(keyed, key_col, k).distinct()
    hh = (
        keyed.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") * F.lit(k + 1) > F.lit(n))
    )
    return hh, n
