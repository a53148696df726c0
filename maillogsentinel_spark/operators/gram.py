"""Distributed Gram / covariance matrix over an embedding column.

The Gram matrix G = Xᵀ·X (d×d) is the primitive behind PCA whitening,
OPQ rotation training, and linear-probe fitting over embedding corpora:
the data is n×d with n potentially in the billions, but the result is
d×d and tiny. The scale-correct plan is map-side reduction — each Arrow
batch contributes a local ``Qᵀ·Q`` (one numpy GEMM), each partition
emits ONE set of d·(d+1)/2 upper-triangle partial sums, and a single
keyed aggregation over ``(i, j)`` merges them. Nothing proportional to
n is ever shuffled or collected: the shuffle volume is
``partitions × d²`` regardless of corpus size.

Arithmetic is integer (int8-quantized vectors → int64 sums), so the
result is exact and order-independent — bit-identical to a DuckDB
oracle that computes the same sums by unnesting pairs
(plans/queries.embedding_gram_int8). Overflow headroom: |q| ≤ 127 so
each product is ≤ 16 129; int64 holds ~5.7e14 such products per cell —
hundreds of trillions of rows.

Reference parity note: the reference engine has no linear-algebra
surface at all (SURVEY §2.8); this operator is part of the
LLM-pipeline extension family (BASELINE.json north star), not a port.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_upper_int(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Upper-triangle Gram entries ``(i, j, g)`` with ``i ≤ j``.

    ``df[vec_col]`` must be ``array<int>`` (or any integral element
    type) of fixed length ``dim``. Output is exactly
    ``dim·(dim+1)/2`` rows: ``g = Σ_rows v[i]·v[j]`` as int64.
    """
    import numpy as np

    iu = np.triu_indices(dim)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack(pdf["__v"].to_numpy()).astype(np.int64)
            acc += q.T @ q
            seen = True
        if seen:
            yield pd.DataFrame(
                {"i": iu[0].astype("int32"), "j": iu[1].astype("int32"),
                 "g": acc[iu]}
            )

    partials = df.select(F.col(vec_col).alias("__v")).mapInPandas(
        partial, "i int, j int, g long"
    )
    return partials.groupBy("i", "j").agg(F.sum("g").alias("g"))
