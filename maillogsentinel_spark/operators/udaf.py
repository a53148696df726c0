"""Grouped pandas UDAF surface — SURVEY §2.10.

The reference has no UDAF extension point at all; the engine exposes
Spark's two grouped-Python forms as first-class API so user aggregations
slot into ordinary groupBy plans:

- ``GROUPED_AGG pandas_udf`` (``lower_median``): one scalar per group,
  usable inside ``groupBy(...).agg(...)`` next to built-ins.
- ``applyInPandas`` (``grouped_apply``): full per-group DataFrame →
  DataFrame transforms.

Scale notes: GROUPED_AGG buffers one group per Arrow batch on an
executor — same contract as Spark's builtin exact percentile, fine for
bounded groups; unbounded groups should use the distributed-selection
quantiles operator instead (operators/quantiles.py). Discrete selection
(an actual element, no interpolation) keeps results bit-identical to
DuckDB's ``quantile_disc``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, GroupedData
from pyspark.sql import functions as F


def lower_median(col) -> "F.Column":
    """Exact discrete lower median: sorted element at (n-1)//2 —
    DuckDB ``quantile_disc(x, 0.5)``'s convention. NULLs excluded.

    Built lazily (a module-level ``@pandas_udf`` would demand an active
    SparkSession at import). Note Spark does not allow GROUPED_AGG
    pandas UDFs in the same ``agg(...)`` as non-pandas aggregates —
    compute builtin aggs in a separate pass and join if both are
    needed."""

    @F.pandas_udf("double")
    def _lower_median(v: pd.Series) -> float:
        a = np.sort(v.dropna().to_numpy())
        if len(a) == 0:
            return None
        return float(a[(len(a) - 1) // 2])

    return _lower_median(col)


def grouped_apply(grouped: GroupedData, fn, schema) -> DataFrame:
    """Thin alias for ``applyInPandas`` so user grouped-map transforms
    go through the engine API (Arrow-batched, one group per call)."""
    return grouped.applyInPandas(fn, schema)


def register_bigram_udtf(spark, name: str = "bigrams"):
    """Python UDTF (Spark's table-function extension point, the third
    leg of the §2.10 surface next to GROUPED_AGG and applyInPandas):
    one (doc_id, text) row fans out to (doc_id, pos, bigram) rows via a
    SQL LATERAL join.

    UDTFs run row-at-a-time Python — this is the API-surface form for
    user extensions; the engine's own hot paths express the same
    fan-out with codegen split+posexplode (see dedup_segments_corpus)
    or Arrow mapInPandas. Returns the registered name for use as
    ``... FROM t, LATERAL <name>(doc_id, text)``."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, bigram string")
    class BigramUDTF:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield doc_id, i, toks[i] + " " + toks[i + 1]

    spark.udtf.register(name, BigramUDTF)
    return name


__all__ = ["lower_median", "grouped_apply", "register_bigram_udtf"]
