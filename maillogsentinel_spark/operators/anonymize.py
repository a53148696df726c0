"""Consistent pseudonymization — reference tools/log_anonymizer.py.

The reference walks a log file once, keeping 7 mutable dicts
original→``anon_<kind>_<n>`` so the same value always maps to the same
token, with earlier (higher-priority) patterns claiming their span so
later patterns cannot rewrite inside it (log_anonymizer.py:17-137,
claim logic :226-503).

Spark-first, two phases (SURVEY §2.10):

1. **Global dictionary build** — for each pattern: extract all matches
   (``regexp_extract_all``), explode, aggregate first-seen position
   (min line_id, then match order), assign ids with ``row_number`` over
   that order. This is distributed dictionary encoding; the sequential
   file walk becomes one shuffle per pattern on the distinct values.
2. **Replacement** — per-line pure logic (span claiming is inherently
   imperative), applied as an Arrow-batched pandas UDF with the
   dictionaries broadcast. Same-value→same-token holds globally because
   the dictionaries are global.

Determinism requires a stable ``line_id`` (e.g. from the source order);
callers without one can zipWithIndex/monotonically_increasing_id as long
as they accept partition-order ids.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (kind, regex) in priority order — earlier patterns claim their spans
# first, like the reference's ordered pattern table.
DEFAULT_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ip", r"\b\d{1,3}(?:\.\d{1,3}){3}\b"),
    ("fqdn", r"\b[a-z0-9-]+(?:\.[a-z0-9-]+){2,}\b"),
    ("host", r"(?<=helo=<)[^>]+(?=>)"),
]


def build_dictionary(
    lines: DataFrame,
    kind: str,
    pattern: str,
    line_id_col: str = "line_id",
    value_col: str = "value",
) -> DataFrame:
    """(original, token) with ids assigned by global first-seen order."""
    matches = lines.select(
        F.col(line_id_col).alias("__lid"),
        F.posexplode(
            F.regexp_extract_all(F.col(value_col), F.lit(pattern), 0)
        ).alias("__pos", "original"),
    )
    first_seen = matches.groupBy("original").agg(
        F.min(F.struct("__lid", "__pos")).alias("__first")
    )
    w = Window.orderBy("__first", "original")
    return first_seen.select(
        "original",
        F.concat(F.lit(f"anon_{kind}_"), F.row_number().over(w).cast("string")).alias(
            "token"
        ),
    )


def anonymize(
    lines: DataFrame,
    patterns: list[tuple[str, str]] | None = None,
    line_id_col: str = "line_id",
    value_col: str = "value",
) -> DataFrame:
    """Replace every pattern match with its consistent token; earlier
    patterns claim their spans (a span already replaced is never touched
    by a later pattern)."""
    patterns = patterns or DEFAULT_PATTERNS
    spark = SparkSession.getActiveSession()

    dicts: dict[str, dict[str, str]] = {}
    for kind, pattern in patterns:
        d = build_dictionary(lines, kind, pattern, line_id_col, value_col)
        dicts[kind] = {r["original"]: r["token"] for r in d.collect()}
    b_dicts = spark.sparkContext.broadcast(dicts)
    compiled = [(kind, pattern) for kind, pattern in patterns]

    @F.pandas_udf(T.StringType())
    def replace_all(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        regs = [(kind, re.compile(p)) for kind, p in compiled]
        mapping = b_dicts.value

        def one(line: str) -> str:
            if line is None:
                return None
            claimed: list[tuple[int, int, str]] = []  # (start, end, token)
            for kind, rx in regs:
                for m in rx.finditer(line):
                    s, e = m.span()
                    # first (higher-priority) match claims the span
                    if any(s < ce and cs < e for cs, ce, _ in claimed):
                        continue
                    token = mapping[kind].get(m.group(0))
                    if token is not None:
                        claimed.append((s, e, token))
                    # patterns are processed in priority order, so
                    # overlap checks against `claimed` suffice
            out, last = [], 0
            for s, e, token in sorted(claimed):
                out.append(line[last:s])
                out.append(token)
                last = e
            out.append(line[last:])
            return "".join(out)

        for batch in batches:
            yield batch.map(one)

    return lines.withColumn(value_col, replace_all(F.col(value_col)))
