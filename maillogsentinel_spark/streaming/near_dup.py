"""Streaming MinHash-LSH near-duplicate pre-filter.

Batch dedup (operators/dedup.py) assumes the corpus is at rest; a
continuously-ingesting training-data pipeline wants to flag a document
as a LIKELY duplicate the moment it arrives, before it lands in the
corpus store. This operator does the LSH half online:

- the MinHash signature is a pure scan-side expression
  (operators.dedup.minhash_signature — no state, no shuffle);
- each document explodes into its ``bands`` band-bucket keys, and the
  stream is keyed by (band, bucket). State per key is ONE value — the
  first document id that claimed the bucket (``applyInPandasWithState``,
  Arrow-batched, TTL-evicted) — so state size is bounded by (distinct
  buckets within the TTL horizon), never corpus size;
- any later document hashing into a claimed bucket is emitted as a
  CANDIDATE pair (first_id, dup_id, band). Exactly like the batch LSH,
  candidates are a superset of true near-dups: verification (exact
  Jaccard against the stored corpus) belongs downstream in a
  ``foreachBatch`` join, where it is a bounded keyed lookup.

Scale: the state store shards on the band-bucket hash — the same
partitioning a streaming agg would use; a hot bucket (boilerplate
shingles) self-limits because only its FIRST claim is stored, every
other arrival is emitted and forgotten. At 100 TB/day the candidate
stream is the LSH collision rate × ingest rate, orders of magnitude
below the ingest itself.

Reference parity note: the reference has no streaming or dedup surface
at all (file-level dedup only, sql_importer.py:251-277); this is part
of the beyond-reference LLM-pipeline extension (SURVEY §2 addendum).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .ttl import warn_if_unbounded

from ..operators.dedup import minhash_signature

_CAND_OUTPUT = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.StringType()),
        T.StructField("first_id", T.LongType()),
        T.StructField("dup_id", T.LongType()),
    ]
)

# one value per (band, bucket): the claiming doc id
_CAND_STATE = T.StructType([T.StructField("first_id", T.LongType())])


def streaming_near_dup_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """(band, bucket, first_id, dup_id) candidate rows for a streaming
    document source. Deterministic within a batch: the smallest id in a
    fresh bucket claims it, all other ids of the batch are emitted
    against the claimant. Parameters mirror the batch LSH defaults so a
    candidate here is a candidate there.

    ``state_ttl_ms=None`` (the DEFAULT — safe for every trigger)
    disables state eviction (GroupStateTimeout.NoTimeout). With
    ProcessingTimeTimeout registered, pending timers keep the query
    alive past the drained data, so an ``availableNow`` backfill NEVER
    terminates — defaulting to a TTL made the hang the default. A
    continuous production stream SHOULD pass a TTL (e.g. 3_600_000):
    unbounded buckets are the state-growth hazard there, and a
    continuous trigger is the one place the timers are harmless."""
    warn_if_unbounded("streaming_near_dup_candidates", state_ttl_ms)
    rows = num_perm // bands
    sig = minhash_signature(F.col(text_col), k, num_perm)
    banded = docs.select(
        F.col(id_col).cast("long").alias("id"), sig.alias("sig")
    ).select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[b * rows + r].cast("string")
                                for r in range(rows)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bucket")

    def update(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        first = state.get[0] if state.exists else None
        ids: list[int] = []
        for pdf in pdf_iter:
            ids.extend(int(x) for x in pdf["id"])
        if not ids:
            return
        ids.sort()
        if first is None:
            first = ids.pop(0)
        state.update((first,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        dups = [i for i in ids if i != first]
        if dups:
            yield pd.DataFrame(
                {
                    "band": [int(key[0])] * len(dups),
                    "bucket": [key[1]] * len(dups),
                    "first_id": [first] * len(dups),
                    "dup_id": dups,
                }
            )

    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        banded.groupBy("band", "bucket")
        .applyInPandasWithState(
            update,
            outputStructType=_CAND_OUTPUT,
            stateStructType=_CAND_STATE,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )


__all__ = ["streaming_near_dup_candidates"]
