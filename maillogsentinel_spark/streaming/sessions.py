"""Streaming session windows + custom stateful operators (§2.9
generalized; the reference has no session concept — its only implicit
window is the daily report bucket, reference report.py:152).

Two tiers, chosen per the engine's "builtins first" rule:

- ``streaming_sessions``: gap-based sessionization is expressible with
  Spark's built-in ``session_window`` — a first-class streaming agg
  with watermark-driven state eviction, fully JVM-side. This is the
  default path and the one that scales: state lives in the streaming
  aggregation state store, partitioned by grouping key.

- ``streaming_failure_streaks``: a semantics builtins can NOT express —
  emit an alert row *mid-session*, the moment a key's consecutive-
  failure streak crosses a threshold (a windowed agg only speaks at
  window close). Implemented with ``applyInPandasWithState``: Arrow-
  batched per-key state, processing-time TTL eviction so abandoned
  keys cannot accumulate state forever.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (resolved by pandas-UDF type hints)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_sessions(
    events: DataFrame,
    key_col: str = "user",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session aggregation over a streaming DataFrame.

    Built-in ``session_window``: sessions close when no event arrives
    for ``gap``; the watermark bounds state (sessions older than
    watermark are finalized and evicted). Emits one row per closed
    session in append mode — (key, session_start, session_end,
    n_events).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "key",
            F.col("sw").start.alias("session_start"),
            F.col("sw").end.alias("session_end"),
            "n_events",
        )
    )


_STREAK_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("streak", T.IntegerType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_STREAK_STATE = T.StructType(
    [
        T.StructField("streak", T.IntegerType()),
        T.StructField("last_ts_epoch", T.DoubleType()),
    ]
)


def streaming_failure_streaks(
    events: DataFrame,
    key_col: str = "ip",
    ts_col: str = "ts",
    threshold: int = 5,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Alert as soon as a key accumulates ``threshold`` consecutive
    failures (every input row is a failure event; interleave a reset
    stream upstream if needed).

    Custom stateful operator: per-key running streak in
    ``applyInPandasWithState`` — alerts must fire MID-stream, which no
    built-in windowed aggregation can do. State is two scalars per key
    (Arrow-batched, bounded by TTL), output mode "update".

    Emits one row per batch per key whose streak is ≥ threshold (with
    the current streak), so downstream sinks see the first crossing and
    subsequent growth.

    ``state_ttl_ms=None`` (the DEFAULT) → GroupStateTimeout.NoTimeout:
    required for ``availableNow`` drain runs, whose pending
    processing-time timers otherwise keep the query alive forever (see
    streaming.near_dup). Continuous production streams should pass a
    TTL to bound per-key state.
    """

    def update(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            streak, last_epoch = state.get
        else:
            streak, last_epoch = 0, 0.0
        n_new = 0
        max_epoch = last_epoch
        for pdf in pdf_iter:
            n_new += len(pdf)
            if len(pdf):
                e = pdf[ts_col].map(lambda t: t.timestamp()).max()
                max_epoch = max(max_epoch, float(e))
        streak += n_new
        state.update((streak, max_epoch))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if streak >= threshold and n_new > 0:
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "streak": [streak],
                    "last_ts": [pd.Timestamp(max_epoch, unit="s")],
                }
            )

    return (
        events.select(F.col(key_col).alias("key"), F.col(ts_col).alias(ts_col))
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=_STREAK_OUTPUT,
            stateStructType=_STREAK_STATE,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if state_ttl_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )


__all__ = ["streaming_sessions", "streaming_failure_streaks"]


_TWS_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("total_failures", T.LongType()),
        T.StructField("distinct_users", T.IntegerType()),
    ]
)


def streaming_spray_alerts(
    events: DataFrame,
    key_col: str = "ip",
    user_col: str = "user",
    threshold: int = 3,
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Password-spray detector on the NEWEST stateful API
    (``transformWithStateInPandas``, Spark 4): per source IP, keep the
    exact set of distinct usernames tried plus a running failure count,
    and emit an alert row whenever the batch pushes the distinct-user
    count across the threshold. Three upgrades over
    applyInPandasWithState (streaming_failure_streaks keeps that tier
    for comparison): typed composable state handles (ListState for the
    user set, ValueState for the counter) instead of one packed tuple,
    TTL enforced declaratively per state (``ttlDurationMs``) instead of
    hand-rolled timeout branches, and state schema evolution managed by
    the store. State size is bounded by distinct users per IP × TTL.

    Environment note: the API's state-server protocol imports
    google.protobuf at stream start; in containers without it (this
    one), use the applyInPandasWithState tier — the test is gated on
    the import accordingly."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ttl = state_ttl_ms

    class SprayProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._users = handle.getListState("users", "u string", ttl)
            self._cnt = handle.getValueState("cnt", "c long", ttl)

        def handleInputRows(self, key, rows, timerValues):
            seen = {r[0] for r in self._users.get()}
            before = len(seen)
            cnt = self._cnt.get()[0] if self._cnt.exists() else 0
            new_users = []
            for pdf in rows:
                cnt += len(pdf)
                for u in pdf[user_col]:
                    if u not in seen:
                        seen.add(u)
                        new_users.append((u,))
            if new_users:
                self._users.appendList(new_users)
            self._cnt.update((cnt,))
            if len(seen) >= threshold and before < threshold:
                yield pd.DataFrame(
                    {
                        "key": [key[0]],
                        "total_failures": [cnt],
                        "distinct_users": [len(seen)],
                    }
                )

        def close(self) -> None:
            pass

    return (
        events.groupBy(F.col(key_col))
        .transformWithStateInPandas(
            statefulProcessor=SprayProcessor(),
            outputStructType=_TWS_OUTPUT,
            outputMode="Append",
            timeMode="ProcessingTime",
        )
    )
