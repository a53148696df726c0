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

from .ttl import warn_if_unbounded


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

    warn_if_unbounded("streaming_failure_streaks", state_ttl_ms)

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


def _has_protobuf() -> bool:
    """transformWithStateInPandas' state-server protocol is protobuf
    over a local socket (pyspark/sql/streaming/proto/StateMessage_pb2);
    without google.protobuf the Python state server crashes at stream
    start with an opaque 'driver worker exited unexpectedly'. Probe the
    dependency up front so callers get a plan-time error instead."""
    import importlib.util

    try:
        # find_spec imports the parent package, so a missing `google`
        # namespace package raises instead of returning None
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def streaming_spray_alerts(
    events: DataFrame,
    key_col: str = "ip",
    user_col: str = "user",
    threshold: int = 3,
    state_ttl_ms: int | None = None,
    implementation: str = "auto",
) -> DataFrame:
    """Password-spray detector: per source IP, keep the exact set of
    distinct usernames tried plus a running failure count, and emit an
    alert row when (and only when) a batch pushes the distinct-user
    count across the threshold.

    Two interchangeable engines, selected by ``implementation``:

    - ``"tws"`` — ``transformWithStateInPandas`` (the newest Spark-4
      stateful API): typed composable state handles (ListState for the
      user set, ValueState for the counter), declarative per-state TTL.
      Its Python↔JVM state protocol REQUIRES google.protobuf; absent
      that, this raises ModuleNotFoundError at plan-build time (not an
      opaque stream crash at runtime).
    - ``"apiws"`` — ``applyInPandasWithState``: identical semantics and
      output schema, state packed as (array<string>, long), no extra
      dependency. ``state_ttl_ms=None`` (default) → NoTimeout, required
      for availableNow drains (pending processing-time timers otherwise
      keep the query alive forever — see streaming.near_dup).
    - ``"auto"`` (default) — "tws" when protobuf is importable, else
      "apiws". Both paths are covered by the same assertions in
      tests/test_streaming.py, so environments without protobuf still
      verify the operator's semantics end-to-end.
    """
    if implementation not in ("auto", "tws", "apiws"):
        raise ValueError(f"unknown implementation {implementation!r}")
    if implementation == "auto":
        implementation = "tws" if _has_protobuf() else "apiws"
    if implementation == "apiws":
        warn_if_unbounded("streaming_spray_alerts", state_ttl_ms)
        return _spray_alerts_apiws(events, key_col, user_col, threshold, state_ttl_ms)
    if not _has_protobuf():
        raise ModuleNotFoundError(
            "transformWithStateInPandas needs google.protobuf (its state "
            "protocol is protobuf-serialized); install protobuf or use "
            "implementation='apiws' — same semantics, no dependency"
        )
    # the tws engine is subject to the same continuous-trigger
    # state-growth hazard as the apiws tier — announce it identically
    warn_if_unbounded("streaming_spray_alerts", state_ttl_ms)
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


_SPRAY_STATE = T.StructType(
    [
        T.StructField("users", T.ArrayType(T.StringType())),
        T.StructField("cnt", T.LongType()),
    ]
)


def _spray_alerts_apiws(
    events: DataFrame,
    key_col: str,
    user_col: str,
    threshold: int,
    state_ttl_ms: int | None,
) -> DataFrame:
    """applyInPandasWithState engine for streaming_spray_alerts —
    bit-identical semantics to the transformWithStateInPandas path
    (same output schema, same crossing-only alert rule), state packed
    as one (array<string>, long) tuple instead of typed handles."""

    def update(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            users, cnt = state.get
            seen = set(users)
        else:
            seen, cnt = set(), 0
        before = len(seen)
        n_new = 0
        for pdf in pdf_iter:
            n_new += len(pdf)
            cnt += len(pdf)
            seen.update(pdf[user_col])
        state.update((sorted(seen), cnt))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if n_new and len(seen) >= threshold and before < threshold:
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "total_failures": [cnt],
                    "distinct_users": [len(seen)],
                }
            )

    return (
        events.select(
            F.col(key_col).alias("key"), F.col(user_col).alias(user_col)
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=_TWS_OUTPUT,
            stateStructType=_SPRAY_STATE,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if state_ttl_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )
