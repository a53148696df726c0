"""Shared state-TTL guard for the applyInPandasWithState operators.

The TTL default flipped to ``None`` (NoTimeout) in round 3 because
ProcessingTimeTimeout's pending timers make ``availableNow`` drains hang
forever. The flip traded one hazard for another: a CONTINUOUS production
stream running with the default now accumulates per-key state without
bound. Two guards close it:

* build time — every stateful operator funnels through
  :func:`warn_if_unbounded`, a one-line, filterable
  ``UnboundedStateWarning`` (the trigger isn't known yet, so a warning
  is the strongest honest signal there);
* start time — :func:`start_stateful` is the supported way to start a
  query over a stateful helper's output. It reads the timeout mode off
  the ANALYZED PLAN's stateful node (``NoTimeout`` vs
  ``ProcessingTimeTimeout`` on FlatMapGroupsInPandasWithState), so it
  needs no registry and covers arbitrary compositions; a continuous
  (processingTime) trigger over NoTimeout state RAISES
  ``UnboundedStateError`` unless the caller opts out explicitly with
  ``allow_unbounded_state=True``. availableNow drains are untouched.
"""

from __future__ import annotations

import warnings


import itertools

_STATEFUL_SEQ = itertools.count()


class UnboundedStateWarning(UserWarning):
    """A stateful streaming operator was built with no state TTL."""


class UnboundedStateError(RuntimeError):
    """A NoTimeout stateful plan was started on a continuous trigger
    without an explicit ``allow_unbounded_state=True`` opt-out."""


def warn_if_unbounded(op_name: str, state_ttl_ms: int | None) -> None:
    if state_ttl_ms is None:
        warnings.warn(
            f"{op_name}: state_ttl_ms=None keeps per-key state forever — "
            "correct for availableNow drains/backfills (a TTL would hang "
            "them), unbounded on a continuous trigger; pass a TTL there "
            "(or start via start_stateful, which enforces this)",
            UnboundedStateWarning,
            stacklevel=3,
        )


def has_unbounded_state(df) -> bool:
    """True when the DataFrame's analyzed plan contains a stateful
    (``...WithState``) node configured with ``NoTimeout`` — i.e. state
    that only ever grows unless the run is a bounded drain."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return any(
        "WithState" in ln and "NoTimeout" in ln for ln in plan.splitlines()
    )


def start_stateful(
    df,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    processing_time: str | None = None,
    output_mode: str = "update",
    sink_format: str = "memory",
    query_name: str | None = None,
    allow_unbounded_state: bool = False,
    **options,
):
    """Start a streaming query over a stateful helper's output with the
    unbounded-state contract ENFORCED instead of advised: a
    processingTime trigger over a NoTimeout stateful plan raises
    ``UnboundedStateError`` (per-key state would grow forever on a
    24/7 stream) unless ``allow_unbounded_state=True`` spells out that
    the key domain is known-bounded. availableNow drains — where
    NoTimeout is REQUIRED (pending timers hang the drain) — start
    unchanged, no warning, no raise."""
    if available_now and processing_time is not None:
        raise ValueError("pass available_now=True OR processing_time, not both")
    if not available_now and processing_time is None:
        raise ValueError("continuous runs must name their processingTime")
    if (
        not available_now
        and not allow_unbounded_state
        and has_unbounded_state(df)
    ):
        raise UnboundedStateError(
            "this plan keeps per-key state with NoTimeout; on a "
            f"processingTime trigger ({processing_time!r}) it grows "
            "without bound. Rebuild the operator with state_ttl_ms=..., "
            "or pass allow_unbounded_state=True if the key domain is "
            "provably bounded."
        )
    if query_name is None and sink_format == "memory":
        # the memory sink REQUIRES a query name; the documented default
        # invocation must not crash on it
        query_name = f"stateful_{next(_STATEFUL_SEQ)}"
    writer = (
        df.writeStream.outputMode(output_mode)
        .format(sink_format)
        .option("checkpointLocation", checkpoint_dir)
    )
    if query_name is not None:
        writer = writer.queryName(query_name)
    for k, v in options.items():
        writer = writer.option(k, v)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
