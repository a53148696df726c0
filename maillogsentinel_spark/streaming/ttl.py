"""Shared state-TTL guard for the applyInPandasWithState operators.

The TTL default flipped to ``None`` (NoTimeout) in round 3 because
ProcessingTimeTimeout's pending timers make ``availableNow`` drains hang
forever. The flip traded one hazard for another: a CONTINUOUS production
stream running with the default now accumulates per-key state without
bound. Docstrings alone don't stop that, so every stateful operator
funnels through :func:`warn_if_unbounded` — a one-line, filterable
``UnboundedStateWarning`` that makes the trade visible at plan-build
time. (The trigger isn't known when the operator is built, so this
cannot be scoped to non-availableNow runs; drain/backfill callers can
silence it with ``warnings.filterwarnings``.)
"""

from __future__ import annotations

import warnings


class UnboundedStateWarning(UserWarning):
    """A stateful streaming operator was built with no state TTL."""


def warn_if_unbounded(op_name: str, state_ttl_ms: int | None) -> None:
    if state_ttl_ms is None:
        warnings.warn(
            f"{op_name}: state_ttl_ms=None keeps per-key state forever — "
            "correct for availableNow drains/backfills (a TTL would hang "
            "them), unbounded on a continuous trigger; pass a TTL there",
            UnboundedStateWarning,
            stacklevel=3,
        )
