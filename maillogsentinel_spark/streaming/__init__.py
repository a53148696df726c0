from .ingest import start_ingest, streaming_daily_user_counts  # noqa: F401
from .near_dup import streaming_near_dup_candidates  # noqa: F401
from .sessions import (  # noqa: F401
    streaming_failure_streaks,
    streaming_sessions,
)
from .ttl import (  # noqa: F401
    UnboundedStateError,
    UnboundedStateWarning,
    has_unbounded_state,
    start_stateful,
)
