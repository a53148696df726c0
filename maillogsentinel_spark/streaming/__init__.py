from .ingest import start_ingest, streaming_daily_user_counts  # noqa: F401
