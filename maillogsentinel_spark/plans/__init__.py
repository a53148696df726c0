from .pipeline import build_events  # noqa: F401
