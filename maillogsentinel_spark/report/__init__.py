from .analyze import daily_report_stats  # noqa: F401
from .render import render_report  # noqa: F401
