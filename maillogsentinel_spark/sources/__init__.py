from .logs import read_logs  # noqa: F401
from .dims import load_geo_country, load_geo_asn  # noqa: F401
from .store import write_events, read_events, write_events_csv  # noqa: F401
