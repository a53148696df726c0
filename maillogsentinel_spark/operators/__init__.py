from .parse import parse_sasl_lines  # noqa: F401
from .range_join import range_join  # noqa: F401
from .rdns import enrich_rdns, resolver_from_table  # noqa: F401
