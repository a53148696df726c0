from .logs import read_logs  # noqa: F401
from .dims import load_geo_country, load_geo_asn  # noqa: F401
from .store import (  # noqa: F401
    read_events,
    write_bucketed,
    write_events,
    write_events_csv,
)
from .txstore import (  # noqa: F401
    tx_append_events,
    tx_clone,
    tx_compact_partitions,
    tx_delete_rewrite,
    tx_drop_column,
    tx_logical_schema,
    tx_optimize_zorder,
    tx_read_events,
    tx_rename_column,
    tx_update,
    tx_upsert_events,
    tx_vacuum,
    tx_write_events,
)
