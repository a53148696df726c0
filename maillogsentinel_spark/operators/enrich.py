"""GeoIP enrichment composition — reference J1 + J3.

Two independent left range-joins (country dim, ASN dim), each side
independently defaulting to 'N/A' on a miss — mirrors
/root/reference/bin/ipinfo.py:309-339 (``lookup_ip_info``), where a
country hit and an ASN miss coexist (ipinfo.py:321-328).

Both dims are broadcast: the sapics/ip-location-db CSVs are a few
hundred-k ranges (~10 MB) — broadcasting keeps the 100 TB fact side
shuffle-free through both joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ip import ip_to_long
from .range_join import range_join

NA = "N/A"


def enrich_geo(
    events: DataFrame,
    geo_country: DataFrame,
    geo_asn: DataFrame,
    ip_col: str = "ip",
    strategy: str = "bucketed",
) -> DataFrame:
    """Add (country_code, asn, aso) with 'N/A' miss defaults."""
    with_long = events.withColumn("__ip_long", ip_to_long(F.col(ip_col)))

    step1 = range_join(
        with_long, "__ip_long", geo_country, strategy=strategy
    ).drop("start_ip", "end_ip")
    step1 = step1.withColumn("country_code", F.coalesce("country_code", F.lit(NA)))

    step2 = range_join(step1, "__ip_long", geo_asn, strategy=strategy).drop(
        "start_ip", "end_ip"
    )
    return (
        step2.withColumn("asn", F.coalesce("asn", F.lit(NA)))
        .withColumn("aso", F.coalesce("aso", F.lit(NA)))
        .drop("__ip_long")
    )
