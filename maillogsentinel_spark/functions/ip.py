"""IPv4 ↔ uint32 expressions, pure JVM-side (whole-stage codegen).

The reference converts dotted-quad to int with
``int(ipaddress.ip_address(s))`` and returns ``None`` on parse failure
(reference: bin/ipinfo.py:33-41). We reproduce that as a Column
expression: no Python UDF, so it runs inside codegen at any scale.

DuckDB-oracle equivalent (used by __spark_entry__.oracle_sql):

    CASE WHEN regexp_matches(ip, '^\\d{1,3}(\\.\\d{1,3}){3}$')
          AND <each octet <= 255>
    THEN CAST(string_split(ip,'.')[1] AS BIGINT)*16777216 + ... END
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_IPV4_RE = r"^\d{1,3}(\.\d{1,3}){3}$"


def ip_to_long(ip: Column) -> Column:
    """Dotted-quad string → uint32 as LongType; NULL when invalid.

    Mirrors reference semantics: any non-IPv4 string (including octets
    > 255) yields NULL (bin/ipinfo.py:33-41 returns None → caller maps
    to 'N/A').
    """
    octets = F.transform(F.split(ip, r"\."), lambda s: s.cast("long"))
    valid = ip.rlike(_IPV4_RE) & F.forall(octets, lambda o: o <= 255)
    value = (
        octets[0] * F.lit(16777216)
        + octets[1] * F.lit(65536)
        + octets[2] * F.lit(256)
        + octets[3]
    )
    return F.when(valid, value)


def long_to_ip(v: Column) -> Column:
    """uint32 long → dotted-quad string (inverse of ip_to_long)."""
    return F.concat_ws(
        ".",
        (v.bitwiseAND(F.lit(4278190080)) / F.lit(16777216)).cast("long").cast("string"),
        (v.bitwiseAND(F.lit(16711680)) / F.lit(65536)).cast("long").cast("string"),
        (v.bitwiseAND(F.lit(65280)) / F.lit(256)).cast("long").cast("string"),
        v.bitwiseAND(F.lit(255)).cast("string"),
    )
