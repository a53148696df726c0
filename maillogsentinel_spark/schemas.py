"""Explicit schemas for every table the engine touches.

The reference keeps everything as untyped CSV strings
(reference: lib/maillogsentinel/parser.py:106-121 — 9 string columns).
We type internally (timestamps, longs) and only degrade to the
reference's string forms at byte-compat sinks.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The canonical mail-events fact table (reference CSV column order,
# parser.py:109-121). `date` is a real timestamp internally; the CSV
# sink formats it back to `dd/MM/yyyy HH:mm`.
MAIL_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("server", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("ip", T.StringType()),
        T.StructField("user", T.StringType()),
        T.StructField("hostname", T.StringType()),
        T.StructField("reverse_dns_status", T.StringType()),
        T.StructField("country_code", T.StringType()),
        T.StructField("asn", T.StringType()),
        T.StructField("aso", T.StringType()),
    ]
)

# CSV (byte-compat) header, in reference order.
MAIL_CSV_COLUMNS = [
    "server",
    "date",
    "ip",
    "user",
    "hostname",
    "reverse_dns_status",
    "country_code",
    "asn",
    "aso",
]

# GeoIP country dim (reference: bin/ipinfo.py:159-172 — csv columns
# start_ip,end_ip,country_code as uint32 bounds, inclusive both ends).
GEO_COUNTRY_SCHEMA = T.StructType(
    [
        T.StructField("start_ip", T.LongType(), False),
        T.StructField("end_ip", T.LongType(), False),
        T.StructField("country_code", T.StringType(), False),
    ]
)

# ASN/ASO dim (reference: bin/ipinfo.py:173-190).
GEO_ASN_SCHEMA = T.StructType(
    [
        T.StructField("start_ip", T.LongType(), False),
        T.StructField("end_ip", T.LongType(), False),
        T.StructField("asn", T.StringType(), False),
        T.StructField("aso", T.StringType(), False),
    ]
)

# Injectable reverse-DNS resolver table (reference tests mock the
# resolver the same way: tests/lib/maillogsentinel/test_parser.py:37-40).
RDNS_SCHEMA = T.StructType(
    [
        T.StructField("ip", T.StringType(), False),
        T.StructField("hostname", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)
