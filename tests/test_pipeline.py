"""End-to-end: raw lines → parse → rDNS → geo → events (SURVEY §3.1)."""

from pyspark.sql import functions as F

from maillogsentinel_spark.plans.pipeline import build_events
from maillogsentinel_spark.schemas import GEO_ASN_SCHEMA, GEO_COUNTRY_SCHEMA

LINES = [
    "Sep 28 00:33:04 srv postfix/smtps/smtpd[1]: warning: unknown[1.0.0.50]: SASL LOGIN authentication failed, sasl_username=admin@x.td",
    "Sep 28 00:34:04 srv postfix/smtps/smtpd[2]: warning: unknown[9.9.9.9]: SASL LOGIN authentication failed, sasl_username=root",
    "Sep 28 00:35:04 srv postfix/qmgr[3]: BEEF: removed",
]


def _resolver(ip):
    if ip == "1.0.0.50":
        return "fifty.example.net", None
    return None, "Timeout"


def test_full_pipeline(spark):
    lines = spark.createDataFrame([(line,) for line in LINES], ["value"])
    geo_c = spark.createDataFrame([(16777216, 16777471, "AU")], GEO_COUNTRY_SCHEMA)
    geo_a = spark.createDataFrame(
        [(16777216, 16777471, "13335", "CLOUDFLARENET")], GEO_ASN_SCHEMA
    )
    ev = build_events(lines, 2025, _resolver, geo_c, geo_a)
    rows = {r["ip"]: r for r in ev.collect()}
    assert set(rows) == {"1.0.0.50", "9.9.9.9"}
    hit = rows["1.0.0.50"]
    assert (hit["hostname"], hit["reverse_dns_status"]) == ("fifty.example.net", "OK")
    assert (hit["country_code"], hit["asn"], hit["aso"]) == ("AU", "13335", "CLOUDFLARENET")
    miss = rows["9.9.9.9"]
    assert (miss["hostname"], miss["reverse_dns_status"]) == ("null", "Timeout")
    assert (miss["country_code"], miss["asn"], miss["aso"]) == ("N/A", "N/A", "N/A")


def test_pipeline_without_geo(spark):
    lines = spark.createDataFrame([(LINES[0],)], ["value"])
    ev = build_events(lines, 2025, _resolver)
    [r] = ev.collect()
    assert r["country_code"] == "N/A"
    assert ev.columns == [
        "server", "ts", "ip", "user", "hostname",
        "reverse_dns_status", "country_code", "asn", "aso",
    ]


def test_filter_pushed_below_joins(spark):
    """The SASL regex filter must sit below both joins in the physical
    plan (Catalyst pushdown — SURVEY §4 row 1)."""
    lines = spark.createDataFrame([(LINES[0],)], ["value"])
    geo_c = spark.createDataFrame([(0, 10, "AA")], GEO_COUNTRY_SCHEMA)
    geo_a = spark.createDataFrame([(0, 10, "1", "A")], GEO_ASN_SCHEMA)
    ev = build_events(lines, 2025, _resolver, geo_c, geo_a)
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
