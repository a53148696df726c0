"""Range-join strategies cross-checked against each other and against
the reference's inclusive-bounds / miss semantics (ipinfo.py:217-238)."""

import pytest
from pyspark.sql import functions as F

from maillogsentinel_spark.functions.ip import ip_to_long, long_to_ip
from maillogsentinel_spark.operators.range_join import range_join
from maillogsentinel_spark.schemas import GEO_COUNTRY_SCHEMA


@pytest.fixture(scope="module")
def dim(spark):
    rows = [
        (0, 255, "AA"),
        (256, 65535, "BB"),
        (16777216, 16777471, "CC"),  # 1.0.0.0 - 1.0.0.255
        (3232235520, 3232301055, "DD"),  # 192.168.0.0/16
    ]
    return spark.createDataFrame(rows, GEO_COUNTRY_SCHEMA)


@pytest.fixture(scope="module")
def facts(spark):
    ips = [
        "0.0.0.0",      # boundary start AA
        "0.0.0.255",    # boundary end AA
        "0.0.1.0",      # BB
        "1.0.0.128",    # CC
        "9.9.9.9",      # gap → miss
        "192.168.44.3", # DD
    ]
    df = spark.createDataFrame([(ip,) for ip in ips], ["ip"])
    return df.withColumn("ip_long", ip_to_long(F.col("ip")))


EXPECTED = {
    "0.0.0.0": "AA",
    "0.0.0.255": "AA",
    "0.0.1.0": "BB",
    "1.0.0.128": "CC",
    "9.9.9.9": None,
    "192.168.44.3": "DD",
}


@pytest.mark.parametrize("strategy", ["bucketed", "bisect", "bnl"])
def test_strategies_agree(spark, dim, facts, strategy):
    out = range_join(facts, "ip_long", dim, strategy=strategy)
    got = {r["ip"]: r["country_code"] for r in out.collect()}
    assert got == EXPECTED


def test_ip_roundtrip(spark):
    df = spark.createDataFrame([("203.0.113.5",), ("255.255.255.255",)], ["ip"])
    out = df.select(long_to_ip(ip_to_long(F.col("ip"))).alias("rt"), "ip").collect()
    for r in out:
        assert r["rt"] == r["ip"]


def test_invalid_ip_is_null(spark):
    df = spark.createDataFrame(
        [("300.1.1.1",), ("not-an-ip",), ("1.2.3",), ("8.8.8.8",)], ["ip"]
    )
    got = {r["ip"]: r["v"] for r in df.select("ip", ip_to_long(F.col("ip")).alias("v")).collect()}
    assert got == {"300.1.1.1": None, "not-an-ip": None, "1.2.3": None, "8.8.8.8": 134744072}
