"""Driver-contract query registry.

Every operator from SURVEY §2 is exposed as a named query over the
driver's synthetic tables (/root/testdata/sf*/..), each paired with an
ANSI-SQL oracle that DuckDB executes on the same parquet — the driver
hash-compares both sides (CORRECTNESS_r{N}.json).

Parity rules that keep the hashes equal:
- **No raw double aggregation.** Sums go through DECIMAL(12,2) operands
  (exact, order-independent in both engines) and only the final value is
  cast to double — identical bits on both sides.
- **Deterministic ordering everywhere a LIMIT exists**: count desc then
  key asc (SURVEY §2.4 tie-break caveat).
- **Portable hashing only** (functions/hashing.py): md5-hex-prefix →
  int64, identical in Spark (conv) and DuckDB (hex cast).
- Synthesized mail-log inputs (ip, user, server) are pure arithmetic on
  events columns, reproduced verbatim in the oracle SQL.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ip import ip_to_long
from ..operators.parse import parse_sasl_lines
from ..operators.range_join import range_join
from ..operators.rdns import enrich_rdns

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

REF_YEAR = 2025
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (see session.py); truncate to
        # micros exactly as DuckDB does when casting ns → TIMESTAMP
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


# ---------------------------------------------------------------------------
# Synthesized mail-log derivation (shared by the mail-pipeline queries).
# Pure arithmetic over `events` so the DuckDB oracle can reproduce it
# exactly. 'click' events become non-SASL noise lines (exercise P2 drop).
# ---------------------------------------------------------------------------

# DuckDB fragments (1-indexed lists; `//` integer division)
_SQL_IP = ("(((user_id % 200) + 1))::VARCHAR || '.' || (event_id % 256)::VARCHAR"
           " || '.' || ((event_id // 256) % 256)::VARCHAR || '.' || (user_id % 256)::VARCHAR")
_SQL_IP_LONG = ("((user_id % 200) + 1) * 16777216 + (event_id % 256) * 65536"
                " + ((event_id // 256) % 256) * 256 + (user_id % 256)")
_SQL_USER = "'user' || user_id::VARCHAR || '@example.com'"
_SQL_SERVER = "'srv' || (user_id % 5)::VARCHAR"
_SQL_STATUS = ("CASE (user_id % 256) % 10 WHEN 0 THEN 'Timeout' WHEN 1 THEN 'ERRNO 1' "
               "WHEN 2 THEN 'Failed (Unknown)' ELSE 'OK' END")


def _synth_ip() -> F.Column:
    u, e = F.col("user_id"), F.col("event_id")
    return F.concat_ws(
        ".",
        ((u % 200) + 1).cast("string"),
        (e % 256).cast("string"),
        (F.expr("event_id div 256") % 256).cast("string"),
        (u % 256).cast("string"),
    )


def _mail_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → (raw syslog line, plus the ground-truth columns)."""
    ev = _t(spark, sf_dir, "events")
    month = F.element_at(F.array(*[F.lit(m) for m in _MONTHS]), F.month("ts"))
    time_s = F.date_format("ts", "HH:mm:ss")
    server = F.concat(F.lit("srv"), (F.col("user_id") % 5).cast("string"))
    user = F.concat(F.lit("user"), F.col("user_id").cast("string"), F.lit("@example.com"))
    sasl = F.format_string(
        "%s %d %s %s postfix/smtps/smtpd[%d]: warning: unknown[%s]: "
        "SASL LOGIN authentication failed: (reason unavailable), sasl_username=%s,",
        month, F.dayofmonth("ts"), time_s, server, F.col("event_id"), _synth_ip(), user,
    )
    noise = F.format_string(
        "%s %d %s %s postfix/qmgr[%d]: %d: removed",
        month, F.dayofmonth("ts"), time_s, server, F.col("event_id"), F.col("event_id"),
    )
    return ev.withColumn(
        "value", F.when(F.col("event_type") == "click", noise).otherwise(sasl)
    )


def mail_resolver(ip: str) -> tuple[str | None, str | None]:
    """Deterministic injectable resolver (keyed on last octet), mirrored
    by _SQL_STATUS in the oracles."""
    last = int(ip.rsplit(".", 1)[1]) % 10
    if last == 0:
        return None, "Timeout"
    if last == 1:
        return None, "ERRNO 1"
    if last == 2:
        return None, "Failed (Unknown)"
    return f"host-{ip}.example.com", None


def _geo_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → 25 non-overlapping ip_long ranges with ~29% gaps."""
    n = _t(spark, sf_dir, "nation")
    return n.select(
        (F.col("n_nationkey").cast("long") * 140000000).alias("range_start"),
        (F.col("n_nationkey").cast("long") * 140000000 + 99999999).alias("range_end"),
        F.col("n_name").alias("country"),
    )


_SQL_GEO_DIM = ("SELECT n_nationkey::BIGINT * 140000000 AS range_start, "
                "n_nationkey::BIGINT * 140000000 + 99999999 AS range_end, "
                "n_name AS country FROM nation")


# ---------------------------------------------------------------------------
# Mail pipeline queries (SURVEY §2.1-2.4)
# ---------------------------------------------------------------------------

@query(
    "sasl_parse",
    oracle=f"""
    SELECT {_SQL_SERVER} AS server,
           strftime(ts, '%d/%m/') || '{REF_YEAR} ' || strftime(ts, '%H:%M') AS date_s,
           {_SQL_IP} AS ip,
           {_SQL_USER} AS user_name
    FROM events WHERE event_type <> 'click'
    """,
)
def q_sasl_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P4 + S1: synthesize raw syslog lines from `events`, then parse
    them back with the real parse operator. Oracle computes the expected
    output directly from the ground-truth columns (roundtrip check)."""
    lines = _mail_events(spark, sf_dir).select("value")
    parsed = parse_sasl_lines(lines, year=REF_YEAR)
    return parsed.select(
        "server",
        F.date_format("ts", "dd/MM/yyyy HH:mm").alias("date_s"),
        "ip",
        F.col("user").alias("user_name"),
    )


@query(
    "geo_range_join",
    oracle=f"""
    WITH pts AS (SELECT {_SQL_IP_LONG} AS ip_long FROM events),
         dim AS ({_SQL_GEO_DIM})
    SELECT coalesce(dim.country, 'N/A') AS country, count(*) AS cnt
    FROM pts LEFT JOIN dim
      ON pts.ip_long >= dim.range_start AND pts.ip_long <= dim.range_end
    GROUP BY 1 ORDER BY country
    """,
)
def q_geo_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: bucketed broadcast interval join, inclusive bounds, miss→N/A."""
    ev = _t(spark, sf_dir, "events").select(ip_to_long(_synth_ip()).alias("ip_long"))
    dim = _geo_dim(spark, sf_dir)
    joined = range_join(ev, "ip_long", dim, start_col="range_start", end_col="range_end")
    return (
        joined.groupBy(F.coalesce("country", F.lit("N/A")).alias("country"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("country")
    )


@query(
    "rdns_status_counts",
    oracle=f"""
    SELECT {_SQL_STATUS} AS reverse_dns_status, count(*) AS cnt
    FROM events GROUP BY 1 ORDER BY reverse_dns_status
    """,
)
def q_rdns_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: distinct-ip mapPartitions resolution + broadcast join back.
    The injected resolver is deterministic so DuckDB can mirror it."""
    ev = _t(spark, sf_dir, "events").select(_synth_ip().alias("ip"))
    enriched = enrich_rdns(ev, mail_resolver)
    return (
        enriched.groupBy("reverse_dns_status")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("reverse_dns_status")
    )


@query(
    "mail_report_top10_today",
    oracle=f"""
    WITH ev AS (
      SELECT {_SQL_USER} AS user_name, {_SQL_IP} AS ip,
             {_SQL_IP_LONG} AS ip_long, {_SQL_STATUS} AS status, ts
      FROM events WHERE event_type <> 'click'
    ),
    today AS (
      SELECT * FROM ev
      WHERE date_trunc('day', ts) = (SELECT max(date_trunc('day', ts)) FROM ev)
    ),
    dim AS ({_SQL_GEO_DIM}),
    enr AS (
      SELECT t.user_name, t.ip,
             CASE WHEN t.status = 'OK' THEN 'host-' || t.ip || '.example.com'
                  ELSE 'null' END AS hostname,
             coalesce(dim.country, 'N/A') AS country
      FROM today t LEFT JOIN dim
        ON t.ip_long >= dim.range_start AND t.ip_long <= dim.range_end
    )
    SELECT user_name, ip, hostname, country, count(*) AS cnt
    FROM enr GROUP BY 1, 2, 3, 4
    ORDER BY cnt DESC, user_name, ip LIMIT 10
    """,
)
def q_mail_report_top10_today(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 over the full pipeline (SURVEY §3.1+§3.2): parse → rDNS → geo →
    day filter → top-10 with deterministic tie-break."""
    lines = _mail_events(spark, sf_dir).select("value")
    parsed = parse_sasl_lines(lines, year=REF_YEAR)
    withdns = enrich_rdns(parsed, mail_resolver)
    dim = _geo_dim(spark, sf_dir)
    geo = range_join(
        withdns.withColumn("ip_long", ip_to_long(F.col("ip"))),
        "ip_long", dim, start_col="range_start", end_col="range_end",
    ).withColumn("country", F.coalesce("country", F.lit("N/A")))
    maxday = geo.agg(F.max(F.to_date("ts")).alias("__maxday"))
    today = geo.join(F.broadcast(maxday), F.to_date("ts") == F.col("__maxday"))
    return (
        today.groupBy(
            F.col("user").alias("user_name"), "ip", "hostname", "country"
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "user_name", "ip")
        .limit(10)
    )


@query(
    "report_daily_totals",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS cnt, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1 ORDER BY day
    """,
)
def q_report_daily_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A9 generalized: per-day totals (the reference's total_today is
    one row of this; partition-pruned when the store is date-partitioned)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.countDistinct("user_id").alias("n_users"))
        .orderBy("day")
    )


@query(
    "top10_usernames",
    oracle=f"""
    SELECT {_SQL_USER} AS user_name, count(*) AS cnt
    FROM events WHERE event_type <> 'click'
    GROUP BY 1 ORDER BY cnt DESC, user_name LIMIT 10
    """,
)
def q_top10_usernames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: global top-k — TakeOrderedAndProject, not a full sort."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") != "click")
    user = F.concat(F.lit("user"), F.col("user_id").cast("string"), F.lit("@example.com"))
    return (
        ev.groupBy(user.alias("user_name"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "user_name")
        .limit(10)
    )


@query(
    "rev_dns_error_counts",
    oracle=f"""
    WITH s AS (SELECT {_SQL_STATUS} AS reverse_dns_status FROM events)
    SELECT reverse_dns_status, count(*) AS cnt FROM s
    WHERE reverse_dns_status <> 'OK'
    GROUP BY 1 ORDER BY cnt DESC, reverse_dns_status
    """,
)
def q_rev_dns_error_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A8: failure breakdown, unbounded sorted agg."""
    ev = _t(spark, sf_dir, "events").select(_synth_ip().alias("ip"))
    enriched = enrich_rdns(ev, mail_resolver)
    return (
        enriched.filter(F.col("reverse_dns_status") != "OK")
        .groupBy("reverse_dns_status")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "reverse_dns_status")
    )


@query(
    "json_props_agg",
    oracle="""
    SELECT event_type,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           count(*) AS cnt
    FROM events GROUP BY 1 ORDER BY event_type
    """,
)
def q_json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 json scalar functions: extract + integer aggs (exact)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.min(k).alias("min_k"),
             F.max(k).alias("max_k"), F.count(F.lit(1)).alias("cnt"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# TPC-H-style queries (generalized engine surface: equi-joins, hash aggs,
# top-k — absent from the reference but required of the Spark engine)
# ---------------------------------------------------------------------------

_DEC = "DECIMAL(12,2)"


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS {_DEC}) * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS {_DEC}) * (1 - CAST(l_discount AS {_DEC})) * (1 + CAST(l_tax AS {_DEC}))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS {_DEC})) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary. Decimal-exact sums (order-independent) cast to
    double only at the end — bit-identical to the oracle."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    tax = F.col("l_tax").cast(_DEC)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS {_DEC}) * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: selective dim side broadcast, big-side shuffle
    only on the join key; top-10 via TakeOrderedAndProject."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS {_DEC}) * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume: 6-way join; nation/region/supplier broadcast,
    lineitem⨝orders⨝customer shuffle on keys, AQE free to reorder."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supplier = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))
    joined = (
        li.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "tpch_q6",
    oracle=f"""
    SELECT CAST(sum(CAST(l_extendedprice AS {_DEC}) * CAST(l_discount AS {_DEC})) AS DOUBLE) AS revenue,
           count(*) AS cnt
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue: pure scan+filter+agg; predicates reach the
    parquet reader (PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC)
    return li.agg(
        F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("cnt")
    )


# ---------------------------------------------------------------------------
# Window / sessionization queries (§2.5, §2.9 generalized)
# ---------------------------------------------------------------------------

@query(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, sum(new_sess) AS n_sessions, count(*) AS n_events
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag window —
    the batch analogue of a streaming session window."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    # timestamp subtraction → microsecond-precise interval in both engines
    new_sess = F.when(
        lag_ts.isNull() | ((F.col("ts") - lag_ts) > F.expr("INTERVAL 30 MINUTE")), 1
    ).otherwise(0)
    flagged = ev.select("user_id", "ts", new_sess.alias("new_sess"))
    return (
        flagged.groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


@query(
    "per_user_topk_event_types",
    oracle="""
    SELECT user_id, event_type, cnt, rn FROM (
      SELECT user_id, event_type, count(*) AS cnt,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn <= 3 ORDER BY user_id, rn
    """,
)
def q_per_user_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: window row_number over a pre-agg (the generalized
    form of the reference's global top-10, SURVEY §2.5)."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.desc("cnt"), "event_type")
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("user_id", "rn")
    )
