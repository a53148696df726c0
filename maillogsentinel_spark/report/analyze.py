"""Daily-report aggregations — reference A1–A10
(/root/reference/lib/maillogsentinel/report.py:60-218, one Python-dict
hash-agg pass over the whole CSV).

Spark shape: cache the day-filtered slice once, then run the small agg
queries against it. Each top-k is ``orderBy(count desc, key asc).limit(k)``
— Catalyst plans TakeOrderedAndProject (per-partition heaps + driver
merge), never a full sort. The deterministic secondary key replaces the
reference's Python stable-sort tie order (report.py:176-193), which
Spark cannot reproduce (SURVEY §2.4 caveat).

At scale the events store is partitioned by day (sources/store.py), so
the day filter is partition pruning, not a scan.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_counts(df: DataFrame, keys: list[str], k: int | None = 10) -> DataFrame:
    """group-by → count → deterministic top-k (count desc, keys asc)."""
    agg = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("count"))
    ordered = agg.orderBy(F.desc("count"), *[F.asc(c) for c in keys])
    return ordered.limit(k) if k else ordered


def daily_report_stats(
    events: DataFrame, report_date: dt.date | str, ts_col: str = "ts"
) -> dict:
    """All report aggregations for one day; returns dict of DataFrames
    plus scalar counts (collected — they are single numbers).

    ``report_date`` accepts a ``datetime.date`` or the reference's
    ``dd/mm/YYYY`` "today" string (report.py:263).

    Keys mirror report.py:97-108's stats dict.
    """
    if isinstance(report_date, str):
        report_date = dt.datetime.strptime(report_date, "%d/%m/%Y").date()
    day = events.filter(F.to_date(F.col(ts_col)) == F.lit(report_date)).cache()

    stats = {
        "total_today": day.count(),  # A1 (report.py:153)
        # A2 (report.py:155-156,176-178): group by (user, ip, hostname, country)
        "top10_today": top_counts(day, ["user", "ip", "hostname", "country_code"]),
        "top10_usernames": top_counts(day, ["user"]),  # A3
        "top10_countries": top_counts(day, ["country_code"]),  # A4
        "top10_aso": top_counts(day, ["aso"]),  # A5
        "top10_asn": top_counts(day, ["asn"]),  # A6
        # A7 (report.py:166-167)
        "total_rev_dns_failures": day.filter(
            F.col("reverse_dns_status") != "OK"
        ).count(),
        # A8 (report.py:168-169,191-193): unbounded, sorted
        "rev_dns_error_counts": top_counts(
            day.filter(F.col("reverse_dns_status") != "OK"),
            ["reverse_dns_status"],
            k=None,
        ),
        "total_events": events.count(),  # A9 (csv_lines, report.py:132)
    }
    return stats
