"""Report aggregations — models the reference's golden fixture
(tests/lib/maillogsentinel/test_report.py:96-156): 4 rows, two identical
(user1, 1.1.1.1, host1, OK, US) today, one DNS_ERROR today, one other
date ⇒ total_today=3, top entry count=2, dns failures=1, store total=4."""

import datetime as dt

from maillogsentinel_spark.report.analyze import daily_report_stats
from maillogsentinel_spark.report.render import render_report
from maillogsentinel_spark.schemas import MAIL_EVENTS_SCHEMA

TODAY = dt.date(2025, 9, 28)


def _events(spark):
    t = dt.datetime(2025, 9, 28, 10, 0)
    other = dt.datetime(2025, 9, 27, 9, 0)
    rows = [
        ("srv", t, "1.1.1.1", "user1", "host1", "OK", "US", "1", "ISP1"),
        ("srv", t, "1.1.1.1", "user1", "host1", "OK", "US", "1", "ISP1"),
        ("srv", t, "2.2.2.2", "user2", "null", "Timeout", "N/A", "N/A", "N/A"),
        ("srv", other, "3.3.3.3", "user3", "host3", "OK", "FR", "2", "ISP2"),
    ]
    return spark.createDataFrame(rows, MAIL_EVENTS_SCHEMA)


def test_golden_stats(spark):
    stats = daily_report_stats(_events(spark), TODAY)
    assert stats["total_today"] == 3
    top = stats["top10_today"].collect()
    assert tuple(top[0]) == ("user1", "1.1.1.1", "host1", "US", 2)
    assert stats["total_rev_dns_failures"] == 1
    assert stats["total_events"] == 4
    errs = stats["rev_dns_error_counts"].collect()
    assert [(r[0], r[1]) for r in errs] == [("Timeout", 1)]


def test_render_smoke(spark):
    stats = daily_report_stats(_events(spark), TODAY)
    text = render_report(stats, TODAY, server_name="srv")
    assert "Total authentication failures today: 3" in text
    assert "user1" in text and "Timeout" in text
    assert text.endswith("\n")


def test_topk_tiebreak_deterministic(spark):
    stats = daily_report_stats(_events(spark), TODAY)
    # user2 vs others with count 1 → tie broken by key asc
    users = [tuple(r) for r in stats["top10_usernames"].collect()]
    assert users == [("user1", 2), ("user2", 1)]
