"""Byte-compatible report rendering (reference report.py:286-427).

The snapshot below was verified by eye against the reference's shipped
example (docs/dataset/sample_email_report_output.txt) and implements
the exact format rules of the reference code: boxed header sized to the
longest line +6, numbered rows with data-dependent column minima
(user≥4, ip≥2, hostname≥8, country≥2, count≥5), right-justified counts
with a " times" suffix, the per-category item-width floor taken from
the section title's third word, and the fixed footer lines.
"""

from maillogsentinel_spark.report.render import (
    collect_compat_stats,
    render_report_compat,
)

STATS = {
    "total_today": 6,
    "top10_today": [
        (("user@example.com", "1.2.3.4", "host.attacker.cn", "CN"), 5),
        (("bob", "10.0.0.1", "null", "N/A"), 1),
    ],
    "top10_usernames": [("user@example.com", 5), ("bob", 1)],
    "top10_countries": [("CN", 5), ("N/A", 1)],
    "top10_aso": [("CHINA UNICOM China169 Backbone", 5), ("N/A", 1)],
    "top10_asn": [("4837", 5), ("N/A", 1)],
    "total_rev_dns_failures": 1,
    "rev_dns_error_counts": [("Timeout", 1)],
    "csv_size_k_str": "241.1 KB",
    "csv_lines_str": "3613",
}

GOLDEN = """\
#############################################
### MailLogSentinel v1.0.5-A                ###
### Extraction interval : hourly            ###
### Report at 2025-05-28 10:30              ###
### Server: 192.168.1.10 (mail.example.com) ###
#############################################

Total attempts today: 6

Top 10 failed authentications today:
   1. user@example.com  1.2.3.4   host.attacker.cn  CN       5 times
   2. bob               10.0.0.1  null              N/A      1 times

Top 10 Usernames today:
   1. user@example.com      5 times
   2. bob                   1 times

Top 10 countries today:
   1. CN             5 times
   2. N/A            1 times

Top 10 ASO today:
   1. CHINA UNICOM China169 Backbone      5 times
   2. N/A                                 1 times

Top 10 ASN today:
   1. 4837      5 times
   2. N/A       1 times

--- Reverse DNS Lookup Failure Summary ---
Total failed reverse lookups today: 1
Breakdown by error type:
  Timeout : 1

Total CSV file size: 241.1 KB
Total CSV lines:     3613

Please see attached: maillogsentinel.csv

For more details and documentation, visit: https://github.com/monozoide/MailLogSentinel/blob/main/README.md
"""


def test_render_compat_snapshot():
    out = render_report_compat(
        STATS,
        script_name="MailLogSentinel",
        script_version="v1.0.5-A",
        extraction_freq="hourly",
        now_stamp="2025-05-28 10:30",
        ipaddr="192.168.1.10",
        fqdn="mail.example.com",
    )
    assert out == GOLDEN


def test_render_compat_empty_sections():
    empty = {
        "total_today": 0,
        "top10_today": [],
        "top10_usernames": [],
        "top10_countries": [],
        "top10_aso": [],
        "top10_asn": [],
        "total_rev_dns_failures": 0,
        "rev_dns_error_counts": [],
        "csv_size_k_str": "0.0 KB",
        "csv_lines_str": "0",
    }
    out = render_report_compat(
        empty, now_stamp="2025-01-01 00:00", ipaddr="1.1.1.1", fqdn="h"
    )
    assert "  (no entries for today)" in out
    assert "  (no specific username stats for today)" in out
    assert "  (no countries stats for today)" in out
    assert "  (no aso stats for today)" in out
    assert "  (no asn stats for today)" in out
    assert (
        "  (No reverse DNS lookup failures recorded for today or "
        "breakdown not available)" in out
    )


def test_end_to_end_compat_pipeline(spark):
    """events → daily_report_stats → compat adapter → renderer."""
    import datetime as dt

    from maillogsentinel_spark.report import daily_report_stats

    rows = [
        ("mx", dt.datetime(2025, 1, 10, 4, 5), "1.2.3.4", "alice", "h.example",
         "OK", "AU", "64496", "EX-NET"),
        ("mx", dt.datetime(2025, 1, 10, 5, 0), "1.2.3.4", "alice", "h.example",
         "OK", "AU", "64496", "EX-NET"),
        ("mx", dt.datetime(2025, 1, 10, 6, 0), "5.6.7.8", "bob", "null",
         "Timeout", "N/A", "N/A", "N/A"),
    ]
    ev = spark.createDataFrame(
        rows,
        "server string, ts timestamp, ip string, user string, hostname string,"
        "reverse_dns_status string, country_code string, asn string, aso string",
    )
    stats = daily_report_stats(ev, report_date="10/01/2025")
    out = render_report_compat(
        collect_compat_stats(stats),
        now_stamp="2025-01-10 23:59",
        ipaddr="10.0.0.1",
        fqdn="mx.example",
    )
    assert "Total attempts today: 3" in out
    assert "   1. alice  1.2.3.4  h.example  AU       2 times" in out
    assert "Total failed reverse lookups today: 1" in out
    assert "  Timeout : 1" in out
    assert "Total CSV lines:     3" in out
