"""Fixed-width text report renderer.

Re-implements the *shape* of the reference's email report
(/root/reference/lib/maillogsentinel/report.py:286-418 and the golden
example docs/dataset/sample_email_report_output.txt): data-dependent
column widths, ranked top-10 sections, failure breakdown, totals footer.
Pure driver-side Python over already-collected agg rows — rendering is
not a distributed concern.
"""

from __future__ import annotations

import datetime as dt


def _section(title: str, rows: list[tuple], headers: list[str]) -> list[str]:
    out = [title]
    if not rows:
        out.append("  (none)")
        return out
    str_rows = [[str(v) for v in r] for r in rows]
    widths = [
        max(len(h), *(len(r[i]) for r in str_rows)) for i, h in enumerate(headers)
    ]
    fmt = "  " + "  ".join(f"{{:<{w}}}" for w in widths)
    out.append(fmt.format(*headers))
    for r in str_rows:
        out.append(fmt.format(*r))
    return out


def render_report(
    stats: dict, report_date: dt.date | str, server_name: str = "mailserver"
) -> str:
    """stats: output of daily_report_stats with DataFrames collect()ed
    into lists of Rows (see report job in plans/pipeline.py).

    ``report_date`` accepts a ``datetime.date`` or the reference's
    ``dd/mm/YYYY`` string form (report.py:263)."""
    if isinstance(report_date, str):
        report_date = dt.datetime.strptime(report_date, "%d/%m/%Y").date()

    def rows(key):
        v = stats[key]
        return [tuple(r) for r in (v.collect() if hasattr(v, "collect") else v)]

    lines: list[str] = []
    lines.append(f"MailLogSentinel-Spark report for {server_name}")
    lines.append(f"Date: {report_date.strftime('%d/%m/%Y')}")
    lines.append("")
    lines.append(f"Total authentication failures today: {stats['total_today']}")
    lines.append("")
    lines += _section(
        "Top 10 failed authentications today (user, ip, hostname, country):",
        rows("top10_today"),
        ["user", "ip", "hostname", "country", "count"],
    )
    lines.append("")
    lines += _section("Top 10 usernames:", rows("top10_usernames"), ["user", "count"])
    lines.append("")
    lines += _section(
        "Top 10 countries:", rows("top10_countries"), ["country", "count"]
    )
    lines.append("")
    lines += _section("Top 10 ASO:", rows("top10_aso"), ["aso", "count"])
    lines.append("")
    lines += _section("Top 10 ASN:", rows("top10_asn"), ["asn", "count"])
    lines.append("")
    lines.append(
        f"Reverse DNS failures today: {stats['total_rev_dns_failures']}"
    )
    lines += _section(
        "Breakdown:", rows("rev_dns_error_counts"), ["status", "count"]
    )
    lines.append("")
    lines.append(f"Total events in store: {stats['total_events']}")
    return "\n".join(lines) + "\n"
