"""Syslog SASL-failure parsing (reference operators P1–P4).

Reference semantics (all in /root/reference/lib/maillogsentinel/log_utils.py):
- P1 syslog prefix  (log_utils.py:36-41):  ``^(Mon) (d|dd) (HH:MM:SS) (server)``
  — non-matching lines are dropped.
- P2 SASL predicate (log_utils.py:42,86-89): first IPv4 in the remainder
  followed (non-greedily) by ``sasl_username=<up-to-comma>`` — lines
  without it are dropped. This is THE selective predicate; it runs before
  any enrichment, and in Spark it is a codegen-side regexp filter that
  Catalyst keeps below the joins.
- P3 date synthesis (log_utils.py:21-34,92-96): month-abbr map + zero-pad
  day + HH:MM (seconds truncated) + an *injected* year (parser.py:97 uses
  wall clock; we take it as a parameter for reproducibility).
- P4 sanitization  (log_utils.py:100-101,109-111): strip; CR/LF → space in
  the username.

Everything is built-in expressions — one WholeStageCodegen span, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# P1 — syslog prefix. Groups: 1=month 2=day 3=HH:MM:SS 4=server 5=rest.
# (?s): Python's `.` matches \r (Java's default doesn't); lines may carry
# stray CRs (the reference test at test_log_utils.py:162 has one).
SYSLOG_RE = r"(?s)^([A-Z][a-z]{2})\s+(\d{1,2})\s+(\d{2}:\d{2}:\d{2})\s+(\S+)\s+(.*)$"
# P2 — SASL failure. Groups: 1=ip 2=user
SASL_RE = r"(?s)(\d{1,3}(?:\.\d{1,3}){3}).*?sasl_username=([^,]+)"

MONTHS = {
    "Jan": 1, "Feb": 2, "Mar": 3, "Apr": 4, "May": 5, "Jun": 6,
    "Jul": 7, "Aug": 8, "Sep": 9, "Oct": 10, "Nov": 11, "Dec": 12,
}


def month_num(mon: Column) -> Column:
    """Month abbreviation → number; NULL for unknown (drops the line,
    matching log_utils.py:92-94 returning None on a bad month)."""
    mapping = F.create_map(*[F.lit(x) for kv in MONTHS.items() for x in kv])
    return mapping[mon]


def parse_sasl_lines(lines: DataFrame, year: int, value_col: str = "value") -> DataFrame:
    """``value:string`` lines → (server, ts, ip, user).

    ``year`` is the injected wall-clock year (SURVEY §7 hard-part 3: never
    call now() inside an operator).
    """
    v = F.col(value_col)
    parsed = lines.select(
        F.regexp_extract(v, SYSLOG_RE, 1).alias("_mon"),
        F.regexp_extract(v, SYSLOG_RE, 2).alias("_day"),
        F.regexp_extract(v, SYSLOG_RE, 3).alias("_time"),
        F.regexp_extract(v, SYSLOG_RE, 4).alias("server"),
        F.regexp_extract(v, SYSLOG_RE, 5).alias("_rest"),
    )
    # P1 filter: regexp_extract yields '' on no-match.
    parsed = parsed.filter(F.col("_mon") != "")
    # P2 extract + filter on the remainder only (reference searches the
    # remainder after the prefix match, log_utils.py:86).
    parsed = parsed.select(
        "server",
        "_mon",
        "_day",
        "_time",
        F.regexp_extract("_rest", SASL_RE, 1).alias("ip"),
        F.regexp_extract("_rest", SASL_RE, 2).alias("_user_raw"),
    ).filter(F.col("ip") != "")

    # P3: dd/MM/yyyy HH:mm with injected year; seconds truncated
    # (log_utils.py:95 `time[:5]`). Invalid month/day → NULL ts → dropped.
    # try_to_timestamp, NOT to_timestamp: under ANSI (Spark 4 default) a
    # single malformed-but-prefix-valid line (e.g. unknown month, which
    # concat_ws silently skips as NULL) would otherwise abort the whole
    # job instead of dropping the line.
    # Documented divergence: the reference never calendar-validates the
    # day — `int(day)` then a plain format string (log_utils.py:94-96),
    # so it emits "99/01/2025" or "31/02/2025" events. We type ts as a
    # real timestamp, so impossible dates drop here (strictly more
    # correct; tests/test_parse_differential.py accounts for it).
    ts = F.try_to_timestamp(
        F.concat_ws(
            " ",
            F.concat_ws(
                "-",
                F.lit(str(year)),
                F.lpad(month_num(F.col("_mon")).cast("string"), 2, "0"),
                F.lpad(F.col("_day"), 2, "0"),
            ),
            F.substring("_time", 1, 5),
        ),
        F.lit("yyyy-MM-dd HH:mm"),
    )
    # P4: strip + CR/LF → space (log_utils.py:100-101).
    user = F.trim(F.regexp_replace("_user_raw", r"[\r\n]", " "))
    out = parsed.select(
        "server", ts.alias("ts"), "ip", user.alias("user")
    ).filter(F.col("ts").isNotNull())
    return out
