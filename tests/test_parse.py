"""Parse-semantics matrix — models the reference's parser tests
(tests/lib/maillogsentinel/test_log_utils.py:41-171, test_parser.py:21-113)."""

import datetime as dt

from maillogsentinel_spark.operators.parse import parse_sasl_lines

LINES = [
    # client= form (parsed)
    "Mar 15 10:00:00 server1 postfix/submission/smtpd[100]: client=unknown[1.1.1.1], sasl_method=PLAIN, sasl_username=user1@example.com",
    # warning/failure form (parsed)
    "Sep 28 00:33:04 srv postfix/smtps/smtpd[999544]: warning: unknown[119.207.78.191]: SASL LOGIN authentication failed: (reason unavailable), sasl_username=admin@domain.tld",
    # no sasl_username → dropped
    "Mar 15 10:00:00 server1 postfix/smtpd[1]: connect from unknown[2.2.2.2]",
    # garbled → dropped
    "This is not a log line.",
    # invalid month → dropped
    "XYZ 32 25:99:99 mail postfix/smtpd[1]: warning: unknown[3.3.3.3]: x, sasl_username=u",
    # single-digit day, two spaces → parsed, day zero-padded
    "Jun  1 00:00:45 mail postfix/smtpd[2]: warning: unknown[4.4.4.4]: SASL fail, sasl_username=bob",
]


def test_parse_matrix(spark):
    df = spark.createDataFrame([(line,) for line in LINES], ["value"])
    rows = {r["ip"]: r for r in parse_sasl_lines(df, year=2025).collect()}
    assert set(rows) == {"1.1.1.1", "119.207.78.191", "4.4.4.4"}
    r = rows["1.1.1.1"]
    assert r["server"] == "server1"
    assert r["user"] == "user1@example.com"
    assert r["ts"] == dt.datetime(2025, 3, 15, 10, 0)
    # seconds truncated (log_utils.py:95)
    assert rows["119.207.78.191"]["ts"] == dt.datetime(2025, 9, 28, 0, 33)
    # single-digit day zero-padded (log_utils.py:96)
    assert rows["4.4.4.4"]["ts"] == dt.datetime(2025, 6, 1, 0, 0)


def test_newline_in_username(spark):
    # log_utils.py:101 — CR/LF → space
    line = "Mar 15 10:00:00 s postfix/smtpd[1]: warning: unknown[5.5.5.5]: f, sasl_username=bad\ruser\n"
    df = spark.createDataFrame([(line,)], ["value"])
    [r] = parse_sasl_lines(df, year=2025).collect()
    assert r["user"] == "bad user"
