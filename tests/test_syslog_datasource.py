"""Python DataSource end-to-end: plain + gzip files, per-file
partitions, stable (path, line_no) provenance, and integration with the
SASL parse operator."""

import gzip

from maillogsentinel_spark.sources.syslog_datasource import register

L1 = "Aug 12 06:57:01 srv1 postfix/smtpd[1]: warning: unknown[45.0.0.1]: SASL LOGIN authentication failed: x, sasl_username=a@x.com,"
L2 = "Aug 12 06:57:02 srv1 postfix/smtpd[1]: noise line without sasl"
L3 = "Aug 11 23:59:00 srv1 postfix/smtpd[9]: warning: unknown[45.0.0.2]: SASL LOGIN authentication failed: y, sasl_username=b@x.com,"


def test_syslog_source_reads_plain_and_gzip(spark, tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    (d / "mail.log").write_text(L1 + "\n" + L2 + "\n")
    with gzip.open(d / "mail.log.1.gz", "wt") as f:
        f.write(L3 + "\n")
    register(spark)
    df = spark.read.format("syslog").option("path", str(d)).load()
    rows = sorted(
        ((r["path"], r["line_no"], r["value"]) for r in df.collect())
    )
    assert len(rows) == 3
    # per-file line numbering, gzip transparently decoded
    assert rows[0][0].endswith("mail.log") and rows[0][1] == 0
    assert rows[1][1] == 1 and rows[1][2] == L2
    assert rows[2][0].endswith(".gz") and rows[2][2] == L3
    # one partition per file
    assert df.rdd.getNumPartitions() == 2
    # integrates with the parse operator downstream
    from maillogsentinel_spark.operators.parse import parse_sasl_lines

    parsed = parse_sasl_lines(df, year=2025)
    assert sorted(r["user"] for r in parsed.collect()) == ["a@x.com", "b@x.com"]
