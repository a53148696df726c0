"""Anonymizer invariants (reference log_anonymizer.py semantics):
same original → same token across the whole input; priority claiming;
first-seen id ordering."""

from maillogsentinel_spark.operators.anonymize import anonymize, build_dictionary

LINES = [
    (0, "connect from mail.example.com [1.2.3.4] user=bob@corp.io"),
    (1, "disconnect 1.2.3.4 again bob@corp.io done"),
    (2, "other host 5.6.7.8 and alice@corp.io"),
]


def _df(spark):
    return spark.createDataFrame(LINES, ["line_id", "value"])


def test_consistent_tokens(spark):
    out = {r["line_id"]: r["value"] for r in anonymize(_df(spark)).collect()}
    # same IP/email same token in lines 0 and 1
    assert "anon_ip_1" in out[0] and "anon_ip_1" in out[1]
    assert "anon_email_1" in out[0] and "anon_email_1" in out[1]
    # second distinct values get _2
    assert "anon_ip_2" in out[2] and "anon_email_2" in out[2]
    # no raw values remain
    assert "1.2.3.4" not in out[0] and "bob@corp.io" not in out[1]


def test_priority_email_over_fqdn(spark):
    # 'corp.io' inside the email must NOT be separately rewritten as fqdn
    out = {r["line_id"]: r["value"] for r in anonymize(_df(spark)).collect()}
    assert "anon_email_1" in out[0]
    assert "anon_fqdn" not in out[0].split("anon_email_1")[1][:10]
    # the standalone fqdn is rewritten
    assert "mail.example.com" not in out[0]


def test_first_seen_ordering(spark):
    d = build_dictionary(_df(spark), "ip", r"\b\d{1,3}(?:\.\d{1,3}){3}\b")
    got = {r["original"]: r["token"] for r in d.collect()}
    assert got == {"1.2.3.4": "anon_ip_1", "5.6.7.8": "anon_ip_2"}
