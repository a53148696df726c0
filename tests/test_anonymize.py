"""Anonymizer invariants (reference log_anonymizer.py semantics):
same original → same token across the whole input; priority claiming;
email local@domain splitting into shared dictionaries; claim_full
context protection; first-seen id ordering."""

from maillogsentinel_spark.operators.anonymize import (
    PatternSpec,
    anonymize,
    build_dictionary,
)

LINES = [
    (0, "connect from mail.example.com [1.2.3.4] user=bob@corp.io"),
    (1, "disconnect 1.2.3.4 again bob@corp.io done"),
    (2, "other host 5.6.7.8 and alice@corp.io"),
]


def _df(spark):
    return spark.createDataFrame(LINES, ["line_id", "value"])


def test_consistent_tokens(spark):
    out = {r["line_id"]: r["value"] for r in anonymize(_df(spark)).collect()}
    # same IP same token in lines 0 and 1
    assert "anon_ip_1" in out[0] and "anon_ip_1" in out[1]
    # email splits into local@domain parts (log_anonymizer.py:92-109);
    # bob keeps his token across lines, alice gets the next id, and both
    # share the same domain token
    assert "anon_user_1@anon_hostname_" in out[0]
    assert out[0].split("user=")[1] == out[1].split("again ")[1].split(" done")[0]
    assert "anon_user_2@" in out[2]
    dom0 = out[0].rsplit("@", 1)[1]
    assert out[2].rsplit("@", 1)[1] == dom0
    # second distinct ip gets _2; no raw values remain
    assert "anon_ip_2" in out[2]
    assert "1.2.3.4" not in out[0] and "bob@corp.io" not in out[1]


def test_priority_email_claims_span_over_fqdn(spark):
    out = {r["line_id"]: r["value"] for r in anonymize(_df(spark)).collect()}
    # 'corp.io' INSIDE the email is replaced as the email's domain part,
    # not re-matched by the standalone-FQDN pattern; the standalone fqdn
    # mail.example.com is rewritten by the fqdn rule into the SAME
    # hostname dictionary
    assert "corp.io" not in out[0]
    assert "mail.example.com" not in out[0]
    assert out[0].startswith("connect from anon_hostname_")


def test_claim_full_match_protects_context(spark):
    # the server rule claims its whole prefix match, so the fqdn/ip
    # patterns cannot rewrite inside the claimed syslog prefix, but the
    # server name itself is tokenized (log_anonymizer.py:46-58)
    lines = spark.createDataFrame(
        [
            (0, "Sep 28 00:33:04 mx1.prod postfix/smtpd[9]: connect from 1.2.3.4"),
            (1, "Sep 28 00:40:00 mx1.prod postfix/smtpd[9]: disconnect"),
        ],
        ["line_id", "value"],
    )
    out = {r["line_id"]: r["value"] for r in anonymize(lines).collect()}
    assert "mx1.prod" not in out[0]
    assert "anon_server_1" in out[0] and "anon_server_1" in out[1]
    # timestamp context survives untouched
    assert out[0].startswith("Sep 28 00:33:04 ")
    assert "anon_ip_1" in out[0]


def test_sasl_username_group_replacement(spark):
    lines = spark.createDataFrame(
        [(0, "warning: SASL LOGIN failed, sasl_username=admin@corp.io,")],
        ["line_id", "value"],
    )
    out = anonymize(lines).collect()[0]["value"]
    # group-scoped: only the value after sasl_username= is replaced
    assert "sasl_username=anon_sasl_user_1," in out


def test_legacy_tuple_patterns_still_work(spark):
    out = {
        r["line_id"]: r["value"]
        for r in anonymize(
            _df(spark), patterns=[("ip", r"\b\d{1,3}(?:\.\d{1,3}){3}\b")]
        ).collect()
    }
    assert "anon_ip_1" in out[0] and "anon_ip_2" in out[2]
    assert "bob@corp.io" in out[1]  # untouched by the single-pattern table


def test_first_seen_ordering(spark):
    d = build_dictionary(_df(spark), "ip", r"\b\d{1,3}(?:\.\d{1,3}){3}\b")
    got = {r["original"]: r["token"] for r in d.collect()}
    assert got == {"1.2.3.4": "anon_ip_1", "5.6.7.8": "anon_ip_2"}


def test_custom_spec_table(spark):
    specs = [
        PatternSpec("port", r"port (\d+)", group=1),
    ]
    lines = spark.createDataFrame(
        [(0, "listen on port 2525 ok"), (1, "port 2525 and port 99")],
        ["line_id", "value"],
    )
    out = {r["line_id"]: r["value"] for r in anonymize(lines, specs).collect()}
    assert out[0] == "listen on port anon_port_1 ok"
    assert out[1] == "port anon_port_1 and port anon_port_2"


def test_shadowed_values_never_enter_lower_dictionaries(spark):
    # mx1.prod is claimed by the server rule (higher priority); the fqdn
    # pattern must not see it, so the hostname dictionary starts at _1
    # with the genuinely standalone fqdn — id numbering matches the
    # reference's sequential claim-then-count scan
    lines = spark.createDataFrame(
        [
            (0, "Sep 28 00:33:04 mx1.prod postfix/smtpd[9]: from other.example.net"),
        ],
        ["line_id", "value"],
    )
    out = anonymize(lines).collect()[0]["value"]
    assert "anon_server_1" in out
    assert "anon_hostname_1" in out  # other.example.net, the only hostname
    assert "anon_hostname_2" not in out


def test_gate_forced_distributed_matches_exact(spark):
    # local_threshold=0 forces the range-partitioned rank (the 100 TB
    # path); output must be bit-identical to the exact-window path —
    # the connected_components(local_threshold=0) gate pattern.
    exact = {r["line_id"]: r["value"] for r in anonymize(_df(spark)).collect()}
    dist = {
        r["line_id"]: r["value"]
        for r in anonymize(_df(spark), local_threshold=0).collect()
    }
    assert dist == exact


def test_first_seen_rank_gate_both_ways(spark):
    from maillogsentinel_spark.operators.anonymize import first_seen_rank

    df = spark.createDataFrame(
        [(k, v) for k in ("a", "b") for v in range(200)], ["kind", "v"]
    )
    lo = first_seen_rank(df, ["v"], ["kind"], local_threshold=10**9)
    hi = first_seen_rank(df, ["v"], ["kind"], local_threshold=0)
    key = lambda rows: sorted((r["kind"], r["v"], r["__rank"]) for r in rows)
    assert key(lo.collect()) == key(hi.collect())
    # ranks are dense 1..200 per kind in both paths
    got = {(r["kind"], r["v"]): r["__rank"] for r in hi.collect()}
    assert all(got[(k, v)] == v + 1 for k in ("a", "b") for v in range(200))
