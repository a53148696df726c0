"""Differential parity: our Spark parser vs the REFERENCE parser on
randomized adversarial input (seeded — fully deterministic).

For every generated line both engines must agree on (a) whether the
line yields an event at all and (b) every output field. This covers the
drop semantics the golden-dataset test can't reach: garbled prefixes,
bad months/days, missing sasl_username, newline/CR injection, weird
spacing, multiple IPs per line.

Skips when /root/reference is not present (the repo stays standalone).
"""

import logging
import os
import random
import sys

import pytest

from maillogsentinel_spark.plans.pipeline import build_events

REF_LIB = "/root/reference/lib"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_LIB), reason="reference tree not available"
)


def _resolver(ip):
    last = int(ip.rsplit(".", 1)[1]) % 10
    if last == 0:
        return None, "Timeout"
    return f"host-{ip}.example.com", None


def _ref_resolver(ip, logger):
    return _resolver(ip)


def _gen_lines(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    months = ["Jan", "Feb", "Mar", "Xxx", "May", "janv", "Dec", "Sep"]
    users = ["alice", "bob@x.td", "we ird", "a,b", "x" * 40, ""]
    out = []
    for _ in range(n):
        month = rng.choice(months)
        day = rng.choice(["1", "09", "28", "31", "99", "7", "123"])
        time = rng.choice(["00:33:04", "23:59:59", "7:3:4", "aa:bb:cc", "10:00:00"])
        server = rng.choice(["srv", "mx-1.prod", "s"])
        ip = ".".join(str(rng.randint(0, 299)) for _ in range(4))
        user = rng.choice(users)
        kind = rng.random()
        if kind < 0.5:
            line = (
                f"{month} {day} {time} {server} postfix/smtpd[{rng.randint(1, 9999)}]: "
                f"warning: unknown[{ip}]: SASL LOGIN authentication failed, "
                f"sasl_username={user},"
            )
        elif kind < 0.7:
            line = f"{month} {day} {time} {server} postfix/qmgr[1]: {rng.randint(0, 999)}: removed"
        elif kind < 0.8:
            line = f"garbage {ip} sasl_username={user}"
        elif kind < 0.9:
            line = (
                f"{month}  {day}   {time}  {server}  noise [{ip}] second ip "
                f"{'.'.join(str(rng.randint(0, 255)) for _ in range(4))} "
                f"sasl_username={user}"
            )
        else:
            line = ""
        out.append(line)
    return out


@needs_reference
def test_differential_vs_reference_parser(spark):
    sys.path.insert(0, REF_LIB)
    from maillogsentinel.log_utils import _parse_log_line

    log = logging.getLogger("diffnull")
    log.addHandler(logging.NullHandler())

    lines = _gen_lines(seed=20260813, n=600)

    import datetime as dt

    def real_date(date_s: str) -> bool:
        # documented divergence (operators/parse.py): the reference never
        # calendar-validates the day ("99/01/2025" passes through as a
        # string); our typed timestamp drops impossible dates
        try:
            dt.datetime.strptime(date_s, "%d/%m/%Y %H:%M")
            return True
        except ValueError:
            return False

    expected = []
    for line in lines:
        r = _parse_log_line(line, 2025, log, None, _ref_resolver)
        if r and real_date(r["date_s"]):
            expected.append(
                (
                    r["server"],
                    r["date_s"],
                    r["ip"],
                    r["user"],
                    r["hostn"],
                    r["reverse_dns_status"],
                )
            )

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    got = [
        tuple(r)
        for r in build_events(df, 2025, _resolver)
        .select(
            "server",
            F.date_format("ts", "dd/MM/yyyy HH:mm").alias("date_s"),
            "ip",
            "user",
            "hostname",
            "reverse_dns_status",
        )
        .collect()
    ]
    assert sorted(got) == sorted(expected)
    assert len(expected) > 50  # the generator actually produced events
