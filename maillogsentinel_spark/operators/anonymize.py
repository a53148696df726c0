"""Consistent pseudonymization — reference tools/log_anonymizer.py.

The reference walks a log file once, keeping per-kind mutable dicts
original→``anon_<kind>_<n>`` so the same value always maps to the same
token, with an ordered pattern table whose earlier entries claim their
span so later patterns cannot rewrite inside it
(log_anonymizer.py:17-137; claim logic log_anonymizer.py:226-503).
Its pattern mechanics, all reproduced here:

- ``group``: only the capture group's value is dictionary-encoded and
  replaced (e.g. ``sasl_username=(...)``, log_anonymizer.py:59-66);
- ``claim_full``: the WHOLE match span is claimed (protecting the
  surrounding context from later patterns) while only the group text is
  replaced — the server-name rule (log_anonymizer.py:46-58);
- ``email_parts``: ``local@domain`` splits into two dictionaries (user
  + hostname) so ``alice@mx1.example`` and ``mx1.example`` share the
  same hostname token (log_anonymizer.py:92-109);
- several patterns may FEED THE SAME dictionary (helo + fqdn both feed
  ``hostname``, log_anonymizer.py:110-124).

Spark-first, two phases sharing ONE claiming scan (SURVEY §2.10):

1. **Global dictionary build** — an Arrow ``mapInPandas`` pass runs the
   per-line claim resolution (priority order, span overlap checks) and
   emits only the *claimed* (kind, value, position) occurrences — so a
   value swallowed by a higher-priority rule never enters a
   lower-priority dictionary, exactly like the reference's sequential
   scan. Each kind's occurrences are then dictionary-encoded
   distributed-ly: first-seen order = min (line_id, priority, match
   position), ids via ``row_number``. One shuffle per kind on distinct
   values.
2. **Replacement** — the same claim resolution re-runs with the (small)
   dictionaries broadcast, substituting tokens. Same-value→same-token
   holds globally because the dictionaries are global — the property
   the reference gets from its single-threaded scan, kept at any
   parallelism.

Determinism requires a stable ``line_id`` (source order); callers
without one can use monotonically_increasing_id accepting
partition-order ids.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class PatternSpec:
    """One row of the ordered pattern table (priority = list position)."""

    kind: str  # dictionary this pattern feeds ("ip", "hostname", ...)
    regex: str
    group: int = 0  # capture group that is encoded + replaced
    claim_full: bool = False  # claim whole match, replace only the group
    email_parts: bool = False  # split group into local@domain → user/hostname


# Defaults mirror the reference table's kinds and order (ips first,
# context-claiming server rule, sasl usernames, subjects, emails split
# into parts, helo then generic FQDNs feeding one hostname dictionary).
DEFAULT_SPECS: list[PatternSpec] = [
    PatternSpec("ip", r"\b\d{1,3}(?:\.\d{1,3}){3}\b"),
    PatternSpec(
        "server",
        r"^\w{3}\s+\d{1,2}\s+\d{2}:\d{2}:\d{2}\s+(\S+)\s+\S+:",
        group=1,
        claim_full=True,
    ),
    PatternSpec("sasl_user", r"sasl_username=([^,;\s]+)", group=1),
    PatternSpec("subject", r"Subject: \"([^\"]*)\"", group=1),
    PatternSpec(
        "user",
        r"\b([a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,63})\b",
        group=1,
        email_parts=True,
    ),
    PatternSpec("hostname", r"helo=<([^>]+)>", group=1),
    PatternSpec(
        "hostname",
        r"\b((?:[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?\.)+[a-zA-Z]{2,63})\b",
        group=1,
    ),
]

# Back-compat: (kind, regex) tuples are accepted and treated as
# whole-match patterns.
LegacyPattern = tuple[str, str]


def _as_specs(patterns) -> list[PatternSpec]:
    return [
        PatternSpec(p[0], p[1]) if isinstance(p, tuple) else p for p in patterns
    ]


def _claim_scan(
    specs: list[PatternSpec],
) -> Callable[[str], list[tuple[int, PatternSpec, int, int, str]]]:
    """Shared per-line claim resolution: returns the claimed matches as
    (priority, spec, repl_start, repl_end, group_text), higher-priority
    spans shadowing later ones — the reference's scan order."""
    regs = [(prio, spec, re.compile(spec.regex)) for prio, spec in enumerate(specs)]

    def scan(line: str):
        claimed_spans: list[tuple[int, int]] = []
        out: list[tuple[int, PatternSpec, int, int, str]] = []
        for prio, spec, rx in regs:
            for m in rx.finditer(line):
                rs, re_ = m.span(spec.group)
                cs, ce = m.span(0) if spec.claim_full else (rs, re_)
                if any(cs < e and s < ce for s, e in claimed_spans):
                    continue
                claimed_spans.append((cs, ce))
                out.append((prio, spec, rs, re_, m.group(spec.group)))
        return out

    return scan


def build_dictionary(
    lines: DataFrame,
    kind: str,
    pattern: str,
    line_id_col: str = "line_id",
    value_col: str = "value",
) -> DataFrame:
    """(original, token) for ONE whole-match pattern, ids in global
    first-seen order — the single-pattern form used by the contract
    query; anonymize() builds multi-pattern claim-aware dictionaries."""
    occ = lines.select(
        F.col(line_id_col).alias("__lid"),
        F.lit(0).alias("__prio"),
        F.posexplode(
            F.regexp_extract_all(F.col(value_col), F.lit(pattern), 0)
        ).alias("__pos", "original"),
    )
    return _encode(occ, kind)


def _encode(occ: DataFrame, kind: str) -> DataFrame:
    first_seen = occ.groupBy("original").agg(
        F.min(F.struct("__lid", "__prio", "__pos")).alias("__first")
    )
    w = Window.orderBy("__first", "original")
    return first_seen.select(
        "original",
        F.concat(
            F.lit(f"anon_{kind}_"), F.row_number().over(w).cast("string")
        ).alias("token"),
    )


def _claimed_occurrences(
    lines: DataFrame, specs: list[PatternSpec], line_id_col: str, value_col: str
) -> DataFrame:
    """(kind, original, __lid, __prio, __pos) of claim-surviving matches
    only — one Arrow pass over the corpus for all patterns."""
    spec_list = list(specs)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scan = _claim_scan(spec_list)
        for pdf in batches:
            kinds, vals, lids, prios, poss = [], [], [], [], []
            for lid, line in zip(pdf[line_id_col], pdf[value_col]):
                if line is None:
                    continue
                for pos, (prio, spec, _, _, text) in enumerate(scan(line)):
                    if spec.email_parts and "@" in text:
                        local, _, domain = text.partition("@")
                        for kind2, val in (("user", local), ("hostname", domain)):
                            kinds.append(kind2)
                            vals.append(val)
                            lids.append(lid)
                            prios.append(prio)
                            poss.append(pos)
                    else:
                        kinds.append(spec.kind)
                        vals.append(text)
                        lids.append(lid)
                        prios.append(prio)
                        poss.append(pos)
            yield pd.DataFrame(
                {
                    "kind": kinds,
                    "original": vals,
                    "__lid": lids,
                    "__prio": prios,
                    "__pos": poss,
                }
            )

    return lines.select(line_id_col, value_col).mapInPandas(
        gen, "kind string, original string, __lid long, __prio int, __pos int"
    )


def anonymize(
    lines: DataFrame,
    patterns: list[PatternSpec] | list[LegacyPattern] | None = None,
    line_id_col: str = "line_id",
    value_col: str = "value",
) -> DataFrame:
    """Replace every claim-surviving match with its consistent token;
    earlier patterns claim their spans (a claimed span is never touched
    by a later pattern)."""
    specs = _as_specs(patterns) if patterns is not None else DEFAULT_SPECS
    spark = SparkSession.getActiveSession()

    occ = _claimed_occurrences(lines, specs, line_id_col, value_col).cache()
    kinds = [r["kind"] for r in occ.select("kind").distinct().collect()]
    dicts: dict[str, dict[str, str]] = {}
    for kind in kinds:
        d = _encode(occ.filter(F.col("kind") == kind), kind)
        dicts[kind] = {r["original"]: r["token"] for r in d.collect()}
    occ.unpersist()
    b_dicts = spark.sparkContext.broadcast(dicts)
    spec_list = list(specs)

    @F.pandas_udf(T.StringType())
    def replace_all(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        scan = _claim_scan(spec_list)
        mapping = b_dicts.value

        def token_for(spec: PatternSpec, text: str) -> str | None:
            if spec.email_parts and "@" in text:
                local, _, domain = text.partition("@")
                u = mapping.get("user", {}).get(local)
                h = mapping.get("hostname", {}).get(domain)
                return f"{u}@{h}" if u is not None and h is not None else None
            return mapping.get(spec.kind, {}).get(text)

        def one(line: str) -> str:
            if line is None:
                return None
            repl = [
                (rs, re_, token)
                for _, spec, rs, re_, text in scan(line)
                if (token := token_for(spec, text)) is not None
            ]
            out, last = [], 0
            for rs, re_, token in sorted(repl):
                out.append(line[last:rs])
                out.append(token)
                last = re_
            out.append(line[last:])
            return "".join(out)

        for batch in batches:
            yield batch.map(one)

    return lines.withColumn(value_col, replace_all(F.col(value_col)))
