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
   emits only the *claimed* (kind, value, span) occurrences — so a
   value swallowed by a higher-priority rule never enters a
   lower-priority dictionary, exactly like the reference's sequential
   scan. Occurrences are dictionary-encoded distributed-ly: first-seen
   order = min (line_id, priority, match position), ids via a
   size-gated rank — a per-kind ``row_number`` window below
   ``local_threshold`` distinct values, and above it an exact
   range-partitioned rank (per-partition ``row_number`` + driver-side
   prefix-sum of the tiny per-partition counts), so no single task ever
   sorts the whole dictionary.
2. **Replacement** — fully join-based: the claimed (line, span)
   occurrences equi-join the dictionary on (kind, original) — AQE
   broadcasts the dict side when it is small, and falls back to a
   shuffle join when it is not, so there is no driver-side collect or
   broadcast variable anywhere on this path. Token splicing happens
   JVM-side with a sorted-span ``aggregate`` over each line's matches.
   Same-value→same-token holds globally because the dictionaries are
   global — the property the reference gets from its single-threaded
   scan, kept at any parallelism.

Like the reference's two passes over the file, the corpus is scanned
twice (once materialized for the dictionary build, once lazily for the
replacement join); the only materialized intermediate is the dictionary
itself (distinct values), localCheckpoint'ed on executors.

Determinism requires a stable ``line_id`` (source order); callers
without one can use monotonically_increasing_id accepting
partition-order ids.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


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
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """(original, token) for ONE whole-match pattern, ids in global
    first-seen order — the single-pattern form used by the contract
    query; anonymize() builds multi-pattern claim-aware dictionaries."""
    occ = lines.select(
        F.lit(kind).alias("kind"),
        F.col(line_id_col).alias("__lid"),
        F.lit(0).alias("__prio"),
        F.posexplode(
            F.regexp_extract_all(F.col(value_col), F.lit(pattern), 0)
        ).alias("__pos", "original"),
    )
    return _encode(occ, local_threshold=local_threshold).drop("kind")


def first_seen_rank(
    first_seen: DataFrame,
    order_cols: list[str],
    partition_cols: list[str] | None = None,
    local_threshold: int = 2_000_000,
    rank_col: str = "__rank",
    total: int | None = None,
) -> DataFrame:
    """Exact 1-based rank of each row by ``order_cols`` within
    ``partition_cols``, gated by size like graph.connected_components'
    local_threshold: below it, a plain window (single-task sort per
    partition key — fine for bounded dictionaries); above it, an exact
    range-partitioned rank — repartitionByRange on the order key, a
    per-range ``row_number``, and a driver-side prefix sum over the tiny
    (range, partition_key) count table. No single task ever holds the
    whole dictionary, so the rank survives 10⁸+ distinct values."""
    pcols = partition_cols or []
    n = total if total is not None else first_seen.count()
    if n <= local_threshold:
        w = Window.partitionBy(*pcols).orderBy(*order_cols) if pcols else (
            Window.orderBy(*order_cols)
        )
        return first_seen.withColumn(rank_col, F.row_number().over(w))

    spark = first_seen.sparkSession
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 32)
    ranged = first_seen.repartitionByRange(
        nparts, *pcols, *order_cols
    ).withColumn("__rpid", F.spark_partition_id())
    ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)
    counts = ranged.groupBy("__rpid", *pcols).count().collect()
    # Prefix-sum per partition key across ranges, in range order. The
    # collect is bounded by (#ranges × #partition keys) — tiny.
    counts.sort(key=lambda r: tuple(str(r[c]) for c in pcols) + (r["__rpid"],))
    offsets, running, cur_key = [], 0, None
    for r in counts:
        key = tuple(r[c] for c in pcols)
        if key != cur_key:
            cur_key, running = key, 0
        offsets.append(tuple(r[c] for c in pcols) + (r["__rpid"], running))
        running += r["count"]
    off_df = spark.createDataFrame(
        offsets, list(pcols) + ["__rpid", "__offset"]
    )
    w = Window.partitionBy("__rpid", *pcols).orderBy(*order_cols)
    out = (
        ranged.withColumn("__local", F.row_number().over(w))
        .join(F.broadcast(off_df), ["__rpid"] + list(pcols))
        .withColumn(rank_col, (F.col("__offset") + F.col("__local")).cast("int"))
        .drop("__rpid", "__local", "__offset")
    )
    out = out.localCheckpoint(eager=True)
    ranged.unpersist()
    return out


def _encode(occ: DataFrame, local_threshold: int = 2_000_000) -> DataFrame:
    """(kind, original) → token in exact global first-seen order."""
    first_seen = occ.groupBy("kind", "original").agg(
        F.min(F.struct("__lid", "__prio", "__pos")).alias("__first")
    )
    ranked = first_seen_rank(
        first_seen,
        order_cols=["__first", "original"],
        partition_cols=["kind"],
        local_threshold=local_threshold,
    )
    return ranked.select(
        "kind",
        "original",
        F.concat(
            F.lit("anon_"), F.col("kind"), F.lit("_"),
            F.col("__rank").cast("string"),
        ).alias("token"),
    )


def _claimed_occurrences(
    lines: DataFrame, specs: list[PatternSpec], line_id_col: str, value_col: str
) -> DataFrame:
    """(kind, original, __lid, __prio, __pos, __rs, __re) of
    claim-surviving matches only — one Arrow pass over the corpus for
    all patterns. ``__rs``/``__re`` are the 0-based replacement span;
    email_parts matches emit TWO rows (user local part, hostname
    domain) with sub-spans so the '@' stays literal between tokens."""
    spec_list = list(specs)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scan = _claim_scan(spec_list)
        for pdf in batches:
            rows: list[tuple] = []
            for lid, line in zip(pdf[line_id_col], pdf[value_col]):
                if line is None:
                    continue
                for pos, (prio, spec, rs, re_, text) in enumerate(scan(line)):
                    if spec.email_parts and "@" in text:
                        local, _, domain = text.partition("@")
                        rows.append(("user", local, lid, prio, pos, rs, rs + len(local)))
                        rows.append(
                            ("hostname", domain, lid, prio, pos, rs + len(local) + 1, re_)
                        )
                    else:
                        rows.append((spec.kind, text, lid, prio, pos, rs, re_))
            yield pd.DataFrame(
                rows,
                columns=["kind", "original", "__lid", "__prio", "__pos", "__rs", "__re"],
            )

    return lines.select(line_id_col, value_col).mapInPandas(
        gen,
        "kind string, original string, __lid long, __prio int, __pos int, "
        "__rs int, __re int",
    )


def _splice_expr(line: Column, spans: Column) -> Column:
    """JVM-side token splice: fold the sorted (rs, re, token) spans over
    the line, copying the unclaimed gaps verbatim. Spans are
    non-overlapping by construction (the claim scan enforces it)."""
    return F.aggregate(
        F.array_sort(spans),
        F.struct(F.lit(0).alias("last"), F.lit("").alias("out")),
        lambda acc, s: F.struct(
            s["re"].alias("last"),
            F.concat(
                acc["out"],
                line.substr(acc["last"] + 1, s["rs"] - acc["last"]),
                s["token"],
            ).alias("out"),
        ),
        lambda acc: F.concat(acc["out"], line.substr(acc["last"] + 1, F.length(line))),
    )


def anonymize(
    lines: DataFrame,
    patterns: list[PatternSpec] | list[LegacyPattern] | None = None,
    line_id_col: str = "line_id",
    value_col: str = "value",
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Replace every claim-surviving match with its consistent token;
    earlier patterns claim their spans (a claimed span is never touched
    by a later pattern).

    Fully distributed: the dictionary is built with a size-gated exact
    rank (see first_seen_rank) and substitution is an equi-join of the
    occurrence table against the dictionary — no driver-side dict
    collect, no broadcast variable. AQE broadcasts the dictionary side
    automatically when it is small and shuffle-joins when it is not."""
    specs = _as_specs(patterns) if patterns is not None else DEFAULT_SPECS

    occ = _claimed_occurrences(lines, specs, line_id_col, value_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # Small table (one row per distinct value); checkpointing it lets us
    # drop the occurrence cache from the final plan's lineage.
    dict_df = _encode(occ, local_threshold=local_threshold).localCheckpoint(
        eager=True
    )
    occ.unpersist()

    # Replacement pass: re-derive spans lazily (second corpus scan, like
    # the reference's replace pass) and join tokens in.
    spans = (
        _claimed_occurrences(lines, specs, line_id_col, value_col)
        .join(dict_df, ["kind", "original"])
        .groupBy("__lid")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("__rs").alias("rs"),
                    F.col("__re").alias("re"),
                    F.col("token").alias("token"),
                )
            ).alias("__spans")
        )
    )
    joined = lines.join(
        spans, lines[line_id_col] == spans["__lid"], "left"
    ).drop("__lid")
    line = F.col(value_col)
    return joined.withColumn(
        value_col,
        F.when(
            line.isNull() | F.col("__spans").isNull(), line
        ).otherwise(_splice_expr(line, F.col("__spans"))),
    ).drop("__spans")
