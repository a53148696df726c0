"""Property-based pinning of the manifest delta/checkpoint core
(sources/txstore.py): for ANY parent state and ANY child manifest,
``_apply_delta(parent, _delta_doc(parent, child)) == child`` — the
exact invariant _commit verifies per write; here hypothesis searches
the state space for a counterexample instead of waiting for one in
production. Pure-Python: no SparkSession, runs in milliseconds."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from maillogsentinel_spark.sources import txstore

_DAYS = [f"2025-03-{d:02d}" for d in range(1, 6)]
_RELS = [f"event_date={d}/tx{i:02d}.parquet" for d in _DAYS for i in range(3)]

_rel_lists = st.dictionaries(
    st.sampled_from(_DAYS),
    st.lists(st.sampled_from(_RELS), min_size=1, max_size=4, unique=True)
    .map(sorted),
    max_size=len(_DAYS),
)
_stats_val = st.fixed_dictionaries(
    {"event_id": st.tuples(st.integers(-100, 0), st.integers(1, 100))
     .map(list)}
)
_bloom_val = st.fixed_dictionaries(
    {"tag": st.fixed_dictionaries({
        "m": st.sampled_from([1024, 8192]),
        "k": st.just(6),
        "bits": st.text(alphabet="ABCDwxyz", min_size=4, max_size=8),
    })}
)
_dv_val = st.lists(st.sampled_from(["dv-a", "dv-b"]), min_size=1,
                   max_size=2, unique=True)


def _manifest(version: int):
    def build(draw_tuple):
        files, stats, blooms, dv, batch, cons = draw_tuple
        live = {r for rels in files.values() for r in rels}
        m = {
            "format": 1,
            "version": version,
            "parent": version - 1,
            "txid": f"tx{version:04d}",
            "operation": "append",
            "schema": json.dumps({"type": "struct", "fields": []}),
            "committed_at_ms": 1_700_000_000_000 + version,
            "files": files,
            "stats": {r: s for r, s in stats.items() if r in live},
            "blooms": {r: b for r, b in blooms.items() if r in live},
            "dv": {r: d for r, d in dv.items() if r in live},
        }
        if batch is not None:
            m["last_batch_id"] = batch
        if cons is not None:
            m["constraints"] = cons
        return m

    return st.tuples(
        _rel_lists,
        st.dictionaries(st.sampled_from(_RELS), _stats_val, max_size=6),
        st.dictionaries(st.sampled_from(_RELS), _bloom_val, max_size=4),
        st.dictionaries(st.sampled_from(_RELS), _dv_val, max_size=3),
        st.one_of(st.none(), st.integers(0, 5)),
        st.one_of(
            st.none(),
            st.dictionaries(
                st.sampled_from(["c1", "c2"]),
                st.just("event_id IS NOT NULL"),
                max_size=2,
            ),
        ),
    ).map(build)


@settings(max_examples=300, deadline=None)
@given(prev=_manifest(7), child=_manifest(8))
def test_delta_roundtrip_exact(prev, child):
    delta = txstore._delta_doc(prev, child)
    assert delta["kind"] == "delta"
    assert txstore._apply_delta(prev, delta) == child
    # the delta survives a JSON round trip (what actually hits disk)
    rehydrated = json.loads(json.dumps(delta, sort_keys=True))
    assert txstore._apply_delta(prev, rehydrated) == child


@settings(max_examples=100, deadline=None)
@given(prev=_manifest(3), mid=_manifest(4), child=_manifest(5))
def test_delta_chain_composes(prev, mid, child):
    d1 = txstore._delta_doc(prev, mid)
    d2 = txstore._delta_doc(mid, child)
    assert txstore._apply_delta(txstore._apply_delta(prev, d1), d2) == child


@settings(max_examples=60, deadline=None)
@given(state=_manifest(9))
def test_checkpoint_roundtrip_exact(state, tmp_path_factory):
    import os
    import uuid

    root = str(tmp_path_factory.mktemp("ckpt") / uuid.uuid4().hex)
    os.makedirs(f"{root}/{txstore._MANIFEST_DIR}")
    txstore._write_ckpt(root, state)
    assert txstore._read_ckpt(root, state["version"]) == state


def test_z_prefix_int_matches_duckdb_mirror(spark):
    """The string z-order kernel and its DuckDB mirror must agree
    value-exactly — short strings, empties, nulls-as-empty, multibyte
    clamping, and order-embedding for ASCII."""
    import duckdb

    from maillogsentinel_spark.operators.zorder import (
        sql_z_prefix_int,
        z_prefix_int,
    )

    vals = ["", "a", "user0001", "user0040", "zzzzzzzzz", "ab",
            "Ωmega", "user", "USER0001", "~~~~~~~"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["k"]
        for r in df.select("s", z_prefix_int(F.col("s")).alias("k")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        lit = "'" + v.replace("'", "''") + "'"
        want = con.execute(f"SELECT {sql_z_prefix_int(lit)}").fetchone()[0]
        assert got[v] == want, (v, got[v], want)
    # order-embedding for ASCII: packed keys sort like the strings
    ascii_vals = [v for v in vals if v.isascii()]
    assert sorted(ascii_vals) == sorted(ascii_vals, key=lambda v: got[v])
