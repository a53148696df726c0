"""Generate a synthetic SF-scaled copy of the driver's test tables.

The driver ships sf0.001/0.01/0.1 read-only (TESTDATA.md, seed=42,
regeneration forbidden); this tool extends the LADDER upward for
scale-differential runs — it reproduces the sf0.1 tables' schemas and
measured distributions (row-count ratios, value ranges, category mixes,
planted near/exact document duplicates, unit-sphere embeddings) with a
fixed seed, so `bench.py` and `tools/check_correctness.py` can run at
sf1+ on data whose workload shape matches one-more-decade of the same
generator family. Oracle runs on the output are self-consistent (Spark
vs DuckDB on the same files), so nothing depends on matching the
driver's RNG bit-for-bit.

Row counts (sf relative to the driver's ladder):
  lineitem 6M/sf, orders 1.5M/sf, customer 150k/sf, part 200k/sf,
  supplier 10k/sf, events 1M/sf, documents 50k/sf, users 15k/sf;
  embeddings grow x4 per decade (500 @0.01, 2000 @0.1 -> 8000 @1),
  matching the driver's sublinear ladder. nation/region fixed.

Usage: python tools/gen_sf.py [sf] [out_dir]   (default: 1 localdata/sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "fast", "row", "the", "agg", "key",
    "query", "a", "scan", "batch", "join", "sort", "order", "line",
    "filter", "slow", "big", "customer", "part", "group", "hash", "b",
]
ADJ = ["blue", "hot", "small", "cold", "new", "red", "old", "large"]
NOUN = ["ring", "rod", "bolt", "anvil", "widget", "plate", "gear", "gizmo"]
SEGMENTS = ["MACHINERY", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD", "BUILDING"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "PROMO", "MEDIUM", "SMALL", "LARGE", "STANDARD"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.40, 0.15, 0.15, 0.15, 0.15]


def write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"{name}: {table.num_rows} rows -> {path}")


def day_ts(days: np.ndarray, base: str) -> np.ndarray:
    return np.datetime64(base, "us") + days.astype("timedelta64[D]").astype(
        "timedelta64[us]"
    )


def gen(sf: float, out_dir: str, seed: int = 421) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = int(150_000 * sf)
    write(out_dir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    n_supp = int(10_000 * sf)
    write(out_dir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    n_part = int(200_000 * sf)
    pk = np.arange(n_part, dtype=np.int64)
    write(out_dir, "part", pa.table({
        "p_partkey": pk,
        "p_name": [
            f"{ADJ[i % 64 // 8]} {NOUN[i % 8]}" for i in range(n_part)
        ],
        "p_brand": [f"Brand#{1 + i % 25}" for i in range(n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": 900.0 + (pk % 1000) / 10.0,
    }))

    n_ord = int(1_500_000 * sf)
    odate_days = rng.integers(0, 2405, n_ord)  # 1995-01-01 .. 2001-08-01
    write(out_dir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": day_ts(odate_days, "1995-01-01"),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    n_li = int(6_000_000 * sf)
    lok = rng.integers(0, n_ord, n_li)  # uniform draw => Poisson(4) lines/order
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": lok,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": day_ts(
            odate_days[lok] + rng.integers(1, 96, n_li), "1995-01-01"
        ),
    }))

    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    ts_us = rng.integers(0, 30 * 86_400 * 1_000_000, n_ev)
    write(out_dir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": np.datetime64("2024-01-01", "us") + ts_us.astype("timedelta64[us]"),
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 560.25, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: uniform vocab draws, 8..100 words; 5% near-dups (copy of
    # an earlier doc with 2 positions replaced by the planted token
    # "dup"), 0.16% verbatim copies — the measured sf0.1 densities.
    n_doc = int(50_000 * sf)
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.0016:
            texts.append(texts[int(rng.integers(0, i))])
            continue
        if i > 10 and r < 0.05 + 0.0016:
            toks = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(2):
                toks[int(rng.integers(0, len(toks)))] = "dup"
            texts.append(" ".join(toks))
            continue
        n_words = int(rng.integers(8, 101))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words)]))
    write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(5, n_doc, p=np.array(LANG_W))
        ],
        "source": [f"src{k}" for k in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # embeddings: uniform unit sphere (measured: no label/cluster
    # structure), x4 per decade above sf0.1's 2000
    n_emb = int(round(2000 * (10 ** (np.log10(sf / 0.1) * 0.60206))))
    E = rng.standard_normal((n_emb, 64))
    E = (E / np.linalg.norm(E, axis=1, keepdims=True)).astype(np.float32)
    write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(E), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else "localdata/sf1"
    gen(sf, out)
