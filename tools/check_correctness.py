"""Local emulation of the driver's correctness gate.

Runs every queries() entry at a given SF and compares against its
oracle_sql() via DuckDB: row count, column names, and order-insensitive
value comparison (rows sorted by all columns, column order normalized by
name). Floats compared with rel tol 1e-9 — stricter than any hash the
driver uses; we aim for exact.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, __file__.rsplit("/", 2)[0])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            elif isinstance(v, float):
                v = round(v, 9)
            elif isinstance(v, list):
                v = tuple(round(x, 9) if isinstance(x, float) else x for x in v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from maillogsentinel_spark.session import get_spark

    spark = get_spark(app_name="correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    attempted = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        attempted += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"weak {name}: rows={len(srows)} (no oracle) [{t_spark:.1f}s]")
            continue
        t1 = time.time()
        try:
            orel = con.sql(oracles[name])
            ocols = [c for c in orel.columns]
            orows = orel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        t_duck = time.time() - t1
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            ok = False
        else:
            s_n, o_n = norm(srows, scols), norm(orows, ocols)
            bad = [i for i, (a, b) in enumerate(zip(s_n, o_n)) if not close(a, b)]
            if bad:
                i = bad[0]
                print(f"FAIL {name}: {len(bad)} rows differ; first:\n  spark  {s_n[i]}\n  duckdb {o_n[i]}")
                ok = False
        if ok:
            print(
                f"ok   {name}: rows={len(srows)} "
                f"[spark {t_spark:.1f}s, duckdb {t_duck:.1f}s]"
            )
        else:
            failures.append(name)
    print(f"\n{attempted - len(failures)}/{attempted} ok")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
