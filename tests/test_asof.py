"""asof_join_backward semantics (operators/asof.py).

Mirrors DuckDB ASOF LEFT JOIN / pandas merge_asof(direction='backward'):
latest right row with right_ts <= left_ts per key; inclusive at equality;
null when no prior right row exists.
"""

import datetime as dt

from pyspark.sql import functions as F

from maillogsentinel_spark.operators.asof import asof_join_backward


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2025-01-01 10:00:00")),  # before any right → null
            (2, "u1", _ts("2025-01-01 12:00:00")),  # equal ts → inclusive match
            (3, "u1", _ts("2025-01-01 13:30:00")),  # between rights → earlier one
            (4, "u1", _ts("2025-01-01 15:00:00")),  # after both → latest
            (5, "u2", _ts("2025-01-01 12:30:00")),  # other key isolated
            (6, "u3", _ts("2025-01-01 23:00:00")),  # key with no rights → null
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2025-01-01 12:00:00"), 100.0),
            ("u1", _ts("2025-01-01 14:00:00"), 200.0),
            ("u2", _ts("2025-01-01 12:00:00"), 300.0),
        ],
        "user_id string, pts timestamp, amount double",
    )
    out = {
        r["event_id"]: (r["pts_asof"], r["amount_asof"])
        for r in asof_join_backward(
            left, right, key="user_id", left_ts="ts", right_ts="pts"
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (_ts("2025-01-01 12:00:00"), 100.0)
    assert out[3] == (_ts("2025-01-01 12:00:00"), 100.0)
    assert out[4] == (_ts("2025-01-01 14:00:00"), 200.0)
    assert out[5] == (_ts("2025-01-01 12:00:00"), 300.0)
    assert out[6] == (None, None)


def test_asof_preserves_left_rowcount_and_plan(spark):
    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    right = spark.range(10).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.col("id") * 500).alias("rts"),
        F.col("id").alias("payload"),
    )
    out = asof_join_backward(left, right, key="k", left_ts="ts", right_ts="rts")
    assert out.count() == 100  # left join: never drops or duplicates
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the scale contract: a single key-shuffle + window, never a
    # nested-loop / cartesian range join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_random_matches_bruteforce(spark):
    """Seeded random instances vs a per-row reference implementation."""
    import random

    rng = random.Random(11)
    for trial in range(3):
        nl, nr = rng.randint(5, 30), rng.randint(0, 20)
        left_rows = [
            (i, rng.randint(0, 3), _ts("2025-01-01 00:00:00")
             + dt.timedelta(minutes=rng.randint(0, 500)))
            for i in range(nl)
        ]
        # unique (key, ts) on the right per the operator's determinism
        # contract
        seen = set()
        right_rows = []
        for j in range(nr):
            k, m = rng.randint(0, 3), rng.randint(0, 500)
            if (k, m) in seen:
                continue
            seen.add((k, m))
            right_rows.append(
                (k, _ts("2025-01-01 00:00:00") + dt.timedelta(minutes=m),
                 float(j))
            )

        left = spark.createDataFrame(left_rows, "event_id long, k long, ts timestamp")
        right = spark.createDataFrame(right_rows, "k long, pts timestamp, amount double")
        got = {
            r["event_id"]: (r["pts_asof"], r["amount_asof"])
            for r in asof_join_backward(
                left, right, key="k", left_ts="ts", right_ts="pts"
            ).collect()
        }

        for eid, k, ts in left_rows:
            cands = [(pts, amt) for (rk, pts, amt) in right_rows
                     if rk == k and pts <= ts]
            want = max(cands) if cands else (None, None)
            assert got[eid] == want, f"trial {trial} event {eid}"
