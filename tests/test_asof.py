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
