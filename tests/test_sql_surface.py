"""engine.sql(): registered views share the engine's Catalyst planning."""

from maillogsentinel_spark.plans.sql import (
    register_testdata_views,
    register_views,
    sql,
)

SF = "/root/testdata/sf0.001"


def test_testdata_views_and_join_query(spark):
    names = register_testdata_views(spark, SF)
    assert "events" in names and "lineitem" in names
    df = sql(spark, """
        SELECT event_type, count(*) AS cnt
        FROM events GROUP BY event_type ORDER BY event_type
    """)
    rows = df.collect()
    assert len(rows) >= 1 and all(r["cnt"] > 0 for r in rows)


def test_sql_plan_gets_pushdown(spark):
    register_testdata_views(spark, SF)
    df = sql(spark, "SELECT l_orderkey FROM lineitem WHERE l_quantity < 2")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan or "Filter" in plan
    # column pruning reached the scan: only the two referenced columns
    scan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "l_comment" not in scan


def test_register_custom_views(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "v"])
    register_views(spark, my_dim=df)
    assert sql(spark, "SELECT count(*) AS c FROM my_dim").collect()[0]["c"] == 1
