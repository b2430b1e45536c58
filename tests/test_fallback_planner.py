"""Tests for fallback-query semantics (§4) and the executable planner
path (F7 end-to-end)."""

from __future__ import annotations

from risk_dashboard_database_spark.functions.planner import execute_plan, plan_query
from risk_dashboard_database_spark.plans.fallback import read_or_rebuild


def test_fallback_missing_materialization(spark, tmp_path):
    base = spark.createDataFrame([(1, "x")], "id int, v string")
    df, source = read_or_rebuild(spark, str(tmp_path / "nope"), lambda: base)
    assert source == "fallback"
    assert df.collect() == base.collect()


def test_fallback_prefers_materialization(spark, tmp_path):
    mat = spark.createDataFrame([(2, "y")], "id int, v string")
    path = str(tmp_path / "mv")
    mat.write.parquet(path)
    df, source = read_or_rebuild(
        spark, path, lambda: (_ for _ in ()).throw(AssertionError("must not rebuild"))
    )
    assert source == "materialized"
    assert df.collect() == mat.collect()


def test_fallback_on_empty_materialization(spark, tmp_path):
    empty = spark.createDataFrame([], "id int, v string")
    path = str(tmp_path / "empty_mv")
    empty.write.parquet(path)
    base = spark.createDataFrame([(3, "z")], "id int, v string")
    df, source = read_or_rebuild(spark, path, lambda: base, require_rows=True)
    assert source == "fallback"
    assert df.count() == 1


def test_execute_plan_runs_routed_query(spark):
    plan = plan_query("top 3 riskiest users by risk score")
    assert plan is not None
    (df,) = execute_plan(plan, spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 3
    assert "risk_score" in df.columns


def test_execute_plan_applies_calendar_window(spark):
    plan = plan_query("show anomalies in q1 2024")
    assert plan["tool_calls"][0]["arguments"]["window"]["mode"] == "calendar"
    (df,) = execute_plan(plan, spark, "/root/testdata/sf0.001")
    dates = [r["date"] for r in df.select("date").distinct().collect()]
    assert all("2024-01-01" <= d <= "2024-03-31" for d in dates)
