"""Tests for the F-surface: period parser (F6), planner routing (F7),
LLM batch-classification plumbing (F1/F2), and the MV refresh graph."""

from __future__ import annotations

from datetime import date

import pytest

from risk_dashboard_database_spark.functions.llm import (
    classify_batch,
    fake_classify,
    salvage_json,
    summarize_cached,
)
from risk_dashboard_database_spark.functions.period import resolve_time_window
from risk_dashboard_database_spark.functions.planner import plan_query

TODAY = date(2026, 8, 13)


@pytest.mark.parametrize(
    "text,label,start,end",
    [
        ("how was q3 2025?", "q3_2025", "2025-07-01", "2025-09-30"),
        ("2025 q4 review", "q4_2025", "2025-10-01", "2025-12-31"),
        ("quarter 1 2026 numbers", "q1_2026", "2026-01-01", "2026-03-31"),
        ("last quarter", "last_quarter", "2026-04-01", "2026-06-30"),
        ("this quarter to date", "this_quarter", "2026-07-01", "2026-08-13"),
        ("last month performance", "last_month", "2026-07-01", "2026-07-31"),
        ("month to date", "this_month", "2026-08-01", "2026-08-13"),
        ("last year", "last_year", "2025-01-01", "2025-12-31"),
        ("year to date", "this_year", "2026-01-01", "2026-08-13"),
    ],
)
def test_period_calendar(text, label, start, end):
    w = resolve_time_window(text, today=TODAY)
    assert (w["mode"], w["period_label"], w["start_date"], w["end_date"]) == (
        "calendar", label, start, end,
    )


@pytest.mark.parametrize(
    "text,days",
    [
        ("past 14 days", 14),
        ("rolling 45 days", 45),
        ("last 999 days", 365),     # clamp to 365
        ("today", 1),
        ("past week", 7),
        ("last 30 days", 30),
        ("something unparseable", 90),  # default
    ],
)
def test_period_rolling(text, days):
    w = resolve_time_window(text, today=TODAY)
    assert (w["mode"], w["days"]) == ("rolling", days)


def test_q4_year_end():
    w = resolve_time_window("q4 2025", today=TODAY)
    assert w["end_date"] == "2025-12-31"


def test_planner_routes():
    p = plan_query("show anomalies in the past 30 days", today=TODAY)
    assert p["plan_type"] == "anomaly_scan"
    assert p["tool_calls"][0]["name"] == "u4_anomaly_rules"
    assert p["tool_calls"][0]["arguments"]["window"]["days"] == 30

    p = plan_query("compare Acme vs Beta over last quarter", today=TODAY)
    assert p["plan_type"] == "entity_comparison"
    assert p["tool_calls"][0]["arguments"]["entities"] == ["Acme", "Beta"]

    p = plan_query("top 5 riskiest brands by risk score", today=TODAY)
    assert p["tool_calls"][0]["name"] == "o6_risk_leaderboard"
    assert p["tool_calls"][0]["arguments"]["limit"] == 5

    assert plan_query("") is None
    assert plan_query("what is the meaning of life") is None


def test_planner_tools_exist_in_registry():
    from risk_dashboard_database_spark.plans import QUERIES
    from risk_dashboard_database_spark.functions import planner

    names = {q for _, (_, q) in planner._ROUTES} | {"j4_entity_daily_metrics"}
    missing = names - set(QUERIES)
    assert not missing


def test_tool_contract_complete_and_resolvable():
    import json

    from risk_dashboard_database_spark.functions.planner import TOOL_CONTRACT
    from risk_dashboard_database_spark.plans import QUERIES

    # every declared tool maps to a registered query
    assert set(TOOL_CONTRACT.values()) <= set(QUERIES)
    # and the mapping covers the reference's full 15-tool contract
    ref = json.load(open("/root/reference/insights agent/ai-insights-tool-contract.json"))
    ref_names = {t["name"] for t in ref["tools"]}
    assert set(TOOL_CONTRACT) == ref_names


def test_salvage_json():
    assert salvage_json('{"a": 1}') == {"a": 1}
    assert salvage_json('Sure! Here: {"a": 1} hope it helps') == {"a": 1}
    assert salvage_json("no json at all") is None
    assert salvage_json("") is None
    assert salvage_json("[1, 2]") is None


def test_classify_batch_deterministic(spark):
    df = spark.createDataFrame([(1, "layoffs hit"), (2, "record profits")], "id int, title string")
    out = classify_batch(df, "title").collect()
    assert {r["id"]: r["sentiment_label"] for r in out} == {
        1: fake_classify("layoffs hit")["sentiment_label"],
        2: fake_classify("record profits")["sentiment_label"],
    }
    with pytest.raises(NotImplementedError):
        classify_batch(df, "title", backend="openai")


def test_summarize_cached(spark):
    df = spark.createDataFrame(
        [("d1", "b title"), ("d1", "a title"), ("d2", "x")], "day string, title string"
    )
    rows = {r["day"]: r["summary"] for r in summarize_cached(df, ["day"], "title").collect()}
    assert rows["d1"] == "summary of 2 items: a title; b title"
    assert rows["d2"] == "summary of 1 items: x"


def test_refresh_aggregates_and_window(spark, tmp_path):
    from risk_dashboard_database_spark.plans.refresh import (
        refresh_aggregates,
        refresh_window,
    )

    out = str(tmp_path / "mvs")
    paths = refresh_aggregates(spark, "/root/testdata/sf0.001", out)
    assert set(paths) == {
        "user_day", "p2_override_daily", "a2_control_counts",
        "j4_entity_daily_metrics", "w1_weekly_rollup", "w2_anomaly_baselines",
    }
    ud = spark.read.parquet(paths["user_day"])
    n_before = ud.count()
    assert n_before > 0
    # targeted window rebuild keeps row count identical (same input)
    refresh_window(spark, "/root/testdata/sf0.001", out, "user_day",
                   "2024-01-05", "2024-01-10")
    assert spark.read.parquet(paths["user_day"]).count() == n_before


def test_refresh_all_warms_every_store_mv(spark, tmp_path, monkeypatch):
    """VERDICT r6 #5: a cold MV store + refresh_all leaves every
    registered relcache relation store-warm (first-touch build costs
    pre-paid in dependency order), and a second run is a no-op."""
    import os

    from risk_dashboard_database_spark.plans import relcache
    from risk_dashboard_database_spark.plans.refresh import (
        MV_STORE_DAG,
        refresh_all,
    )

    monkeypatch.setattr(relcache, "MV_ROOT", str(tmp_path / "mv"))
    relcache.clear()
    try:
        timings = refresh_all(spark, "/root/testdata/sf0.001")
        assert set(timings) == {s for s, _, _ in MV_STORE_DAG}

        # every concrete key is materialized with a completed publish
        # (layout_* keys are scale-gated: tiny testdata never triggers
        # the re-layout seam, so they are exempt here)
        expected = {
            k
            for _, keys, _ in MV_STORE_DAG
            for k in keys
            if not k.endswith("*")
        }
        for key in expected:
            key_dir = tmp_path / "mv" / key
            assert key_dir.is_dir(), f"{key} not materialized"
            fps = [d for d in os.listdir(key_dir) if ".tmp-" not in d]
            assert fps, f"{key} has no dataset materialization"
            assert (key_dir / fps[0] / "_SUCCESS").exists()

        # warm rerun: pure store hits, no rebuild (sub-second per step)
        relcache.clear()
        again = refresh_all(spark, "/root/testdata/sf0.001")
        assert sum(again.values()) < 0.5 * sum(timings.values())
    finally:
        relcache.clear()
