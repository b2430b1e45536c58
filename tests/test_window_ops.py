"""Unit tests for window operators: lag_calendar calendar-day
semantics, latest_per_key tie-breaks, trailing_rollup ROWS-frame
behavior over gap days."""

from __future__ import annotations

from pyspark.sql import functions as F

from risk_dashboard_database_spark.operators.windows import (
    lag_calendar,
    latest_per_key,
    trailing_rollup,
)

from conftest import d, ts


def test_lag_calendar_misses_read_default(spark):
    df = spark.createDataFrame(
        [
            (1, d("2024-01-01"), 5),
            (1, d("2024-01-02"), 7),   # prior day present -> 5
            (1, d("2024-01-04"), 9),   # gap -> default 0
            (2, d("2024-01-01"), 3),   # first row -> default 0
        ],
        "user_id int, date date, errors int",
    )
    out = df.withColumn(
        "prior", lag_calendar(df, ["user_id"], "date", "errors", default=0)
    )
    got = {(r["user_id"], r["date"]): r["prior"] for r in out.collect()}
    assert got == {
        (1, d("2024-01-01")): 0,
        (1, d("2024-01-02")): 5,
        (1, d("2024-01-04")): 0,
        (2, d("2024-01-01")): 0,
    }


def test_latest_per_key_equal_ts_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10, ts("2024-01-01T10:00:00")),
            (1, "a", 11, ts("2024-01-01T10:00:00")),  # same ts, higher id wins
            (1, "a", 5, ts("2024-01-01T09:00:00")),
            (1, "b", 1, ts("2024-01-01T00:00:00")),
        ],
        "user_id int, event_type string, event_id int, ts timestamp",
    )
    out = latest_per_key(
        df, ["user_id", "event_type"], [F.desc("ts"), F.desc("event_id")]
    )
    got = {(r["user_id"], r["event_type"]): r["event_id"] for r in out.collect()}
    assert got == {(1, "a"): 11, (1, "b"): 1}


def test_trailing_rollup_rows_frame_skips_gap_days(spark):
    # ROWS frame: the 2024-01-10 row's 3-row window reaches back over
    # the calendar gap to 01-02 (RANGE would not) — the reference's
    # entity_weekly_rollup_v semantics.
    df = spark.createDataFrame(
        [
            (1, d("2024-01-01"), 1),
            (1, d("2024-01-02"), 2),
            (1, d("2024-01-10"), 4),
        ],
        "user_id int, date date, total int",
    )
    out = trailing_rollup(
        df, ["user_id"], "date", {"sum3": F.sum("total")}, start=-2, end=0
    )
    got = {r["date"]: r["sum3"] for r in out.collect()}
    assert got == {d("2024-01-01"): 1, d("2024-01-02"): 3, d("2024-01-10"): 7}
