"""Unit tests for asof_join: at-or-before matching, equal-timestamp
inclusion, last-write-wins tiebreak, probes with no prior build."""

from __future__ import annotations

from risk_dashboard_database_spark.operators.joins import asof_join

from conftest import ts


def _dfs(spark):
    probe = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:00"), "p1"),
            (1, ts("2024-01-01T12:00:00"), "p2"),
            (2, ts("2024-01-01T08:00:00"), "p3"),  # before any build
        ],
        "user_id int, ts timestamp, tag string",
    )
    build = spark.createDataFrame(
        [
            (1, ts("2024-01-01T09:00:00"), 1, 100.0),
            (1, ts("2024-01-01T12:00:00"), 2, 200.0),  # equal-ts: eligible
            (1, ts("2024-01-01T12:00:00"), 3, 300.0),  # equal-ts, higher tiebreak wins
            (2, ts("2024-01-01T09:00:00"), 4, 400.0),
        ],
        "user_id int, bts timestamp, bid int, bval double",
    )
    return probe, build


def test_asof_basic_and_equal_ts_tiebreak(spark):
    probe, build = _dfs(spark)
    out = asof_join(
        probe, build,
        on="user_id", probe_time="ts", build_time="bts",
        build_cols=["bid", "bval"], tiebreak="bid",
    )
    got = {r["tag"]: (r["bid"], r["bval"]) for r in out.collect()}
    assert got["p1"] == (1, 100.0)       # strictly-before build
    assert got["p2"] == (3, 300.0)       # equal ts eligible; last tiebreak wins
    assert got["p3"] == (None, None)     # no prior build -> nulls


def test_asof_probe_columns_preserved(spark):
    probe, build = _dfs(spark)
    out = asof_join(
        probe, build,
        on="user_id", probe_time="ts", build_time="bts",
        build_cols=["bval"], tiebreak="bid",
    )
    assert set(out.columns) == {"user_id", "ts", "tag", "bval"}
    assert out.count() == 3
