"""Slow-query log + single-flight lock semantics (SURVEY §4)."""

from __future__ import annotations

import time

from risk_dashboard_database_spark.observe import SlowQueryLog, single_flight


def test_slow_query_log_records_only_breaches():
    sq = SlowQueryLog(threshold_ms=20.0)
    with sq.timed("fast"):
        pass
    with sq.timed("slow"):
        time.sleep(0.05)
    names = [n for n, _ in sq.entries]
    assert names == ["slow"]
    assert sq.entries[0][1] > 20.0


def test_slow_query_run_returns_value():
    sq = SlowQueryLog(threshold_ms=1e9)
    assert sq.run("q", lambda: 42) == 42
    assert not sq.entries


def test_single_flight_one_winner(tmp_path):
    with single_flight(str(tmp_path), "refresh_mv") as first:
        assert first is True
        with single_flight(str(tmp_path), "refresh_mv") as second:
            assert second is False  # same job name: skip
        with single_flight(str(tmp_path), "other_job") as other:
            assert other is True  # different job: independent lock
    # released: next caller acquires again
    with single_flight(str(tmp_path), "refresh_mv") as again:
        assert again is True


def test_single_flight_breaks_stale_lock(tmp_path):
    lock = tmp_path / "refresh_mv.lock"
    lock.write_text("999999999")  # pid that cannot exist
    with single_flight(str(tmp_path), "refresh_mv") as got:
        assert got is True
