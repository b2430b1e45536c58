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


def test_lock_break_does_not_steal_fresh_lock(tmp_path, monkeypatch):
    """ADVICE r5: a slow breaker that observed a stale pid must not
    delete a rival's FRESH lock. Interleave the rival deterministically:
    just before our tombstone rename lands, the rival breaks the stale
    lock itself and re-acquires with a live pid. Our breaker must
    detect the pid mismatch inside the tombstone, restore the lock,
    and yield acquired=False."""
    import os

    import risk_dashboard_database_spark.observe as obs

    lock = tmp_path / "job.lock"
    lock.write_text("999999999")  # stale: pid that cannot exist
    live_pid = str(os.getpid())
    real_rename = os.rename

    def racing_rename(src, dst):
        if src == str(lock) and ".stale." in dst and lock.read_text() == "999999999":
            lock.write_text(live_pid)  # rival re-acquired just in time
        return real_rename(src, dst)

    monkeypatch.setattr(obs.os, "rename", racing_rename)
    with obs.single_flight(str(tmp_path), "job") as got:
        assert got is False, "breaker must not steal the rival's fresh lock"
    assert lock.exists() and lock.read_text() == live_pid
    assert not list(tmp_path.glob("*.stale.*")), "tombstone must be cleaned up"


def test_lock_break_does_not_resurrect_dead_rivals_lock(tmp_path, monkeypatch):
    """Code-review r6: if the pid found inside the tombstone is
    DIFFERENT but its process already exited (the rival acquired and
    released, or died), restoring the lock would starve every future
    caller forever. The breaker must treat it as free and acquire."""
    import os

    import risk_dashboard_database_spark.observe as obs

    lock = tmp_path / "job.lock"
    lock.write_text("999999999")       # stale pid
    real_rename = os.rename

    def racing_rename(src, dst):
        if src == str(lock) and ".stale." in dst and lock.read_text() == "999999999":
            lock.write_text("999999998")  # rival's pid — also not running
        return real_rename(src, dst)

    monkeypatch.setattr(obs.os, "rename", racing_rename)
    with obs.single_flight(str(tmp_path), "job") as got:
        assert got is True, "a dead rival's lock must not be resurrected"
    assert not lock.exists()
    assert not list(tmp_path.glob("*.stale.*"))
