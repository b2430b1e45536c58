"""Unit tests for sessionization operators: chain_active boundary
cases (gap reset, gate-fail mid-chain, trigger on first row), episodes,
and the state_scan escape hatch — plus a golden fixture test that
checks chain_active against a direct Python evaluation of the
reference recurrence (`crisis_event_rollups.py:639-683`):

    active(d) = gate(d) AND (trig(d) OR (cont(d) AND active(d-1)))
    with the carried state resetting across calendar gaps.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from risk_dashboard_database_spark.operators.sessionize import (
    chain_active,
    episodes,
    state_scan,
    with_islands,
)

from conftest import d


def _mk(spark, rows):
    return spark.createDataFrame(rows, "user_id int, date date, errors int, total int")


def _reference_recurrence(rows):
    """Independent oracle: evaluate the recurrence day by day."""
    out = {}
    by_user = {}
    for r in sorted(rows, key=lambda r: (r[0], r[1])):
        by_user.setdefault(r[0], []).append(r)
    for user, urows in by_user.items():
        prev_date, prev_active = None, False
        for (u, date, errors, total) in urows:
            gate = total >= 2
            trig = errors >= 3
            cont = errors >= 1 and errors / total >= 0.2
            carried = prev_active and prev_date is not None and (date - prev_date).days == 1
            active = gate and (trig or (cont and carried))
            out[(u, date)] = active
            prev_date, prev_active = date, active
    return out


def _run_chain(spark, rows):
    df = _mk(spark, rows)
    res = chain_active(
        df,
        ["user_id"],
        "date",
        trig=F.col("errors") >= 3,
        cont=(F.col("errors") >= 1) & (F.col("errors") / F.col("total") >= 0.2),
        gate=F.col("total") >= 2,
    )
    return {(r["user_id"], r["date"]): r["active"] for r in res.collect()}


def test_chain_trigger_on_first_row(spark):
    rows = [(1, d("2024-01-01"), 3, 4)]
    assert _run_chain(spark, rows) == {(1, d("2024-01-01")): True}


def test_chain_continuation_and_gap_reset(spark):
    rows = [
        (1, d("2024-01-01"), 3, 4),   # trigger -> active
        (1, d("2024-01-02"), 1, 4),   # cont (1/4 >= .2) -> active
        (1, d("2024-01-04"), 1, 4),   # gap: cont alone cannot carry -> inactive
    ]
    got = _run_chain(spark, rows)
    assert got[(1, d("2024-01-01"))] is True
    assert got[(1, d("2024-01-02"))] is True
    assert got[(1, d("2024-01-04"))] is False


def test_chain_gate_fail_mid_chain_breaks_carry(spark):
    rows = [
        (1, d("2024-01-01"), 3, 4),   # active
        (1, d("2024-01-02"), 1, 1),   # gate fails (total<2) -> inactive
        (1, d("2024-01-03"), 1, 4),   # cont but yesterday inactive -> inactive
    ]
    got = _run_chain(spark, rows)
    assert got[(1, d("2024-01-02"))] is False
    assert got[(1, d("2024-01-03"))] is False


def test_chain_cont_false_breaks_chain(spark):
    rows = [
        (1, d("2024-01-01"), 3, 4),   # active
        (1, d("2024-01-02"), 0, 9),   # no cont, no trig -> inactive
        (1, d("2024-01-03"), 1, 4),   # cont but chain broken -> inactive
    ]
    got = _run_chain(spark, rows)
    assert got[(1, d("2024-01-02"))] is False
    assert got[(1, d("2024-01-03"))] is False


def test_chain_retrigger_inside_segment(spark):
    rows = [
        (1, d("2024-01-01"), 1, 4),   # cont-eligible but nothing to continue
        (1, d("2024-01-02"), 3, 4),   # fresh trigger -> active
        (1, d("2024-01-03"), 1, 4),   # continues
    ]
    got = _run_chain(spark, rows)
    assert got[(1, d("2024-01-01"))] is False
    assert got[(1, d("2024-01-02"))] is True
    assert got[(1, d("2024-01-03"))] is True


def test_chain_golden_against_reference_recurrence(spark):
    # pseudo-random but deterministic 3-user, 40-day fixture
    rows = []
    for u in (1, 2, 3):
        for i in range(40):
            if (u * 7 + i * 13) % 5 == 0:  # gap days
                continue
            errors = (u * 3 + i * 11) % 5
            total = 1 + (u + i * 7) % 6
            rows.append((u, d("2024-01-01") + dt.timedelta(days=i), errors, total))
    expected = _reference_recurrence(rows)
    got = _run_chain(spark, rows)
    assert got == expected


def test_with_islands_and_episodes(spark):
    rows = [
        (1, d("2024-01-01"), 0, 1),
        (1, d("2024-01-02"), 0, 1),
        (1, d("2024-01-05"), 0, 1),
        (2, d("2024-01-02"), 0, 1),
    ]
    df = _mk(spark, rows)
    isl = {
        (r["user_id"], r["date"]): r["island_start"]
        for r in with_islands(df, ["user_id"], "date").collect()
    }
    assert isl[(1, d("2024-01-01"))] == d("2024-01-01")
    assert isl[(1, d("2024-01-02"))] == d("2024-01-01")
    assert isl[(1, d("2024-01-05"))] == d("2024-01-05")
    assert isl[(2, d("2024-01-02"))] == d("2024-01-02")

    eps = {
        (r["user_id"], r["episode_start"]): (r["episode_end"], r["episode_days"])
        for r in episodes(df, ["user_id"], "date").collect()
    }
    assert eps[(1, d("2024-01-01"))] == (d("2024-01-02"), 2)
    assert eps[(1, d("2024-01-05"))] == (d("2024-01-05"), 1)
    assert eps[(2, d("2024-01-02"))] == (d("2024-01-02"), 1)


def test_state_scan_running_max(spark):
    df = _mk(
        spark,
        [
            (1, d("2024-01-01"), 2, 1),
            (1, d("2024-01-02"), 5, 1),
            (1, d("2024-01-03"), 1, 1),
            (2, d("2024-01-01"), 7, 1),
        ],
    )

    def step(state, row):
        best = max(state.get("running_max") or 0, row["errors"])
        return {"running_max": best}

    out = state_scan(df, ["user_id"], "date", step, {"running_max": "int"})
    got = {(r["user_id"], r["date"]): r["running_max"] for r in out.collect()}
    assert got == {
        (1, d("2024-01-01")): 2,
        (1, d("2024-01-02")): 5,
        (1, d("2024-01-03")): 5,
        (2, d("2024-01-01")): 7,
    }
