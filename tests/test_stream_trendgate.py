"""Streaming trends-feed gate (#32): availableNow replay of the
scoped per-(entity, day) interest relation must equal the batch form
row-for-row — one-shot and under per-file micro-batches — and the
static semi-join must prune out-of-scope entities from BOTH sides."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.trendgate import (
    batch_scoped_interest,
    stream_scoped_interest,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return {
        (str(r["date"]), r["cust"]): r["interest"] for r in df.collect()
    }


def test_stream_scoped_interest_matches_batch(spark, tmp_path):
    ev_dir = tmp_path / "ev_trend"
    ev_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", ev_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_scoped_interest(spark, str(ev_dir), SF_DIR),
        "t_stream_trend",
    )
    got = _rows(streamed)
    want = _rows(batch_scoped_interest(spark, SF_DIR))
    assert got == want and want
    # the scope PRUNES: out-of-scope entities appear in neither side
    scoped = {
        r["c_custkey"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .where(F.col("c_mktsegment") == "BUILDING")
        .collect()
    }
    assert {c for (_, c) in got} <= scoped
    all_users = {
        r["user_id"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .collect()
    }
    assert all_users - scoped  # non-degenerate: pruning really happened


def test_stream_scoped_interest_per_file_batches(spark, tmp_path):
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF_DIR}/events.parquet")
    ev_dir = tmp_path / "ev_trend_files"
    ev_dir.mkdir()
    third = max(1, full.num_rows // 3)
    for i in range(3):
        lo = i * third
        hi = full.num_rows if i == 2 else (i + 1) * third
        pq.write_table(full.slice(lo, hi - lo), ev_dir / f"part-{i}.parquet")

    streamed = run_available_now(
        stream_scoped_interest(spark, str(ev_dir), SF_DIR),
        "t_stream_trend_files",
    )
    assert _rows(streamed) == _rows(batch_scoped_interest(spark, SF_DIR))
