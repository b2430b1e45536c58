"""Structured Streaming daily rollup: availableNow bounded replay must
equal the batch aggregation over the same files."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from risk_dashboard_database_spark.streaming.daily import (
    run_available_now,
    stream_daily_counts,
)


def test_stream_matches_batch(spark, tmp_path):
    events_dir = tmp_path / "events_stream"
    events_dir.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", events_dir / "part-0.parquet"
    )
    streamed = run_available_now(
        stream_daily_counts(spark, str(events_dir)), "t_stream_daily"
    )
    batch = (
        spark.read.parquet(str(events_dir))
        .withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
        .groupBy(F.col("ts").cast("date").alias("date"), "user_id")
        .agg(
            F.count("*").alias("total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("errors"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("purchases"),
        )
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) > 0
