"""Structured Streaming daily rollup (SURVEY §2.10).

The reference is an incremental daily batch system; its
streaming-shaped semantics (daily tumbling windows, late-data-tolerant
idempotent upserts) map to Structured Streaming as: file source ->
event-time tumbling window + watermark -> aggregation. This module is
that mapping, exercised by tests against the batch result
(availableNow trigger == bounded replay).

Scale notes: the state store holds one row per (window, user) until
the watermark passes; with a 2-day watermark on daily windows, state
is bounded at ~2 days x |entities|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Testdata timestamps are parquet TIMESTAMP(NANOS); the session reads
# them as long (see session.get_spark) and we convert to micros here —
# same handling as tables.load_table, applied on the stream.
EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def stream_daily_counts(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "2 days",
) -> DataFrame:
    """readStream over a parquet directory -> per-(day, user) class
    counts with late-data watermarking — the streaming twin of
    plans/common.user_day."""
    ev = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    ev = ev.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
    flag = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("long")  # noqa: E731
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(
            F.count("*").alias("total"),
            flag("error").alias("errors"),
            flag("purchase").alias("purchases"),
        )
        .select(
            F.col("w.start").cast("date").alias("date"),
            "user_id",
            "total",
            "errors",
            "purchases",
        )
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain everything currently available into a memory sink and
    return the result as a batch DataFrame (bounded replay — how the
    tests and backfills consume the stream). complete for aggregation
    streams; append for row streams (dedup)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
