"""Streaming exact dedup (SURVEY §2.10 + the d1 dedup family).

The batch side dedups by content-identity hash (d1: sha256 of the
normalized URL, `src/url_utils.py:43-47`); an ingest pipeline needs
the same answer ON ARRIVAL — drop a document whose hash was already
admitted, tolerating late duplicate arrivals, without keeping
unbounded state. That is exactly Structured Streaming's
dropDuplicatesWithinWatermark: state holds one row per hash only
until the event-time watermark passes, so at 100 TB/day the dedup
state is bounded by (watermark span x distinct-hash arrival rate),
not by corpus size. A duplicate arriving after the watermark is
admitted again — the downstream idempotent upsert sink
(sources/sinks.merge_upsert) collapses those, the same two-tier
story the reference runs (ingest-time hash check + natural-key merge,
`src/ingest_v2.py:195-222`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import url_hash
from ..plans.synth import k_col, url_col
from .daily import read_events_stream


def stream_exact_dedup(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "2 days",
    schema=None,
) -> DataFrame:
    """readStream over the events directory -> first-admitted row per
    url_hash within the watermark horizon. Columns: ts, event_id,
    url_hash. Pass `schema` to start on an empty directory."""
    ev = read_events_stream(spark, events_dir, schema=schema)
    hashed = ev.select(
        "ts",
        "event_id",
        url_hash(url_col(k_col(), F.col("event_type"))).alias("url_hash"),
    )
    return hashed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["url_hash"]
    )
