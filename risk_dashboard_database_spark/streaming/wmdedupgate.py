"""Streaming exact-dedup gate via Spark's NATIVE
dropDuplicatesWithinWatermark — the at-least-once ingest repair.

Every file/queue source re-delivers on retry, so an ingest pipeline's
first stateful stage is usually "drop the redelivery": keep each
event_id's FIRST arrival, expire the dedup state once the watermark
passes (bounded state — the property a plain dropDuplicates() stream
lacks, whose state grows with the corpus forever). The suite's other
dedup gates implement CONTENT near-dup semantics in custom state;
this gate pins the engine-NATIVE operator the identity-dedup case
should use instead, exactly as w12 pinned native session_window
against the hand-rolled islands form.

Parity contract (tested): replaying the corpus PLUS a full duplicate
re-delivery of it (same event_ids, later micro-batches, inside the
watermark) yields each event_id exactly once with its first-arrival
row — equal to the batch DISTINCT-by-key relation over the original
corpus row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .daily import read_events_stream


def stream_dedup_within_watermark(
    spark: SparkSession,
    events_dir: str,
    schema=None,
    delay: str = "1 day",
) -> DataFrame:
    """readStream over an events directory -> the stream with
    redeliveries of the same event_id dropped while their state is
    inside the event-time watermark. The watermark bounds the dedup
    state to the redelivery horizon — the 100 TB argument for using
    the native operator over an unbounded custom-state fold."""
    ev = read_events_stream(spark, events_dir, schema=schema)
    return ev.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
