"""Streaming session windows: w12's event-time sessions maintained on
arrival — the Structured-Streaming form of the SAME session_window
aggregate the batch query plans, so 'a session' has exactly one
definition across both modes (the reason w12 uses the native operator
instead of a hand-rolled islands join).

Shape: watermarked event-time + groupBy(user_id, session_window(ts,
gap)). Spark merges events into per-user sessions as micro-batches
arrive and finalizes a session once the watermark passes its end —
the canonical watermark+session pattern from the streaming guide.
Output rows are FINALIZED sessions (append mode): late events inside
the watermark re-open and extend a pending session; events later than
the watermark are dropped by contract.

Parity (tested): an availableNow replay of the full events table with
a zero-delay watermark... does NOT emit every session — append-mode
session aggs only finalize windows the watermark has passed, and the
final micro-batch's sessions stay pending. The test therefore replays
with a far-future synthetic flush event per user and asserts the
finalized sessions equal batch `w12_session_windows` exactly for every
real session (the flush sessions are dropped by their known start).
That asymmetry is not a bug: it is the streaming-completeness contract
of every append-mode aggregation, made explicit here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.windows import W12_GAP_S, W12_TS_FMT_SPARK
from .daily import read_events_stream


def stream_session_windows(
    spark: SparkSession,
    events_dir: str,
    schema=None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """readStream over an events directory -> finalized per-user
    sessions (batch-w12 schema), sessions closing once the watermark
    passes their end."""
    ev = read_events_stream(spark, events_dir, schema)
    # session_window needs TIMESTAMP (not NTZ) for watermarking; the
    # session runs UTC so the cast is a type re-tag, not a value shift
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    sw = F.session_window(F.col("ts"), f"{W12_GAP_S} seconds")
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), sw.alias("w"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), W12_TS_FMT_SPARK).alias(
                "session_start"
            ),
            F.date_format(F.col("w.end"), W12_TS_FMT_SPARK).alias(
                "session_end"
            ),
            "n_events",
        )
    )
