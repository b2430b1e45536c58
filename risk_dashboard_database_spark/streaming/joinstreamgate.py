"""Streaming stream-stream join gate: attribute each purchase to the
same user's signups within a trailing window, as TWO watermarked
streams joined on event time — the native Structured Streaming
surface the suite hadn't exercised (stream-STATIC joins appear in the
novelty/DSIR gates; session_window and dropDuplicatesWithinWatermark
in their own gates; this is the two-moving-sides case).

The conversion-attribution ask: purchase P by user U matches signup S
by U when S.ts <= P.ts <= S.ts + ATTRIB_DAYS. Both sides carry a
watermark so the engine can BOUND the join state: a buffered signup
can be dropped once the purchase-side watermark passes its
attribution horizon — the state-retention math that makes
stream-stream joins viable at 100 TB (an unwatermarked inner join
would buffer both streams forever).

Parity contract (tested): availableNow replay equals the batch
inner-join with the identical predicate row-for-row, under one-shot
AND per-file arrival IN event-time order (the tests slice by ts). The
watermark cuts both ways, deliberately: a row arriving LATER than the
watermark allows — older than max(seen ts) minus the delay plus the
attribution horizon — is dropped WITH its matches, exactly as the
operator's late-data contract specifies. Exactness under arbitrary
slicing holds only for slicings the watermark admits; an
out-of-order-beyond-the-delay feed trades those pairs for bounded
state, which is the point of the watermark (code-review r11 wording
fix — the earlier text overclaimed 'regardless of slicing')."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.joins import (
    J12_ATTRIB_DAYS as ATTRIB_DAYS,
    _j12_join as _join,
    _j12_sides as _sides,
    j12_purchase_attribution as batch_attribution,
)
from .daily import read_events_stream


def stream_attribution(
    spark: SparkSession, events_dir: str, schema=None
) -> DataFrame:
    """readStream -> watermarked purchase/signup sides -> native
    stream-stream inner join with the event-time range condition.
    Both watermarks are 1 day: with the <= ATTRIB_DAYS range bound in
    the join condition, the engine derives a finite state-retention
    horizon for each side (see the Structured Streaming join-state
    watermark rules) — the plan carries the bound, not the prose."""
    ev = read_events_stream(spark, events_dir, schema=schema)
    purchases, signups = _sides(ev)
    return _join(
        purchases.withWatermark("p_ts", "1 day"),
        signups.withWatermark("s_ts", "1 day"),
    )
