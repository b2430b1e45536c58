"""Streaming trends-feed gate: the scoped per-(entity, day) interest
relation that e16/e17's endpoint assemblies serve from, maintained
incrementally.

The r14 stock/trends endpoints (`plans/endpoints.py:e16/e17`,
`build_stock_rows`/`build_trends_rows` `app.py:6740-6917`) are
serving-time queries over ONE corpus-derived relation: the scoped
daily series (entity, day, value). That relation is the streaming-
maintainable piece — the reference rebuilds it on its ingest cadence;
here it is a file-source stream:

    readStream(events) -> stream-STATIC broadcast LEFT SEMI join
    against the scope dim (the company whitelist, `app.py:6741-6748`
    — j10's RLS emulation, applied BEFORE the aggregation so
    out-of-scope rows never enter the state store) -> event-time daily
    tumbling window + watermark -> per-(entity, day) count.

The semi-join-then-windowed-agg composition is the one the 31 prior
gates hadn't exercised: novelty/DSIR join static dims to ENRICH rows,
the daily gate aggregates unscoped — this gate's static side PRUNES
the stream, which is the state-size lever (state rows ~ days x
|scoped entities|, not days x |all entities|).

Parity contract (tested): availableNow replay over the same files
equals the batch scoped-daily relation row-for-row, one-shot AND
under per-file micro-batches; out-of-scope entities appear in
NEITHER. The endpoint assemblies (snapshot fallback, pipe histories,
pct-change) stay batch serving-time queries over this maintained
relation — the same split the reference runs (ingest maintains
trends_daily; the endpoint reads it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .daily import read_events_stream


def scope_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static scope whitelist (j10's segment stand-in) — the
    `company in (select name from companies where id = any(%s))`
    clause of `app.py:6741-6748` as a broadcast dim."""
    return F.broadcast(
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )


def stream_scoped_interest(
    spark: SparkSession,
    events_dir: str,
    sf_dir: str,
    watermark: str = "2 days",
    schema=None,
) -> DataFrame:
    """readStream -> broadcast semi-join scope -> watermarked daily
    tumbling count per entity: the streaming twin of e17's `daily`
    sub-relation (and e16's, with price sums in place of counts)."""
    ev = read_events_stream(spark, events_dir, schema=schema)
    scope = scope_dim(spark, sf_dir)
    return (
        ev.join(scope, ev.user_id == scope.c_custkey, "left_semi")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.count("*").alias("interest"))
        .select(
            F.col("w.start").cast("date").alias("date"),
            F.col("user_id").alias("cust"),
            F.col("interest").cast("long").alias("interest"),
        )
    )


def batch_scoped_interest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch relation the stream must reproduce — e17's `daily`
    (scope semi-join before the one map-side-combinable agg)."""
    ev = load_table(spark, sf_dir, "events")
    scope = scope_dim(spark, sf_dir)
    return (
        ev.join(scope, ev.user_id == scope.c_custkey, "left_semi")
        .groupBy(
            F.col("ts").cast("date").alias("date"),
            F.col("user_id").alias("cust"),
        )
        .agg(F.count("*").cast("long").alias("interest"))
    )
