"""Streaming frame-dedup gate: batch m5's cross-video frame audit
applied to videos on arrival — the multimodal member of the gate set.

An ingest pipeline for video shards wants to know AT LANDING how much
of a new video is b-roll / intro cards / rebroadcast material already
in the corpus. The cross-video frame-fingerprint dictionary is a
STATIC artifact derived from the base corpus (the span-strip gate's
stance — refreshed on the MV rebuild cadence); each arriving video
explodes its sampled frames through the SHARED m-family convention
(`plans.multimodal.frame_fingerprints`: m3's sampling plan + the fake
codec's 12-byte slice + md5 — a real deployment swaps in a pHash at
the decode seam, the plan around it unchanged), LEFT-SEMI joins the
dictionary (one fingerprint-keyed stream-static exchange per
micro-batch — the same key batch m5's agg shuffles on), and a
doc-keyed stateful fold emits the batch-m5 row.

A sentinel row rides along per video (carrying its sample count) so
hit-less videos still emit zeros — batch m5 emits EVERY video.

Parity (tested, incl. 1-file micro-batches): replaying the base
corpus makes the static dictionary exactly batch m5's shared set, so
the replay equals `m5_frame_dedup` row-for-row. A video arriving
after the dictionary build shares frames only with the dictionary's
generation until the next refresh — the standard static-side trade.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.multimodal import (
    _video_dims,
    frame_fingerprints,
    shared_frame_fps,
)

OUTPUT_SCHEMA = (
    "doc_id long, sampled_frames long, dup_frames long, dup_ppm long"
)
STATE_SCHEMA = "done int"


def _fold(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    ns = None
    dup = 0
    for pdf in batches:
        for row in pdf.itertuples(index=False):
            if int(row.kind) == 0:
                ns = int(row.ns)
            else:
                dup += 1
    out = []
    if ns is not None:  # sentinel always arrives with its hit rows
        out.append((int(key[0]), ns, dup, (dup * 1_000_000) // ns))
    # Same single-micro-batch completeness argument as spanstrip._fold:
    # the group never recurs, so remove the state entry rather than
    # growing the store unboundedly under NoTimeout (ADVICE r10).
    state.remove()
    yield pd.DataFrame(
        out, columns=["doc_id", "sampled_frames", "dup_frames", "dup_ppm"]
    )


def with_frame_flags(docs: DataFrame, shared: DataFrame) -> DataFrame:
    """(streaming videos, static fingerprint dictionary) ->
    per-video dup accounting, batch-m5 schema."""
    sentinel = _video_dims(docs).select(
        "doc_id", F.lit(0).alias("kind"), F.col("ns")
    )
    hits = (
        frame_fingerprints(docs)
        .join(shared, "fp", "left_semi")
        .select("doc_id", F.lit(1).alias("kind"), F.col("ns"))
    )
    return (
        sentinel.unionByName(hits)
        .groupBy("doc_id")
        .applyInPandasWithState(
            _fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_frame_dedup(
    spark: SparkSession, docs_dir: str, sf_dir: str, schema=None
) -> DataFrame:
    """readStream over a videos (documents) directory -> per-arrival
    frame-dedup accounting against sf_dir's fingerprint dictionary."""
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    shared = shared_frame_fps(spark, sf_dir)
    docs = spark.readStream.schema(schema).parquet(docs_dir)
    return with_frame_flags(docs, shared)
