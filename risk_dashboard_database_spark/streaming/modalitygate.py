"""Streaming modality-mix monitor: batch m6's dataset card as a
running per-source gate.

A multimodal feed's first failure mode is silent — one modality stops
arriving and nothing errors. m6_modality_mix is the batch census; this
gate maintains the same card incrementally so the mix is inspectable
per micro-batch. The state is the per-source {media_type -> (items,
bytes)} map — bounded by the media-TYPE domain (4 values), the same
value-domain-merge argument as the length-histogram gate: counts and
byte sums add exactly, so any micro-batch arrival order converges
bit-for-bit to the batch answer.

Parity contract (tested): availableNow replay over the real documents
table emits, for every (source, media_type), exactly the DuckDB-
oracle-verified batch `m6_modality_mix` row, under one-shot AND
per-file micro-batch arrival.

Classification is the same magic-byte rule as batch m1/m6 ('key '
prefix, else utf-8 byte length mod 3) — computed here in the Python
fold on the identical bytes, so the two paths cannot disagree.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source string, media_type string, n_items long, total_bytes long, "
    "byte_share_ppm long"
)
STATE_SCHEMA = "kinds array<string>, items array<bigint>, bytes array<bigint>"


def _classify(text: str) -> tuple[str, int]:
    b = len((text or "").encode("utf-8"))
    if (text or "")[:4] == "key ":
        return "KEY0", b
    return {0: "IMG", 1: "AUD"}.get(b % 3, "VID"), b


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (source,) = key
    if state.exists:
        kinds, items, byts = state.get
        held = {
            k: [int(i), int(b)] for k, i, b in zip(kinds, items, byts)
        }
    else:
        held = {}
    for pdf in batches:
        for t in pdf["text"]:
            mt, b = _classify(t)
            cur = held.setdefault(mt, [0, 0])
            cur[0] += 1
            cur[1] += b
    kinds = sorted(held)
    state.update(
        (kinds, [held[k][0] for k in kinds], [held[k][1] for k in kinds])
    )
    total = sum(held[k][1] for k in kinds)
    yield pd.DataFrame(
        [
            (
                source,
                k,
                held[k][0],
                held[k][1],
                (held[k][1] * 1_000_000) // total if total else 0,
            )
            for k in kinds
        ],
        columns=[
            "source",
            "media_type",
            "n_items",
            "total_bytes",
            "byte_share_ppm",
        ],
    )


def stream_modality_mix(
    spark: SparkSession, docs_dir: str, schema=None
) -> DataFrame:
    """readStream over a documents directory -> running per-source
    modality card (one row per (source, media_type) per micro-batch
    with the current counts, byte budgets and byte shares)."""
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return (
        stream.select("source", "text")
        .groupBy("source")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
