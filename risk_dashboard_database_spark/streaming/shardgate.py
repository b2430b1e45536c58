"""Streaming shard-pack gate: batch m7's shard assignment computed
for payloads on arrival — the actual shard WRITER's form.

A WebDataset-style shard writer consumes a stream and needs, for
each arriving payload, the shard it belongs to and the byte offset
it starts at; the batch m7 card is the after-the-fact census of the
same axis. The state per (source, stream) group is ONE cumulative
byte counter — the smallest state any gate in this suite carries —
and the assignment is d12's boundary arithmetic applied at append
time: shard = cum_before div budget, offset = cum_before mod budget.

Arrival order IS the packing axis (a writer packs what arrives, in
the order it arrives): the parity contract therefore pins that an
availableNow replay arriving in doc_id order reproduces batch
m7_shard_pack's card exactly (fold the per-item emissions to shard
grain), under one-shot AND per-file slicing. Out-of-order arrival is
still CORRECT (the writer packs that order); it is just a different
packing than the doc_id-ordered batch census — the docstring caveat
every append-time/batch pair in this suite states explicitly.

Within one micro-batch the fold iterates rows in ascending doc_id so
a single batch is internally order-independent; ACROSS micro-batches
the file arrival order governs, exactly like a real feed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.multimodal import M7_SHARD_BYTES, M7_STREAMS

OUTPUT_SCHEMA = (
    "source string, stream long, doc_id long, payload_bytes long, "
    "shard long, shard_offset long"
)
STATE_SCHEMA = "cum bigint"


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    source, stream = key
    (cum,) = state.get if state.exists else (0,)
    cum = int(cum)
    # applyInPandasWithState delivers ONE group's micro-batch data as
    # MULTIPLE pandas chunks (split at arrow maxRecordsPerBatch), in
    # shuffle order — sorting per chunk would interleave doc_ids
    # across chunk boundaries. Materialize the whole group's batch
    # (bounded by one group's share of one micro-batch) and sort ONCE
    # so the documented within-micro-batch doc_id order really holds.
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
        out = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            b = len((text or "").encode("utf-8"))
            out.append(
                (
                    source,
                    int(stream),
                    int(doc_id),
                    b,
                    cum // M7_SHARD_BYTES,
                    cum % M7_SHARD_BYTES,
                )
            )
            cum += b
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "source",
                    "stream",
                    "doc_id",
                    "payload_bytes",
                    "shard",
                    "shard_offset",
                ],
            )
    state.update((cum,))


def stream_shard_pack(
    spark: SparkSession, docs_dir: str, schema=None
) -> DataFrame:
    """readStream over a documents directory -> one row per arriving
    payload with its (shard, byte offset) assignment on the
    per-(source, stream) packing axis."""
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    from pyspark.sql import functions as F

    return (
        stream.select(
            "source",
            "doc_id",
            (F.col("doc_id") % M7_STREAMS).cast("long").alias("stream"),
            "text",
        )
        .groupBy("source", "stream")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
