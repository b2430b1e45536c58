"""Streaming sentence-dedup gate: batch d46's corpus-wide
first-instance-wins policy applied ON ARRIVAL.

Batch d46 (`plans/dedup.py:d46_sentence_dedup`) computes each
normalized sentence's first (doc_id, position) instance with one
sentence-keyed exchange. An ingest pipeline wants the same verdict the
moment a document lands: which of its sentences are already in the
corpus? That is per-sentence STATE — exactly one long (the first
instance's composite key) per distinct sentence ever admitted — so the
streaming form is applyInPandasWithState keyed on the sentence, the
same shape as the T2 chain (`stateful.py`) with a 1-scalar state row.

Contract: first-ARRIVED instance wins (the stream cannot know a
smaller key will arrive later). Replaying history in (doc_id, pos)
order — one maximal availableNow batch, or doc-ordered files — makes
first-arrived == globally-first, so the replay reproduces batch d46
exactly (tested, including under 1-file-per-batch triggers). The same
convention as stream_exact_dedup's watermark caveat, except here state
is deliberately unbounded: exact corpus-wide dedup state IS the
distinct-sentence dictionary — the same relation batch d46 shuffles —
and it is keyed by a 64-bit sentence hash, not the sentence text, so a
100 TB corpus holds ~8 bytes x distinct-sentences of store, sharded by
Spark's state-store partitioning. (A bounded variant is one
`withWatermark` away, trading exactness past the horizon, the
`dedup.py` two-tier story.)

State-key hashing note: grouping by xxhash64(sentence) instead of the
sentence string keeps state rows fixed-width; a 64-bit collision
merges two sentences' dedup scopes — acceptable for a gate (P ~ n^2 /
2^64), and the batch-parity test would catch one at test scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.dedup import D46_POS_SCALE

OUTPUT_SCHEMA = "doc_id long, pos long, is_dup boolean"
STATE_SCHEMA = "first_k long"


def _instances(docs: DataFrame) -> DataFrame:
    """(doc_id, text, ...) -> one row per normalized sentence instance:
    (doc_id, pos, k, sent_key). Same normalization as batch d46
    (split on [.!?]+, trim+lower, drop empties, 1-based positions);
    works identically on batch and streaming DataFrames."""
    ss = F.expr(
        "filter(transform(split(text, '[.!?]+'),"
        " x -> trim(lower(x))), x -> length(x) > 0)"
    )
    return (
        docs.select("doc_id", ss.alias("ss"))
        .where(F.size("ss") > 0)
        .select("doc_id", F.posexplode("ss").alias("pos0", "sent"))
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            (F.col("doc_id") * D46_POS_SCALE + F.col("pos0") + 1).alias("k"),
            F.xxhash64("sent").alias("sent_key"),
        )
    )


def _fold(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    first_k = state.get[0] if state.exists else None
    # concatenate chunks THEN sort once (stateful.py's ordering note):
    # within a batch the smallest composite key is the admitted one.
    chunks = list(batches)
    out = []
    if chunks:
        pdf = pd.concat(chunks).sort_values("k")
        for row in pdf.itertuples(index=False):
            if first_k is None:
                first_k = int(row.k)
                out.append((int(row.doc_id), int(row.pos), False))
            else:
                out.append((int(row.doc_id), int(row.pos), True))
    state.update((first_k,))
    yield pd.DataFrame(out, columns=["doc_id", "pos", "is_dup"])


def stream_sentence_dedup(spark: SparkSession, docs_dir: str, schema=None) -> DataFrame:
    """readStream over a documents directory -> per-sentence-instance
    dup verdicts (doc_id, pos, is_dup). Sentence-less documents emit
    nothing (batch d46's zero branch is a scan-side fill, not a gate
    concern)."""
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    docs = spark.readStream.schema(schema).parquet(docs_dir)
    return with_sentence_flags(docs)


def with_sentence_flags(docs: DataFrame) -> DataFrame:
    return _instances(docs).groupBy("sent_key").applyInPandasWithState(
        _fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
