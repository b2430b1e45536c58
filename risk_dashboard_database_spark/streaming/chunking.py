"""Streaming chunk gate: turn each arriving document into its
overlapping token-window chunks the moment it lands.

Batch d28 (`plans/dedup.py:d28_chunk_overlap`) defines the chunk
geometry (CHUNK_W-token windows advancing by CHUNK_STRIDE). The
streaming form inherits determinism for free BECAUSE chunking is a
pure per-row function of the document text — STATELESS: no watermark,
no state store, no shuffle; a document's chunks never depend on which
micro-batch carried it, so ingest-time chunking and a batch backfill
produce byte-identical chunk tables (the property an incremental RAG
index build needs).

Independent implementation, pinned by test not code-sharing: batch
d28 derives (chunk_idx, chunk_start) from posexplode over a stride-
stepped sequence; here the starts come from FILTERING the dense token
index sequence on `i % STRIDE == 0` and the idx from integer division
— same geometry, structurally different derivation, so the parity
test catches a real divergence rather than re-asserting shared code.

Trigger guidance: same measured knee as the curation gate
(`quality.py`: BACKFILL_TRIGGER / INGEST_TRIGGER / floor notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.dedup import CHUNK_STRIDE, CHUNK_W


def with_chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, text, ...) -> one row per chunk, the batch-d28 schema:
    (doc_id, chunk_idx, chunk_start, n_chunk_tokens, chunk_hash).
    Works identically on batch and streaming DataFrames."""
    tk = F.split(F.col("text"), " ")
    starts = F.filter(
        F.sequence(F.lit(0), F.size(tk) - 1),
        lambda i: i % CHUNK_STRIDE == 0,
    )
    exploded = docs.select(
        "doc_id",
        tk.alias("tk"),
        F.explode(starts).alias("start"),
    )
    piece = F.slice(F.col("tk"), F.col("start") + 1, F.lit(CHUNK_W))
    return exploded.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("chunk_start"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_hash"),
    )


def stream_chunk_gate(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Streaming source over a documents directory -> per-arrival
    chunk rows. Stateless; any trigger policy works (see quality.py
    for the measured knee)."""
    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return with_chunks(stream)
