"""Streaming deterministic-sampling gate: admit each arriving
document into the reproducible SAMPLE_PCT% sample the moment it lands.

Batch d11 (`plans/dedup.py:d11_hash_sample`) proves the property that
makes hash-mod sampling the right primitive: rerun -> same sample,
grow the corpus -> previously-sampled docs stay sampled. The streaming
form inherits that for free BECAUSE the verdict is a pure per-row
function of doc_id — STATELESS: no watermark, no state store, no
shuffle; a doc's verdict never depends on which micro-batch carried it
(the whole point of hash-mod over rand()/reservoir sampling, whose
streaming forms need state and lose run-to-run stability).

Independent implementation, pinned by test not code-sharing: the
bucket here is a left fold over the md5 prefix's hex characters
(acc * 16 + digit), while batch d11 goes through conv(); the parity
test replays this gate availableNow over the real documents table and
asserts per-row agreement with the batch predicate AND that the
per-language rollup equals the DuckDB-oracle-verified d11 output.

Trigger guidance: same measured knee as the curation gate
(`quality.py`: BACKFILL_TRIGGER / INGEST_TRIGGER / floor notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.dedup import SAMPLE_PCT

_HEX = "0123456789abcdef"


def _bucket_fold(doc_id: F.Column) -> F.Column:
    """0-99 bucket from the first 8 hex chars of md5(doc_id), derived
    as a base-16 left fold (acc * 16 + digit) — same function as batch
    d11's conv()-based form, structurally different implementation."""
    prefix = F.substring(F.md5(doc_id.cast("string")), 1, 8)
    digits = F.transform(
        F.split(prefix, ""),
        lambda c: F.instr(F.lit(_HEX), c) - 1,
    )
    # split("abcd", "") yields a trailing empty token on some Spark
    # versions; instr('', ...) = 0 -> digit -1. Filter to valid digits.
    val = F.aggregate(
        F.filter(digits, lambda d: d >= 0),
        F.lit(0).cast("long"),
        lambda acc, d: acc * 16 + d,
    )
    return val % 100


def with_sample_verdict(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, ...) -> (doc_id, lang, bucket, in_sample).
    Works identically on batch and streaming DataFrames."""
    bucket = _bucket_fold(F.col("doc_id"))
    return docs.select(
        "doc_id",
        "lang",
        bucket.cast("int").alias("bucket"),
        (bucket < SAMPLE_PCT).cast("int").alias("in_sample"),
    )


def stream_sample_gate(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Streaming source over a documents directory -> per-arrival
    sampling verdicts. Stateless; any trigger policy works (see
    quality.py for the measured knee)."""
    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return with_sample_verdict(stream)
