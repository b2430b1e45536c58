"""Streaming Bloom-filter decontamination (the d72 batch op, on
arrival) — gate #31.

`streaming/decontam.py` folds the benchmark's raw gram set into the
per-row expression, which is the right call while the set is
broadcastable; its own docstring names the upgrade when it is not: "a
bloom filter of gram hashes when the set is large". This gate IS that
upgrade: the benchmark folds into an M-bit '0'/'1' string once at
stream setup (k md5-derived positions per gram — the exact filter the
batch d72 query and its DuckDB oracle compute), and every arriving
document probes k substring positions per gram, JVM-side. State: none
— the filter is static, so the gate is stateless per arrival (append
mode, no watermark, no state store), the chunkgate class.

Parity bar (same as the 30 existing gates): an availableNow replay
over the same files equals the batch twin row-for-row, one-shot AND
per-file; and both equal d72's bloom_contaminated column (the exists-
over-array form here and d72's max-over-exploded-rows form are the
same predicate). False positives are IN the contract — they are a
property of the filter, not the arrival order, so stream and batch
agree on them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.dedup import D72_K, D72_M, bloom_bits_from_grams, bloom_hit_col
from .decontam import _gram_expr


def benchmark_bloom_bits(
    spark: SparkSession, docs_dir: str, m: int = D72_M, k: int = D72_K
) -> str:
    """The static filter, built once at stream setup from the
    benchmark stand-in (doc_id % 97 == 0): collect is bounded by
    k x |benchmark grams| (the sanctioned dictionary-class collect —
    same justification as decontam.benchmark_grams, but the collected
    object is M bits regardless of how the benchmark grows)."""
    docs = spark.read.parquet(docs_dir).where(F.col("doc_id") % 97 == 0)
    w = docs.select(F.split(F.col("text"), " ").alias("__w"))
    grams = (
        w.select(F.explode(_gram_expr(F.col("__w"))).alias("h")).distinct()
    )
    return bloom_bits_from_grams(grams, m, k)


def _bloom_flag(bits: str, k: int = D72_K) -> F.Column:
    """exists(grams, g -> all k bits set) over the bound `__grams`
    column — the same `bloom_hit_col` probe the batch d72 runs, with
    the filter as a PLAN CONSTANT (the bound-column form copied the
    M chars into every row; see bloom_hit_col's measured note). m is
    DERIVED from the filter itself (len(bits)): a probe that hashed
    mod a different m than the build would silently read off the end
    of the string and miss set members — the false negative the whole
    design forbids (caught by the tiny-filter test)."""
    return F.exists(
        F.col("__grams"), lambda g: bloom_hit_col(g, bits, k)
    ).cast("int")


def _with_grams(df: DataFrame, bits: str) -> DataFrame:
    return df.withColumn("__grams", _gram_expr(F.col("__w")))


def batch_bloom_decontam(docs: DataFrame, bits: str) -> DataFrame:
    """Batch twin: same projection the stream runs, on a batch frame."""
    w = docs.where(F.col("doc_id") % 97 != 0).select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("__w")
    )
    return _with_grams(w, bits).select(
        "doc_id",
        "lang",
        _bloom_flag(bits).alias("bloom_contaminated"),
    )


def stream_bloom_decontam(
    spark: SparkSession,
    docs_dir: str,
    bits: str | None = None,
    schema=None,
) -> DataFrame:
    """readStream over a documents directory -> (doc_id, lang,
    bloom_contaminated int) per arriving document. Stateless; pass
    `bits` to reuse a prebuilt filter, `schema` to start on an empty
    directory."""
    if bits is None:
        bits = benchmark_bloom_bits(spark, docs_dir)
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    docs = spark.readStream.schema(schema).parquet(docs_dir)
    w = docs.where(F.col("doc_id") % 97 != 0).select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("__w")
    )
    return (
        _with_grams(w, bits)
        .select(
            "doc_id",
            "lang",
            _bloom_flag(bits).alias("bloom_contaminated"),
        )
    )
