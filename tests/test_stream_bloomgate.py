"""Streaming Bloom decontamination (gate #31): availableNow replay
over the real documents table must equal the batch twin AND the batch
d72 bloom column, statelessly; bloom flags are a superset of exact
flags (false negatives impossible); a deliberately tiny filter forces
false positives and the superset law still holds."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from risk_dashboard_database_spark.plans import dedup as dedup_plans
from risk_dashboard_database_spark.streaming.bloomgate import (
    batch_bloom_decontam,
    benchmark_bloom_bits,
    stream_bloom_decontam,
)
from risk_dashboard_database_spark.streaming.daily import run_available_now

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch_twin_and_d72(spark, tmp_path):
    docs_dir = tmp_path / "docs_bloom"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    bits = benchmark_bloom_bits(spark, str(docs_dir))
    streamed = run_available_now(
        stream_bloom_decontam(spark, str(docs_dir), bits=bits),
        "t_stream_bloom",
        output_mode="append",
    )
    s = {tuple(r) for r in streamed.collect()}
    twin = batch_bloom_decontam(spark.read.parquet(str(docs_dir)), bits)
    assert s == {tuple(r) for r in twin.collect()}
    d72 = {
        (r["doc_id"], r["lang"], r["bloom_contaminated"])
        for r in dedup_plans.d72_bloom_decontam(spark, SF_DIR).collect()
    }
    assert s == d72
    assert any(r[2] == 1 for r in s)  # the corpus has real contamination


def test_bloom_never_misses_exact_contamination(spark):
    """False negatives are impossible by construction: every doc d15
    flags, d72's bloom flags too (on the same corpus)."""
    d72 = dedup_plans.d72_bloom_decontam(spark, SF_DIR)
    missed = d72.where(
        (F.col("contaminated") == 1) & (F.col("bloom_contaminated") == 0)
    ).count()
    assert missed == 0
    # and the false_positive column is exactly the flag difference
    bad = d72.where(
        F.col("false_positive")
        != F.col("bloom_contaminated") - F.col("contaminated")
    ).count()
    assert bad == 0


def test_tiny_filter_forces_false_positives_but_no_misses(spark, tmp_path):
    """With M=64 bits the filter saturates and false positives MUST
    appear — and the superset law still holds. This exercises the FP
    path the honest-sized filter never reaches at test SFs."""
    docs_dir = tmp_path / "docs_tiny"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")
    bits = benchmark_bloom_bits(spark, str(docs_dir), m=64)
    assert bits.count("1") > 16  # saturated enough to collide
    docs = spark.read.parquet(str(docs_dir))
    tiny = batch_bloom_decontam(docs, bits)
    exact = dedup_plans.d15_decontaminate(spark, SF_DIR)
    j = tiny.withColumnRenamed("bloom_contaminated", "b").join(
        exact, ["doc_id", "lang"]
    )
    assert j.where((F.col("contaminated") == 1) & (F.col("b") == 0)).count() == 0
    assert j.where((F.col("b") == 1) & (F.col("contaminated") == 0)).count() > 0


def test_incremental_arrival_is_stateless(spark, tmp_path):
    """Per-file arrival gives the same verdicts as one-shot: the
    filter is static, so arrival order cannot matter."""
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF_DIR}/documents.parquet")
    docs_dir = tmp_path / "docs_bloom_inc"
    docs_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    bits = benchmark_bloom_bits(spark, f"{SF_DIR}/documents.parquet")
    half = full.num_rows // 2
    pq.write_table(full.slice(0, half), docs_dir / "part-0.parquet")

    schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    out_dir = str(tmp_path / "out")

    def drain():
        q = (
            stream_bloom_decontam(spark, str(docs_dir), bits=bits, schema=schema)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir)

    first = {tuple(r) for r in drain().collect()}
    assert 0 < len(first) < full.num_rows
    pq.write_table(full.slice(half), docs_dir / "part-1.parquet")
    both = {tuple(r) for r in drain().collect()}
    twin = batch_bloom_decontam(spark.read.parquet(str(docs_dir)), bits)
    assert first < both and both == {tuple(r) for r in twin.collect()}
