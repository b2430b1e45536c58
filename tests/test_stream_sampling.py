"""Streaming sampling gate: availableNow replay over the real
documents table must agree per-row with batch d11's hash-mod
predicate (independent bucket implementations — fold vs conv) and
roll up to exactly the DuckDB-oracle-verified d11_hash_sample
output."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from risk_dashboard_database_spark.plans.dedup import (
    SAMPLE_PCT,
    _hash_bucket_spark,
    d11_hash_sample,
)
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.sampling import stream_sample_gate

SF_DIR = "/root/testdata/sf0.001"


def test_stream_sample_gate_matches_batch_predicate_and_rollup(spark, tmp_path):
    docs_dir = tmp_path / "docs_sample_stream"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_sample_gate(spark, str(docs_dir)),
        "t_stream_sample",
        output_mode="append",
    )

    # per-row: the fold-derived bucket equals the conv-derived one
    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id",
        "lang",
        _hash_bucket_spark(F.col("doc_id")).cast("int").alias("bucket"),
    )
    want_rows = {
        (r["doc_id"], r["lang"], r["bucket"], int(r["bucket"] < SAMPLE_PCT))
        for r in batch.collect()
    }
    got_rows = {tuple(r) for r in streamed.collect()}
    assert got_rows == want_rows
    assert {r[3] for r in got_rows} == {0, 1}, "gate must be non-vacuous"

    # rollup: streamed verdicts re-aggregate to d11's oracle-checked
    # sample counts per language
    got_counts = {
        (r["lang"], r["n"], r["s"])
        for r in streamed.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("in_sample").cast("long").alias("s"),
        )
        .collect()
    }
    want_counts = {
        (r["lang"], r["docs_total"], r["sample_docs"])
        for r in d11_hash_sample(spark, SF_DIR).collect()
    }
    assert got_counts == want_counts
