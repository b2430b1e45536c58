"""Streaming decontamination: availableNow replay over the real
documents table must equal the batch d15 flags, statelessly."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans import dedup as dedup_plans
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.decontam import (
    benchmark_grams,
    stream_decontaminate,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch_d15(spark, tmp_path):
    docs_dir = tmp_path / "docs_stream"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_decontaminate(spark, str(docs_dir)),
        "t_stream_decontam",
        output_mode="append",
    )
    batch = dedup_plans.d15_decontaminate(spark, SF_DIR)
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
    assert any(r[2] == 1 for r in s)  # the corpus has real contamination


def test_incremental_arrival_is_stateless(spark, tmp_path):
    """A doc arriving in a later micro-batch gets the same verdict as
    in a bulk load: no state, so arrival order can't matter."""
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF_DIR}/documents.parquet")
    docs_dir = tmp_path / "docs_inc"
    docs_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    # benchmark grams computed from the FULL corpus file (static set);
    # the stream starts with the first half only
    grams = benchmark_grams(spark, f"{SF_DIR}/documents.parquet")
    half = full.num_rows // 2
    pq.write_table(full.slice(0, half), docs_dir / "part-0.parquet")

    schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    out_dir = str(tmp_path / "out")

    def drain():
        # file sink + shared checkpoint: the second drain processes
        # ONLY the newly-arrived file (true incremental), appending to
        # the same output dir
        q = (
            stream_decontaminate(spark, str(docs_dir), grams=grams, schema=schema)
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

    batch = dedup_plans.d15_decontaminate(spark, SF_DIR)
    assert first < both and both == {tuple(r) for r in batch.collect()}


def test_empty_benchmark_flags_nothing(spark, tmp_path):
    """No benchmark docs -> empty gram set -> every doc clean (and the
    empty-literal probe doesn't error)."""
    import shutil

    docs_dir = tmp_path / "docs_nb"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")
    out = run_available_now(
        stream_decontaminate(spark, str(docs_dir), grams=[]),
        "t_stream_decontam_nb",
        output_mode="append",
    )
    rows = out.collect()
    assert rows and all(r.contaminated == 0 for r in rows)
