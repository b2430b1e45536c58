"""Streaming modality-mix gate: availableNow replay over the real
documents table must equal the oracle-verified batch m6 card for
every (source, media_type) and every column, under one-shot AND
per-file micro-batch arrival (update mode: take each group's LAST
emission)."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans.multimodal import m6_modality_mix
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.modalitygate import (
    stream_modality_mix,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_want(spark):
    return {
        (r["source"], r["media_type"]): (
            r["n_items"],
            r["total_bytes"],
            r["byte_share_ppm"],
        )
        for r in m6_modality_mix(spark, SF_DIR).collect()
    }


def test_stream_modality_mix_matches_batch(spark, tmp_path):
    docs_dir = tmp_path / "docs_modality"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_modality_mix(spark, str(docs_dir)),
        "t_stream_modality",
        output_mode="update",
    )
    got = {
        (r["source"], r["media_type"]): (
            r["n_items"],
            r["total_bytes"],
            r["byte_share_ppm"],
        )
        for r in streamed.collect()
    }
    assert got == _batch_want(spark)


def test_stream_modality_mix_single_file_batches(spark, tmp_path):
    """Per-file micro-batches: counts and byte sums merge exactly, so
    the LAST emission per (source, media_type) equals the batch card
    regardless of arrival slicing."""
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF_DIR}/documents.parquet")
    docs_dir = tmp_path / "docs_modality_files"
    docs_dir.mkdir()
    third = max(1, full.num_rows // 3)
    for i in range(3):
        lo = i * third
        hi = full.num_rows if i == 2 else (i + 1) * third
        pq.write_table(full.slice(lo, hi - lo), docs_dir / f"part-{i}.parquet")

    spark_schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    stream = (
        spark.readStream.schema(spark_schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(docs_dir))
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    from risk_dashboard_database_spark.streaming.modalitygate import (
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        _update,
    )

    gated = (
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
    # update mode emits per micro-batch; the final emission per source
    # carries the final counts for ALL its types, so keeping each
    # key's max-n_items row (counts only accumulate; later rows win
    # ties — the histogram gate's incremental-test idiom) recovers the
    # final card.
    streamed = run_available_now(
        gated, "t_stream_modality_files", output_mode="update"
    )
    assert streamed.count() > len(_batch_want(spark)), (
        "rate limit must have produced multiple emissions per source"
    )
    last: dict = {}
    for r in streamed.collect():
        k = (r["source"], r["media_type"])
        cur = last.get(k)
        if cur is None or r["n_items"] >= cur[0]:
            last[k] = (r["n_items"], r["total_bytes"], r["byte_share_ppm"])
    assert last == _batch_want(spark)
