"""Streaming frame-dedup gate: availableNow replay over the base
corpus (whose fingerprint dictionary IS batch m5's) must equal
m5_frame_dedup row-for-row, including under 1-file micro-batches."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans.multimodal import m5_frame_dedup
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.framegate import (
    stream_frame_dedup,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return {
        r["doc_id"]: (r["sampled_frames"], r["dup_frames"], r["dup_ppm"])
        for r in df.collect()
    }


def test_stream_frame_dedup_matches_batch_m5(spark, tmp_path):
    docs_dir = tmp_path / "vids_frame_stream"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_frame_dedup(spark, str(docs_dir), SF_DIR),
        "t_stream_framegate",
        output_mode="append",
    )
    got = _rows(streamed)
    want = _rows(m5_frame_dedup(spark, SF_DIR))
    assert got == want
    assert any(v[1] > 0 for v in want.values()), "corpus has shared frames"


def test_stream_frame_dedup_single_file_batches(spark, tmp_path):
    import pyarrow.parquet as pq

    from risk_dashboard_database_spark.plans.multimodal import (
        shared_frame_fps,
    )
    from risk_dashboard_database_spark.streaming.framegate import (
        with_frame_flags,
    )

    full = pq.read_table(f"{SF_DIR}/documents.parquet")
    docs_dir = tmp_path / "vids_frame_files"
    docs_dir.mkdir()
    half = max(1, full.num_rows // 2)
    pq.write_table(full.slice(0, half), docs_dir / "part-0.parquet")
    pq.write_table(
        full.slice(half, full.num_rows - half), docs_dir / "part-1.parquet"
    )

    schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(docs_dir))
    )
    streamed = run_available_now(
        with_frame_flags(stream, shared_frame_fps(spark, SF_DIR)),
        "t_stream_framegate_files",
        output_mode="append",
    )
    assert _rows(streamed) == _rows(m5_frame_dedup(spark, SF_DIR))
