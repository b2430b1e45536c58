"""Streaming span-strip gate: availableNow replay over the base
corpus (whose shared-gram dictionary IS batch d57's) must equal
d57_span_strip row-for-row, including under 1-file micro-batches."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans.dedup import d57_span_strip
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.spanstrip import (
    stream_span_strip,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["kept_tokens"],
            r["removed_tokens"],
            r["fully_removed"],
            r["clean_text"],
        )
        for r in df.collect()
    }


def test_stream_span_strip_matches_batch_d57(spark, tmp_path):
    docs_dir = tmp_path / "docs_spanstrip"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_span_strip(spark, str(docs_dir), SF_DIR),
        "t_stream_spanstrip",
        output_mode="append",
    )
    got = _rows(streamed)
    want = _rows(d57_span_strip(spark, SF_DIR))
    assert got == want
    # the corpus has real cross-document spans to strip
    assert any(v[2] > 0 for v in want.values())


def test_stream_span_strip_single_file_batches(spark, tmp_path):
    """1-file micro-batches: every doc's sentinel + gram rows still
    land together (a document is one input row), so per-batch arrival
    granularity cannot change any verdict."""
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF_DIR}/documents.parquet")
    docs_dir = tmp_path / "docs_spanstrip_files"
    docs_dir.mkdir()
    third = max(1, full.num_rows // 3)
    for i in range(3):
        lo = i * third
        hi = full.num_rows if i == 2 else (i + 1) * third
        pq.write_table(full.slice(lo, hi - lo), docs_dir / f"part-{i}.parquet")

    from risk_dashboard_database_spark.streaming.spanstrip import (
        shared_gram_dictionary,
        with_span_strip,
    )

    schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(docs_dir))
    )
    streamed = run_available_now(
        with_span_strip(stream, shared_gram_dictionary(spark, SF_DIR)),
        "t_stream_spanstrip_files",
        output_mode="append",
    )
    assert _rows(streamed) == _rows(d57_span_strip(spark, SF_DIR))


def test_stream_span_strip_state_store_stays_empty(spark, tmp_path):
    """ADVICE r10 regression, pinned behaviorally: the span-strip fold
    removes its per-document state entry after emitting, so a finished
    replay reports ZERO state-store rows (update()-style tombstones
    would report one per document for the stream's life)."""
    import shutil

    docs_dir = tmp_path / "docs_spanstrip_state"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    q = (
        stream_span_strip(spark, str(docs_dir), SF_DIR)
        .writeStream.format("memory")
        .queryName("t_stream_spanstrip_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_rows = [
        op["numRowsTotal"]
        for p in q.recentProgress
        for op in (p.get("stateOperators") or [])
    ]
    assert state_rows and state_rows[-1] == 0, state_rows
