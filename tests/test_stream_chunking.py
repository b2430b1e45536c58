"""Streaming chunk gate: availableNow replay over the real documents
table must reproduce batch d28's chunk table row-for-row (independent
derivations — filtered dense sequence + integer div vs posexplode
over a stepped sequence), including under 1-file-per-batch triggers
(stateless => batch boundaries can't matter)."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans.dedup import d28_chunk_overlap
from risk_dashboard_database_spark.streaming.chunking import stream_chunk_gate
from risk_dashboard_database_spark.streaming.daily import run_available_now

SF_DIR = "/root/testdata/sf0.001"


def test_stream_chunk_gate_matches_batch_d28(spark, tmp_path):
    docs_dir = tmp_path / "docs_chunk_stream"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_chunk_gate(spark, str(docs_dir)),
        "t_stream_chunks",
        output_mode="append",
    )
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in d28_chunk_overlap(spark, SF_DIR).collect()}
    assert got == want
    assert len(got) > len(
        {r[0] for r in got}
    ), "long docs must produce multiple chunks"


def test_stream_chunk_gate_is_batch_boundary_invariant(spark, tmp_path):
    # split the corpus across two files and drain with
    # maxFilesPerTrigger=1: two micro-batches, same chunk table.
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs_dir = tmp_path / "docs_chunk_two"
    half_a = docs.where("doc_id % 2 = 0")
    half_b = docs.where("doc_id % 2 = 1")
    half_a.coalesce(1).write.parquet(str(docs_dir / "a"))
    half_b.coalesce(1).write.parquet(str(docs_dir / "b"))
    flat = tmp_path / "docs_chunk_flat"
    flat.mkdir()
    n = 0
    for sub in ("a", "b"):
        for f in (docs_dir / sub).glob("part-*.parquet"):
            shutil.copy(f, flat / f"part-{n}.parquet")
            n += 1
    assert n == 2

    schema = docs.schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(flat))
    from risk_dashboard_database_spark.streaming.chunking import with_chunks

    streamed = run_available_now(
        with_chunks(stream), "t_stream_chunks_2", output_mode="append"
    )
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in d28_chunk_overlap(spark, SF_DIR).collect()}
    assert got == want
