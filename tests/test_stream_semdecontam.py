"""Streaming semantic-decontam gate: availableNow replay over the real
embeddings table must reproduce batch d47 BIT-identically (independent
derivations — per-row expression folds over broadcast struct arrays vs
the batch broadcast-join + max_by aggregate), and the gate must be
batch-boundary invariant (stateless => file splits can't matter)."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans.dedup import d47_semantic_decontam
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.semdecontam import (
    _static_side,
    stream_semantic_decontam,
    with_leak_flags,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return {
        (r["train_id"], r["matched_eval"], r["max_cosine"], r["cell"])
        for r in df.collect()
    }


def test_stream_semantic_decontam_matches_batch_d47(spark, tmp_path):
    vecs_dir = tmp_path / "vecs_stream"
    vecs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/embeddings.parquet", vecs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_semantic_decontam(spark, str(vecs_dir), SF_DIR),
        "t_stream_semdecontam",
        output_mode="append",
    )
    got = _rows(streamed)
    want = _rows(d47_semantic_decontam(spark, SF_DIR))
    assert got == want  # includes raw cosine bits
    assert want, "parity test needs a non-empty leak set at this SF"


def test_stream_semantic_decontam_batch_boundary_invariant(spark, tmp_path):
    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    flat = tmp_path / "vecs_two"
    flat.mkdir()
    vecs.where("vec_id % 2 = 0").coalesce(1).write.parquet(str(tmp_path / "a"))
    vecs.where("vec_id % 2 = 1").coalesce(1).write.parquet(str(tmp_path / "b"))
    n = 0
    for sub in ("a", "b"):
        for f in (tmp_path / sub).glob("part-*.parquet"):
            shutil.copy(f, flat / f"part-{n}.parquet")
            n += 1
    assert n == 2

    stream = (
        spark.readStream.schema(vecs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    streamed = run_available_now(
        with_leak_flags(stream, _static_side(spark, SF_DIR)),
        "t_stream_semdecontam_2",
        output_mode="append",
    )
    assert _rows(streamed) == _rows(d47_semantic_decontam(spark, SF_DIR))
