"""Streaming trained-index maintenance gate: per-arrival cell + PQ
code assignment must equal the stored batch index MV row-for-row."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans.dedup import PQ_M, _trained_assigned
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.ivfgate import (
    codebook_side,
    stream_trained_assignment,
    with_trained_assignment,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return {
        r["vec_id"]: (
            r["label"],
            r["cell"],
            tuple(r[f"code_{s}"] for s in range(1, PQ_M + 1)),
            r["vnorm"],
        )
        for r in df.collect()
    }


def _batch_index(spark):
    mv = _trained_assigned(spark, SF_DIR)
    return _rows(mv.drop("v"))


def test_stream_assignment_matches_batch_index_mv(spark, tmp_path):
    vecs_dir = tmp_path / "vecs_ivf_stream"
    vecs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/embeddings.parquet", vecs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_trained_assignment(spark, str(vecs_dir), SF_DIR),
        "t_stream_ivf_assign",
        output_mode="append",
    )
    got = _rows(streamed)
    want = _batch_index(spark)
    assert got == want
    # the corpus actually spreads over multiple cells
    assert len({v[1] for v in got.values()}) > 1


def test_batch_dataframe_path_matches_too(spark):
    """with_trained_assignment is the shared projection: feeding it
    the batch embeddings table must reproduce the MV as well."""
    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = _rows(with_trained_assignment(vecs, codebook_side(spark, SF_DIR)))
    assert got == _batch_index(spark)
