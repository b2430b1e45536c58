"""Streaming LM-quality gate: availableNow replay over the real
documents table must equal the batch d43 per-doc score MV + tertile
cut assignment exactly. Cross-implementation: the streaming side
scores through a broadcast python dict in an Arrow UDF, the batch
side through the Spark join/agg pipeline — integer arithmetic on both
sides, so agreement is exact, not approximate."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from risk_dashboard_database_spark.plans.dedup import _d43_doc_scores
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.lmgate import (
    lm_artifacts,
    stream_lm_gate,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_lm_gate_matches_batch_scores(spark, tmp_path):
    docs_dir = tmp_path / "docs_stream"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    lm, cuts = lm_artifacts(spark, SF_DIR)
    streamed = run_available_now(
        stream_lm_gate(spark, str(docs_dir), lm=lm, cuts=cuts),
        "t_stream_lmgate",
        output_mode="append",
    )
    got = {r["doc_id"]: r for r in streamed.collect()}

    scored = _d43_doc_scores(spark, SF_DIR)
    want = {r["doc_id"]: r for r in scored.collect()}
    # replay text is training text: every bigram is in the LM, so the
    # streamed score equals the batch MV score exactly
    assert len(got) >= len(want)
    n_scored = 0
    for doc_id, w in want.items():
        g = got[doc_id]
        assert g["score"] == w["score"], doc_id
        t1, t2 = cuts[w["lang"]]
        exp = "tail" if w["score"] <= t1 else ("middle" if w["score"] <= t2 else "head")
        assert g["bucket"] == exp, doc_id
        n_scored += 1
    assert n_scored == len(want)
    # short docs (if any) carry the sentinel
    for doc_id, g in got.items():
        if doc_id not in want:
            assert g["score"] == -1 and g["bucket"] == "short"


def test_stream_lm_gate_oov_and_short(spark, tmp_path):
    """Synthetic arrivals the training corpus never saw: fully-OOV
    text scores 0 ppm (maximally surprising -> its language's tail
    unless the tail cut is negative, which integer ppm can't be);
    an unknown language buckets 'unknown'; a 1-token doc is 'short'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs_dir = tmp_path / "docs_oov"
    docs_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    "zzqj vvwk xxop yyrm",  # bigrams unseen by the LM
                    "zzqj vvwk",
                    "solo",
                ],
                "lang": ["en", "xx_unknown", "en"],
                "source": ["t", "t", "t"],
                "n_chars": pa.array([19, 9, 4], pa.int64()),
            }
        ),
        str(docs_dir / "part-0.parquet"),
    )

    lm, cuts = lm_artifacts(spark, SF_DIR)
    got = {
        r["doc_id"]: r
        for r in run_available_now(
            stream_lm_gate(spark, str(docs_dir), lm=lm, cuts=cuts),
            "t_stream_lmgate_oov",
            output_mode="append",
        ).collect()
    }
    assert got[1]["score"] == 0 and got[1]["bucket"] == "tail"
    assert got[2]["score"] == 0 and got[2]["bucket"] == "unknown"
    assert got[3]["score"] == -1 and got[3]["bucket"] == "short"
