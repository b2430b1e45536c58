"""Streaming curation gate: availableNow replay over the real
documents table must equal the conjunction of the two DuckDB-oracle-
verified batch queries (t_quality_score, t_repetition) — a
cross-implementation parity check, not shared code agreeing with
itself."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from risk_dashboard_database_spark.plans import textstats
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.quality import (
    MIN_QUALITY,
    stream_curation_gate,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_gate_matches_oracle_checked_batch(spark, tmp_path):
    docs_dir = tmp_path / "docs_stream"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_curation_gate(spark, str(docs_dir)),
        "t_stream_quality",
        output_mode="append",
    )

    q = textstats.t_quality_score(spark, SF_DIR).select("doc_id", "quality_score")
    r = textstats.t_repetition(spark, SF_DIR).select("doc_id", "is_repetitive")
    want = q.join(r, "doc_id").select(
        "doc_id",
        "quality_score",
        "is_repetitive",
        (
            (F.col("quality_score") >= MIN_QUALITY)
            & (F.col("is_repetitive") == 0)
        )
        .cast("int")
        .alias("keep"),
    )
    s = {tuple(row) for row in streamed.collect()}
    b = {tuple(row) for row in want.collect()}
    assert s == b
    keeps = {row[3] for row in s}
    assert keeps == {0, 1}, "gate must be non-vacuous on the real corpus"


def test_stream_pii_gate_matches_oracle_checked_batch(spark, tmp_path):
    """Streaming PII verdict == the DuckDB-oracle-verified batch
    t_pii_redact, row for row (counts, flag, AND the redacted text) —
    the same cross-implementation parity contract as the curation
    gate."""
    from risk_dashboard_database_spark.streaming.quality import stream_pii_gate

    docs_dir = tmp_path / "docs_pii_stream"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_pii_gate(spark, str(docs_dir)),
        "t_stream_pii",
        output_mode="append",
    )
    want = textstats.t_pii_redact(spark, SF_DIR)
    s = {tuple(row) for row in streamed.collect()}
    b = {tuple(row) for row in want.collect()}
    assert s == b
    flags = {row[3] for row in s}
    assert flags == {0, 1}, "PII screen must be non-vacuous on the corpus"
