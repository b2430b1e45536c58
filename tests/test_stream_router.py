"""Streaming code/prose router: availableNow replay over the real
documents table must equal the DuckDB-oracle-verified batch
t_code_detect row-for-row (stateless per-row expressions — the parity
pins the shared column logic across the batch and streaming paths)."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans.textstats import t_code_detect
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.router import (
    stream_route,
    with_route,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return {
        r["doc_id"]: (r["n_sym"], r["n_kw"], r["sym_ppm"], r["route"])
        for r in df.collect()
    }


def test_stream_route_matches_batch_t_code_detect(spark, tmp_path):
    docs_dir = tmp_path / "docs_route_stream"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_route(spark, str(docs_dir), plant=True),
        "t_stream_route",
        output_mode="append",
    )
    assert _rows(streamed) == _rows(t_code_detect(spark, SF_DIR))


def test_stream_route_defaults_to_real_ingest_no_planting(spark, tmp_path):
    """stream_route's default is the real-ingest form (plant=False):
    the synthetic corpus carries no code, so every document must route
    prose — planting is opt-in, never the ingest default."""
    docs_dir = tmp_path / "docs_route_stream_real"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_route(spark, str(docs_dir)),
        "t_stream_route_real",
        output_mode="append",
    )
    rows = streamed.collect()
    assert rows and all(r["route"] == "prose" for r in rows)


def test_route_without_planting_is_all_prose_on_synthetic_corpus(spark):
    """The synthetic corpus carries no code, so the real-ingest form
    (plant=False) must route everything prose — the miss path without
    the planted schedule."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = with_route(docs, plant=False).collect()
    assert out and all(r["route"] == "prose" for r in out)
