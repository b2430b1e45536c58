"""Streaming DSIR gate: availableNow replay over the corpus must
reproduce batch d60's weighted relation exactly, and d60's top-K
selection must be recoverable from the gate's weights alone."""

from __future__ import annotations

import hashlib
import shutil

from risk_dashboard_database_spark.plans.dedup import (
    DSIR_K,
    DSIR_TARGET,
    d60_dsir_select,
)
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.dsirgate import (
    dsir_artifacts,
    stream_dsir_weights,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_dsir_weights_match_batch_d60(spark, tmp_path):
    docs_dir = tmp_path / "docs_dsir"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    base_lm, target_lm = dsir_artifacts(spark, SF_DIR)
    streamed = run_available_now(
        stream_dsir_weights(
            spark, str(docs_dir), base_lm=base_lm, target_lm=target_lm
        ),
        "t_stream_dsir",
        output_mode="append",
    ).collect()

    by_doc = {r["doc_id"]: r for r in streamed}
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(by_doc) == n_docs

    # route partition: target-source docs are never candidates
    assert all(
        (r["route"] == "target") == (r["source"] == DSIR_TARGET)
        for r in streamed
        if r["route"] != "short"
    )
    # weights are internally consistent
    assert all(
        r["weight_ppm"] == r["target_ppm"] - r["base_ppm"]
        for r in streamed
        if r["route"] != "short"
    )

    # batch d60's selection = top-DSIR_K of the gate's candidate
    # weights under the same deterministic order
    cands = [r for r in streamed if r["route"] == "candidate"]
    cands.sort(
        key=lambda r: (
            -r["weight_ppm"],
            hashlib.md5(str(r["doc_id"]).encode()).hexdigest(),
            r["doc_id"],
        )
    )
    want = [
        (r["doc_id"], r["base_ppm"], r["target_ppm"], r["weight_ppm"])
        for r in cands[:DSIR_K]
    ]
    got_rows = sorted(
        d60_dsir_select(spark, SF_DIR).collect(), key=lambda r: r["rank"]
    )
    got = [
        (r["doc_id"], r["base_ppm"], r["target_ppm"], r["weight_ppm"])
        for r in got_rows
    ]
    assert got == want
