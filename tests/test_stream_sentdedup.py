"""Streaming sentence-dedup gate: availableNow replay over the real
documents table must reproduce batch d46's per-document duplication
profile (independent derivations — per-sentence state fold vs the
batch min-key exchange), including when the corpus is split into
doc-ordered files drained one per micro-batch (state carries the
dictionary across batches)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from risk_dashboard_database_spark.plans.dedup import d46_sentence_dedup
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.sentdedup import (
    stream_sentence_dedup,
)

SF_DIR = "/root/testdata/sf0.001"


def _profile(instances):
    """Aggregate streamed instance verdicts to the batch d46 shape."""
    prof = {}
    for r in instances:
        n, d = prof.get(r["doc_id"], (0, 0))
        prof[r["doc_id"]] = (n + 1, d + (1 if r["is_dup"] else 0))
    return {
        doc: (n, d, d * 1_000_000 // n) for doc, (n, d) in prof.items()
    }


def _batch_profile(spark):
    rows = d46_sentence_dedup(spark, SF_DIR).collect()
    # the gate emits nothing for sentence-less docs (batch's zero branch)
    return {
        r["doc_id"]: (r["n_sentences"], r["n_dup_instances"], r["dup_share_ppm"])
        for r in rows
        if r["n_sentences"] > 0
    }


def test_stream_sentence_dedup_matches_batch_d46(spark, tmp_path):
    docs_dir = tmp_path / "docs_sent_stream"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_sentence_dedup(spark, str(docs_dir)),
        "t_stream_sentdedup",
        output_mode="append",
    )
    assert _profile(streamed.collect()) == _batch_profile(spark)


def test_stream_sentence_dedup_state_carries_across_batches(spark, tmp_path):
    # doc-ordered two-file split drained 1 file per micro-batch: the
    # second batch's repeats must be flagged against FIRST-batch state
    # (first-arrived == globally-first because the split is doc-ordered)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mid = docs.agg(F.expr("percentile_cont(0.5) within group (order by doc_id)")).first()[0]
    flat = tmp_path / "docs_sent_two"
    flat.mkdir()
    lo = docs.where(F.col("doc_id") <= mid).coalesce(1)
    hi = docs.where(F.col("doc_id") > mid).coalesce(1)
    lo.write.parquet(str(tmp_path / "lo"))
    hi.write.parquet(str(tmp_path / "hi"))
    n = 0
    # file names must sort lo-before-hi so arrival order is doc order
    for sub in ("lo", "hi"):
        for f in (tmp_path / sub).glob("part-*.parquet"):
            shutil.copy(f, flat / f"part-{n}.parquet")
            n += 1
    assert n == 2

    from risk_dashboard_database_spark.streaming.sentdedup import (
        with_sentence_flags,
    )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(flat))
    )
    streamed = run_available_now(
        with_sentence_flags(stream), "t_stream_sentdedup_2", output_mode="append"
    )
    assert _profile(streamed.collect()) == _batch_profile(spark)
