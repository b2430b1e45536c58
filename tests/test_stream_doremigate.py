"""Streaming DoReMi card gate: availableNow replay over the real
documents table must end, per source, with exactly batch d64's
(docs, toks, score_mean) accumulators — under one-shot AND per-file
micro-batch arrival — and the shared driver-side weight derivation
from the final card must equal batch d64's weight columns
row-for-row."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans.dedup import d64_doremi_mix
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.doremigate import (
    doremi_weights_from_card,
    stream_doremi_card,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_want(spark):
    return {r["source"]: r for r in d64_doremi_mix(spark, SF_DIR).collect()}


def _assert_card_matches(spark, rows):
    want = _batch_want(spark)
    # final emission per source: accumulators only grow, so the
    # max-docs row is the last (the modality-card recovery idiom)
    last: dict = {}
    for r in rows:
        cur = last.get(r["source"])
        if cur is None or r["docs"] >= cur["docs"]:
            last[r["source"]] = r
    assert set(last) == set(want)
    for src, w in want.items():
        g = last[src]
        assert g["docs"] == w["docs"]
        assert g["toks"] == w["toks"]
        assert g["score_mean"] == w["score_mean"]
    # the weight table is a deterministic function of the card
    derived = doremi_weights_from_card(
        [
            (src, g["docs"], g["toks"], g["score_sum"])
            for src, g in last.items()
        ]
    )
    for src, w in want.items():
        assert derived[src] == (
            w["excess_ppm"],
            w["w0_ppm"],
            w["w1_ppm"],
            w["w2_ppm"],
        )
    # every arrival is accounted for: scored + short == corpus rows
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(g["docs"] + g["short_docs"] for g in last.values()) == n_docs


def test_stream_doremi_card_matches_batch(spark, tmp_path):
    docs_dir = tmp_path / "docs_doremi"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_doremi_card(spark, str(docs_dir), sf_dir=SF_DIR),
        "t_stream_doremi",
        output_mode="update",
    )
    _assert_card_matches(spark, streamed.collect())


def test_stream_doremi_card_single_file_batches(spark, tmp_path):
    """Per-file micro-batches: integer accumulators merge exactly, so
    the final card equals batch d64 regardless of arrival slicing."""
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF_DIR}/documents.parquet")
    docs_dir = tmp_path / "docs_doremi_files"
    docs_dir.mkdir()
    third = max(1, full.num_rows // 3)
    for i in range(3):
        lo = i * third
        hi = full.num_rows if i == 2 else (i + 1) * third
        pq.write_table(full.slice(lo, hi - lo), docs_dir / f"part-{i}.parquet")

    spark_schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    from pyspark.sql.streaming.state import GroupStateTimeout

    from risk_dashboard_database_spark.streaming.doremigate import (
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        _make_update,
    )
    from risk_dashboard_database_spark.streaming.lmgate import (
        bigram_ppm_table,
    )

    lm_bc = spark.sparkContext.broadcast(bigram_ppm_table(spark, SF_DIR))
    stream = (
        spark.readStream.schema(spark_schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(docs_dir))
    )
    gated = (
        stream.select("source", "text")
        .groupBy("source")
        .applyInPandasWithState(
            _make_update(lm_bc),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    streamed = run_available_now(
        gated, "t_stream_doremi_files", output_mode="update"
    )
    rows = streamed.collect()
    n_sources = len(_batch_want(spark))
    assert len(rows) > n_sources, (
        "rate limit must have produced multiple emissions per source"
    )
    _assert_card_matches(spark, rows)


def test_weights_from_card_handles_all_short_sources():
    """Regression (code-review r11): a source whose every payload is
    under 2 tokens emits a card row with docs == 0 — the derivation
    must exclude it (batch d64's scored-join never sees it) instead
    of dividing by zero; an all-short card yields {}."""
    from risk_dashboard_database_spark.streaming.doremigate import (
        doremi_weights_from_card,
    )

    assert doremi_weights_from_card([("only_short", 0, 0, 0)]) == {}
    got = doremi_weights_from_card(
        [("only_short", 0, 0, 0), ("real", 4, 40, 2_000_000)]
    )
    assert set(got) == {"real"}
    excess, w0, w1, w2 = got["real"]
    assert excess == 0  # one source IS the corpus mean
    assert w0 == w1 == w2 == 1_000_000
