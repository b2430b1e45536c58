"""Streaming k-anonymity gate: availableNow replay over the real
documents table must end, per (lang, source), with exactly the
oracle-verified batch t_k_anonymity row, under one-shot AND per-file
micro-batch arrival (update mode: the max-n_rows emission per slice
is the final card — n_rows only grows, even though the at-risk
columns are non-monotone)."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans.textstats import t_k_anonymity
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.kanonygate import (
    stream_k_anonymity,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_want(spark):
    return {
        (r["lang"], r["source"]): (
            r["n_rows"],
            r["n_classes"],
            r["min_class_size"],
            r["at_risk_rows"],
            r["at_risk_ppm"],
        )
        for r in t_k_anonymity(spark, SF_DIR).collect()
    }


def _last_card(rows):
    last: dict = {}
    for r in rows:
        k = (r["lang"], r["source"])
        cur = last.get(k)
        if cur is None or r["n_rows"] >= cur[0]:
            last[k] = (
                r["n_rows"],
                r["n_classes"],
                r["min_class_size"],
                r["at_risk_rows"],
                r["at_risk_ppm"],
            )
    return last


def test_stream_k_anonymity_matches_batch(spark, tmp_path):
    docs_dir = tmp_path / "docs_kanon"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_k_anonymity(spark, str(docs_dir)),
        "t_stream_kanon",
        output_mode="update",
    )
    assert _last_card(streamed.collect()) == _batch_want(spark)


def test_stream_k_anonymity_single_file_batches(spark, tmp_path):
    """Per-file micro-batches: class counts merge exactly, so the
    final card equals the batch census regardless of slicing — even
    though intermediate emissions can show MORE at-risk rows than the
    final state (classes get rescued as they grow past K)."""
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF_DIR}/documents.parquet")
    docs_dir = tmp_path / "docs_kanon_files"
    docs_dir.mkdir()
    third = max(1, full.num_rows // 3)
    for i in range(3):
        lo = i * third
        hi = full.num_rows if i == 2 else (i + 1) * third
        pq.write_table(full.slice(lo, hi - lo), docs_dir / f"part-{i}.parquet")

    spark_schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    stream = (
        spark.readStream.schema(spark_schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(docs_dir))
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    from risk_dashboard_database_spark.streaming.kanonygate import (
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        _update,
    )

    gated = (
        stream.select("lang", "source", "n_chars")
        .groupBy("lang", "source")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    streamed = run_available_now(
        gated, "t_stream_kanon_files", output_mode="update"
    )
    rows = streamed.collect()
    want = _batch_want(spark)
    assert len(rows) > len(want), (
        "rate limit must have produced multiple emissions per slice"
    )
    assert _last_card(rows) == want
