"""Streaming shard-pack gate: a doc_id-ordered availableNow replay's
per-item assignments must fold to exactly the oracle-verified batch
m7_shard_pack card, under one-shot AND per-file arrival; offsets
must be contiguous on each (source, stream) packing axis."""

from __future__ import annotations

import shutil
from collections import defaultdict

from risk_dashboard_database_spark.plans.multimodal import (
    M7_SHARD_BYTES,
    m7_shard_pack,
)
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.shardgate import (
    stream_shard_pack,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_want(spark):
    return {
        (r["source"], r["stream"], r["shard"]): (
            r["n_items"],
            r["payload_bytes"],
        )
        for r in m7_shard_pack(spark, SF_DIR).collect()
    }


def _check(spark, rows):
    # fold per-item emissions to the shard card
    card: dict = defaultdict(lambda: [0, 0])
    axis: dict = defaultdict(list)
    for r in rows:
        c = card[(r["source"], r["stream"], r["shard"])]
        c[0] += 1
        c[1] += r["payload_bytes"]
        axis[(r["source"], r["stream"])].append(
            (r["doc_id"], r["shard"], r["shard_offset"], r["payload_bytes"])
        )
    assert {k: tuple(v) for k, v in card.items()} == _batch_want(spark)
    # offsets are contiguous along each packing axis in doc_id order
    for items in axis.values():
        cum = 0
        for doc_id, shard, off, b in sorted(items):
            assert shard == cum // M7_SHARD_BYTES
            assert off == cum % M7_SHARD_BYTES
            cum += b


def test_stream_shard_pack_matches_batch(spark, tmp_path):
    docs_dir = tmp_path / "docs_shard"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_shard_pack(spark, str(docs_dir)),
        "t_stream_shard",
        output_mode="append",
    )
    _check(spark, streamed.collect())


def test_stream_shard_pack_single_file_batches(spark, tmp_path):
    """Per-file micro-batches arriving in doc_id order: the running
    byte counter carries across batches, so the fold still equals the
    batch card."""
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF_DIR}/documents.parquet").sort_by("doc_id")
    docs_dir = tmp_path / "docs_shard_files"
    docs_dir.mkdir()
    third = max(1, full.num_rows // 3)
    for i in range(3):
        lo = i * third
        hi = full.num_rows if i == 2 else (i + 1) * third
        pq.write_table(full.slice(lo, hi - lo), docs_dir / f"part-{i}.parquet")

    spark_schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from risk_dashboard_database_spark.plans.multimodal import M7_STREAMS
    from risk_dashboard_database_spark.streaming.shardgate import (
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        _update,
    )

    stream = (
        spark.readStream.schema(spark_schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(docs_dir))
    )
    gated = (
        stream.select(
            "source",
            "doc_id",
            (F.col("doc_id") % M7_STREAMS).cast("long").alias("stream"),
            "text",
        )
        .groupBy("source", "stream")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    streamed = run_available_now(
        gated, "t_stream_shard_files", output_mode="append"
    )
    rows = streamed.collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs  # append mode: exactly one row per payload
    _check(spark, rows)
