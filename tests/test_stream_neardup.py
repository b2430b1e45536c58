"""Streaming MinHash+LSH candidate emission: the distinct pair set
from availableNow replay over the REAL documents table must equal the
batch d2 band-join candidate set, and incremental arrivals must only
ADD pairs against previously-admitted docs (no recomputation, no
misses)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from risk_dashboard_database_spark.plans.dedup import (
    N_BANDS,
    _minhash_spark,
    _shingles_spark,
)
from risk_dashboard_database_spark.streaming.neardup import (
    stream_neardup_candidates,
)


def _batch_candidates(spark, docs_df):
    sigs = (
        docs_df.select("doc_id", _shingles_spark(F.col("text")).alias("sh"))
        .where(F.size("sh") > 0)
        .select("doc_id", _minhash_spark(F.col("sh")).alias("mh"))
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat(
                            b.cast("string"),
                            F.lit(":"),
                            F.element_at(F.col("mh"), b * 3 + 1),
                            F.element_at(F.col("mh"), b * 3 + 2),
                            F.element_at(F.col("mh"), b * 3 + 3),
                        )
                    ).alias("band_key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band_key").alias("band_key"))
    cand = (
        bands.alias("b1")
        .join(
            bands.alias("b2"),
            (F.col("b1.band_key") == F.col("b2.band_key"))
            & (F.col("b1.doc_id") < F.col("b2.doc_id")),
        )
        .select(F.col("b1.doc_id").alias("doc_a"), F.col("b2.doc_id").alias("doc_b"))
        .distinct()
    )
    return {(r["doc_a"], r["doc_b"]) for r in cand.collect()}


def _drain(spark, docs_dir, ckpt, out_dir):
    q = (
        stream_neardup_candidates(spark, str(docs_dir))
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(str(out_dir))
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }


def test_stream_neardup_matches_batch_and_is_incremental(spark, tmp_path):
    docs_dir = tmp_path / "docs_stream"
    docs_dir.mkdir()
    ckpt = tmp_path / "ckpt"

    full = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    half_a = full.where(F.col("doc_id") % 2 == 0)
    half_b = full.where(F.col("doc_id") % 2 == 1)

    # batch expectations computed with the SAME expressions
    want_half = _batch_candidates(spark, half_a)
    want_full = _batch_candidates(spark, full)
    assert want_full, "corpus should contain banded near-dup candidates"

    out_dir = tmp_path / "pairs_out"
    half_a.coalesce(1).write.mode("append").parquet(str(docs_dir))
    got_half = _drain(spark, docs_dir, ckpt, out_dir)
    assert got_half == want_half

    # second file arrives: checkpointed state pairs new docs against the
    # already-admitted half without re-emitting the old pairs
    half_b.coalesce(1).write.mode("append").parquet(str(docs_dir))
    got_full = _drain(spark, docs_dir, ckpt, out_dir)
    assert got_full == want_full
