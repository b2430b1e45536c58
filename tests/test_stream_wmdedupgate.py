"""Native dropDuplicatesWithinWatermark gate: replaying the corpus
plus a FULL duplicate redelivery (same event_ids, later micro-batch,
inside the watermark) must yield each event_id exactly once with its
first-arrival row — equal to the batch by-key relation."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.wmdedupgate import (
    stream_dedup_within_watermark,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_want(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    assert len({r["event_id"] for r in ev}) == len(ev)  # ids unique in source
    return {
        r["event_id"]: (str(r["ts"]), r["user_id"], r["event_type"], r["value"])
        for r in ev
    }


def _got(rows):
    return {
        r["event_id"]: (str(r["ts"]), r["user_id"], r["event_type"], r["value"])
        for r in rows
    }


def test_wm_dedup_drops_full_redelivery(spark, tmp_path):
    """part-0 = the corpus; part-1 = the SAME corpus redelivered in a
    later micro-batch. The gate emits each event exactly once."""
    events_dir = tmp_path / "events_wmdedup"
    events_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", events_dir / "part-0.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", events_dir / "part-1.parquet")

    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(events_dir))
    )
    # rebuild the gate's transform over the rate-limited reader (the
    # module reads its own stream; the per-file variant needs the
    # trigger option on the source)
    from pyspark.sql import functions as F

    gated = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    out = run_available_now(gated, "t_wm_dedup_files", output_mode="append")
    rows = out.collect()
    want = _batch_want(spark)
    assert len(rows) == len(want)  # one row per id despite 2x input
    got = {
        r["event_id"]: (
            str(r["ts"]).replace("+00:00", ""),
            r["user_id"],
            r["event_type"],
            r["value"],
        )
        for r in rows
    }
    assert got == want


def test_wm_dedup_one_shot_passthrough(spark, tmp_path):
    """Without redelivery the gate is the identity on the key set."""
    events_dir = tmp_path / "events_wmdedup_clean"
    events_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", events_dir / "part-0.parquet")
    out = run_available_now(
        stream_dedup_within_watermark(spark, str(events_dir)),
        "t_wm_dedup_one",
        output_mode="append",
    )
    rows = out.collect()
    want = _batch_want(spark)
    assert len(rows) == len(want)
    got = {
        r["event_id"]: (
            str(r["ts"]).replace("+00:00", ""),
            r["user_id"],
            r["event_type"],
            r["value"],
        )
        for r in rows
    }
    assert got == want
