"""Stream-stream join gate: the watermarked purchase<-signup
attribution join replayed availableNow must equal the batch join
with the identical predicate row-for-row, under one-shot AND
per-file arrival; a python brute force re-derives the truth."""

from __future__ import annotations

import shutil
from datetime import timedelta

from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.joinstreamgate import (
    ATTRIB_DAYS,
    batch_attribution,
    stream_attribution,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows_key(rows):
    return {
        (
            r["user_id"],
            r["purchase_id"],
            r["signup_id"],
            r["purchase_ts"],
            r["signup_ts"],
            r["purchase_value"],
        )
        for r in rows
    }


def _python_truth(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    purchases = [r for r in ev if r["event_type"] == "purchase"]
    signups = [r for r in ev if r["event_type"] == "signup"]
    out = set()
    for p in purchases:
        for s in signups:
            if (
                p["user_id"] == s["user_id"]
                and s["ts"] <= p["ts"] <= s["ts"] + timedelta(days=ATTRIB_DAYS)
            ):
                out.add(
                    (
                        p["user_id"],
                        p["event_id"],
                        s["event_id"],
                        p["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"),
                        s["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"),
                        p["value"],
                    )
                )
    return out


def test_batch_attribution_matches_python(spark):
    got = _rows_key(batch_attribution(spark, SF_DIR).collect())
    want = _python_truth(spark)
    assert got == want
    assert want, "fixture must exercise the join (non-empty truth)"


def test_stream_attribution_matches_batch(spark, tmp_path):
    events_dir = tmp_path / "events_join"
    events_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", events_dir / "part-0.parquet")
    streamed = run_available_now(
        stream_attribution(spark, str(events_dir)),
        "t_stream_join",
        output_mode="append",
    )
    assert _rows_key(streamed.collect()) == _rows_key(
        batch_attribution(spark, SF_DIR).collect()
    )


def test_stream_attribution_single_file_batches(spark, tmp_path):
    """Per-file arrival: the two sides of a match can land in
    DIFFERENT micro-batches (files are time-sliced, so a purchase and
    its signup often split); the buffered join state must still pair
    them."""
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF_DIR}/events.parquet").sort_by("ts")
    events_dir = tmp_path / "events_join_files"
    events_dir.mkdir()
    third = max(1, full.num_rows // 3)
    for i in range(3):
        lo = i * third
        hi = full.num_rows if i == 2 else (i + 1) * third
        pq.write_table(full.slice(lo, hi - lo), events_dir / f"part-{i}.parquet")

    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    from risk_dashboard_database_spark.streaming.joinstreamgate import (
        _join,
        _sides,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(events_dir))
    )
    from pyspark.sql import functions as F

    ev = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    purchases, signups = _sides(ev)
    gated = _join(
        purchases.withWatermark("p_ts", "1 day"),
        signups.withWatermark("s_ts", "1 day"),
    )
    streamed = run_available_now(
        gated, "t_stream_join_files", output_mode="append"
    )
    assert _rows_key(streamed.collect()) == _rows_key(
        batch_attribution(spark, SF_DIR).collect()
    )
