"""Streaming OHLC gate: the final emission per (series, day) must
equal the oracle-verified batch w14 row under one-shot, per-file
ordered, AND deliberately SHUFFLED file arrival — the state carries
the (ts, event_id) order keys, so the merge is exactly
order-independent (this shuffled-arrival case is the proof)."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans.windows import w14_ohlc_resample
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.ohlcgate import stream_ohlc

SF_DIR = "/root/testdata/sf0.001"


def _batch_want(spark):
    return {
        (r["user_id"], r["date"]): (
            r["open"],
            r["high"],
            r["low"],
            r["close"],
            r["volume"],
            r["value_sum"],
        )
        for r in w14_ohlc_resample(spark, SF_DIR).collect()
    }


def _last_card(rows):
    last: dict = {}
    for r in rows:
        k = (r["user_id"], r["date"])
        cur = last.get(k)
        if cur is None or r["volume"] >= cur[4]:
            last[k] = (
                r["open"],
                r["high"],
                r["low"],
                r["close"],
                r["volume"],
                r["value_sum"],
            )
    return last


def test_stream_ohlc_matches_batch(spark, tmp_path):
    events_dir = tmp_path / "events_ohlc"
    events_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", events_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_ohlc(spark, str(events_dir)),
        "t_stream_ohlc",
        output_mode="update",
    )
    assert _last_card(streamed.collect()) == _batch_want(spark)


def test_stream_ohlc_shuffled_single_file_batches(spark, tmp_path):
    """Three file slices arriving in DELIBERATELY wrong time order
    (middle, last, first): open/close still converge to batch w14
    because the state holds the order keys — the order-independence
    contract the module docstring claims."""
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF_DIR}/events.parquet").sort_by("ts")
    events_dir = tmp_path / "events_ohlc_files"
    events_dir.mkdir()
    third = max(1, full.num_rows // 3)
    slices = [
        full.slice(third, third),                       # middle first
        full.slice(2 * third, full.num_rows - 2 * third),  # tail second
        full.slice(0, third),                           # head LAST
    ]
    for i, tbl in enumerate(slices):
        pq.write_table(tbl, events_dir / f"part-{i}.parquet")

    spark_schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from risk_dashboard_database_spark.streaming.ohlcgate import (
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        _update,
    )

    stream = (
        spark.readStream.schema(spark_schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(events_dir))
    )
    gated = (
        stream.select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd").alias("date"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts"),
            "event_id",
            "value",
        )
        .groupBy("user_id", "date")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    streamed = run_available_now(
        gated, "t_stream_ohlc_files", output_mode="update"
    )
    rows = streamed.collect()
    want = _batch_want(spark)
    assert len(rows) > len(want), (
        "rate limit must have produced multiple emissions per bucket"
    )
    assert _last_card(rows) == want


def test_cents_rounds_half_up_like_spark(spark):
    """The state's cent fold must round exactly like Spark's
    double -> DECIMAL(18,2) cast (HALF_UP), not Python's default
    banker's rounding — pinned on the .005 tie the fixture never
    exercises."""
    from risk_dashboard_database_spark.streaming.ohlcgate import _cents

    # 0.125 is an exact double AND an exact decimal tie: HALF_UP says
    # 13 cents, banker's (Python's quantize default) says 12
    assert _cents(0.125) == 13
    row = spark.sql(
        "SELECT CAST(CAST(0.125 AS DOUBLE) AS DECIMAL(18,2)) AS c"
    ).collect()[0]
    assert int(row["c"] * 100) == _cents(0.125)
