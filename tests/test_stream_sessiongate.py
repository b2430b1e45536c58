"""Streaming session gate: finalized sessions from an availableNow
replay (with a per-user far-future flush event to push the watermark
past every real session) must equal batch w12_session_windows exactly
— same native session_window operator, one definition of 'session'
across batch and streaming."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"
FLUSH_TS = "2031-01-01 00:00:00"


def _batch_want(spark):
    from risk_dashboard_database_spark.plans.windows import (
        w12_session_windows,
    )

    return {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in w12_session_windows(spark, SF_DIR).collect()
    }


def _replay(spark, tmp_path, single_file_batches: bool) -> dict:
    import duckdb

    from risk_dashboard_database_spark.streaming.daily import (
        run_available_now,
    )
    from risk_dashboard_database_spark.streaming.sessiongate import (
        stream_session_windows,
    )

    docs_dir = tmp_path / ("ev_sess_files" if single_file_batches else "ev_sess")
    docs_dir.mkdir()
    con = duckdb.connect()
    src = f"{SF_DIR}/events.parquet"
    con.execute(
        f"COPY (SELECT * FROM '{src}') TO "
        f"'{docs_dir}/part-0.parquet' (FORMAT PARQUET)"
    )
    # one flush event per user, far past every real session: once it
    # arrives, the watermark passes every real session's end and they
    # all finalize. The flush sessions themselves stay pending (or are
    # dropped by start below).
    con.execute(
        f"""COPY (
          SELECT 90000000 + user_id AS event_id,
                 TIMESTAMP '{FLUSH_TS}' AS ts, user_id,
                 'flush' AS event_type, 0.0 AS value, '' AS props
          FROM (SELECT DISTINCT user_id FROM '{src}')
        ) TO '{docs_dir}/part-1.parquet' (FORMAT PARQUET)"""
    )
    stream = stream_session_windows(spark, str(docs_dir))
    if single_file_batches:
        # rebuild with a rate limit so the flush file lands in its own
        # micro-batch AFTER the data batch (lexicographic file order)
        from pyspark.sql import functions as F  # noqa: F401

        from risk_dashboard_database_spark.streaming.sessiongate import (
            stream_session_windows as _ssw,
        )

        schema = spark.read.parquet(str(docs_dir)).schema
        ev = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(str(docs_dir))
        )
        # reuse the gate's aggregation by writing through its module
        # function on a pre-built stream is not exposed; build inline
        # with the same constants instead
        from risk_dashboard_database_spark.plans.windows import (
            W12_GAP_S,
            W12_TS_FMT_SPARK,
        )

        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
        sw = F.session_window(F.col("ts"), f"{W12_GAP_S} seconds")
        stream = (
            ev.withWatermark("ts", "0 seconds")
            .groupBy(F.col("user_id"), sw.alias("w"))
            .agg(F.count("*").cast("long").alias("n_events"))
            .select(
                "user_id",
                F.date_format(F.col("w.start"), W12_TS_FMT_SPARK).alias(
                    "session_start"
                ),
                F.date_format(F.col("w.end"), W12_TS_FMT_SPARK).alias(
                    "session_end"
                ),
                "n_events",
            )
        )
    name = "t_stream_sess_files" if single_file_batches else "t_stream_sess"
    finalized = run_available_now(stream, name, output_mode="append")
    return {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in finalized.collect()
        if not r["session_start"].startswith("2031-")
    }


def test_stream_sessions_match_batch_w12(spark, tmp_path):
    assert _replay(spark, tmp_path, False) == _batch_want(spark)


def test_stream_sessions_single_file_batches(spark, tmp_path):
    """Flush file in its OWN micro-batch: the first batch leaves every
    session pending (watermark still at the data's max ts minus gap);
    the flush batch advances the watermark and finalizes them all —
    the arrival slicing cannot change any session's extent."""
    assert _replay(spark, tmp_path, True) == _batch_want(spark)
