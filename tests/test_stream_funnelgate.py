"""Streaming funnel gate: availableNow replay over the real events
table must reproduce batch w15's per-user stages (and therefore the
3-row funnel card) for every user, under one-shot AND per-file
micro-batch arrival — the order-sensitivity stress, since slicing the
files reorders arrival relative to event time."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans.windows import (
    w15_funnel_steps,
    w15_user_stages,
)
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.funnelgate import (
    stream_funnel_stages,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_stages(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return {
        r["user_id"]: r["stage"] for r in w15_user_stages(ev).collect()
    }


def _last_emissions(streamed):
    # update mode: one emission per user per micro-batch it appeared
    # in; the LAST one carries the full buffered state. The memory
    # sink appends, so dedup by taking the final row per user.
    out = {}
    for r in streamed.collect():
        out[r["user_id"]] = r["stage"]
    return out


def test_stream_funnel_matches_batch_one_shot(spark, tmp_path):
    ev_dir = tmp_path / "events_funnel"
    ev_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", ev_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_funnel_stages(spark, str(ev_dir)),
        "t_stream_funnel_oneshot",
        output_mode="update",
    )
    assert _last_emissions(streamed) == _batch_stages(spark)


def test_stream_funnel_matches_batch_per_file_batches(spark, tmp_path):
    """Split the corpus into 3 files by ROW SLICE (so each user's
    events scatter across micro-batches out of event-time order) and
    replay one file per trigger: the last emission per user must
    still equal the batch stage — the buffered-state re-fold makes
    arrival order irrelevant."""
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF_DIR}/events.parquet")
    ev_dir = tmp_path / "events_funnel_files"
    ev_dir.mkdir()
    third = max(1, full.num_rows // 3)
    # reversed slice order on disk + latestFirst=false still replays
    # file order deterministically; rows inside a file are
    # event-time-shuffled already (event_id order != ts order)
    for i in range(3):
        lo = i * third
        hi = full.num_rows if i == 2 else (i + 1) * third
        pq.write_table(full.slice(lo, hi - lo), ev_dir / f"part-{2 - i}.parquet")

    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(ev_dir))
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    from risk_dashboard_database_spark.plans.windows import W15_STEPS
    from risk_dashboard_database_spark.streaming.funnelgate import (
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        _update,
    )

    gated = (
        stream.where(stream["event_type"].isin(*W15_STEPS))
        .select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    streamed = run_available_now(
        gated, "t_stream_funnel_files", output_mode="update"
    )
    assert _last_emissions(streamed) == _batch_stages(spark)


def test_stream_funnel_card_derives_from_stages(spark, tmp_path):
    """The 3-row card w15 publishes is a pure function of the per-user
    stages the gate maintains — derive it from the streamed stages and
    pin it against the oracle-checked batch card."""
    ev_dir = tmp_path / "events_funnel_card"
    ev_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", ev_dir / "part-0.parquet")
    streamed = run_available_now(
        stream_funnel_stages(spark, str(ev_dir)),
        "t_stream_funnel_card",
        output_mode="update",
    )
    stages = _last_emissions(streamed)
    u = [
        sum(1 for s in stages.values() if s >= k) for k in (1, 2, 3)
    ]
    want = {
        (r["step"], r["step_name"]): (r["users"], r["conversion_ppm"])
        for r in w15_funnel_steps(spark, SF_DIR).collect()
    }
    got = {
        (k, name): (u[k - 1], (u[k - 1] * 1_000_000) // u[0] if u[0] else None)
        for k, name in enumerate(("view", "click", "purchase"), start=1)
    }
    assert got == want
