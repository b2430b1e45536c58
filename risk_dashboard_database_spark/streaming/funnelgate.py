"""Streaming funnel gate: batch w15's per-user funnel stage maintained
on arrival.

The funnel is inherently ORDER-SENSITIVE in event time ("view, then
click, then purchase"), and stream arrival order is not event-time
order — a compact mergeable statistic does not exist (an earlier view
arriving late can re-qualify a click that was previously before the
first view). So the honest stream state is the user's funnel-relevant
events themselves: per user, the (ts, event_id, code) triples seen so
far, re-folded through the stage machine on every emission. That
state is bounded by the PER-USER funnel event count — exactly the
per-key quantity j12b_attribution_skew discloses for the interval
join; a zipf-hot user inflates their own buffer, nobody else's.

The machine itself has ONE definition: the gate's Python fold is
pinned equal to the JVM expression fold in
`plans/windows.py:w15_user_stages` by the parity test (replay ==
batch for every user, one-shot AND per-file arrival), so batch and
streaming funnels cannot drift.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.windows import W15_STEPS

OUTPUT_SCHEMA = "user_id long, stage long"
STATE_SCHEMA = "ts_ns array<bigint>, eid array<bigint>, code array<bigint>"

_CODE = {name: i + 1 for i, name in enumerate(W15_STEPS)}


def _stage(triples: list[tuple[int, int, int]]) -> int:
    """The stage machine over (ts_ns, event_id, code), sorted exactly
    like the batch fold's sort_array(struct(ts, event_id, code))."""
    stage = 0
    for _, _, code in sorted(triples):
        if code == stage + 1:
            stage += 1
    return stage


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        ts_ns, eid, code = state.get
        held = [
            (int(t), int(e), int(c)) for t, e, c in zip(ts_ns, eid, code)
        ]
    else:
        held = []
    for pdf in batches:
        for t, e, et in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
            c = _CODE.get(et)
            if c is not None:
                held.append((int(pd.Timestamp(t).value), int(e), c))
    state.update(
        (
            [t for t, _, _ in held],
            [e for _, e, _ in held],
            [c for _, _, c in held],
        )
    )
    yield pd.DataFrame(
        [(int(user_id), _stage(held))], columns=["user_id", "stage"]
    )


def stream_funnel_stages(
    spark: SparkSession, events_dir: str, schema=None
) -> DataFrame:
    """readStream over an events directory -> running per-user funnel
    stage (update mode: take each user's LAST emission)."""
    if schema is None:
        schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return (
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
