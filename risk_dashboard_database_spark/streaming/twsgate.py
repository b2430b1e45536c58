"""transformWithStateInPandas gate — Spark 4's arbitrary-state
operator (the successor to applyInPandasWithState) exercised on the
running per-user activity card.

Why a separate gate when 30 applyInPandasWithState/native gates
already exist: transformWithState is the API new stateful operators
should target (typed state handles, timers, TTL, the RocksDB-backed
store), so the engine needs one oracle-pinned example proving the
semantics line up with the batch relation — the same reason w12
exercised native session_window next to the hand-rolled islands.

Semantics: per user, (n_events, value_cents, max_ts_ns) folded over
arrivals. Every term is an order-independent integer merge (count,
integer-cents sum, max), so ANY micro-batch slicing converges to the
batch groupBy exactly — the modality-gate stance, carried by a
ValueState handle instead of the GroupState tuple.

Requires the RocksDB state store provider (transformWithState's
backing store); the test sets it for the query and restores the
session conf after.

ENVIRONMENT SEAM (the F1/F3 stance): transformWithState's Python
driver worker imports `google.protobuf` (its state-server protocol is
protobuf-framed: pyspark/sql/streaming/proto/StateMessage_pb2), and
this container ships no protobuf and permits no installs — the query
compiles and starts, then the streaming runner dies with
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE / ImportError. The
gate code is therefore complete and its parity test SKIPS unless
`google.protobuf` imports (tests/test_stream_twsgate.py pins the
skip reason so it reads as the environment limitation it is, not a
pass). The applyInPandasWithState gates (funnelgate, modalitygate,
stateful, ...) are the environment-runnable arbitrary-state form.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_cents long, max_ts_ns long"
)
_STATE_SCHEMA = "n long, cents long, mx long"


def value_cents(col: F.Column) -> F.Column:
    """THE money quantization for this card: floor(value * 100) as
    BIGINT — IEEE multiply + floor, engine- and order-exact. One
    definition for the batch twin and the stream fold."""
    return F.floor(col.cast("double") * F.lit(100.0)).cast("long")


class UserActivityProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, cents, mx = (
            self._agg.get() if self._agg.exists() else (0, 0, None)
        )
        for pdf in rows:
            n += len(pdf)
            # cents were computed JVM-side (value_cents) before the
            # operator, so the python fold only ever adds integers
            cents += int(pdf["cents"].sum())
            batch_mx = int(pd.Series(pdf["ts"]).max().value)
            mx = batch_mx if mx is None else max(mx, batch_mx)
        self._agg.update((n, cents, mx))
        yield pd.DataFrame(
            [(int(key[0]), n, cents, mx)],
            columns=["user_id", "n_events", "value_cents", "max_ts_ns"],
        )

    def close(self) -> None:
        pass


def stream_user_activity_tws(
    spark: SparkSession, events_dir: str, schema=None
) -> DataFrame:
    """readStream over an events directory -> running per-user
    activity card via transformWithStateInPandas (update mode: take
    each user's LAST emission)."""
    if schema is None:
        schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return (
        stream.select(
            "user_id", "ts", value_cents(F.col("value")).alias("cents")
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserActivityProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def batch_user_activity(ev: DataFrame) -> DataFrame:
    """The batch twin: one map-side-combinable groupBy. max_ts in ns
    to match the pandas Timestamp.value the stream fold keeps (events
    ts is microsecond-grain, so *1000 is exact)."""
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(value_cents(F.col("value"))).cast("long").alias("value_cents"),
        (F.unix_micros(F.max(F.col("ts").cast("timestamp"))) * F.lit(1000))
        .cast("long")
        .alias("max_ts_ns"),
    )
