"""Streaming OHLC gate: batch w14's candlesticks maintained per
(series, day) on arrival — and, unlike the shard gate, EXACTLY
order-independent.

Open/close look order-sensitive, but the state can carry the ORDER
KEY alongside the value: per (user_id, date) it holds
(open_ts, open_event_id, open_value), (close_ts, close_event_id,
close_value), high, low, volume, and the cent-integer value sum. An
arriving observation replaces the open iff its (ts, event_id) sorts
BEFORE the held open key, the close iff AFTER the held close key —
an associative, commutative merge, so ANY micro-batch arrival order
(including late data) converges bit-for-bit to the batch w14 row.
This is the argmin/argmax-as-mergeable-state trick that makes an
order-sensitive aggregate safe for out-of-order feeds without a
watermark: the card is correct at every instant, not only after
finalization.

The value sum is held as integer CENTS (the batch side sums
DECIMAL(18,2)) so the running state never accumulates float error;
the emitted double is cents / 100 computed once per emission.

Parity contract (tested): availableNow replay over the events table
ends with, per (user_id, date), exactly batch w14_ohlc_resample's
row — under one-shot, per-file ordered, AND deliberately SHUFFLED
file arrival (the order-independence proof the shard gate cannot
make).
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, date string, open double, high double, low double, "
    "close double, volume long, value_sum double"
)
STATE_SCHEMA = (
    "open_ts long, open_eid long, open_v double, "
    "close_ts long, close_eid long, close_v double, "
    "high double, low double, volume bigint, cents bigint"
)


def _cents(v: float) -> int:
    # ROUND_HALF_UP explicitly: Spark's double -> DECIMAL(18,2) cast
    # rounds half-up (java BigDecimal), while Python's quantize
    # defaults to banker's rounding — invisible on 2-decimal fixture
    # values, a real divergence on arbitrary feeds
    return int(
        (
            Decimal(str(v)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
            * 100
        ).to_integral_value(rounding=ROUND_HALF_UP)
    )


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id, date = key
    if state.exists:
        (o_ts, o_eid, o_v, c_ts, c_eid, c_v, hi, lo, vol, cents) = state.get
    else:
        o_ts = o_eid = c_ts = c_eid = None
        o_v = c_v = hi = lo = None
        vol = cents = 0
    for pdf in batches:
        for ts, eid, v in zip(
            pdf["ts"].astype("int64"), pdf["event_id"], pdf["value"]
        ):
            ts, eid, v = int(ts), int(eid), float(v)
            if o_ts is None or (ts, eid) < (o_ts, o_eid):
                o_ts, o_eid, o_v = ts, eid, v
            if c_ts is None or (ts, eid) > (c_ts, c_eid):
                c_ts, c_eid, c_v = ts, eid, v
            hi = v if hi is None else max(hi, v)
            lo = v if lo is None else min(lo, v)
            vol += 1
            cents += _cents(v)
    state.update((o_ts, o_eid, o_v, c_ts, c_eid, c_v, hi, lo, vol, cents))
    yield pd.DataFrame(
        [(user_id, date, o_v, hi, lo, c_v, vol, cents / 100.0)],
        columns=[
            "user_id",
            "date",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "value_sum",
        ],
    )


def stream_ohlc(spark: SparkSession, events_dir: str, schema=None) -> DataFrame:
    """readStream over an events directory -> running per-(series,
    day) candlestick card, exactly order-independent (see module
    docstring)."""
    # read through the suite's stream reader, NOT a raw readStream:
    # it truncates TIMESTAMP(NANOS)-as-long columns to micros exactly
    # like the batch loaders and casts NTZ ts to TIMESTAMP under the
    # UTC session — bypassing it would silently mis-key nanos feeds
    # (code-review r11)
    from .daily import read_events_stream

    stream = read_events_stream(spark, events_dir, schema=schema)
    return (
        stream.select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd").alias("date"),
            # microsecond order key: casting the timestamp to long
            # would truncate to seconds and lose the batch side's
            # sub-second ordering — unix_micros keeps it exact
            F.unix_micros("ts").alias("ts"),
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
