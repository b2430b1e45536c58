"""Streaming length-distribution monitor: batch d38's quantile
operator as a stateful streaming gate.

The value-domain histogram is the quantile state you WANT in a
stream because it merges exactly: per-value counts add, so folding
micro-batches through per-language state converges to bit-for-bit
the batch answer — both the fixed-bin ESTIMATE and the EXACT
ceil(p*n/100)-th order statistic, because the state holds the full
(n_chars -> count) map, which is bounded by the VALUE DOMAIN (the
same boundedness argument the batch plan's dictionary-sized tail
rests on), not by stream length. Contrast percentile_approx-class
sketches, whose merge is order-dependent.

Parity contract (tested): availableNow replay over the real
documents table emits, for every language, exactly the batch
`d38_quantile_sketch` row — every column, including the exact order
statistics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.dedup import QSK_BIN_W, QSK_PS

OUTPUT_SCHEMA = "lang string, n_docs long, " + ", ".join(
    f"p{p}_exact long, p{p}_est long" for p in QSK_PS
)
STATE_SCHEMA = "lens array<bigint>, counts array<bigint>"


def _percentiles(held: dict[int, int]) -> dict[str, int]:
    n = sum(held.values())
    out = {"n_docs": n}
    cum = 0
    targets = {p: (p * n + 99) // 100 for p in QSK_PS}
    found: dict[int, int] = {}
    for v in sorted(held):
        cum += held[v]
        for p, k in targets.items():
            if p not in found and cum >= k:
                found[p] = v
    for p in QSK_PS:
        v = found[p]
        out[f"p{p}_exact"] = v
        out[f"p{p}_est"] = (v // QSK_BIN_W + 1) * QSK_BIN_W - 1
    return out


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (lang,) = key
    if state.exists:
        lens, counts = state.get
        held = {int(v): int(c) for v, c in zip(lens, counts)}
    else:
        held = {}
    for pdf in batches:
        for v in pdf["n_chars"]:
            held[int(v)] = held.get(int(v), 0) + 1
    keys = sorted(held)
    state.update((keys, [held[k] for k in keys]))
    row = {"lang": lang, **_percentiles(held)}
    yield pd.DataFrame([row], columns=["lang", "n_docs"] + [
        c for p in QSK_PS for c in (f"p{p}_exact", f"p{p}_est")
    ])


def stream_length_quantiles(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Streaming source over a documents directory -> per-language
    running length percentiles (one row per language per micro-batch
    with the current exact + histogram-estimate values)."""
    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return (
        stream.select("lang", "n_chars")
        .groupBy("lang")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
