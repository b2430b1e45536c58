"""Streaming k-anonymity monitor: batch t_k_anonymity's privacy card
maintained per (lang, source) slice on arrival.

A corpus released continuously needs its re-identification posture
CURRENT, not recomputed before each drop: as rows land, equivalence
classes over the (lang, source, length-bucket) quasi-identifier grow,
and a class crossing the K threshold moves its rows OUT of the
at-risk set — so the card is non-monotone in the risk columns and
genuinely needs the running class map, not a counter. The state per
(lang, source) group is {len_bucket -> count} — bounded by the
length-bucket domain (max document length / bucket width), the same
value-domain-merge argument as the modality and histogram gates:
counts add exactly, so any micro-batch slicing converges bit-for-bit
to the batch census.

Parity contract (tested): availableNow replay over the documents
table ends with, per (lang, source), exactly the DuckDB-oracle-
verified batch `t_k_anonymity` row — under one-shot AND per-file
arrival — including slices whose early emissions showed rows at risk
that later arrivals rescued.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.textstats import K_ANON, K_ANON_LEN_BUCKET

OUTPUT_SCHEMA = (
    "lang string, source string, n_rows long, n_classes long, "
    "min_class_size long, at_risk_rows long, at_risk_ppm long"
)
STATE_SCHEMA = "buckets array<bigint>, counts array<bigint>"


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    lang, source = key
    if state.exists:
        buckets, counts = state.get
        held = dict(zip((int(b) for b in buckets), (int(c) for c in counts)))
    else:
        held = {}
    for pdf in batches:
        for n_chars in pdf["n_chars"]:
            b = int(n_chars) // K_ANON_LEN_BUCKET
            held[b] = held.get(b, 0) + 1
    buckets = sorted(held)
    state.update((buckets, [held[b] for b in buckets]))
    n_rows = sum(held.values())
    at_risk = sum(c for c in held.values() if c < K_ANON)
    yield pd.DataFrame(
        [
            (
                lang,
                source,
                n_rows,
                len(held),
                min(held.values()),
                at_risk,
                (at_risk * 1_000_000) // n_rows if n_rows else 0,
            )
        ],
        columns=[
            "lang",
            "source",
            "n_rows",
            "n_classes",
            "min_class_size",
            "at_risk_rows",
            "at_risk_ppm",
        ],
    )


def stream_k_anonymity(
    spark: SparkSession, docs_dir: str, schema=None
) -> DataFrame:
    """readStream over a documents directory -> running per-(lang,
    source) k-anonymity card (one row per slice per micro-batch with
    the current class census and at-risk accounting)."""
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return (
        stream.select("lang", "source", "n_chars")
        .groupBy("lang", "source")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
