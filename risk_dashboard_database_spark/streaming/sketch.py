"""Streaming deterministic cardinality sketch: batch d26's KMV
estimator as a stateful streaming operator.

KMV is the sketch you WANT in a stream because it merges exactly: the
k smallest hashes of a union are the k smallest of the merged minima,
so folding micro-batches through per-language state converges to
bit-for-bit the batch answer — no approximation drift, no
engine-specific merge like HLL registers. State is bounded at k
(hash, word-id) pairs per language regardless of stream length (the
`applyInPandasWithState` shape, same as `stateful.py`).

Batch-parity subtlety (round-9 fix): batch d26 ranks DISTINCT
(lang, word) rows by the 52-bit hash prefix, so two distinct words
that collide on the 13-hex prefix occupy TWO of the k slots. A
hash-value set() in the stream would merge them into one slot and
break bit parity on a bottom-k collision. State therefore dedups by
full-md5 word identity (collision odds 2^-128, the same identity
contract as d1's exact dedup) while ranking by the hv prefix — one
kept entry per distinct word, duplicates on hv preserved, exactly the
batch row_number semantics. Ties on hv at the k boundary cannot change
the answer either way: k_kept is k and hv_k is the tied value itself.

Parity contract (tested): availableNow replay over the real documents
table emits, for every language, exactly the (k_kept, vocab_est) of
the DuckDB-oracle-verified batch `d26_kmv_distinct` — including the
raw double bits of the estimate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.dedup import _KMV_HEX_CHARS, _KMV_SCALE, KMV_K

OUTPUT_SCHEMA = "lang string, k_kept long, vocab_est double"
STATE_SCHEMA = "hvs array<bigint>, wids array<string>"


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (lang,) = key
    if state.exists:
        hvs, wids = state.get
        kept = {w: int(h) for h, w in zip(hvs, wids)}
    else:
        kept = {}
    for pdf in batches:
        for hv, wid in zip(pdf["hv"], pdf["wid"]):
            if wid not in kept:
                kept[wid] = int(hv)
    # one entry per DISTINCT WORD, ranked by hv (batch row_number
    # semantics); wid tie-break only for state determinism — equal-hv
    # boundary ties cannot change k_kept or hv_k.
    held = sorted(kept.items(), key=lambda kv: (kv[1], kv[0]))[:KMV_K]
    state.update(([h for _, h in held], [w for w, _ in held]))
    k_kept = len(held)
    if k_kept < KMV_K:
        est = float(k_kept)
    else:
        est = (KMV_K - 1) / (float(held[-1][1]) / float(_KMV_SCALE))
    yield pd.DataFrame(
        [{"lang": lang, "k_kept": k_kept, "vocab_est": est}],
        columns=["lang", "k_kept", "vocab_est"],
    )


def with_token_hashes(docs: DataFrame) -> DataFrame:
    """(lang, text, ...) -> (lang, hv, wid): the same 52-bit
    md5-prefix integer batch d26 ranks on, plus the full md5 as the
    word identity used for slot dedup — both derived JVM-side before
    the stateful fold (the Python side only merges minima)."""
    return docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).select(
        "lang",
        F.conv(F.substring(F.md5(F.col("word")), 1, _KMV_HEX_CHARS), 16, 10)
        .cast("long")
        .alias("hv"),
        F.md5(F.col("word")).alias("wid"),
    )


def stream_kmv_sketch(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Streaming source over a documents directory -> per-language
    running KMV sketch (one row per language per micro-batch with the
    current estimate)."""
    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return with_token_hashes(stream).groupBy("lang").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
