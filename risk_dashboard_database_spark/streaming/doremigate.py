"""Streaming DoReMi card: batch d64's per-source accumulators
maintained on arrival.

A mixture build that reweights domains by loss feedback (the DoReMi
recipe, Xie et al. 2023 — batch form d64_doremi_mix) wants the
per-source evidence — scored docs, tokens, LM-score sum — to be
CURRENT while data lands, so the next reweighting pass reads a card
instead of re-scanning the corpus. The corpus-trained bigram LM is a
shipped artifact (lmgate's stance: bounded by vocabulary, broadcast
once); each arriving document is scored in one Arrow pass with the
SAME `score_tokens` convention batch d43/d64 use, then folded into
per-source state (docs, toks, score_sum) that is bounded by the
SOURCE domain and merges exactly under any micro-batch arrival order
(the modality-card argument: integer counters add).

The normalized weight table (w0/w1/w2) needs CROSS-source totals, so
it stays a deterministic driver-side function of the card — the
parity test derives it from the final card rows and matches batch
d64 column-for-column. Emitting it from inside a per-source group
would require routing every document through ONE state group, the
wrong 100 TB shape.

Short documents (< 2 tokens, score sentinel -1) are outside the
reweighting universe, exactly as in batch d64 (d60's 'short'
routing): they are counted in a separate `short_docs` column so the
card still accounts for every arrival.

Parity contract (tested): availableNow replay over the corpus ends
with, per source, exactly batch d64's (docs, toks, score_mean) —
under one-shot AND 1-file-per-trigger arrival — and the python
weight derivation from the final card equals d64's
(excess_ppm, w0_ppm, w1_ppm, w2_ppm) row-for-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .lmgate import bigram_ppm_table, score_tokens

OUTPUT_SCHEMA = (
    "source string, docs long, toks long, score_sum long, "
    "score_mean long, short_docs long"
)
STATE_SCHEMA = "docs bigint, toks bigint, score_sum bigint, short_docs bigint"


def _make_update(lm_bc):
    def _update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        docs, toks, ssum, short = state.get if state.exists else (0, 0, 0, 0)
        model = lm_bc.value
        for pdf in batches:
            for t in pdf["text"]:
                w = (t or "").split(" ")
                s = score_tokens(w, model)
                if s < 0:
                    short += 1
                    continue
                docs += 1
                toks += len(w)  # n_bigrams + 1, the batch token law
                ssum += s
        state.update((docs, toks, ssum, short))
        yield pd.DataFrame(
            [
                (
                    source,
                    docs,
                    toks,
                    ssum,
                    ssum // docs if docs else 0,
                    short,
                )
            ],
            columns=[
                "source",
                "docs",
                "toks",
                "score_sum",
                "score_mean",
                "short_docs",
            ],
        )

    return _update


def doremi_weights_from_card(
    card: list[tuple[str, int, int, int]]
) -> dict[str, tuple[int, int, int, int]]:
    """The deterministic weight derivation batch d64 computes in-plan,
    as a driver-side function of the card rows (source, docs, toks,
    score_sum): returns {source: (excess_ppm, w0_ppm, w1_ppm,
    w2_ppm)}. Shared by the parity test and any serving consumer so
    the two reweighting paths cannot drift.

    Sources with docs == 0 are excluded from the reweighting universe
    — the streaming card DOES emit such rows (a feed source whose
    every payload is under 2 tokens still gets its short_docs
    accounting), whereas batch d64's scored-join never sees them; the
    derivation must match the batch universe, not the card's
    disclosure rows. An all-short card returns {} (code-review r11)."""
    scored = [row for row in card if row[1] > 0]
    if not scored:
        return {}
    cdocs = sum(d for _, d, _, _ in scored)
    csum = sum(s for _, _, _, s in scored)
    ttot = sum(t for _, _, t, _ in scored)
    cmean = csum // cdocs
    rows = {}
    for source, docs, toks, ssum in scored:
        mean = ssum // docs
        excess = max(0, cmean - mean)
        w0 = (toks * 1_000_000) // ttot
        rows[source] = [excess, w0]
    s1 = sum(
        (w0 * (1_000_000 + ex)) // 1_000_000 for ex, w0 in rows.values()
    )
    for v in rows.values():
        v.append(((v[1] * (1_000_000 + v[0])) // 1_000_000) * 1_000_000 // s1)
    s2 = sum(
        (w1 * (1_000_000 + ex)) // 1_000_000 for ex, _, w1 in rows.values()
    )
    for v in rows.values():
        v.append(((v[2] * (1_000_000 + v[0])) // 1_000_000) * 1_000_000 // s2)
    return {k: tuple(v) for k, v in rows.items()}


def stream_doremi_card(
    spark: SparkSession,
    docs_dir: str,
    sf_dir: str | None = None,
    base_lm: dict[tuple[str, str], int] | None = None,
    schema=None,
) -> DataFrame:
    """readStream over a documents directory -> running per-source
    DoReMi card (one row per source per micro-batch with the current
    scored-doc/token/score accumulators and integer mean).

    Pass a precomputed ``base_lm`` or ``sf_dir`` (the CORPUS dataset
    the LM trains on — NOT the arrivals directory, whose partial
    slice would silently break batch-d64 parity)."""
    if base_lm is None:
        if sf_dir is None:
            raise ValueError(
                "stream_doremi_card needs sf_dir (the training corpus) "
                "or an explicit base_lm model table — the arrivals "
                "directory is not the corpus"
            )
        base_lm = bigram_ppm_table(spark, sf_dir)
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    lm_bc = spark.sparkContext.broadcast(base_lm)
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return (
        stream.select("source", "text")
        .groupBy("source")
        .applyInPandasWithState(
            _make_update(lm_bc),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
