"""Streaming span-strip transform: batch d57's substring-dedup
REMOVAL applied to documents on arrival.

Batch d57 (`plans/dedup.py:d57_span_strip`) strips every token
position covered by a SPAN_L-gram that appears in >= 2 distinct
documents, using the stored positional gram MV. An ingest pipeline
wants the cleaned text the moment a document lands, so the streaming
form splits the work the way a production substring-dedup does
(the d27 base-vs-incoming stance):

- the SHARED-GRAM DICTIONARY — grams duplicated across the BASE
  corpus — is a STATIC relation derived from the same `d30_grams` MV
  the batch plan reads, refreshed on the MV rebuild cadence (the
  decontam gate's static-benchmark stance, corpus-sized instead of
  benchmark-sized, so it joins rather than folding into a literal);
- each arriving document explodes its positional grams, LEFT-SEMI
  joins the static dictionary (ONE gram-keyed stream-static exchange
  per micro-batch — the same key the batch agg shuffles on), and the
  per-document rebuild happens in a doc-keyed stateful fold.

A sentinel row (pos = -1, carrying the text) rides along for every
document so gram-less (short) and hit-less documents still emit their
unchanged text — batch d57 emits EVERY document.

Parity: replaying the base corpus itself (availableNow) makes the
static dictionary exactly batch d57's shared-gram set, so the replay
must equal `d57_span_strip` row-for-row (tested, including 1-file
micro-batches). For a document arriving AFTER the dictionary build,
grams it shares only with a single base document are kept until the
next dictionary refresh — the documented freshness trade of every
static-side gate here.

State-store note: the fold is keyed on doc_id and every row of a
document lands in the same micro-batch (a document is one input row;
its gram rows never split across files), so state is written once and
never revisited — the state column exists only because streaming
groupBy requires the applyInPandasWithState shape (d46's pattern).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.dedup import SPAN_L, shared_span_grams, span_gram_rows

OUTPUT_SCHEMA = (
    "doc_id long, n_tokens long, kept_tokens long, removed_tokens long, "
    "fully_removed int, clean_text string"
)
STATE_SCHEMA = "done int"


def shared_gram_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static cross-document gram dictionary (g): exactly batch
    d57's `shared_span_grams` — ONE definition of 'duplicated span'
    for both paths. Persist it (or re-materialize via the MV seam)
    before a long-running stream so micro-batches re-scan parquet,
    not recompute."""
    return shared_span_grams(spark, sf_dir)


def _strip(text: str, starts: list[int]) -> tuple[int, int, str]:
    """Python twin of the batch rebuild expression: keep position p
    unless some duplicated start s covers it (s <= p < s + SPAN_L).
    Returns (n_tokens, kept_tokens, clean_text)."""
    tk = text.split(" ")
    keep = [
        t
        for p, t in enumerate(tk)
        if not any(s <= p < s + SPAN_L for s in starts)
    ]
    return len(tk), len(keep), " ".join(keep)


def _fold(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    text = None
    starts: list[int] = []
    for pdf in batches:
        for row in pdf.itertuples(index=False):
            if int(row.pos) < 0:
                text = row.text
            else:
                starts.append(int(row.pos))
    out = []
    if text is not None:  # sentinel always arrives with its gram rows
        n, kept, clean = _strip(text, sorted(starts))
        out.append(
            (int(key[0]), n, kept, n - kept, int(kept == 0), clean)
        )
    # Every document's rows (sentinel + gram hits) are produced from the
    # same arrival file, so they land in ONE micro-batch and the group is
    # complete the moment this fold runs: drop the state entry instead of
    # parking a tombstone forever (ADVICE r10 — with NoTimeout an
    # update() here would grow the state store by one row per document
    # for the life of the stream).
    state.remove()
    yield pd.DataFrame(
        out,
        columns=[
            "doc_id",
            "n_tokens",
            "kept_tokens",
            "removed_tokens",
            "fully_removed",
            "clean_text",
        ],
    )


def with_span_strip(docs: DataFrame, shared: DataFrame) -> DataFrame:
    """(streaming docs, static dictionary) -> per-document cleaned
    text + accounting, batch-d57 schema."""
    sentinel = docs.select(
        "doc_id", F.lit(-1).cast("int").alias("pos"), F.col("text")
    )
    hits = (
        span_gram_rows(docs)
        .join(shared, "g", "left_semi")
        .select("doc_id", "pos", F.lit(None).cast("string").alias("text"))
    )
    return (
        sentinel.unionByName(hits)
        .groupBy("doc_id")
        .applyInPandasWithState(
            _fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_span_strip(
    spark: SparkSession, docs_dir: str, sf_dir: str, schema=None
) -> DataFrame:
    """readStream over a documents directory -> cleaned documents on
    arrival, stripped against sf_dir's stored shared-gram dictionary."""
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    shared = shared_gram_dictionary(spark, sf_dir)
    docs = spark.readStream.schema(schema).parquet(docs_dir)
    return with_span_strip(docs, shared)
