"""Streaming near-dup candidate detection (MinHash + LSH on arrival).

The batch path (plans/dedup.d2_minhash_pairs) shingles each document,
minhashes the shingle set, hashes signature bands to bucket keys, and
joins docs sharing a bucket — never comparing all pairs. A training-
data ingest pipeline needs the same candidate detection ON ARRIVAL: as
each document lands, surface which previously-admitted documents it
likely duplicates, without rescanning the corpus.

This module is that operator: the same shingle/minhash/band
expressions feed a per-(band, bucket) stateful stage
(applyInPandasWithState) whose state is the list of doc_ids already
seen in the bucket. A new arrival emits one candidate pair per
previously-seen member, then joins the state. Work per arrival is
O(bucket size) — the same "buckets stay tiny under any real near-dup
density" argument the batch plan makes; no all-pairs comparison ever
happens, in batch or stream.

Scale posture: state is per-bucket and grows with DISTINCT bucket
membership, not with stream length (a doc_id that reappears is
skipped entirely: no re-emit, no state growth — its pairs were
emitted on first arrival, so replay stays exactly-once). At 100 TB you would attach an ingest-time
timestamp and evict buckets via state timeout past the dedup horizon
(the same watermark story as streaming/dedup.py); the documents table
has no event-time column, so the tests run NoTimeout with bounded
corpora. Exact-Jaccard confirmation of emitted candidates stays a
downstream batch join against the shingle MV — candidates are cheap
and unordered, verification is where the cost control lives.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.dedup import N_BANDS, ROWS_PER_BAND, _minhash_spark, _shingles_spark

PAIR_SCHEMA = "doc_a long, doc_b long, band int"
STATE_SCHEMA = "seen array<long>"


def stream_band_keys(spark: SparkSession, docs_dir: str) -> DataFrame:
    """readStream over a documents parquet directory -> one row per
    (doc_id, band, band_key), using the SAME shingle/minhash/band
    expressions as the batch d2 plan so stream and batch bucket
    identically."""
    schema = spark.read.parquet(docs_dir).schema
    docs = spark.readStream.schema(schema).parquet(docs_dir)
    sigs = (
        docs.select("doc_id", _shingles_spark(F.col("text")).alias("sh"))
        .where(F.size("sh") > 0)
        .select("doc_id", _minhash_spark(F.col("sh")).alias("mh"))
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    F.md5(
                        F.concat(
                            b.cast("string"),
                            F.lit(":"),
                            F.concat_ws(
                                "",
                                F.slice(F.col("mh"), b * ROWS_PER_BAND + 1, ROWS_PER_BAND),
                            ),
                        )
                    ).alias("band_key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    return bands


def _emit_pairs(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    band = int(key[0])
    seen: list[int] = list(state.get[0]) if state.exists else []
    member = set(seen)  # O(1) membership; `seen` keeps arrival order
    rows: list[tuple[int, int, int]] = []
    for pdf in batches:
        # fold arrivals in doc_id order so replay is deterministic; a
        # doc_id already in state is SKIPPED (no re-emit, no state
        # growth) — its pairs were emitted on first arrival
        for doc_id in sorted(int(d) for d in pdf["doc_id"]):
            if doc_id in member:
                continue
            rows.extend(
                (min(doc_id, other), max(doc_id, other), band) for other in seen
            )
            seen.append(doc_id)
            member.add(doc_id)
    state.update((seen,))
    yield pd.DataFrame(rows, columns=["doc_a", "doc_b", "band"])


def stream_neardup_candidates(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Candidate near-dup pairs emitted on arrival: docs sharing any
    LSH band bucket. One output row per (pair, band); consumers
    dedup across bands (batch distinct, or a second watermarked
    streaming dedup keyed on the pair)."""
    bands = stream_band_keys(spark, docs_dir)
    return bands.groupBy("band", "band_key").applyInPandasWithState(
        _emit_pairs,
        outputStructType=PAIR_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
