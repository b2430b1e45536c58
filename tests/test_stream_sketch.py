"""Streaming KMV sketch: availableNow replay over the real documents
table must equal the DuckDB-oracle-verified batch d26 sketch columns
bit-for-bit (KMV merges exactly — the k smallest of a union are the
k smallest of the merged minima), and incremental two-batch arrival
must converge to the same state as one-shot arrival."""

from __future__ import annotations

import shutil
import struct

from risk_dashboard_database_spark.plans.dedup import d26_kmv_distinct
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.sketch import stream_kmv_sketch

SF_DIR = "/root/testdata/sf0.001"


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def _batch_want(spark):
    return {
        r["lang"]: (r["k_kept"], _bits(r["vocab_est"]))
        for r in d26_kmv_distinct(spark, SF_DIR).collect()
    }


def test_stream_kmv_matches_oracle_checked_batch(spark, tmp_path):
    docs_dir = tmp_path / "docs_kmv_stream"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_kmv_sketch(spark, str(docs_dir)),
        "t_stream_kmv",
        output_mode="update",
    )
    got = {
        r["lang"]: (r["k_kept"], _bits(r["vocab_est"]))
        for r in streamed.collect()
    }
    assert got == _batch_want(spark)


def test_stream_kmv_incremental_merge_converges(spark, tmp_path):
    """Split the corpus across two files/micro-batch opportunities; the
    FINAL emission per language must still equal the batch sketch —
    the mergeability property that makes KMV stream-safe."""
    import duckdb

    docs_dir = tmp_path / "docs_kmv_inc"
    docs_dir.mkdir()
    con = duckdb.connect()
    src = f"{SF_DIR}/documents.parquet"
    con.execute(
        f"COPY (SELECT * FROM '{src}' WHERE doc_id % 2 = 0) TO "
        f"'{docs_dir}/part-0.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * FROM '{src}' WHERE doc_id % 2 = 1) TO "
        f"'{docs_dir}/part-1.parquet' (FORMAT PARQUET)"
    )

    # one file per micro-batch (availableNow respects source rate
    # limits), so the sketch state demonstrably merges across batches
    schema = spark.read.parquet(str(docs_dir)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(docs_dir))
    )
    from risk_dashboard_database_spark.streaming.sketch import (
        STATE_SCHEMA,
        with_token_hashes,
        _update,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    sketched = with_token_hashes(stream).groupBy("lang").applyInPandasWithState(
        _update,
        outputStructType="lang string, k_kept long, vocab_est double",
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        sketched.writeStream.format("memory")
        .queryName("t_stream_kmv_inc")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("t_stream_kmv_inc")
    assert streamed.count() > len(_batch_want(spark)), (
        "rate limit must have produced multiple emissions per language"
    )
    # update-mode sink may hold one row per (lang, micro-batch); the
    # final state per language is the last written one — reduce by
    # keeping, per lang, the row with the largest k_kept then the
    # largest estimate (the sketch only grows toward the batch answer)
    rows = streamed.collect()
    final = {}
    for r in rows:
        cur = final.get(r["lang"])
        cand = (r["k_kept"], r["vocab_est"])
        if cur is None or cand[0] > cur[0] or (cand[0] == cur[0] and cand[1] >= cur[1]):
            final[r["lang"]] = cand
    got = {k: (v[0], _bits(v[1])) for k, v in final.items()}
    assert got == _batch_want(spark)


class _FakeState:
    """Minimal GroupState stand-in for direct _update unit tests."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_update_keeps_hv_colliding_distinct_words_in_separate_slots():
    """Batch d26 ranks distinct (lang, word) rows by the 52-bit hash
    prefix, so two DIFFERENT words colliding on hv occupy two of the k
    slots. The stream state must mirror that (round-9 advice fix): a
    hash-value set would merge them and break bit parity."""
    import pandas as pd

    from risk_dashboard_database_spark.plans.dedup import KMV_K
    from risk_dashboard_database_spark.streaming.sketch import _update

    # KMV_K distinct words, two of which collide on hv=5; plus one
    # true repeat of an already-kept word (same wid) that must NOT
    # take a second slot.
    rows = [{"hv": i, "wid": f"w{i}"} for i in range(KMV_K - 1)]
    rows.append({"hv": 5, "wid": "w5_collider"})  # distinct word, same hv
    rows.append({"hv": 3, "wid": "w3"})  # repeat occurrence, same word
    state = _FakeState()
    (out,) = _update(("en",), iter([pd.DataFrame(rows)]), state)
    assert int(out["k_kept"].iloc[0]) == KMV_K
    hvs, wids = state.get
    assert sorted(hvs).count(5) == 2, "hv collision must hold two slots"
    assert len(set(wids)) == KMV_K, "slots dedup by word identity"
