"""Streaming length-quantile gate: availableNow replay over the real
documents table must equal the DuckDB-oracle-verified batch d38 row
for every language and EVERY column (the value-domain histogram
merges exactly), and per-file micro-batch arrival must converge to
the same final state as one-shot arrival."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans.dedup import d38_quantile_sketch
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.histogram import (
    stream_length_quantiles,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_want(spark):
    return {
        r["lang"]: r.asDict()
        for r in d38_quantile_sketch(spark, SF_DIR).collect()
    }


def test_stream_quantiles_match_oracle_checked_batch(spark, tmp_path):
    docs_dir = tmp_path / "docs_hist_stream"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_length_quantiles(spark, str(docs_dir)),
        "t_stream_hist",
        output_mode="update",
    )
    got = {r["lang"]: r.asDict() for r in streamed.collect()}
    assert got == _batch_want(spark)


def test_stream_quantiles_incremental_converges(spark, tmp_path):
    import duckdb

    from pyspark.sql.streaming.state import GroupStateTimeout

    from risk_dashboard_database_spark.streaming.histogram import (
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        _update,
    )

    docs_dir = tmp_path / "docs_hist_inc"
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
    # limits), so the histogram state demonstrably merges across
    # batches rather than seeing everything at once
    from risk_dashboard_database_spark.session import get_spark

    spark = get_spark(shuffle_partitions=4)
    schema = spark.read.parquet(str(docs_dir)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(docs_dir))
    )
    gated = (
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
    q = (
        gated.writeStream.format("memory")
        .queryName("t_stream_hist_inc")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("t_stream_hist_inc")
    want = _batch_want(spark)
    assert streamed.count() > len(want), (
        "rate limit must have produced multiple emissions per language"
    )
    # the final state per language is the emission with the largest
    # n_docs (the histogram only accumulates)
    final = {}
    for r in streamed.collect():
        cur = final.get(r["lang"])
        if cur is None or r["n_docs"] >= cur["n_docs"]:
            final[r["lang"]] = r.asDict()
    assert final == want
