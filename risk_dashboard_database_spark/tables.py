"""Testdata table loaders.

The driver materializes a deterministic TPC-H-ish star schema plus an
`events` stream table, a `documents` corpus, and an `embeddings` table
(TESTDATA.md). Every named query in plans/ takes (spark, sf_dir) and
reads through these loaders.

Scale posture: each loader is a plain parquet scan, so Catalyst pushes
filters/projections into the scan (PushedFilters/ReadSchema). At 100 TB
the fact tables (lineitem/orders/events) would be date-partitioned on
disk; loaders stay identical because partition pruning happens at plan
time from the same predicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension-sized tables we always hint for broadcast in star joins.
DIM_TABLES = {"region", "nation", "customer", "supplier", "part"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark can't read
    them natively; we read them as long and truncate to micros (the
    same truncation DuckDB applies when it loads ns into its us-
    precision TIMESTAMP). Current testdata stores plain timestamp[us]
    everywhere, so this probe returns [] and reads are native — it
    stays as a guard so a ns-producing source can't silently break
    the batch/stream loaders again."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # The driver may hand us a session not built by get_spark(), so make
    # sure the nanos-as-long guard is on before the first read (a no-op
    # against the current timestamp[us] testdata). Set unconditionally
    # (not per-table) so read behavior never flips mid-session based on
    # which table loaded first. Session timezone is pinned too:
    # `CAST(ts AS DATE)` is timezone-sensitive and the DuckDB oracle
    # treats the stored instants as naive/UTC.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ns_cols = _nanos_ts_columns(path)
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(CAST({c} DIV 1000 AS LONG))"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() plans match
    the DataFrame API paths (same Catalyst plans either way)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
