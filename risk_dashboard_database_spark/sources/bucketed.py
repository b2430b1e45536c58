"""Bucketed tables for co-located joins (brief: "bucketing for
co-located joins"; SURVEY §4: unique-index conflict targets become
MERGE key choice + bucket layout).

Writing both sides of a hot join bucketed by the join key lets Spark
join them with ZERO exchanges (each bucket pair joins locally) — the
disk-layout analog of the reference's FK indexes. Requires
saveAsTable (bucket metadata lives in the catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the join key. With matching bucket
    counts Spark plans a shuffle-free sort-merge join (verify: no
    Exchange above either scan in .explain)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
