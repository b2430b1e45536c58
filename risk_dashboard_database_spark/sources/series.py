"""Pipe-encoded series source (SURVEY §2.1 S2).

Reference semantics (`src/ingest_metrics.py:8-26,97-148`): interchange
CSVs carry whole time series as pipe-joined strings
(`price_history='1.0|2.0|3.0'`, `date_history='2024-01-01|...'`) that
ingest splits, zips positionally, and explodes into daily rows.

Spark-first: split + arrays_zip + explode — one narrow projection, no
Python, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_pipe_series(
    df: DataFrame,
    date_history_col: str,
    value_history_col: str,
    date_out: str = "date",
    value_out: str = "value",
) -> DataFrame:
    """Explode parallel pipe-encoded histories into one row per
    (date, value) pair. Rows where the two histories disagree in
    length are truncated to the shorter (arrays_zip pads with null;
    we drop the padded tail — the reference zips with strict=False,
    `src/ingest_metrics.py:19-24`)."""
    dates = F.split(F.col(date_history_col), r"\|")
    values = F.split(F.col(value_history_col), r"\|")
    zipped = F.arrays_zip(dates.alias("d"), values.alias("v"))
    out = (
        df.withColumn("__pair", F.explode(zipped))
        .where(F.col("__pair.d").isNotNull() & F.col("__pair.v").isNotNull())
        .withColumn(date_out, F.col("__pair.d"))
        .withColumn(value_out, F.col("__pair.v"))
        .drop("__pair", date_history_col, value_history_col)
    )
    return out
