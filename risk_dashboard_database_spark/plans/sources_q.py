"""Source-operator query entries (SURVEY §2.1 S2).

s2 round-trips the pipe-encoded series format through the REAL source
operator: it first ENCODES the daily series into the reference's
interchange shape (`price_history='v1|v2|..'`, `date_history=
'd1|d2|..'`, `src/ingest_metrics.py:8-26`), then decodes it with
`explode_pipe_series` (split + arrays_zip + explode). The oracle skips
the round trip entirely and aggregates the daily grain directly — if
encode or decode drops/reorders/misaligns anything, the hash breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.series import explode_pipe_series
from ..tables import load_table
from .common import USER_DAY_CTE, user_day
from .registry import query

DATE_FMT = "yyyy-MM-dd"


@query(
    "s2_pipe_series_explode",
    oracle=f"""
    WITH {USER_DAY_CTE}
    SELECT user_id,
           STRFTIME(date, '%Y-%m-%d') AS date,
           CAST(total AS BIGINT) AS value
    FROM user_day
    """,
)
def s2_pipe_series_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipe-encoded series encode->decode round trip (S2)."""
    ud = user_day(spark, sf_dir)
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col("date"), F.col("total")))
    )
    encoded = ud.groupBy("user_id").agg(
        F.array_join(
            F.transform(pairs, lambda p: F.date_format(p["date"], DATE_FMT)), "|"
        ).alias("date_history"),
        F.array_join(
            F.transform(pairs, lambda p: p["total"].cast("string")), "|"
        ).alias("value_history"),
    )
    exploded = explode_pipe_series(encoded, "date_history", "value_history")
    return exploded.select(
        "user_id", "date", F.col("value").cast("long").alias("value")
    )


# ---------------------------------------------------------- s_profile
# ANALYZE-style table statistics — the stats card a cost-based
# optimizer (and every capacity-planning review) reads: per column,
# null count and distinct-value count over one pass of the table.
# Exact NDV here because the driver gate demands hash-exactness; the
# 100 TB path swaps the exact COUNT(DISTINCT) for d26's KMV sketch
# (same card, bounded error, one pass) — the expensive part, the
# single-scan multi-column fold, is the same either way.

_PROFILE_COLS = (
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate",
)


@query(
    "s_table_profile",
    oracle="\n    UNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv
    FROM lineitem"""
        for c in _PROFILE_COLS
    ),
)
def s_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics card for the biggest fact table: one row per
    column with row count, null count, and exact NDV.

    Spark shape: ONE agg over ONE scan computes every column's
    count/ndv together (the multi-COUNT(DISTINCT) Expand — each input
    row fans to |cols|+1 grouping rows BEFORE the map-side combine
    absorbs them, the standard single-pass ANALYZE plan); the 1-row
    result unpivots to the card via a stack() projection, no second
    scan. The oracle reads the table once per column instead — the
    gate pins that the fused pass equals the per-column truth."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nulls_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"__ndv_{c}"))
    one = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __nulls_{c}, __ndv_{c}" for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS (column_name, n_nulls, ndv)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column_name", "n_rows", "n_nulls", "ndv")
