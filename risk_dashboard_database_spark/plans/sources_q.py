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
