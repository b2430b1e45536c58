"""Pricing/daily-count aggregations (SURVEY §2.4 A1, §2.2 P8).

Reference semantics: `sql/article_daily_counts_mv.sql:11-17,32-38` —
per-(date, entity) sentiment pivot counts with an exactly-rounded
negative ratio. Re-expressed over the synthetic star schema: the
flagship is the classic pricing-summary shape (scan → pushed filter →
hash agg with exact decimal sums), and the daily-event variant is the
direct port of the sentiment pivot-count MV.

Scale notes: both queries are single-shuffle hash aggregations with
map-side partial aggregation; the scan filter is pushed into parquet
(verify via .explain: PushedFilters on l_shipdate). Group-key
cardinality is tiny (RF x LS = 6; day x user ~ thousands), so the
reduce side is trivially balanced at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query

DEC = "decimal(18,2)"


def _dec(col: str) -> F.Column:
    return F.col(col).cast(DEC)


@query(
    "a1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      COUNT(*) AS count_order,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(8,2)) AS DECIMAL(18,4)))
           AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(8,2)) AS DECIMAL(18,4))
               * CAST(1 + l_tax AS DECIMAL(8,2)))
           AS DOUBLE) AS sum_charge,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: scan -> pushed filter -> exact-decimal hash agg."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = (_dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")).cast(
        "decimal(18,4)"
    )
    charge = disc_price * (F.lit(1) + F.col("l_tax")).cast("decimal(8,2)")
    return (
        li.where(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("count_order"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / F.count("*"), 6).alias("avg_qty"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(8,2)")).cast("double") / F.count("*"), 6
            ).alias("avg_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "a1b_rounding_parity",
    oracle="""
    SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS date,
           'brand' AS entity_type,
           user_id,
           COUNT(*) AS total,
           ROUND(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS neg_pct
    FROM events WHERE user_id % 2 = 0
    GROUP BY 1, 3
    UNION ALL
    SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d'),
           'ceo',
           user_id,
           COUNT(*),
           ROUND(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 1)
    FROM events WHERE user_id % 2 = 1
    GROUP BY 1, 3
    """,
)
def a1b_rounding_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-parity branch union (SURVEY hard part #3): the
    reference rounds `neg_pct` to SIX decimals on the brand branch but
    ONE decimal on the ceo branch (`sql/article_daily_counts_mv.sql:
    16,37`) — an easy hash-mismatch trap replicated here as the same
    two-branch UNION ALL with per-branch rounding."""
    ev = load_table(spark, sf_dir, "events")
    is_neg = F.col("event_type") == "error"

    def branch(parity: int, tag: str, digits: int) -> DataFrame:
        return (
            ev.where(F.col("user_id") % 2 == parity)
            .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("date"), "user_id")
            .agg(
                F.count("*").alias("total"),
                F.round(
                    F.sum(F.when(is_neg, 1).otherwise(0)).cast("double") / F.count("*"),
                    digits,
                ).alias("neg_pct"),
            )
            .select("date", F.lit(tag).alias("entity_type"), "user_id", "total", "neg_pct")
        )

    return branch(0, "brand", 6).unionByName(branch(1, "ceo", 1))


@query(
    "a1_daily_event_counts",
    oracle="""
    SELECT
      STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS date,
      user_id,
      CAST(SUM(CASE WHEN event_type IN ('purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS positive_count,
      CAST(SUM(CASE WHEN event_type IN ('view','click') THEN 1 ELSE 0 END) AS BIGINT) AS neutral_count,
      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS negative_count,
      COUNT(*) AS total_count,
      ROUND(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS neg_pct
    FROM events
    GROUP BY 1, 2
    ORDER BY date, user_id
    """,
)
def a1_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct port of the sentiment pivot-count MV
    (`sql/article_daily_counts_mv.sql:11-17`): per-(date, entity)
    class counts + neg ratio rounded to 6 decimals."""
    ev = load_table(spark, sf_dir, "events")
    is_pos = F.col("event_type").isin("purchase", "signup")
    is_neu = F.col("event_type").isin("view", "click")
    is_neg = F.col("event_type") == "error"
    cnt = lambda pred: F.sum(F.when(pred, 1).otherwise(0)).cast("long")  # noqa: E731
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("date"), "user_id")
        .agg(
            cnt(is_pos).alias("positive_count"),
            cnt(is_neu).alias("neutral_count"),
            cnt(is_neg).alias("negative_count"),
            F.count("*").alias("total_count"),
            F.round(
                F.sum(F.when(is_neg, 1).otherwise(0)).cast("double") / F.count("*"), 6
            ).alias("neg_pct"),
        )
    )
