"""Set-operation family (SURVEY §2.7 U1-U3; U4 lives in crisis.py).

- U1: the standard brand-branch ⊕ ceo-branch UNION ALL
  (`sql/article_daily_counts_mv.sql:22`, ~8 occurrences)
- U2: UNION-dedup of key sets (`sql/entity_daily_metrics_v.sql:122-130`)
- U3: 3-way heterogeneous evidence union with schema alignment and
  keep-max-weight dedup (`app.py:5398-5523`)

Scale notes: unionByName is a zero-shuffle plan concat; the only
shuffles are the branch aggregations themselves and (for U3) the
single row_number window on the dedup key. Keep-max-weight dedup via
window beats groupBy(max_by(struct)) here because the payload is the
whole row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query

DATE_FMT = "yyyy-MM-dd"


@query(
    "u1_entity_branches",
    oracle="""
    SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS date,
           'engagement' AS entity_type,
           user_id,
           COUNT(*) AS total
    FROM events WHERE event_type IN ('view','click')
    GROUP BY 1, 3
    UNION ALL
    SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS date,
           'conversion' AS entity_type,
           user_id,
           COUNT(*) AS total
    FROM events WHERE event_type IN ('purchase','signup')
    GROUP BY 1, 3
    """,
)
def u1_entity_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of typed branches (U1): each branch filters + aggs its
    slice, schemas align, branches concatenate without dedup."""
    ev = load_table(spark, sf_dir, "events")

    def branch(types: list[str], tag: str) -> DataFrame:
        return (
            ev.where(F.col("event_type").isin(*types))
            .groupBy(
                F.date_format(F.col("ts").cast("date"), DATE_FMT).alias("date"),
                "user_id",
            )
            .agg(F.count("*").alias("total"))
            .withColumn("entity_type", F.lit(tag))
            .select("date", "entity_type", "user_id", "total")
        )

    return branch(["view", "click"], "engagement").unionByName(
        branch(["purchase", "signup"], "conversion")
    )


@query(
    "u2_key_union_dedup",
    oracle="""
    SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS date, user_id
    FROM events WHERE event_type IN ('view','click')
    UNION
    SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS date, user_id
    FROM events WHERE event_type IN ('purchase','signup')
    """,
)
def u2_key_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (dedup) of key sets (U2): the `entity_keys` CTE pattern.
    Spark: union + distinct — one shuffle on the key, map-side partial
    dedup keeps it balanced."""
    ev = load_table(spark, sf_dir, "events")

    def keys(types: list[str]) -> DataFrame:
        return ev.where(F.col("event_type").isin(*types)).select(
            F.date_format(F.col("ts").cast("date"), DATE_FMT).alias("date"), "user_id"
        )

    return keys(["view", "click"]).union(keys(["purchase", "signup"])).distinct()


@query(
    "u3_evidence_union",
    oracle="""
    WITH evidence AS (
      SELECT CAST(o_custkey % 150 AS BIGINT) AS entity_id,
             STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS date,
             'order' AS evidence_type,
             'u' || CAST(o_orderkey % 500 AS VARCHAR) AS url,
             'order ' || o_orderpriority AS title,
             3 AS sort_weight
      FROM orders
      UNION ALL
      SELECT CAST(l_suppkey AS BIGINT),
             STRFTIME(CAST(l_shipdate AS DATE), '%Y-%m-%d'),
             'line',
             'u' || CAST(l_partkey % 500 AS VARCHAR),
             'line ' || l_returnflag,
             2
      FROM lineitem
      UNION ALL
      SELECT CAST(user_id AS BIGINT),
             STRFTIME(CAST(ts AS DATE), '%Y-%m-%d'),
             'event',
             'u' || CAST(event_id % 500 AS VARCHAR),
             'event ' || event_type,
             1
      FROM events
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY entity_id, date, url
               ORDER BY sort_weight DESC, evidence_type, title
             ) AS rn
      FROM evidence
    )
    SELECT entity_id, date, evidence_type, url, title,
           CAST(sort_weight AS INTEGER) AS sort_weight
    FROM ranked WHERE rn = 1
    """,
)
def u3_evidence_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way heterogeneous evidence union + keep-max-weight dedup (U3):
    align three differently-shaped sources to one schema with a
    sort_weight, UNION ALL, then `DISTINCT ON (keys) ... ORDER BY
    weight DESC` keep-best dedup (`app.py:5398-5523`)."""
    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 150).cast("long").alias("entity_id"),
        F.date_format(F.col("o_orderdate").cast("date"), DATE_FMT).alias("date"),
        F.lit("order").alias("evidence_type"),
        F.concat(F.lit("u"), (F.col("o_orderkey") % 500).cast("string")).alias("url"),
        F.concat(F.lit("order "), F.col("o_orderpriority")).alias("title"),
        F.lit(3).alias("sort_weight"),
    )
    lines = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").cast("long").alias("entity_id"),
        F.date_format(F.col("l_shipdate").cast("date"), DATE_FMT).alias("date"),
        F.lit("line").alias("evidence_type"),
        F.concat(F.lit("u"), (F.col("l_partkey") % 500).cast("string")).alias("url"),
        F.concat(F.lit("line "), F.col("l_returnflag")).alias("title"),
        F.lit(2).alias("sort_weight"),
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("entity_id"),
        F.date_format(F.col("ts").cast("date"), DATE_FMT).alias("date"),
        F.lit("event").alias("evidence_type"),
        F.concat(F.lit("u"), (F.col("event_id") % 500).cast("string")).alias("url"),
        F.concat(F.lit("event "), F.col("event_type")).alias("title"),
        F.lit(1).alias("sort_weight"),
    )
    evidence = orders.unionByName(lines).unionByName(events)
    # keep-best as a hash AGGREGATE, not a row_number window: the window
    # shuffles AND SORTS the whole 3-way union to discard 0.03% of rows;
    # min_by over the ascending key (-weight, type, title) picks the same
    # winner with a hash agg — no sort, map-side partial aggregation, and
    # at 100 TB the sort spill disappears. Ties under the key are
    # bit-identical rows (all other columns are in the group key), so the
    # result is deterministic.
    order_key = F.struct(
        (-F.col("sort_weight")).alias("nw"),
        F.col("evidence_type").alias("et"),
        F.col("title").alias("t"),
    )
    best = evidence.groupBy("entity_id", "date", "url").agg(
        F.min_by(
            F.struct("evidence_type", "title", "sort_weight"), order_key
        ).alias("best")
    )
    return best.select(
        "entity_id",
        "date",
        F.col("best.evidence_type").alias("evidence_type"),
        "url",
        F.col("best.title").alias("title"),
        F.col("best.sort_weight").cast("int").alias("sort_weight"),
    )
