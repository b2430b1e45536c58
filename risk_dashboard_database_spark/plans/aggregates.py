"""Aggregation family (SURVEY §2.4 A5-A16; A1-A4 live in pricing.py /
overrides.py).

Reference shapes ported, each cited on its query. Scale notes: every
query is one or two hash aggregations; the string/map aggregations
(A5/A10) collect only per-group top-k or per-group tag sets, so state
per key is bounded; sector stats (A7) aggregate a dim-sized relation.
No driver-side loops anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from .common import USER_DAY_CTE, user_day
from .registry import query

DATE_FMT = "yyyy-MM-dd"
DEC = "decimal(18,2)"


@query(
    "a5_top_headlines",
    oracle="""
    SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS date,
           user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS negative_count,
           COALESCE(array_to_string(
             (array_agg(event_type || '#' || CAST(event_id AS VARCHAR) ORDER BY event_type || '#' || CAST(event_id AS VARCHAR))
                FILTER (WHERE event_type = 'error'))[1:3], ' | '), '') AS top_negative
    FROM events
    GROUP BY 1, 2
    """,
)
def a5_top_headlines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered, filtered, sliced string agg (A5/O5): top-3 negative
    titles per (date, entity), deterministic ordering —
    `sql/negative_summary_mv.sql:43-46` `(array_agg(title ORDER BY
    title) FILTER (...))[1:3]`. Spark: collect_list(when(...)) drops
    nulls, sort_array fixes the nondeterministic collect order, slice
    takes the top-3 — per-group state is bounded by the group size but
    the emitted value by the slice."""
    ev = load_table(spark, sf_dir, "events")
    title = F.concat("event_type", F.lit("#"), F.col("event_id").cast("string"))
    neg_titles = F.sort_array(
        F.collect_list(F.when(F.col("event_type") == "error", title))
    )
    return ev.groupBy(
        F.date_format(F.col("ts").cast("date"), DATE_FMT).alias("date"), "user_id"
    ).agg(
        F.count(F.when(F.col("event_type") == "error", 1)).alias("negative_count"),
        F.coalesce(
            F.array_join(F.slice(neg_titles, 1, 3), " | "), F.lit("")
        ).alias("top_negative"),
    )


@query(
    "a6_screen",
    oracle=f"""
    WITH {USER_DAY_CTE}
    SELECT user_id,
           CAST(SUM(total) AS BIGINT) AS window_value,
           CAST(SUM(total) AS DOUBLE) / COUNT(*) AS avg_daily_value,
           CAST(MAX(total) AS BIGINT) AS max_daily_value,
           CAST(COALESCE(MAX(CASE WHEN date = DATE '2024-01-22' THEN total END), 0) AS BIGINT) AS latest_value,
           CAST(COUNT(*) FILTER (WHERE total > 0) AS BIGINT) AS signal_days
    FROM user_day
    WHERE date BETWEEN DATE '2024-01-08' AND DATE '2024-01-22'
    GROUP BY user_id
    HAVING SUM(total) >= 30
    ORDER BY window_value DESC, user_id
    LIMIT 25
    """,
)
def a6_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-metric windowed screen (A6): per entity over [start,end]
    sum/avg/max, latest-day value, signal-day count, HAVING floor,
    ORDER BY window value LIMIT n — `app.py:4400-4425,4543-4568`."""
    ud = user_day(spark, sf_dir).where(
        F.col("date").between(F.lit("2024-01-08"), F.lit("2024-01-22"))
    )
    return (
        ud.groupBy("user_id")
        .agg(
            F.sum("total").cast("long").alias("window_value"),
            (F.sum("total").cast("double") / F.count("*")).alias("avg_daily_value"),
            F.max("total").cast("long").alias("max_daily_value"),
            F.coalesce(
                F.max(F.when(F.col("date") == F.lit("2024-01-22"), F.col("total"))),
                F.lit(0),
            )
            .cast("long")
            .alias("latest_value"),
            F.count(F.when(F.col("total") > 0, 1)).alias("signal_days"),
        )
        .where(F.col("window_value") >= 30)
        .orderBy(F.col("window_value").desc(), F.col("user_id"))
        .limit(25)
    )


@query(
    "a7_sector_stats",
    oracle="""
    WITH entity AS (
      SELECT c.c_custkey, c.c_name, c.c_mktsegment AS sector,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS window_value
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *,
             RANK() OVER (PARTITION BY sector ORDER BY window_value DESC) AS peer_rank,
             COUNT(*) OVER (PARTITION BY sector) AS n_peers,
             CAST(AVG(window_value) OVER (PARTITION BY sector) AS DOUBLE) AS sector_avg,
             CAST(MEDIAN(window_value) OVER (PARTITION BY sector) AS DOUBLE) AS sector_median,
             MAX(window_value) OVER (PARTITION BY sector) AS sector_max
      FROM entity
    )
    SELECT c_custkey, c_name, sector, window_value,
           sector_avg, sector_median, sector_max,
           CAST(peer_rank AS BIGINT) AS peer_rank,
           CAST(100.0 * (n_peers - peer_rank) AS DOUBLE) / NULLIF(n_peers - 1, 0) AS percentile
    FROM ranked
    """,
)
def a7_sector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sector summary stats (A7): avg / exact median / max of entity
    window values per sector, peer rank, percentile
    `100*(n-rank)/(n-1)` — `app.py:4592-4631`. Exact median via
    Spark 3.4+ `median` as a window function; everything derives from
    one dim-sized aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    cust = F.broadcast(load_table(spark, sf_dir, "customer"))
    entity = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", F.col("c_mktsegment").alias("sector"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("window_value"))
    )
    ws = Window.partitionBy("sector")
    wr = Window.partitionBy("sector").orderBy(F.col("window_value").desc())
    ranked = entity.select(
        "*",
        F.rank().over(wr).alias("peer_rank"),
        F.count("*").over(ws).alias("n_peers"),
        F.avg("window_value").over(ws).alias("sector_avg"),
        F.median("window_value").over(ws).alias("sector_median"),
        F.max("window_value").over(ws).alias("sector_max"),
    )
    return ranked.select(
        "c_custkey",
        "c_name",
        "sector",
        "window_value",
        "sector_avg",
        "sector_median",
        "sector_max",
        F.col("peer_rank").cast("long").alias("peer_rank"),
        (
            (F.lit(100.0) * (F.col("n_peers") - F.col("peer_rank")))
            / F.nullif(F.col("n_peers") - 1, F.lit(0))
        ).alias("percentile"),
    )


@query(
    "a8_index_union",
    oracle="""
    SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS date,
           'engagement' AS series,
           CAST(COUNT(*) AS BIGINT) AS total
    FROM events WHERE event_type IN ('view','click')
    GROUP BY 1
    UNION ALL
    SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d'), 'conversion', CAST(COUNT(*) AS BIGINT)
    FROM events WHERE event_type IN ('purchase','signup')
    GROUP BY 1
    UNION ALL
    SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d'), 'Index', CAST(COUNT(*) AS BIGINT)
    FROM events WHERE event_type IN ('view','click','purchase','signup')
    GROUP BY 1
    """,
)
def a8_index_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-mode union aggregate (A8): per-type daily series plus a
    combined 'Index' series union-appended (`app.py:6954-6990`).
    Spark-first: aggregate (date, series) once, then derive Index rows
    by re-agg over the (tiny) daily result instead of rescanning."""
    ev = load_table(spark, sf_dir, "events")
    typed = (
        ev.where(F.col("event_type").isin("view", "click", "purchase", "signup"))
        .groupBy(
            F.date_format(F.col("ts").cast("date"), DATE_FMT).alias("date"),
            F.when(F.col("event_type").isin("view", "click"), "engagement")
            .otherwise("conversion")
            .alias("series"),
        )
        .agg(F.count("*").alias("total"))
    )
    index = typed.groupBy("date").agg(F.sum("total").cast("long").alias("total")).select(
        "date", F.lit("Index").alias("series"), "total"
    )
    return typed.unionByName(index)


@query(
    "a9_evidence_summary",
    oracle="""
    WITH counts AS (
      SELECT event_type AS evidence_type,
             CASE WHEN value >= 50 THEN 'high_value' ELSE 'routine' END AS included_reason,
             COUNT(*) AS n
      FROM events
      GROUP BY 1, 2
    )
    SELECT evidence_type, included_reason, CAST(n AS BIGINT) AS n,
           CASE WHEN included_reason = 'high_value' AND n >= 100 THEN 'material'
                WHEN included_reason = 'high_value' THEN 'notable'
                ELSE 'routine' END AS interpretation
    FROM counts
    """,
)
def a9_evidence_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evidence summary maps (A9): counts by (evidence_type,
    included_reason) plus a derived interpretation label —
    `app.py:1515-1561`."""
    ev = load_table(spark, sf_dir, "events")
    reason = F.when(F.col("value") >= 50, "high_value").otherwise("routine")
    counts = ev.groupBy(
        F.col("event_type").alias("evidence_type"), reason.alias("included_reason")
    ).agg(F.count("*").alias("n"))
    return counts.select(
        "evidence_type",
        "included_reason",
        "n",
        F.when(
            (F.col("included_reason") == "high_value") & (F.col("n") >= 100), "material"
        )
        .when(F.col("included_reason") == "high_value", "notable")
        .otherwise("routine")
        .alias("interpretation"),
    )


@query(
    "a10_tag_counts_map",
    oracle="""
    WITH per_tag AS (
      SELECT CAST(ts AS DATE) AS date, user_id, event_type AS tag, COUNT(*) AS n
      FROM events
      GROUP BY 1, 2, 3
    )
    SELECT STRFTIME(date, '%Y-%m-%d') AS date, user_id,
           '{' || string_agg('"' || tag || '":' || CAST(n AS VARCHAR), ',' ORDER BY tag) || '}' AS tag_counts
    FROM per_tag
    GROUP BY 1, 2
    """,
)
def a10_tag_counts_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag-count map aggregation (A10): per (date, entity) a jsonb-like
    map tag -> count (`narrative_runtime.py:476-478,546`,
    `tag_counts jsonb`). Emitted as canonical sorted-key JSON text so
    the comparison is representation-stable across engines."""
    ev = load_table(spark, sf_dir, "events")
    per_tag = ev.groupBy(
        F.date_format(F.col("ts").cast("date"), DATE_FMT).alias("date"),
        "user_id",
        F.col("event_type").alias("tag"),
    ).agg(F.count("*").alias("n"))
    return per_tag.groupBy("date", "user_id").agg(
        F.to_json(
            F.map_from_entries(F.sort_array(F.collect_list(F.struct("tag", "n"))))
        ).alias("tag_counts")
    )


# Canonical tag priority (A11 tie-break): higher = preferred, mirroring
# the reference's crisis-group-then-canonical-order vote
# (`narrative_runtime.py:26-33,349-361,510-519`).
_TAG_PRIORITY = {"error": 5, "purchase": 4, "signup": 3, "click": 2, "view": 1}


@query(
    "a11_majority_vote",
    oracle="""
    WITH per_tag AS (
      SELECT CAST(ts AS DATE) AS date, user_id, event_type AS tag, COUNT(*) AS n,
             CASE event_type WHEN 'error' THEN 5 WHEN 'purchase' THEN 4
                  WHEN 'signup' THEN 3 WHEN 'click' THEN 2 ELSE 1 END AS priority
      FROM events
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY date, user_id
                                   ORDER BY n DESC, priority DESC) AS rn
      FROM per_tag
    )
    SELECT STRFTIME(date, '%Y-%m-%d') AS date, user_id,
           tag AS primary_tag, CAST(n AS BIGINT) AS votes
    FROM ranked WHERE rn = 1
    """,
)
def a11_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-vote argmax (A11): primary tag = argmax of (count,
    crisis-group priority, canonical order) — `narrative_runtime.py:
    510-519`. Spark: `max_by(tag, struct(n, priority))` — one
    aggregation, no window; the oracle uses row_number so the two
    formulations cross-check."""
    ev = load_table(spark, sf_dir, "events")
    priority = (
        F.when(F.col("event_type") == "error", 5)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 3)
        .when(F.col("event_type") == "click", 2)
        .otherwise(1)
    )
    per_tag = ev.groupBy(
        F.date_format(F.col("ts").cast("date"), DATE_FMT).alias("date"),
        "user_id",
        F.col("event_type").alias("tag"),
    ).agg(F.count("*").alias("n"), F.max(priority).alias("priority"))
    return per_tag.groupBy("date", "user_id").agg(
        F.expr("max_by(tag, struct(n, priority))").alias("primary_tag"),
        F.max(F.struct("n", "priority")).getField("n").alias("votes"),
    )


@query(
    "a12_bucket_counts",
    oracle="""
    SELECT c.c_mktsegment AS sector,
           o.o_orderpriority AS bucket,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_entities,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
)
def a12_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level bucket group/count (A12): the storyline/crisis-impact
    sector x tag grouping with distinct-entity counts
    (`app.py:1968-2211,2214-2414`) as a single distinct-agg."""
    orders = load_table(spark, sf_dir, "orders")
    cust = F.broadcast(load_table(spark, sf_dir, "customer"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("sector"),
            F.col("o_orderpriority").alias("bucket"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_entities"),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_value"),
        )
    )


@query(
    "a12b_storylines",
    oracle="""
    WITH tagged AS (
      SELECT c.c_mktsegment AS sector,
             o.o_orderpriority AS tag,
             c.c_name AS entity,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    grouped AS (
      SELECT sector, tag,
             CAST(COUNT(DISTINCT entity) AS BIGINT) AS n_entities,
             COUNT(*) AS n_events,
             CAST(SUM(price) AS DOUBLE) AS total_value,
             array_to_string(list_sort(list_distinct(array_agg(entity)))[1:3], ', ') AS sample_entities
      FROM tagged
      GROUP BY sector, tag
    )
    SELECT sector, tag, n_entities, n_events, total_value, sample_entities,
           CAST(2.0 AS DOUBLE) * n_entities + CAST(0.5 AS DOUBLE) * n_events AS score
    FROM grouped
    ORDER BY score DESC, sector, tag
    LIMIT 10
    """,
)
def a12b_storylines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storyline scan (A12 full shape, `app.py:1968-2211`): per
    (sector, tag) distinct-entity counts, volumes, a deterministic
    top-3 entity sample (`slice(sort_array(collect_set(...)))` — O5),
    a weighted storyline score, and the top-10 compound-sorted slice
    (O4-style composed sort key)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = F.broadcast(load_table(spark, sf_dir, "customer"))
    tagged = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("sector"),
        F.col("o_orderpriority").alias("tag"),
        F.col("c_name").alias("entity"),
        F.col("o_totalprice").cast(DEC).alias("price"),
    )
    # Two-phase: reduce to the (sector, tag, entity) grain first, then
    # aggregate entities. The single-pass countDistinct+collect_set
    # formulation ships every raw row's entity string into one reduce
    # side; pre-aggregating gets map-side combine on the fact scan and
    # the second agg only ever sees distinct entities (so collect_list
    # here == collect_set there, already deduped, and countDistinct
    # becomes a plain count). Measured 2x at sf0.1 (1.81 -> 0.90 s).
    per_entity = tagged.groupBy("sector", "tag", "entity").agg(
        F.count("*").alias("n"), F.sum("price").alias("p")
    )
    grouped = per_entity.groupBy("sector", "tag").agg(
        # count(entity), not count(*): the per-entity grain would give a
        # NULL entity its own row, and countDistinct (the semantics this
        # rewrite replaced) never counted NULLs
        F.count("entity").alias("n_entities"),
        F.sum("n").alias("n_events"),
        F.sum("p").cast("double").alias("total_value"),
        F.array_join(
            F.slice(F.sort_array(F.collect_list("entity")), 1, 3), ", "
        ).alias("sample_entities"),
    )
    score = F.lit(2.0) * F.col("n_entities") + F.lit(0.5) * F.col("n_events")
    return (
        grouped.withColumn("score", score)
        .orderBy(F.col("score").desc(), F.col("sector"), F.col("tag"))
        .limit(10)
    )


@query(
    "a13_distinct_dates",
    oracle="""
    SELECT DISTINCT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS date FROM events
    """,
)
def a13_distinct_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-date list (A13): `select distinct date` date-picker
    feed (`app.py:2737-2752`)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.date_format(F.col("ts").cast("date"), DATE_FMT).alias("date")
    ).distinct()


@query(
    "a14_latest_lookup",
    oracle="""
    SELECT user_id, STRFTIME(MAX(CAST(ts AS DATE)), '%Y-%m-%d') AS latest_date,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days
    FROM events
    GROUP BY user_id
    """,
)
def a14_latest_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max(date) latest-available lookup per scope (A14):
    `app.py:4376-4387,5375-5383`."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.date_format(F.max(F.col("ts").cast("date")), DATE_FMT).alias("latest_date"),
        F.countDistinct(F.col("ts").cast("date")).alias("active_days"),
    )


@query(
    "a15_sector_company_count",
    oracle="""
    SELECT c_mktsegment AS sector, COUNT(*) AS n_companies
    FROM customer
    GROUP BY 1
    """,
)
def a15_sector_company_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sector company-count (A15): `group by sector`
    (`app.py:1171-1182`)."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("sector"))
        .agg(F.count("*").alias("n_companies"))
    )


@query(
    "a16_confusion_matrix",
    oracle="""
    WITH labeled AS (
      SELECT CASE WHEN event_type IN ('purchase','signup') THEN 'positive'
                  WHEN event_type IN ('view','click') THEN 'neutral'
                  ELSE 'negative' END AS truth,
             CASE WHEN CAST(props->>'$.k' AS INTEGER) % 5 = 0 THEN
               CASE WHEN event_type IN ('purchase','signup') THEN 'positive'
                    WHEN event_type IN ('view','click') THEN 'neutral'
                    ELSE 'negative' END
             ELSE
               CASE CAST(props->>'$.k' AS INTEGER) % 3
                    WHEN 0 THEN 'negative' WHEN 1 THEN 'neutral' ELSE 'positive' END
             END AS predicted
      FROM events
    )
    SELECT truth, predicted, COUNT(*) AS n,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY truth) AS frac_of_truth,
           CAST(SUM(CASE WHEN truth = predicted THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS cell_agreement
    FROM labeled
    GROUP BY truth, predicted
    """,
)
def a16_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-agreement confusion matrix (A16): baseline label vs
    candidate label counts + per-truth fractions — the sentiment
    bakeoff harness (`scripts/sentiment_bakeoff.py:416-490`). The
    'candidate' here is the llm layer with override->raw fallback
    precedence, mirroring the bakeoff's label precedence."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    truth = (
        F.when(F.col("event_type").isin("purchase", "signup"), "positive")
        .when(F.col("event_type").isin("view", "click"), "neutral")
        .otherwise("negative")
    )
    llm = (
        F.when(k % 3 == 0, "negative").when(k % 3 == 1, "neutral").otherwise("positive")
    )
    predicted = F.when(k % 5 == 0, truth).otherwise(llm)
    labeled = ev.select(truth.alias("truth"), predicted.alias("predicted"))
    counts = labeled.groupBy("truth", "predicted").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("truth")
    return counts.select(
        "truth",
        "predicted",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wt)).alias("frac_of_truth"),
        F.when(F.col("truth") == F.col("predicted"), 1.0).otherwise(0.0).alias(
            "cell_agreement"
        ),
    )


# ---------------------------------------------------------------- a17
# ROLLUP totals — the multi-grain summary every dashboard footer
# needs (per-cell, per-dimension subtotal, grand total) computed by
# Spark's NATIVE rollup operator in ONE pass instead of a 3-branch
# UNION of separate aggregations (a8's pattern solves a different
# problem: branches with DIFFERENT logic; a17 is the same aggregate
# at nested grains, which is exactly what ROLLUP's partial
# re-aggregation exists for — at 100 TB the fact table is scanned
# once and the subtotal grains re-aggregate the cell grain, not the
# corpus). grouping_id() disambiguates a real NULL dimension value
# from a subtotal row — the classic rollup trap, pinned by the gate
# since DuckDB's GROUPING() must agree bit-for-bit.


@query(
    "a17_rollup_totals",
    oracle="""
    SELECT event_type,
           CAST(user_id % 4 AS BIGINT) AS cohort,
           CAST(GROUPING(event_type) * 2 + GROUPING(user_id % 4)
                AS BIGINT) AS lvl,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY ROLLUP (event_type, user_id % 4)
    """,
)
def a17_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, cohort) cells + per-type subtotals + grand total
    in one native ROLLUP pass, with grouping_id() labeling the grain.

    Spark shape: one scan -> rollup(...) agg (Expand to the 3 grains
    BEFORE the map-side combine, so the exchange carries at most
    3 x |cells| rows regardless of corpus size) -> done. The money
    sum goes through DECIMAL(18,2) at every grain (order-independent)
    then casts to double."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            (F.col("user_id") % 4).cast("long").alias("cohort"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .rollup("event_type", "cohort")
        .agg(
            F.grouping_id().cast("long").alias("lvl"),
            F.count("*").cast("long").alias("n_events"),
            F.sum("v").cast("double").alias("value_sum"),
        )
        .select("event_type", "cohort", "lvl", "n_events", "value_sum")
    )


# ---------------------------------------------------------------- a18
# PIVOT — long-to-wide reshape through Spark's NATIVE pivot operator
# with an EXPLICIT value list (the 100 TB form: without the list,
# pivot runs a blocking distinct-collect over the corpus to discover
# the columns; with it, the reshape is one ordinary agg whose Expand
# is bounded by the fixed domain). The oracle derives the same wide
# matrix with manual FILTERed aggregates, so the gate pins the pivot
# translation column-for-column.

A18_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "a18_pivot_matrix",
    oracle="""
    SELECT user_id,
    """
    + ",\n    ".join(
        f"""CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT)
             AS {t}_n,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2)))
                FILTER (WHERE event_type = '{t}'), 0) AS DOUBLE)
             AS {t}_value"""
        for t in A18_TYPES
    )
    + """
    FROM events GROUP BY user_id
    """,
)
def a18_pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user wide event matrix: one (count, decimal-exact value
    sum) column pair per event type, via native pivot with the
    explicit type list.

    Spark shape: one scan -> groupBy(user).pivot(type, FIXED LIST)
    .agg(count, sum(decimal)) — a single exchange; the fixed list
    keeps the plan free of the discovery distinct AND keeps the
    output schema stable when a type is absent at small SF (absent
    cells are 0 by the COALESCE convention on both sides)."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.select(
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("user_id")
        .pivot("event_type", list(A18_TYPES))
        .agg(
            # count(*) is rejected inside Pivot; count(v) is equal here
            # (v is a cast of a non-null column)
            F.count("v").alias("n"),
            F.sum("v").alias("value"),
        )
    )
    cols = [F.col("user_id")]
    for t in A18_TYPES:
        cols.append(
            F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("long").alias(f"{t}_n")
        )
        cols.append(
            F.coalesce(F.col(f"{t}_value"), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias(f"{t}_value")
        )
    return wide.select(*cols)


# ---------------------------------------------------------------- a19
# GROUPING SETS — the general multi-grain form (a17 covered the
# ROLLUP special case): an ASYMMETRIC set list that no rollup/cube
# shorthand produces, through Spark's native groupingSets operator.
# Same scale shape as a17: Expand to |sets| grains BEFORE the
# map-side combine, one exchange bounded by the grain-cell count.


@query(
    "a19_grouping_sets",
    oracle="""
    SELECT event_type,
           CAST(user_id % 4 AS BIGINT) AS cohort,
           CAST(GROUPING(event_type) * 2 + GROUPING(user_id % 4)
                AS BIGINT) AS lvl,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY GROUPING SETS ((event_type, user_id % 4), (user_id % 4), ())
    """,
)
def a19_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(type, cohort) cells + per-cohort marginals + the grand total —
    an asymmetric grain list (deliberately NOT expressible as rollup
    or cube) in one native GROUPING SETS pass, grouping_id-labeled.

    Spark shape: one scan -> groupingSets(...) agg (Expand to the 3
    grains before the map-side combine, so the exchange carries at
    most 3 x |cells| rows at any corpus size). Money through
    DECIMAL(18,2) at every grain, then double."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            (F.col("user_id") % 4).cast("long").alias("cohort"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .groupingSets(
            [["event_type", "cohort"], ["cohort"], []],
            "event_type",
            "cohort",
        )
        .agg(
            F.grouping_id().cast("long").alias("lvl"),
            F.count("*").cast("long").alias("n_events"),
            F.sum("v").cast("double").alias("value_sum"),
        )
        .select("event_type", "cohort", "lvl", "n_events", "value_sum")
    )
