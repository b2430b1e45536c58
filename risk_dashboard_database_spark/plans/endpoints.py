"""Composite endpoint-shaped queries (SURVEY §3.1 read path; §2.11 F1).

e1_trend_summary is the flagship read-path composition
(`GET /api/v1/insights/trend_summary`, `app.py:5137-5240,1443-1463`):
daily series -> current-7d vs prior-7d windows -> deltas + pct change
-> impact classification label, per entity at its latest date. In the
reference this spans an SQL view stack plus Python post-processing;
here it is ONE DataFrame program (a window max + one conditional
aggregation — a single shuffle on the entity key).

f1_llm_classify runs the batched LLM-classification surface
(`src/llm_utils.py:6-93` shape) through mapInPandas with the
deterministic fake backend; the oracle re-derives the md5 arithmetic
in SQL, so the Python batch path is value-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.llm import classify_batch
from ..tables import load_table
from .common import USER_DAY_CTE, user_day
from .registry import query

DATE_FMT = "yyyy-MM-dd"


@query(
    "e1_trend_summary",
    oracle=f"""
    WITH {USER_DAY_CTE},
    anchored AS (
      SELECT user_id, date, total, errors,
             MAX(date) OVER (PARTITION BY user_id) AS latest_date
      FROM user_day
    ),
    agg AS (
      SELECT user_id,
             MAX(latest_date) AS latest_date,
             CAST(SUM(CASE WHEN date > latest_date - 7 THEN total ELSE 0 END) AS BIGINT) AS current_7d,
             CAST(SUM(CASE WHEN date <= latest_date - 7 AND date > latest_date - 14
                           THEN total ELSE 0 END) AS BIGINT) AS prior_7d,
             CAST(SUM(CASE WHEN date > latest_date - 7 THEN errors ELSE 0 END) AS BIGINT) AS current_errors_7d
      FROM anchored
      GROUP BY user_id
    )
    SELECT user_id,
           STRFTIME(latest_date, '%Y-%m-%d') AS latest_date,
           current_7d,
           prior_7d,
           CAST(current_7d - prior_7d AS BIGINT) AS delta_7d,
           CASE WHEN prior_7d > 0
                THEN CAST(current_7d - prior_7d AS DOUBLE) / prior_7d
                ELSE NULL END AS pct_change,
           current_errors_7d,
           CASE WHEN current_7d - prior_7d >= 5 THEN 'worsening'
                WHEN current_7d - prior_7d <= -5 THEN 'improving'
                ELSE 'stable' END AS impact
    FROM agg
    """,
)
def e1_trend_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend-summary endpoint composition (§3.1 steps 4-6 as one
    DataFrame program): current vs prior 7-calendar-day windows
    anchored at each entity's latest active date, delta + pct change,
    and the worsening/stable/improving impact classification
    (`app.py:5220-5240,1443-1463`)."""
    ud = user_day(spark, sf_dir)
    latest = F.max("date").over(Window.partitionBy("user_id"))
    anchored = ud.withColumn("latest_date", latest)
    in_cur = F.col("date") > F.date_sub(F.col("latest_date"), 7)
    in_prior = (~in_cur) & (F.col("date") > F.date_sub(F.col("latest_date"), 14))
    agg = anchored.groupBy("user_id").agg(
        F.max("latest_date").alias("latest_date"),
        F.sum(F.when(in_cur, F.col("total")).otherwise(0)).cast("long").alias("current_7d"),
        F.sum(F.when(in_prior, F.col("total")).otherwise(0)).cast("long").alias("prior_7d"),
        F.sum(F.when(in_cur, F.col("errors")).otherwise(0))
        .cast("long")
        .alias("current_errors_7d"),
    )
    delta = F.col("current_7d") - F.col("prior_7d")
    return agg.select(
        "user_id",
        F.date_format("latest_date", DATE_FMT).alias("latest_date"),
        "current_7d",
        "prior_7d",
        delta.cast("long").alias("delta_7d"),
        F.when(
            F.col("prior_7d") > 0, delta.cast("double") / F.col("prior_7d")
        ).alias("pct_change"),
        "current_errors_7d",
        F.when(delta >= 5, "worsening")
        .when(delta <= -5, "improving")
        .otherwise("stable")
        .alias("impact"),
    )


@query(
    "e2_crisis_durations",
    oracle=f"""
    WITH RECURSIVE {USER_DAY_CTE},
    scored AS (
      SELECT user_id, date, errors, total,
             (errors >= 3) AS trig,
             (errors >= 1 AND CAST(errors AS DOUBLE) / total >= 0.2) AS cont,
             (total >= 2) AS gate,
             LAG(date) OVER (PARTITION BY user_id ORDER BY date) AS prev_date
      FROM user_day
    ),
    chain AS (
      SELECT user_id, date, trig, cont, gate, prev_date,
             (gate AND trig) AS active
      FROM scored WHERE prev_date IS NULL OR prev_date + 1 <> date
      UNION ALL
      SELECT s.user_id, s.date, s.trig, s.cont, s.gate, s.prev_date,
             (s.gate AND (s.trig OR (s.cont AND c.active)))
      FROM scored s
      JOIN chain c ON c.user_id = s.user_id AND s.date = c.date + 1
      WHERE s.prev_date IS NOT NULL AND s.prev_date + 1 = s.date
    ),
    active_days AS (SELECT user_id, date FROM chain WHERE active),
    islands AS (
      SELECT user_id, date,
             date - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY date) AS INTEGER) AS anchor
      FROM active_days
    ),
    eps AS (
      SELECT user_id, MIN(date) AS ep_start, MAX(date) AS ep_end, COUNT(*) AS ep_days
      FROM islands GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_episodes,
           CAST(SUM(ep_days) AS BIGINT) AS total_crisis_days,
           CAST(SUM(ep_days) AS DOUBLE) / COUNT(*) AS avg_duration,
           CAST(MAX(ep_days) AS BIGINT) AS max_duration,
           STRFTIME(MAX(ep_end), '%Y-%m-%d') AS last_active_day
    FROM eps
    GROUP BY user_id
    """,
)
def e2_crisis_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crisis-duration endpoint (the planner's industry-duration shape,
    `app.py:2294-2318,4097-4120`): T2 active days -> gaps-and-islands
    episodes (T4) -> per-entity episode count / total days / average
    and max duration / last active day. Three window passes + one agg,
    all shuffled on the entity key. The oracle recomputes T2 through
    the independent recursive CTE, then islands in SQL."""
    from ..operators.sessionize import chain_active, episodes

    ud = user_day(spark, sf_dir)
    chain = chain_active(
        ud,
        ["user_id"],
        "date",
        trig=F.col("errors") >= 3,
        cont=(F.col("errors") >= 1)
        & (F.col("errors").cast("double") / F.col("total") >= 0.2),
        gate=F.col("total") >= 2,
    )
    eps = episodes(chain.where(F.col("active")), ["user_id"], "date")
    return eps.groupBy("user_id").agg(
        F.count("*").alias("n_episodes"),
        F.sum("episode_days").cast("long").alias("total_crisis_days"),
        (F.sum("episode_days").cast("double") / F.count("*")).alias("avg_duration"),
        F.max("episode_days").cast("long").alias("max_duration"),
        F.date_format(F.max("episode_end"), DATE_FMT).alias("last_active_day"),
    )


# DuckDB re-derivation of functions/llm.fake_classify: h = first 8 hex
# chars of md5(text) as an integer, folded digit by digit.
_H_SQL = """
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, 9),
        i -> CAST(instr('0123456789abcdef', substr(md5(text), i, 1)) - 1 AS BIGINT))),
    (acc, v) -> acc * 16 + v)
"""


@query(
    "f1_llm_classify",
    oracle=f"""
    SELECT doc_id,
           CASE ({_H_SQL}) % 3 WHEN 0 THEN 'negative' WHEN 1 THEN 'neutral'
                ELSE 'positive' END AS sentiment_label,
           CASE (({_H_SQL}) // 3) % 3 WHEN 0 THEN 'none' WHEN 1 THEN 'watch'
                ELSE 'crisis_risk' END AS risk_label,
           CAST(50 + ({_H_SQL}) % 50 AS DOUBLE) / 100.0 AS confidence
    FROM documents
    """,
)
def f1_llm_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched LLM classification surface (F1) over the documents
    corpus: the real Arrow/mapInPandas production path with the
    deterministic fake backend; the oracle re-derives the md5-based
    labels in SQL, value-checking the whole Python batch pipeline."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = classify_batch(docs, "text")
    return out.select("doc_id", "sentiment_label", "risk_label", "confidence")
