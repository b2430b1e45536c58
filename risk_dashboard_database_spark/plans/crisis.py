"""Crisis-event semantics (SURVEY §2.9 T2, §2.7 U4).

The reference's hardest operator: the per-entity-day crisis state
machine (`dashboard_app/crisis_event_rollups.py:639-683`) where
active-today depends on active-yesterday. See
operators/sessionize.chain_active for why the recurrence linearizes
into pure window functions (the 100 TB-safe formulation — no Python,
no driver loop).

u4_anomaly_rules ports the 6-way rule union of
`sql/entity_anomalies_v.sql:41-177`, but instead of recomputing the
shared baseline CTE once per rule branch (what UNION ALL would do in
Spark), it evaluates every rule as a column over ONE baseline pass and
explodes the matches — single scan, single shuffle, same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sessionize import chain_active
from .common import USER_DAY_CTE, user_day
from .registry import query

DATE_FMT = "yyyy-MM-dd"


@query(
    "t2_crisis_chain",
    # Independent oracle: evaluates the reference recurrence
    #   active(d) = gate(d) AND (trig(d) OR (cont(d) AND active(d-1)))
    # DIRECTLY via a recursive CTE walking consecutive calendar days,
    # deliberately NOT the segment/linearization algorithm the Spark
    # side uses — a shared linearization bug cannot pass this gate.
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
      SELECT user_id, date, errors, total, trig, cont, gate,
             (gate AND trig) AS active
      FROM scored
      WHERE prev_date IS NULL OR prev_date + 1 <> date
      UNION ALL
      SELECT s.user_id, s.date, s.errors, s.total, s.trig, s.cont, s.gate,
             (s.gate AND (s.trig OR (s.cont AND c.active))) AS active
      FROM scored s
      JOIN chain c ON c.user_id = s.user_id AND s.date = c.date + 1
      WHERE s.prev_date IS NOT NULL AND s.prev_date + 1 = s.date
    )
    SELECT user_id,
           STRFTIME(date, '%Y-%m-%d') AS date,
           errors,
           total,
           CAST(active AS INTEGER) AS active
    FROM chain
    ORDER BY user_id, date
    """,
)
def t2_crisis_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crisis-event state machine (T2): a day is active iff it has an
    independent trigger (error burst), or continues an active run
    (continued coverage), gated by minimum volume; runs reset on
    calendar gaps — `crisis_event_rollups.py:16-30,639-683`."""
    ud = user_day(spark, sf_dir)
    out = chain_active(
        ud,
        ["user_id"],
        "date",
        trig=F.col("errors") >= 3,
        cont=(F.col("errors") >= 1)
        & (F.col("errors").cast("double") / F.col("total") >= 0.2),
        gate=F.col("total") >= 2,
    )
    return out.select(
        "user_id",
        F.date_format("date", DATE_FMT).alias("date"),
        "errors",
        "total",
        F.col("active").cast("int").alias("active"),
    )


@query(
    "u4_anomaly_rules",
    oracle=f"""
    WITH {USER_DAY_CTE},
    baseline AS (
      SELECT user_id, date, errors, total,
             CAST(SUM(errors) OVER wb AS DOUBLE) / NULLIF(COUNT(*) OVER wb, 0) AS base_avg,
             COUNT(*) OVER wb AS obs_days,
             MAX(errors) OVER (PARTITION BY user_id ORDER BY date ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS prior7_max,
             MAX(errors) OVER (PARTITION BY user_id ORDER BY date ROWS BETWEEN 30 PRECEDING AND 8 PRECEDING) AS prior30_max,
             SUM(CASE WHEN errors >= 2 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY date ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS streak3
      FROM user_day
      WINDOW wb AS (PARTITION BY user_id ORDER BY date ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, STRFTIME(date, '%Y-%m-%d') AS date, 'error_spike' AS rule,
           CAST(errors AS DOUBLE) AS observed, ROUND(base_avg, 6) AS baseline
    FROM baseline
    WHERE obs_days >= 5 AND errors >= 3 AND errors >= 2 * base_avg
    UNION ALL
    SELECT user_id, STRFTIME(date, '%Y-%m-%d'), 'new_activity',
           CAST(errors AS DOUBLE), 0.0
    FROM baseline WHERE obs_days = 0 AND errors >= 2
    UNION ALL
    SELECT user_id, STRFTIME(date, '%Y-%m-%d'), 'resurfacing',
           CAST(errors AS DOUBLE), CAST(prior30_max AS DOUBLE)
    FROM baseline
    WHERE errors >= 1 AND COALESCE(prior7_max, 0) = 0 AND COALESCE(prior30_max, 0) >= 1
    UNION ALL
    SELECT user_id, STRFTIME(date, '%Y-%m-%d'), 'error_streak',
           CAST(streak3 AS DOUBLE), 3.0
    FROM baseline WHERE streak3 >= 3
    ORDER BY user_id, date, rule
    """,
)
def u4_anomaly_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-rule anomaly union (`sql/entity_anomalies_v.sql:41-177`,
    four rules material here). Spark-first twist: one baseline pass,
    rules as an array of structs, explode + filter — instead of N
    recomputations of the shared CTE."""
    ud = user_day(spark, sf_dir)

    def w(s: int, e: int) -> Window:
        return Window.partitionBy("user_id").orderBy("date").rowsBetween(s, e)

    wb = w(-30, -1)
    base = ud.select(
        "user_id",
        "date",
        "errors",
        "total",
        (F.sum("errors").over(wb).cast("double") / F.nullif(F.count("*").over(wb), F.lit(0))).alias("base_avg"),
        F.count("*").over(wb).alias("obs_days"),
        F.max("errors").over(w(-7, -1)).alias("prior7_max"),
        F.max("errors").over(w(-30, -8)).alias("prior30_max"),
        F.sum(F.when(F.col("errors") >= 2, 1).otherwise(0)).over(w(-2, 0)).alias("streak3"),
    )

    def rule(name: str, flag: F.Column, observed: F.Column, baseline: F.Column):
        return F.struct(
            F.lit(name).alias("rule"),
            flag.alias("flag"),
            observed.cast("double").alias("observed"),
            baseline.cast("double").alias("baseline"),
        )

    rules = F.array(
        rule(
            "error_spike",
            (F.col("obs_days") >= 5)
            & (F.col("errors") >= 3)
            & (F.col("errors") >= 2 * F.col("base_avg")),
            F.col("errors"),
            F.round(F.col("base_avg"), 6),
        ),
        rule(
            "new_activity",
            (F.col("obs_days") == 0) & (F.col("errors") >= 2),
            F.col("errors"),
            F.lit(0.0),
        ),
        rule(
            "resurfacing",
            (F.col("errors") >= 1)
            & (F.coalesce(F.col("prior7_max"), F.lit(0)) == 0)
            & (F.coalesce(F.col("prior30_max"), F.lit(0)) >= 1),
            F.col("errors"),
            F.col("prior30_max"),
        ),
        rule(
            "error_streak",
            F.col("streak3") >= 3,
            F.col("streak3"),
            F.lit(3.0),
        ),
    )
    return (
        base.select(
            "user_id",
            F.date_format("date", DATE_FMT).alias("date"),
            F.explode(rules).alias("r"),
        )
        .where(F.col("r.flag"))
        .select("user_id", "date", F.col("r.rule").alias("rule"),
                F.col("r.observed").alias("observed"), F.col("r.baseline").alias("baseline"))
    )
