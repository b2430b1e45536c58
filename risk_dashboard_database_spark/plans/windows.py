"""Window-function query family (SURVEY §2.5 W1-W10, §2.6 O-ops).

Each query ports a reference window pattern onto the events table; the
citations are in the operator docstrings (operators/windows.py,
operators/sessionize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sessionize import episodes
from ..operators.windows import lag_calendar, latest_per_key, trailing_rollup
from ..tables import load_table
from .common import USER_DAY_CTE, user_day
from .registry import query

DATE_FMT = "yyyy-MM-dd"
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


@query(
    "w1_weekly_rollup",
    oracle=f"""
    WITH {USER_DAY_CTE}
    SELECT
      user_id,
      STRFTIME(date, '%Y-%m-%d') AS date,
      CAST(SUM(total)     OVER w AS BIGINT) AS total_7d,
      CAST(SUM(errors)    OVER w AS BIGINT) AS errors_7d,
      CAST(SUM(purchases) OVER w AS BIGINT) AS purchases_7d,
      CAST(SUM(value_dec) OVER w AS DOUBLE) AS value_7d,
      CAST(MAX(total)  OVER w AS BIGINT) AS max_daily_7d,
      CAST(MIN(total)  OVER w AS BIGINT) AS min_daily_7d,
      CAST(COUNT(*)    OVER w AS BIGINT) AS obs_days_7d,
      ROUND(CAST(SUM(total) OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS avg_daily_7d,
      ROUND(CAST(SUM(errors) OVER w AS DOUBLE)
            / NULLIF(CAST(SUM(total) OVER w AS DOUBLE), 0), 6) AS error_rate_7d,
      STRFTIME(MIN(date) OVER w, '%Y-%m-%d') AS window_start,
      CAST(SUM(CASE WHEN errors >= 2 THEN 1 ELSE 0 END) OVER w AS BIGINT) AS crisis_days_7d
    FROM user_day
    WINDOW w AS (PARTITION BY user_id ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, date
    """,
)
def w1_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-ROW rollup (`sql/entity_weekly_rollup_v.sql:2-29`):
    the reference computes ELEVEN metrics over one shared window —
    replicated here (sums, extrema, observation days, derived
    rates, min(date) window-start, conditional crisis-day count), all
    ROWS-framed so gap days are skipped rows, one window = one
    shuffle regardless of metric count."""
    ud = user_day(spark, sf_dir)
    out = trailing_rollup(
        ud,
        ["user_id"],
        "date",
        {
            "total_7d": F.sum("total"),
            "errors_7d": F.sum("errors"),
            "purchases_7d": F.sum("purchases"),
            "value_7d_dec": F.sum("value_dec"),
            "max_daily_7d": F.max("total"),
            "min_daily_7d": F.min("total"),
            "obs_days_7d": F.count("*"),
            "window_start": F.min("date"),
            "crisis_days_7d_int": F.sum(F.when(F.col("errors") >= 2, 1).otherwise(0)),
        },
    )
    out = out.withColumn("value_7d", F.col("value_7d_dec").cast("double")).withColumn(
        "crisis_days_7d", F.col("crisis_days_7d_int").cast("long")
    )
    return out.select(
        "user_id",
        F.date_format("date", DATE_FMT).alias("date"),
        "total_7d",
        "errors_7d",
        "purchases_7d",
        "value_7d",
        "max_daily_7d",
        "min_daily_7d",
        "obs_days_7d",
        F.round(
            F.col("total_7d").cast("double") / F.col("obs_days_7d"), 6
        ).alias("avg_daily_7d"),
        F.round(
            F.col("errors_7d").cast("double")
            / F.nullif(F.col("total_7d").cast("double"), F.lit(0.0)),
            6,
        ).alias("error_rate_7d"),
        F.date_format("window_start", DATE_FMT).alias("window_start"),
        "crisis_days_7d",
    )


@query(
    "w2_anomaly_baselines",
    oracle=f"""
    WITH {USER_DAY_CTE}
    SELECT
      user_id,
      STRFTIME(date, '%Y-%m-%d') AS date,
      errors,
      ROUND(CAST(SUM(errors) OVER wb AS DOUBLE) / NULLIF(COUNT(*) OVER wb, 0), 6) AS baseline_avg_errors,
      COUNT(*) OVER wb AS obs_days,
      MAX(errors) OVER (PARTITION BY user_id ORDER BY date ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS prior7_max,
      MAX(errors) OVER (PARTITION BY user_id ORDER BY date ROWS BETWEEN 30 PRECEDING AND 8 PRECEDING) AS prior30_max,
      CAST(SUM(CASE WHEN errors >= 2 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY date ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS streak3
    FROM user_day
    WINDOW wb AS (PARTITION BY user_id ORDER BY date ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
    ORDER BY user_id, date
    """,
)
def w2_anomaly_baselines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing baselines excluding the current row (W2), prior-range
    maxes for resurfacing detection (W3), and the 3-day streak frame
    (W4) — `sql/entity_anomalies_v.sql:4-38`."""
    ud = user_day(spark, sf_dir)

    def w(s: int, e: int) -> Window:
        return Window.partitionBy("user_id").orderBy("date").rowsBetween(s, e)

    wb = w(-30, -1)
    return ud.select(
        "user_id",
        F.date_format("date", DATE_FMT).alias("date"),
        "errors",
        F.round(
            F.sum("errors").over(wb).cast("double") / F.nullif(F.count("*").over(wb), F.lit(0)), 6
        ).alias("baseline_avg_errors"),
        F.count("*").over(wb).alias("obs_days"),
        F.max("errors").over(w(-7, -1)).alias("prior7_max"),
        F.max("errors").over(w(-30, -8)).alias("prior30_max"),
        F.sum(F.when(F.col("errors") >= 2, 1).otherwise(0)).over(w(-2, 0)).cast("long").alias("streak3"),
    )


@query(
    "w5_latest_per_key",
    oracle="""
    SELECT user_id, event_type, event_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def w5_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins per key: Postgres `DISTINCT ON ... ORDER BY ts DESC`
    (`sql/schema.sql:67-76`) as row_number()=1."""
    ev = load_table(spark, sf_dir, "events")
    latest = latest_per_key(
        ev, ["user_id", "event_type"], [F.desc("ts"), F.desc("event_id")]
    )
    return latest.select(
        "user_id",
        "event_type",
        "event_id",
        F.date_format("ts", TS_FMT).alias("ts"),
        "value",
    )


@query(
    "w8_activity_episodes",
    oracle=f"""
    WITH {USER_DAY_CTE},
    tagged AS (
      SELECT user_id, date, total,
             date - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY date) AS INTEGER) AS anchor
      FROM user_day
    )
    SELECT user_id,
           STRFTIME(MIN(date), '%Y-%m-%d') AS episode_start,
           STRFTIME(MAX(date), '%Y-%m-%d') AS episode_end,
           COUNT(*) AS episode_days,
           CAST(SUM(total) AS BIGINT) AS total_events
    FROM tagged
    GROUP BY user_id, anchor
    ORDER BY user_id, episode_start
    """,
)
def w8_activity_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (`app.py:1602-1635`): runs of
    adjacent active days -> (start, end, length, volume) episodes."""
    ud = user_day(spark, sf_dir)
    ep = episodes(
        ud, ["user_id"], "date", {"total_events": F.sum("total").cast("long")}
    )
    return ep.select(
        "user_id",
        F.date_format("episode_start", DATE_FMT).alias("episode_start"),
        F.date_format("episode_end", DATE_FMT).alias("episode_end"),
        "episode_days",
        "total_events",
    )


@query(
    "w7_error_streak",
    oracle=f"""
    WITH {USER_DAY_CTE},
    latest AS (SELECT user_id, MAX(date) AS latest_date FROM user_day GROUP BY user_id),
    err_days AS (SELECT user_id, date FROM user_day WHERE errors >= 1),
    tagged AS (
      SELECT user_id, date,
             date - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY date) AS INTEGER) AS anchor
      FROM err_days
    ),
    eps AS (
      SELECT user_id, MAX(date) AS episode_end, COUNT(*) AS episode_days
      FROM tagged GROUP BY user_id, anchor
    )
    SELECT l.user_id,
           STRFTIME(l.latest_date, '%Y-%m-%d') AS latest_date,
           CAST(COALESCE(e.episode_days, 0) AS BIGINT) AS streak_days
    FROM latest l
    LEFT JOIN eps e ON e.user_id = l.user_id AND e.episode_end = l.latest_date
    ORDER BY l.user_id
    """,
)
def w7_error_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing streak ending at the latest date (`app.py:1380-1387`):
    consecutive error-days scanning back from each user's latest
    active day; 0 if the latest day itself had no errors."""
    ud = user_day(spark, sf_dir)
    latest = ud.groupBy("user_id").agg(F.max("date").alias("latest_date"))
    err_eps = episodes(ud.where(F.col("errors") >= 1), ["user_id"], "date")
    return (
        latest.join(
            err_eps.withColumnRenamed("user_id", "e_user"),
            (F.col("e_user") == F.col("user_id"))
            & (F.col("episode_end") == F.col("latest_date")),
            "left",
        )
        .select(
            "user_id",
            F.date_format("latest_date", DATE_FMT).alias("latest_date"),
            F.coalesce(F.col("episode_days"), F.lit(0)).cast("long").alias("streak_days"),
        )
    )


@query(
    "w10_lag_delta",
    oracle=f"""
    WITH {USER_DAY_CTE},
    lagged AS (
      SELECT user_id, date, errors,
             LAG(date)   OVER w AS prev_date,
             LAG(errors) OVER w AS prev_errors
      FROM user_day
      WINDOW w AS (PARTITION BY user_id ORDER BY date)
    )
    SELECT user_id,
           STRFTIME(date, '%Y-%m-%d') AS date,
           errors,
           CAST(CASE WHEN prev_date = date - 1 THEN prev_errors ELSE 0 END AS BIGINT) AS prior_errors,
           CAST(errors - CASE WHEN prev_date = date - 1 THEN prev_errors ELSE 0 END AS BIGINT) AS errors_delta
    FROM lagged
    ORDER BY user_id, date
    """,
)
def w10_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-day LAG delta (`crisis_event_rollups.py:647-661`): a
    missing prior calendar day reads as 0, not as the previous row."""
    ud = user_day(spark, sf_dir)
    prior = lag_calendar(ud, ["user_id"], "date", "errors", default=0).cast("long")
    return (
        ud.withColumn("prior_errors", prior)
        .select(
            "user_id",
            F.date_format("date", DATE_FMT).alias("date"),
            "errors",
            "prior_errors",
            (F.col("errors") - F.col("prior_errors")).cast("long").alias("errors_delta"),
        )
    )


# ---------------------------------------------------------------- w12
# Timestamp session windows — w8's gaps-and-islands at event-time
# grain, expressed through Spark's NATIVE session_window aggregate
# (the Structured-Streaming session primitive run in batch mode, so
# the batch and streaming forms of "a session" are one definition).
# The oracle derives the identical sessions the classical way: a LAG
# break flag + running-sum island id — so the driver gate pins
# Spark's built-in merge semantics (events closer than the gap fuse;
# window end = last event + gap) against first-principles SQL.

W12_GAP_S = 28_800  # 8 hours; the corpus has no exact-boundary gap
W12_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
W12_TS_FMT_SQL = "%Y-%m-%d %H:%M:%S.%f"


@query(
    "w12_session_windows",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w >= INTERVAL {W12_GAP_S} SECOND
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    i AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM o
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '{W12_TS_FMT_SQL}') AS session_start,
           STRFTIME(MAX(ts) + INTERVAL {W12_GAP_S} SECOND,
                    '{W12_TS_FMT_SQL}') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM i GROUP BY user_id, island
    """,
)
def w12_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time sessions per user (gap {8h}): start, end (last event
    + gap — Spark's session_window convention), event count.

    Spark shape: ONE groupBy(user_id, session_window(ts, gap)) — the
    native session aggregate plans a single user-keyed exchange with
    map-side partial merging of adjacent windows; no self-join, no LAG
    materialization, no island running sum (those live in the ORACLE,
    proving the built-in's semantics from first principles). Because
    session_window is the same operator Structured Streaming uses for
    watermarked session aggs, this query IS the batch twin of a
    streaming sessionizer — one definition of 'session' across both
    modes. At 100 TB: the one exchange is keyed on user_id (high
    cardinality, no skewed mega-key in this domain), and the window
    merge is per-user local after the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts"), f"{W12_GAP_S} seconds")
    return (
        ev.groupBy(F.col("user_id"), sw.alias("w"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), W12_TS_FMT_SPARK).alias(
                "session_start"
            ),
            F.date_format(F.col("w.end"), W12_TS_FMT_SPARK).alias(
                "session_end"
            ),
            "n_events",
        )
    )


# ---------------------------------------------------------------- w13
# Range join at scale: attribute a big fact table to derived date
# INTERVALS without a non-equi nested-loop over the corpus. The
# intervals are order-surge windows (runs of days whose order count
# is >= 1.2x the daily mean — integer-exact threshold, no float
# ratio); the points are lineitem shipments. The scalable shape is:
# pre-aggregate the fact to day grain FIRST (map-side combinable,
# one date-keyed exchange), explode each window into its member days
# (bounded by the calendar domain), and equi-join day-to-day — the
# interval-bucketing range-join pattern. The naive formulation
# (lineitem x windows ON l_shipdate BETWEEN start AND end) is the
# oracle's job, not the engine's: at 100 TB it is a broadcast
# nested-loop over every lineitem row.


@query(
    "w13_surge_shipments",
    oracle="""
    WITH dayo AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT COUNT(*) AS n_days, SUM(n) AS total_orders FROM dayo
    ),
    hot AS (
      SELECT d, n FROM dayo, tot
      WHERE n * n_days * 10 >= total_orders * 12
    ),
    tagged AS (
      SELECT d, n,
             d - CAST(ROW_NUMBER() OVER (ORDER BY d) AS INTEGER) AS anchor
      FROM hot
    ),
    win AS (
      SELECT MIN(d) AS ws, MAX(d) AS we,
             CAST(COUNT(*) AS BIGINT) AS win_days,
             CAST(SUM(n) AS BIGINT) AS win_orders
      FROM tagged GROUP BY anchor
    ),
    shipd AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             COUNT(*) AS n_items,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM lineitem GROUP BY 1
    )
    SELECT STRFTIME(ws, '%Y-%m-%d') AS win_start,
           STRFTIME(we, '%Y-%m-%d') AS win_end,
           win_days, win_orders,
           CAST(COALESCE(SUM(s.n_items), 0) AS BIGINT) AS ship_items,
           CAST(COALESCE(SUM(s.qty), 0) AS DOUBLE) AS ship_qty,
           CAST(COALESCE(SUM(s.rev), 0) AS DOUBLE) AS ship_revenue
    FROM win LEFT JOIN shipd s ON s.d BETWEEN win.ws AND win.we
    GROUP BY 1, 2, 3, 4
    """,
)
def w13_surge_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-surge windows (islands of >= 1.2x-mean order days) with
    the shipment volume they contain — a cross-relational date-range
    join (orders define the intervals, lineitem provides the points).

    Spark shape: one day-grain orders agg -> 1-row totals anchor ->
    integer-exact hot filter -> islands over the day-domain rows (the
    single-partition window is the sanctioned dictionary class: there
    are at most a few thousand distinct days at ANY corpus size) ->
    windows exploded into member days (calendar-bounded)
    LEFT-joined to the BROADCAST day-grain lineitem pre-agg (both
    sides are calendar-bounded; the build side must be the right one
    under LeftOuter), so the fact table is touched exactly once,
    pre-aggregates once on its day key, and never meets a non-equi
    condition. Money/quantity sums go
    through DECIMAL(18,2) then cast to double (order-independent)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dayo = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(F.count("*").alias("n"))
    tot = dayo.agg(
        F.count("*").alias("n_days"),
        F.sum("n").alias("total_orders"),
    )
    hot = (
        dayo.crossJoin(F.broadcast(tot))
        .where(F.expr("n * n_days * 10 >= total_orders * 12"))
        .select("d", "n")
    )
    tagged = hot.withColumn(
        "anchor", F.expr("date_sub(d, row_number() over (order by d))")
    )
    win = tagged.groupBy("anchor").agg(
        F.min("d").alias("ws"),
        F.max("d").alias("we"),
        F.count("*").cast("long").alias("win_days"),
        F.sum("n").cast("long").alias("win_orders"),
    )
    days = win.select(
        "ws",
        "we",
        "win_days",
        "win_orders",
        F.explode(F.sequence("ws", "we")).alias("d"),
    )
    shipd = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"),
    )
    return (
        # broadcast the RIGHT side: BHJ LeftOuter must BuildRight, so
        # a hint on the left is silently unusable (code-review r11 —
        # the earlier F.broadcast(days) produced the same plan with a
        # dead hint). shipd is day-grain, calendar-bounded at any
        # corpus size, so the build side is honestly tiny too.
        days.join(F.broadcast(shipd), "d", "left")
        .groupBy("ws", "we", "win_days", "win_orders")
        .agg(
            F.coalesce(F.sum("n_items"), F.lit(0)).cast("long").alias("ship_items"),
            F.coalesce(F.sum("qty"), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("ship_qty"),
            F.coalesce(F.sum("rev"), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("ship_revenue"),
        )
        .select(
            F.date_format("ws", DATE_FMT).alias("win_start"),
            F.date_format("we", DATE_FMT).alias("win_end"),
            "win_days",
            "win_orders",
            "ship_items",
            "ship_qty",
            "ship_revenue",
        )
    )


# ---------------------------------------------------------------- w14
# OHLC resample — the reference's domain is a risk dashboard over
# stock data (SURVEY §1), and the one finance resample every such
# dashboard serves is candlesticks: per (series, day), the first /
# highest / lowest / last observation plus volume. Order-SENSITIVE
# aggregation (open/close depend on time order within the bucket) done
# as a single map-side-combinable agg via max_by/min_by over the
# (ts, event_id) order key — no window, no sort, no self-join; the
# event_id tiebreak makes same-microsecond observations deterministic
# on both engines. High/low/sums are order-free. The d59 disclosure
# discipline is moot here (every row lands in exactly one bucket).


@query(
    "w14_ohlc_resample",
    oracle="""
    WITH ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS d, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT user_id,
           STRFTIME(d, '%Y-%m-%d') AS date,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM ranked
    GROUP BY 1, 2
    """,
)
def w14_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candlesticks per series (user_id stands in for the
    ticker): open/close via min_by/max_by over (ts, event_id), exact
    high/low, volume, and the decimal-exact value sum.

    Spark shape: ONE (user_id, date) agg over one scan — min_by/
    max_by carry (value, orderkey) pairs through the map-side
    combine, so the time-order semantics cost no sort and no window;
    at 100 TB this is the same shape as a1's pivot counts. The value
    sum goes through DECIMAL(18,2) (order-independent) then casts to
    double; open/close/high/low are PICKED values, bit-identical by
    construction."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy(
        "user_id", F.date_format("ts", DATE_FMT).alias("date")
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count("*").cast("long").alias("volume"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )


# ---------------------------------------------------------------- w15
# Ordered-funnel conversion — the product-analytics sequential
# pattern ("view, THEN click, THEN purchase, in event-time order"):
# per user, fold the time-ordered event sequence through a stage
# machine entirely in JVM expressions (sort_array + aggregate()),
# then roll the per-user stages up to the 3-row funnel card. The
# SEQUENCE requirement is what separates this from a18's per-type
# counts: a user who purchases before ever viewing converts nothing.

W15_STEPS = ("view", "click", "purchase")


def w15_user_stages(ev: DataFrame) -> DataFrame:
    """Per-user funnel stage (0..3): the time-ordered stage machine as
    a JVM expression fold. ONE definition shared with the streaming
    funnel gate (streaming/funnelgate.py replays the same machine over
    its buffered per-user state), the j12/_j12_join stance — batch and
    streaming funnels can never drift."""
    code = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "purchase", 3)
        .otherwise(0)
        .cast("long")
    )
    return (
        ev.where(F.col("event_type").isin(*W15_STEPS))
        .select(
            "user_id", F.struct("ts", "event_id", code.alias("code")).alias("e")
        )
        .groupBy("user_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list("e")),
                    lambda s: s.getField("code"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: F.when(x == acc + 1, acc + 1).otherwise(acc),
            ).alias("stage")
        )
    )


@query(
    "w15_funnel_steps",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list(CAST(CASE event_type WHEN 'view' THEN 1
                           WHEN 'click' THEN 2 WHEN 'purchase' THEN 3
                           ELSE 0 END AS BIGINT)
                      ORDER BY ts, event_id)),
               (acc, x) -> CASE WHEN x = acc + 1 THEN acc + 1
                                ELSE acc END) AS stage
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
      GROUP BY user_id
    ),
    card AS (
      SELECT CAST(COUNT(*) FILTER (WHERE stage >= 1) AS BIGINT) AS u1,
             CAST(COUNT(*) FILTER (WHERE stage >= 2) AS BIGINT) AS u2,
             CAST(COUNT(*) FILTER (WHERE stage >= 3) AS BIGINT) AS u3
      FROM seq
    )
    SELECT step, step_name, users,
           CAST((users * 1000000) // NULLIF(u1, 0) AS BIGINT)
             AS conversion_ppm
    FROM (
      SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
             u1 AS users, u1 FROM card
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'click', u2, u1 FROM card
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'purchase', u3, u1 FROM card
    )
    """,
)
def w15_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The view -> click -> purchase funnel card: users reached per
    step (strictly event-time-ordered) and conversion vs step 1 in
    integer ppm.

    Spark shape: filter to the 3 funnel types (pushed to the scan),
    ONE user-keyed exchange collecting each user's (ts, event_id,
    code) structs, then the stage machine runs as a JVM expression
    fold — sort_array for the event-time order (event_id breaks ts
    ties identically on both engines) and aggregate() for the
    'advance only on the next expected step' transition — never a
    Python UDF, never a self-join per step (the textbook funnel query
    is K-1 self-joins; this is one pass). The per-user array is that
    user's funnel events only — per-key bounded the same way j12
    discloses via j12b. The card rollup is a 1-row conditional agg
    stacked to 3 rows."""
    ev = load_table(spark, sf_dir, "events")
    card = w15_user_stages(ev).agg(
        *[
            F.count(F.when(F.col("stage") >= i, 1)).cast("long").alias(f"u{i}")
            for i in (1, 2, 3)
        ]
    )
    steps = ", ".join(
        f"CAST({i} AS BIGINT), '{s}', u{i}"
        for i, s in enumerate(W15_STEPS, start=1)
    )
    return card.select(
        F.expr(f"stack(3, {steps}) AS (step, step_name, users)"),
        F.col("u1"),
    ).select(
        "step",
        "step_name",
        "users",
        F.expr("CAST(users * 1000000 DIV NULLIF(u1, 0) AS BIGINT)").alias(
            "conversion_ppm"
        ),
    )


# ---------------------------------------------------------------- w16
# Retention cohort matrix — the other canonical product-analytics
# relation beside w15's funnel: users bucketed by signup week, then
# for each week offset, how many were active at all. Week identity is
# an INTEGER epoch-week index (epoch days // 7) so both engines
# derive it with exact integer arithmetic — no date_trunc('week')
# dialect anchor to disagree on.


@query(
    "w16_retention_cohorts",
    oracle="""
    WITH wk AS (
      SELECT user_id, event_type,
             CAST((CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS BIGINT)
               AS week_idx
      FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(week_idx) AS cohort_week
      FROM wk WHERE event_type = 'signup' GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM cohort GROUP BY cohort_week
    ),
    act AS (SELECT DISTINCT user_id, week_idx FROM wk),
    hits AS (
      SELECT c.cohort_week,
             a.week_idx - c.cohort_week AS week_offset,
             CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
      FROM act a JOIN cohort c ON c.user_id = a.user_id
      WHERE a.week_idx >= c.cohort_week
      GROUP BY 1, 2
    )
    SELECT h.cohort_week, h.week_offset, h.active_users, s.cohort_size,
           CAST((h.active_users * 1000000) // s.cohort_size AS BIGINT)
             AS retention_ppm
    FROM hits h JOIN sizes s ON s.cohort_week = h.cohort_week
    """,
)
def w16_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly signup-cohort retention: per (cohort week, week offset),
    distinct active users, cohort size, retention in integer ppm.

    Spark shape: one scan derives the integer epoch-week index per
    event; the cohort relation is a user-keyed min agg over signups,
    the activity relation a (user, week) distinct — both map-side
    combined to user-grain before their exchanges. The act-cohort
    join is left UNHINTED: cohort is user-grain (it GROWS with
    users), so Catalyst broadcasts it while its stats fit and AQE
    switches to a co-keyed shuffle join beyond that — a hard hint
    here would force an over-limit broadcast at exactly the scale
    the matrix is for. Only the |weeks|-row sizes join is hinted.
    At 100 TB cohorts grow with USERS, offsets with TIME — the
    output is |weeks|^2/2 rows no matter how many events arrive."""
    ev = load_table(spark, sf_dir, "events")
    week = (
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long") / F.lit(7)
    )
    wk = ev.select(
        "user_id",
        "event_type",
        F.floor(week).cast("long").alias("week_idx"),
    )
    cohort = (
        wk.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("week_idx").alias("cohort_week"))
    )
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    act = wk.select("user_id", "week_idx").distinct()
    # NO broadcast hint on cohort (code-review r12 #3): it is
    # user-grain, so a hard hint would force an >8 GB broadcast build
    # at the very scale the matrix is meant for. Catalyst broadcasts
    # it at test SFs on size stats and AQE falls back to a shuffle
    # join when users outgrow the threshold; sizes (|weeks| rows)
    # stays hinted below.
    hits = (
        act.join(cohort, "user_id")
        .where(F.col("week_idx") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct(F.col("user_id")).cast("long").alias("active_users"))
    )
    return hits.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "active_users",
        "cohort_size",
        F.expr("CAST(active_users * 1000000 DIV cohort_size AS BIGINT)").alias(
            "retention_ppm"
        ),
    )


# ----------------------------------------------------------------- w17
# Trailing 7-day distinct users per day — the sliding COUNT DISTINCT
# every engagement dashboard needs and naive SQL answers with a
# day-spine x events self-join (a range join that re-scans the fact
# table per day). The scalable form is the window-contribution
# explode: each (day, user) pair contributes itself to the 7 window
# END days it falls inside — a bounded x7 fan-out of the already-
# deduplicated day-user relation, then ONE distinct-agg. No self-join,
# no range join, no per-day rescan, at any corpus size.
W17_DAYS = 7


@query(
    "w17_trailing_distinct",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    contrib AS (
      SELECT d, user_id,
             unnest(generate_series(d, d + {W17_DAYS - 1},
                                    INTERVAL 1 DAY))::DATE AS wend
      FROM du
    )
    SELECT STRFTIME(wend, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT CASE WHEN wend = d THEN user_id END)
                AS BIGINT) AS dau,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau_7d,
           CAST(COUNT(DISTINCT CASE WHEN wend = d THEN user_id END)
                AS BIGINT) * 1000000
             // CAST(COUNT(DISTINCT user_id) AS BIGINT) AS stickiness_ppm
    FROM contrib
    GROUP BY wend
    """,
)
def w17_trailing_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: that day's distinct users (dau), the trailing
    {W17_DAYS}-day distinct users (wau_7d), and dau/wau stickiness in
    integer ppm. Days with no events of their own still appear while
    inside some active user's trailing window (dau 0) — both engines
    emit them from the same explode. Output property (deliberate,
    ADVICE r13): the explode also emits the {W17_DAYS - 1} window-end
    days PAST the last data day (dau 0, wau shrinking as the tail
    drains) — the trailing-window view of a feed that just stopped,
    consistent across engines by construction.

    Scale shape: ONE distinct over (day, user) — the only corpus-
    sized exchange, map-side combined — then a x{W17_DAYS} explode of
    that deduplicated relation (sequence + explode, linear and
    bounded) into ONE window-end aggregation that answers dau and
    wau together (dau = distinct users whose window end IS their own
    day — no second agg, no day-grain join; the first shipped form
    carried both and compiled to 5 exchanges, over the audit budget).
    The naive day-spine self-join this replaces re-scans the fact
    table once per day; this never reads a fact row twice."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    contrib = du.select(
        "d",
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), W17_DAYS - 1))
        ).alias("wend"),
    )
    dau = F.count_distinct(
        F.when(F.col("wend") == F.col("d"), F.col("user_id"))
    ).cast("long")
    wau = F.count_distinct(F.col("user_id")).cast("long")
    return contrib.groupBy("wend").agg(
        dau.alias("dau"),
        wau.alias("wau_7d"),
        F.expr(
            "CAST(CAST(COUNT(DISTINCT CASE WHEN wend = d THEN user_id END)"
            " AS BIGINT) * 1000000"
            " DIV COUNT(DISTINCT user_id) AS BIGINT)"
        ).alias("stickiness_ppm"),
    ).select(
        F.date_format("wend", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau_7d",
        "stickiness_ppm",
    )


# --------------------------------------------------------------- w18
# Integer-exact spike detection over the daily series: flag days whose
# total exceeds the trailing-{W18_LOOKBACK}-day baseline by more than
# two standard deviations — the monitoring rule every dashboard
# implements with floats, done here in pure BIGINT cross-multiplied
# arithmetic so the verdict is engine-exact and hash-comparable:
#   x > mean + 2*sigma  <=>  n*x - s > 0  AND  (n*x - s)^2 > 4*(n*ss - s^2)
# (multiply through by n, then square; n*ss - s^2 = n^2 * variance).
# Domain bound (documented, not checked): the squared deviation stays
# under 2^63 while per-entity daily totals are < ~1e8 with a 30-day
# window — far above any real per-entity day.
W18_LOOKBACK = 30
W18_MIN_BASE = 5


@query(
    "w18_anomaly_days",
    oracle=f"""
    WITH {USER_DAY_CTE},
    w AS (
      SELECT user_id, date, CAST(total AS BIGINT) AS x,
             CAST(COUNT(*) OVER win AS BIGINT) AS n,
             CAST(SUM(total) OVER win AS BIGINT) AS s,
             CAST(SUM(total * total) OVER win AS BIGINT) AS ss
      FROM user_day
      WINDOW win AS (PARTITION BY user_id ORDER BY date
                     ROWS BETWEEN {W18_LOOKBACK} PRECEDING AND 1 PRECEDING)
    )
    SELECT STRFTIME(date, '%Y-%m-%d') AS date, user_id, x AS total,
           n AS base_n, s AS base_sum,
           CAST(CASE WHEN n >= {W18_MIN_BASE} AND n * x > s
                      AND (n * x - s) * (n * x - s) > 4 * (n * ss - s * s)
                THEN 1 ELSE 0 END AS INTEGER) AS is_spike
    FROM w
    """,
)
def w18_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sigma spike days over each entity's daily total, against a
    trailing {W18_LOOKBACK}-row baseline that EXCLUDES the current day
    (w2's frame discipline) and requires {W18_MIN_BASE} baseline days
    — with mean/variance never materialized: the comparison is
    cross-multiplied into exact BIGINT arithmetic, so both engines
    agree bit-for-bit and the driver hash never sees a float.

    Scale shape: the user_day pre-agg (one map-side-combinable
    corpus exchange, shared MV-grain with w2/t2) then ONE user-keyed
    window pass — bounded frame, no join, no second corpus scan."""
    ud = user_day(spark, sf_dir)
    win = (
        Window.partitionBy("user_id")
        .orderBy("date")
        .rowsBetween(-W18_LOOKBACK, -1)
    )
    x = F.col("total").cast("long")
    n = F.count(F.lit(1)).over(win).cast("long")
    s = F.sum("total").over(win).cast("long")
    ss = F.sum(F.col("total") * F.col("total")).over(win).cast("long")
    dev = n * x - s
    spike = (
        (n >= W18_MIN_BASE) & (dev > 0) & (dev * dev > 4 * (n * ss - s * s))
    )
    return ud.select(
        F.date_format("date", "yyyy-MM-dd").alias("date"),
        "user_id",
        x.alias("total"),
        n.alias("base_n"),
        s.alias("base_sum"),
        F.when(spike, 1).otherwise(0).cast("int").alias("is_spike"),
    )
