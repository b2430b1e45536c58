"""Sort / limit / top-k family (SURVEY §2.6 O1-O7) + composite risk
score (§2.8).

These are the only queries whose ORDER BY is semantic (pagination,
top-k slicing), so they keep their sorts; everything else in the
engine drops global ordering (the driver compare is order-insensitive
and a total-order exchange is waste at scale). Top-k sorts in Spark
execute as TakeOrderedAndProject — no full sort, no single-partition
exchange — which is the 100 TB-safe shape for every query here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query

DATE_FMT = "yyyy-MM-dd"
DEC = "decimal(18,2)"


@query(
    "o1_pagination",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS date,
           o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS total_price
    FROM orders
    ORDER BY CAST(o_orderdate AS DATE) DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """,
)
def o1_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY LIMIT OFFSET pagination (O1): the reference caps every
    endpoint at limit<=500/1000 with offsets (`app.py:2903-2904`).
    The sort key includes the unique order key so pages are stable."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.date_format(F.col("o_orderdate").cast("date"), DATE_FMT).alias("date"),
            "o_orderpriority",
            F.col("o_totalprice").cast("double").alias("total_price"),
        )
        .orderBy(F.col("date").desc(), F.col("o_orderkey"))
        .offset(100)
        .limit(50)
    )


@query(
    "o2_topk_compound",
    oracle="""
    SELECT c.c_name AS entity_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS window_value,
           STRFTIME(MAX(CAST(o.o_orderdate AS DATE)), '%Y-%m-%d') AS latest,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_name
    ORDER BY window_value DESC, latest DESC, entity_name ASC
    LIMIT 20
    """,
)
def o2_topk_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with multi-key compound sort (O2): `window_value desc,
    latest desc, name asc` exactly as the screen endpoint's ordering
    (`app.py:4422-4423`). Executes as TakeOrderedAndProject."""
    orders = load_table(spark, sf_dir, "orders")
    cust = F.broadcast(load_table(spark, sf_dir, "customer"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_name").alias("entity_name"))
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("window_value"),
            F.date_format(F.max(F.col("o_orderdate").cast("date")), DATE_FMT).alias(
                "latest"
            ),
            F.count("*").alias("n_orders"),
        )
        .orderBy(
            F.col("window_value").desc(), F.col("latest").desc(), F.col("entity_name")
        )
        .limit(20)
    )


@query(
    "o3_nulls_last",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN value < 10 THEN NULL ELSE value END AS metric
    FROM events
    ORDER BY metric ASC NULLS LAST, event_id
    LIMIT 100
    """,
)
def o3_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS LAST ordering (O3): `order by position nulls last, id`
    (`app.py:523,3411,5796`). Spark defaults to nulls-first on asc, so
    the modifier is semantic, not cosmetic."""
    ev = load_table(spark, sf_dir, "events")
    metric = F.when(F.col("value") < 10, F.lit(None)).otherwise(F.col("value"))
    return (
        ev.select("event_id", "user_id", metric.alias("metric"))
        .orderBy(F.asc_nulls_last("metric"), F.col("event_id"))
        .limit(100)
    )


# Composite risk score weights — reference defaults
# (`dashboard_app/static/app/entity-store.js:131-216`, duplicated server-side
# `app.py:175-184`): news .24, organic .24, topStories .16, aio .12,
# paa .10, videos .07, perspectives .07, minus control .10.
_RISK_WEIGHTS = {
    "purchase": 0.24,
    "view": 0.24,
    "click": 0.16,
    "signup": 0.12,
    "error": 0.10,
}
_CTRL_WEIGHT = 0.10


@query(
    "o6_risk_leaderboard",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
             COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
             COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
             COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
             COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
             COUNT(*) FILTER (WHERE CAST(props->>'$.k' AS INTEGER) % 4 = 0) AS n_controlled
      FROM events
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(0.24 AS DOUBLE) * n_purchase + CAST(0.24 AS DOUBLE) * n_view
             + CAST(0.16 AS DOUBLE) * n_click
             + CAST(0.12 AS DOUBLE) * n_signup + CAST(0.10 AS DOUBLE) * n_error
             - CAST(0.10 AS DOUBLE) * n_controlled AS risk_score,
           CASE WHEN n_error > 0 AND n_controlled < 5 THEN 'High'
                WHEN n_error > 0 THEN 'Medium'
                ELSE 'Low' END AS risk_label
    FROM per_user
    ORDER BY risk_score DESC, user_id
    LIMIT 10
    """,
)
def o6_risk_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-score top-10 leaderboard (O6 + §2.8 risk score):
    weighted linear blend of per-feature counts minus a control credit,
    then High/Medium/Low labeling — `entity-store.js:131-222,1393-1399`.
    Pure column arithmetic over one hash agg; top-k via
    TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    n = lambda t: F.count(F.when(F.col("event_type") == t, 1))  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        n("purchase").alias("n_purchase"),
        n("view").alias("n_view"),
        n("click").alias("n_click"),
        n("signup").alias("n_signup"),
        n("error").alias("n_error"),
        F.count(F.when(k % 4 == 0, 1)).alias("n_controlled"),
    )
    score = (
        F.lit(0.24) * F.col("n_purchase")
        + F.lit(0.24) * F.col("n_view")
        + F.lit(0.16) * F.col("n_click")
        + F.lit(0.12) * F.col("n_signup")
        + F.lit(0.10) * F.col("n_error")
        - F.lit(0.10) * F.col("n_controlled")
    )
    return (
        per_user.select(
            "user_id",
            score.alias("risk_score"),
            F.when((F.col("n_error") > 0) & (F.col("n_controlled") < 5), "High")
            .when(F.col("n_error") > 0, "Medium")
            .otherwise("Low")
            .alias("risk_label"),
        )
        .orderBy(F.col("risk_score").desc(), F.col("user_id"))
        .limit(10)
    )


def fuzzy_resolve(probes: DataFrame, candidates: DataFrame) -> DataFrame:
    """The fuzzy-resolution core, reference-parity semantics
    (`app.py:1048-1056,1097-1161,1204-1217,1253-1334`):

    - score = ``difflib.SequenceMatcher(None, lower(probe),
      lower(candidate)).ratio()``
    - keep scores >= 0.72 (the suggestion threshold)
    - per probe: sort (-score, candidate), keep the top 5
    - ``resolved`` = 1 only on the rank-1 row, only when best >= 0.84
      AND (no runner-up OR best - runner >= 0.01)

    ``probes`` must have (probe_id, probe_name); ``candidates`` must
    have (candidate). Exposed separately from the o7 query so golden
    fixtures can pin the thresholds with hand-computed cases.

    Scoring runs as an Arrow-batched pandas UDF over a broadcast
    candidate join — at scale candidates are a dim table, so the fact
    side never shuffles; the UDF is the only Python in the plan,
    batched, never row-at-a-time."""
    from pyspark.sql.functions import pandas_udf

    # Series->Series scalar pandas UDF via type hints (the modern,
    # non-deprecated form); `pd` is a module-level import so
    # get_type_hints can resolve the stringified annotations that
    # `from __future__ import annotations` produces.
    @pandas_udf("double")
    def seq_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
        from difflib import SequenceMatcher

        return pd.Series(
            [SequenceMatcher(None, x, y).ratio() for x, y in zip(a, b)]
        )

    # Lossless length-band prefilter BEFORE the Python UDF:
    # SequenceMatcher.ratio() = 2*M/(la+lb) with M <= min(la, lb), so
    # any pair with 2*min(la,lb)/(la+lb) < 0.72 can never reach the
    # score cutoff — prune it JVM-side and never invoke the UDF on it
    # (~10x fewer Python invocations at wide candidate dims; results
    # provably identical).
    la, lb = F.length("probe_name"), F.length("candidate")
    length_ub = F.lit(2.0) * F.least(la, lb) / (la + lb)
    scored = (
        probes.join(F.broadcast(candidates))
        .where(length_ub >= 0.72)
        .withColumn("score", seq_ratio(F.lower("probe_name"), F.lower("candidate")))
        .where(F.col("score") >= 0.72)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.col("score").desc(), F.col("candidate"))
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
    )
    best = F.max(F.when(F.col("rank") == 1, F.col("score"))).over(
        Window.partitionBy("probe_id")
    )
    runner = F.max(F.when(F.col("rank") == 2, F.col("score"))).over(
        Window.partitionBy("probe_id")
    )
    return top.select(
        "probe_id",
        "probe_name",
        "candidate",
        F.round("score", 6).alias("score"),
        "rank",
        (
            (F.col("rank") == 1)
            & (best >= 0.84)
            & ((runner.isNull()) | (best - runner >= 0.01))
        )
        .cast("int")
        .alias("resolved"),
    )


@query("o7_fuzzy_topk")  # no oracle: SequenceMatcher has no SQL equivalent (F-surface)
def o7_fuzzy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-suggestion top-k (O7) over the customer dim: probes are
    customer names with their last 3 chars dropped (deterministic);
    candidates are the full name set. All scoring/threshold semantics
    live in :func:`fuzzy_resolve` (reference parity:
    `app.py:1048-1056,1097-1161,1204-1217`)."""
    cust = load_table(spark, sf_dir, "customer")
    probes = cust.where(F.col("c_custkey") % 100 == 0).select(
        F.col("c_custkey").alias("probe_id"),
        F.expr("substring(c_name, 1, length(c_name) - 3)").alias("probe_name"),
    )
    candidates = cust.select(F.col("c_name").alias("candidate"))
    return fuzzy_resolve(probes, candidates)


# ----------------------------------------------------------------- o8
# Keyset (seek) pagination — the scale-correct form of o1. OFFSET N
# pagination is an anti-pattern at warehouse scale: the engine must
# produce and DISCARD the first N rows of the global order on every
# page (page 10,000 of a 100 TB leaderboard scans half a million rows
# to throw them away). The seek method replaces the offset with a
# cursor — the compound sort key of the last row of the previous page
# — so the next page compiles to a pushable range predicate + top-k.
# o8 computes o1's exact third page (rows 101-150) this way and shares
# o1's OFFSET oracle, so the driver gate asserts seek == offset
# semantics bit-for-bit.


@query(
    "o8_keyset_pagination",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS date,
           o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS total_price
    FROM orders
    ORDER BY CAST(o_orderdate AS DATE) DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """,
)
def o8_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """o1's page 3 via the seek method: derive the cursor (the
    compound key of ordered row 100 — in a live API the client echoes
    it back, here it derives deterministically), then fetch the page
    as WHERE key-after-cursor ORDER BY LIMIT 50.

    Spark shape: the cursor is TakeOrdered(100) -> a row_number window
    over that 100-row frame -> ONE row (sanctioned tiny-relation
    class); the page is the base scan joined to the broadcast 1-row
    cursor on the strict after-in-sort-order predicate (the e4/e7/e8
    1-row anchor pattern — a BroadcastNestedLoopJoin of corpus x 1)
    followed by TakeOrderedAndProject(50). No row is produced just to
    be discarded: at 100 TB the page cost is one filtered scan + a
    top-50, independent of how deep the page sits — OFFSET's linear
    discard is exactly what this operator exists to retire."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.date_format(F.col("o_orderdate").cast("date"), DATE_FMT).alias("date"),
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("total_price"),
    )
    order_cols = [F.col("date").desc(), F.col("o_orderkey")]
    cursor = (
        base.orderBy(*order_cols)
        .limit(100)
        .withColumn(
            "__rn", F.row_number().over(Window.orderBy(*order_cols))
        )
        .where(F.col("__rn") == 100)
        .select(
            F.col("date").alias("__cur_date"),
            F.col("o_orderkey").alias("__cur_key"),
        )
    )
    after_cursor = (F.col("date") < F.col("__cur_date")) | (
        (F.col("date") == F.col("__cur_date"))
        & (F.col("o_orderkey") > F.col("__cur_key"))
    )
    return (
        base.join(F.broadcast(cursor), after_cursor)
        .select("o_orderkey", "date", "o_orderpriority", "total_price")
        .orderBy(*order_cols)
        .limit(50)
    )


# ---------------------------------------------------------------- o9
# Diversified top-k — the serving-layer ranking constraint every
# leaderboard eventually grows ("show the top 20, but no more than 3
# per segment"): a per-group rank cap composed under a global top-k.


O9_PER_SEGMENT = 3
O9_TOPK = 20


@query(
    "o9_diversified_topk",
    oracle=f"""
    WITH ranked AS (
      SELECT c.c_mktsegment AS segment,
             o.o_orderkey,
             o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC,
                                         o.o_orderkey) AS seg_rank
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT segment,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           o_totalprice AS total_price,
           CAST(seg_rank AS BIGINT) AS seg_rank
    FROM ranked
    WHERE seg_rank <= {O9_PER_SEGMENT}
    ORDER BY total_price DESC, o_orderkey
    LIMIT {O9_TOPK}
    """,
)
def o9_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-{O9_TOPK} orders by price, capped at
    {O9_PER_SEGMENT} per market segment — diversified ranking via a
    per-segment ROW_NUMBER cap under a global TakeOrdered.

    Scale shape: the segment rank is WindowGroupLimit-pushed (each
    input partition keeps only its own top-{O9_PER_SEGMENT} per
    segment BEFORE the exchange, so the window shuffle moves
    ~{O9_PER_SEGMENT} x partitions x |segments| rows, never the fact
    table), and the final slice is TakeOrderedAndProject — no global
    sort at any corpus size. Ties break on o_orderkey on both
    engines, so the page is deterministic. total_price is a raw
    stored value (no float accumulation), so double equality is safe
    cross-engine.

    The customer join carries NO broadcast hint (ADVICE r12: customer
    is user-grain and grows with SF — the w16 stance): at test SFs
    AQE broadcasts it anyway under the size threshold, and at 100 TB
    the same plan falls back to a shuffle join instead of forcing an
    over-limit build."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    w = Window.partitionBy("segment").orderBy(
        F.col("total_price").desc(), F.col("o_orderkey")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("segment", "o_orderkey", F.col("o_totalprice").alias("total_price"))
        .withColumn("seg_rank", F.row_number().over(w).cast("long"))
        .where(F.col("seg_rank") <= O9_PER_SEGMENT)
        .orderBy(F.col("total_price").desc(), F.col("o_orderkey"))
        .limit(O9_TOPK)
    )
