"""Trailing-window operators (SURVEY §2.5 W1-W7, W10).

Reference semantics ported:
- `sql/entity_weekly_rollup_v.sql:2-29` — trailing 7-ROW rollups
  (ROWS, not RANGE: gap days are skipped rows, replicated exactly).
- `sql/entity_anomalies_v.sql:4-38` — 30-day trailing baselines that
  exclude the current row, prior-range maxes, 3-day streaks.
- `dashboard_app/crisis_event_rollups.py:647-661` — LAG deltas with
  *calendar-day* semantics (a missing prior day reads as 0, not as
  the previous row).

Scale notes: every operator here is a single window over
(partition_keys, order_key). Spark executes it as one shuffle on the
partition keys followed by an in-partition sort; at 100 TB the
partition key is the entity id (high cardinality, no skew), so the
shuffle is balanced and no driver-side state exists.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def trailing_window(
    partition_keys: list[str], order_key: str, start: int, end: int
) -> WindowSpec:
    """ROWS-frame trailing window, e.g. (-6, 0) = 7 trailing rows."""
    return (
        Window.partitionBy(*partition_keys)
        .orderBy(order_key)
        .rowsBetween(start, end)
    )


def trailing_rollup(
    df: DataFrame,
    partition_keys: list[str],
    order_key: str,
    metrics: Mapping[str, Column],
    start: int = -6,
    end: int = 0,
) -> DataFrame:
    """Add trailing ROWS-frame aggregate columns (W1-W4 shape).

    `metrics` maps output column name -> aggregate expression (e.g.
    ``{"errors_7d": F.sum("errors")}``); each is evaluated over the
    same ROWS frame.
    """
    w = trailing_window(partition_keys, order_key, start, end)
    out = df
    for name, expr in metrics.items():
        out = out.withColumn(name, expr.over(w))
    return out


def lag_calendar(
    df: DataFrame,
    partition_keys: list[str],
    date_col: str,
    value_col: str,
    default: float | int = 0,
) -> Column:
    """Prior *calendar day* value: if the previous row is not exactly
    one day earlier, the prior value is `default` (reference dict-miss
    semantics, `crisis_event_rollups.py:648`). Returns a Column to
    attach with withColumn."""
    w = Window.partitionBy(*partition_keys).orderBy(date_col)
    prev_date = F.lag(date_col).over(w)
    prev_val = F.lag(value_col).over(w)
    return F.when(
        prev_date.isNotNull() & (F.date_add(prev_date, 1) == F.col(date_col)),
        prev_val,
    ).otherwise(F.lit(default))


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column],
) -> DataFrame:
    """Latest-wins dedup (W5/J3): Postgres `DISTINCT ON (keys) ...
    ORDER BY keys, ts DESC` == row_number()=1 over the same window
    (`sql/schema.sql:67-76`). `order_cols` must define a total order
    (include a unique id as final tiebreak)."""
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
