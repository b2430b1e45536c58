"""Sessionization / gaps-and-islands / temporal state machines
(SURVEY §2.5 W8-W9, W11; §2.9 T2, T4).

Reference semantics ported:
- `dashboard_app/app.py:1602-1635` — split a set of dates into runs of
  adjacent days -> episode (start, end, length) windows.
- `dashboard_app/crisis_event_rollups.py:639-683` — per-entity-day
  crisis state machine: a day is *active* iff an independent trigger
  fires, OR the previous day was active and a continuation condition
  holds; the carried state resets on calendar gaps; an additional gate
  (has primary tag) must hold on every active day.

The state machine looks iterative (active-today depends on
active-yesterday), but the recurrence

    active(d) = gate(d) AND (trig(d) OR (cont(d) AND active(d-1)))

is *linearizable*: a chain can only flow through days where `cont` and
`gate` held, so segmenting rows at every point where the chain must
break (calendar gap, cont false, or previous day's gate false) reduces
it to `gate AND max(trig) over the segment so far` — pure window
functions, no Python in the loop, fully distributed. This is the
100 TB-safe formulation; `applyInPandas` is reserved for state
functions that genuinely aren't linearizable (see `state_scan`).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_islands(
    df: DataFrame,
    partition_keys: list[str],
    date_col: str,
    island_col: str = "island_start",
) -> DataFrame:
    """Tag each row with the start date of its consecutive-day island
    (classic `date - row_number()` grouping key, made interpretable by
    using `min(date)` per island).

    The island key is `date_sub(date, row_number)` — constant within a
    run of adjacent days; we then replace it with the island's first
    date so downstream grouping keys are meaningful.
    """
    w = Window.partitionBy(*partition_keys).orderBy(date_col)
    anchor = F.date_sub(F.col(date_col), F.row_number().over(w))
    df = df.withColumn("__anchor", anchor)
    w2 = Window.partitionBy(*partition_keys, "__anchor")
    return df.withColumn(island_col, F.min(date_col).over(w2)).drop("__anchor")


def episodes(
    df: DataFrame,
    partition_keys: list[str],
    date_col: str,
    agg: dict[str, Column] | None = None,
) -> DataFrame:
    """Collapse consecutive-day runs into episode rows
    (start, end, n_days[, extra aggregates]) — T4 / app.py:1602-1635."""
    tagged = with_islands(df, partition_keys, date_col)
    aggs = [
        F.min(date_col).alias("episode_start"),
        F.max(date_col).alias("episode_end"),
        F.count("*").alias("episode_days"),
    ] + [expr.alias(name) for name, expr in (agg or {}).items()]
    return tagged.groupBy(*partition_keys, "island_start").agg(*aggs).drop("island_start")


def chain_active(
    df: DataFrame,
    partition_keys: list[str],
    date_col: str,
    trig: Column,
    cont: Column,
    gate: Column | None = None,
) -> DataFrame:
    """Crisis-event activity scan (T2), window-only formulation.

    active(d) = gate(d) AND (trig(d) OR (cont(d) AND active(d-1)))
    with active resetting across calendar gaps
    (`crisis_event_rollups.py:639-683`).

    Adds boolean column `active`.
    """
    gate = F.lit(True) if gate is None else gate
    df = df.withColumn("__trig", trig).withColumn("__cont", cont).withColumn("__gate", gate)

    w = Window.partitionBy(*partition_keys).orderBy(date_col)
    prev_date = F.lag(date_col).over(w)
    prev_gate = F.lag("__gate").over(w)
    gap = prev_date.isNull() | (F.date_add(prev_date, 1) != F.col(date_col))
    # A chain must break entering day d when: d is not cont-eligible,
    # there is a calendar gap, or yesterday's gate failed (yesterday
    # could not have been active). Rows 2..n of a segment therefore all
    # have cont=true and prev gate=true, so within a segment:
    #   active(d) = gate(d) AND any(trig) over segment rows <= d.
    boundary = (~F.coalesce(F.col("__cont"), F.lit(False))) | gap | (
        ~F.coalesce(prev_gate, F.lit(False))
    )
    seg = F.sum(boundary.cast("int")).over(
        Window.partitionBy(*partition_keys).orderBy(date_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    df = df.withColumn("__seg", seg)
    wseg = (
        Window.partitionBy(*partition_keys, "__seg")
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    active = F.col("__gate") & (
        F.max(F.coalesce(F.col("__trig"), F.lit(False)).cast("int")).over(wseg) == 1
    )
    return (
        df.withColumn("active", F.coalesce(active, F.lit(False)))
        .drop("__trig", "__cont", "__gate", "__seg")
    )


def state_scan(
    df: DataFrame,
    partition_keys: list[str],
    order_key: str,
    step: Callable,
    state_cols: dict[str, str],
) -> DataFrame:
    """General per-entity ordered state scan via applyInPandas — the
    escape hatch for state functions that are NOT linear recurrences
    (T2-class semantics with arbitrary carried state).

    `step(state, row) -> state` is a plain-Python transition; output
    gains one column per entry in `state_cols` (name -> spark type
    string). Partitioned by entity, so state never crosses executors;
    at 100 TB each group is one entity's history (small), and groups
    are hash-distributed — no skew beyond the entity with the longest
    history.
    """
    import pandas as pd

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{n} {t}" for n, t in state_cols.items()]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_key).reset_index(drop=True)
        state: dict = {}
        extra: dict[str, list] = {n: [] for n in state_cols}
        # itertuples, not iterrows: no per-row Series construction
        # (~10x less overhead for the unavoidable sequential scan).
        for row in pdf.itertuples(index=False):
            state = step(state, row._asdict())
            for n in state_cols:
                extra[n].append(state.get(n))
        for n, vals in extra.items():
            pdf[n] = vals
        return pdf

    return df.groupBy(*partition_keys).applyInPandas(run, schema=out_schema)
