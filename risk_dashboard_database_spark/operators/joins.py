"""Join operators beyond Spark built-ins (SURVEY §2.3).

`asof_join` — "latest build-side row at or before the probe's time"
(the reference's prior-day metric / latest-override lookups,
`dashboard_app/crisis_event_rollups.py:648,657-661`; `sql/schema.sql:67-88`).

Spark has no ASOF JOIN. The naive encoding (equi-join + inequality +
max) is a range join that degenerates to a per-key cross product. This
implementation uses the union + ordered-window technique instead:

    1. union build rows (tagged 0) and probe rows (tagged 1) into one
       relation keyed by (join key, event time, tag);
    2. sort within each key partition by (time, tag) — builds sort
       before probes at equal timestamps, giving <= semantics;
    3. last_value(build_cols, ignoreNulls) over the running frame
       hands every probe the most recent build row at-or-before it;
    4. keep only probe rows.

Cost: one shuffle + one sort over |build| + |probe| rows — the same
complexity as a sort-merge join, no cross product, no skew beyond the
hottest join key. This is the 100 TB formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_time: str,
    build_time: str,
    build_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each probe row, attach `build_cols` from the build row with
    the greatest `build_time` <= `probe_time` within the same `on` key
    (left-asof: probes with no prior build get nulls).

    `tiebreak`: column ordering builds with identical timestamps — the
    row sorting LAST wins (last-write-wins, matching the reference's
    latest-override semantics).
    """
    b = build.select(
        F.col(on).alias("__k"),
        F.col(build_time).alias("__t"),
        F.lit(0).alias("__is_probe"),
        F.coalesce(F.col(tiebreak), F.lit(0)).alias("__tb")
        if tiebreak
        else F.lit(0).alias("__tb"),
        F.struct(*build_cols).alias("__payload"),
    )
    probe_fields = probe.columns
    p = probe.select(
        F.col(on).alias("__k"),
        F.col(probe_time).alias("__t"),
        F.lit(1).alias("__is_probe"),
        F.lit(0).alias("__tb"),
        F.lit(None).cast(b.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__p_{c}") for c in probe_fields],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__is_probe", "__tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = b.unionByName(p, allowMissingColumns=True).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = merged.where(F.col("__is_probe") == 1).select(
        *[F.col(f"__p_{c}").alias(c) for c in probe_fields],
        *[F.col(f"__match.{c}").alias(c) for c in build_cols],
    )
    return out
