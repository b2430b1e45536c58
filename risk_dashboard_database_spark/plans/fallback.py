"""Fallback query plans (SURVEY §4: "derived table -> raw fallback on
error/empty ... this is *semantics*; replicate").

The reference serves several endpoints from a derived table when it
exists and silently recomputes from base tables when it does not (or
errors) — `dashboard_app/app.py:3508-3563,3713-3764,1744-1817`. The
Spark mapping: try the materialized parquet (written by
plans/refresh.refresh_aggregates); on a missing/unreadable/empty
materialization, run the base-table builder.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def read_or_rebuild(
    spark: SparkSession,
    materialized_path: str,
    rebuild: Callable[[], DataFrame],
    require_rows: bool = False,
) -> tuple[DataFrame, str]:
    """Return (df, source) where source is 'materialized' or
    'fallback'. `require_rows=True` additionally falls back when the
    materialization is readable but empty (the reference's
    empty-result fallback, `app.py:3548-3563`)."""
    try:
        df = spark.read.parquet(materialized_path)
        if require_rows and df.isEmpty():
            return rebuild(), "fallback"
        return df, "materialized"
    except Exception:  # noqa: BLE001 — any unreadable materialization falls back
        return rebuild(), "fallback"
