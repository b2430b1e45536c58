"""Alias-tolerant CSV source (SURVEY §2.1 S1; §2.8 bool parse).

Reference semantics (`src/ingest_v2.py:253-341`, `src/ingest_csvs.py:
95-135`): modal CSV exports arrive with drifting header names; the
ingester resolves each canonical field from a list of accepted aliases
and coerces booleans/enums tolerantly (`src/ingest_v2.py:21-62`).

Spark-first: one `spark.read.csv(header=True)` then a single select
that coalesces alias columns into canonical names — no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRUE_WORDS = ["true", "t", "yes", "y", "1"]
FALSE_WORDS = ["false", "f", "no", "n", "0"]


def coerce_bool(col: F.Column) -> F.Column:
    """Tolerant tri-state bool parse (`src/ingest_v2.py:21-47`):
    unrecognized/blank -> null (nullable BooleanType, the reference's
    tri-state columns)."""
    v = F.lower(F.trim(col))
    return (
        F.when(v.isin(TRUE_WORDS), F.lit(True))
        .when(v.isin(FALSE_WORDS), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def read_aliased_csv(
    spark: SparkSession,
    path: str,
    aliases: dict[str, list[str]],
    bool_cols: list[str] | None = None,
) -> DataFrame:
    """Read a header CSV and resolve canonical columns from alias
    lists. `aliases` maps canonical name -> accepted header names in
    priority order (first non-null wins per row, matching the
    reference's per-field alias probing). Missing aliases contribute
    nulls; a canonical column with NO alias present errors loudly."""
    raw = spark.read.csv(path, header=True)
    present = set(raw.columns)
    out_cols = []
    for canonical, names in aliases.items():
        hits = [n for n in names if n in present]
        if not hits:
            raise ValueError(
                f"CSV {path}: none of the aliases {names!r} for column "
                f"{canonical!r} are present (found {sorted(present)!r})"
            )
        col = F.coalesce(*[F.col(f"`{n}`") for n in hits]) if len(hits) > 1 else F.col(
            f"`{hits[0]}`"
        )
        out_cols.append(col.alias(canonical))
    df = raw.select(out_cols)
    for b in bool_cols or []:
        df = df.withColumn(b, coerce_bool(F.col(b)))
    return df
