"""Skew-handling operators (brief: "skewed keys hurt ... salting for
skew"; SURVEY §4 physical-execution notes).

AQE's skew-join splitting handles join-side skew at runtime; these
helpers cover the two cases AQE does not:

- `salted_agg`: two-stage aggregation for HOT GROUP KEYS. Stage 1
  aggregates on (key, salt) — the hot key's rows spread over
  `n_salts` reducers; stage 2 merges the partials on the key alone
  (tiny input). Works for any algebraic aggregate expressed as
  (partial, merge) pairs.
- `salted_broadcast_left`: replicate a small build side `n_salts`
  times so a salted probe side still joins correctly — the classic
  skew-join salt when the build side is broadcastable anyway.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: Mapping[str, Column],
    merges: Mapping[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    `partials` maps output name -> stage-1 aggregate over the raw rows
    (evaluated per (keys, salt)); `merges` maps the SAME names ->
    stage-2 aggregate over the stage-1 columns (evaluated per keys).
    Example: total count = partial F.count('*'), merge F.sum('n').

    The salt is deterministic (hash of all columns mod n_salts), so
    results are reproducible; distribution quality only affects
    balance, not correctness.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in partials.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merges.items()]
    )


def salted_broadcast_left(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "left",
) -> DataFrame:
    """Join a (possibly skewed) probe side against a small build side
    by salting the probe and exploding the build over every salt
    value, so each hot probe key's rows land on `n_salts` different
    tasks. The build side must be broadcast-small (it is replicated
    n_salts times)."""
    salted_probe = probe.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    )
    exploded_build = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_probe.join(
        F.broadcast(exploded_build), on=[on, "__salt"], how=how
    )
    return out.drop("__salt")
