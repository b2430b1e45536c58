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
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    `partials` maps output name -> stage-1 aggregate over the raw rows
    (evaluated per (keys, salt)); `merges` maps the SAME names ->
    stage-2 aggregate over the stage-1 columns (evaluated per keys).
    Example: total count = partial F.count('*'), merge F.sum('n').

    The salt is deterministic (hash of `salt_on` — default all
    columns — mod n_salts), so results are reproducible; for algebraic
    aggregates distribution quality only affects balance, not
    correctness. Semi-algebraic aggregates need a SPECIFIC salt_on to
    stay exact: partial DISTINCT sets are disjoint across salts only
    when the salt is a pure function of the distinct value — see
    `salted_count_distinct`.
    """
    cols = salt_on if salt_on is not None else df.columns
    salt = F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salts))
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in partials.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merges.items()]
    )


# NOTE deliberately ABSENT: a salted_count_distinct helper. Catalyst
# already plans `count_distinct` skew-safely — phase 1 aggregates on
# (keys + distinct col) and hash-partitions on BOTH, so a hot key's
# rows spread across every reducer before the per-key count runs.
# A manual value-salt rewrite measured 18% SLOWER than the built-in
# plan on a 90%-hot 20M-row corpus (BENCH_NOTES r6 skew study): it
# re-implements the same expansion plus an extra shuffle. Use the
# salt_on parameter above only for aggregation state Catalyst cannot
# rewrite (UDAF-style merges).


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
