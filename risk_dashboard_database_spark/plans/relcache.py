"""Per-dataset cached relations — the engine's materialized-view seam.

The reference materializes its expensive derived relations (label-
enriched facts, daily narrative rollups, MinHash-style signature
tables) as Postgres MVs/tables and reuses them across endpoints
(`sql/serp_feature_daily_mv.sql`, `narrative_runtime.py` rollup
writes). The Spark analog is a persisted DataFrame shared by every
query over the same dataset: built once, reused by all consumers, so
Catalyst's CollapseProject can't inline an expensive expression tree
(JSON parse, regex tagging, md5 minhash) into each of N references.

Lifecycle: one cached relation per key; switching datasets (sf_dir)
unpersists the stale entry before building the new one, so repeated
runs across datasets never accumulate cached blocks (ADVICE r2).
At 100 TB these are exactly the relations you would checkpoint or
write as tables in the MV refresh graph.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

_CACHE: dict[str, tuple[str, DataFrame]] = {}


def cached_relation(key: str, sf_dir: str, build: Callable[[], DataFrame]) -> DataFrame:
    """Return the persisted relation for (key, sf_dir), building it on
    first use; a different sf_dir for the same key evicts (unpersists)
    the previous dataset's entry."""
    hit = _CACHE.get(key)
    if hit is not None:
        prev_dir, df = hit
        if prev_dir == sf_dir:
            return df
        df.unpersist()
        del _CACHE[key]
    df = build().persist()
    _CACHE[key] = (sf_dir, df)
    return df


def clear() -> None:
    """Unpersist and drop every cached relation (test isolation)."""
    for _, df in _CACHE.values():
        df.unpersist()
    _CACHE.clear()
