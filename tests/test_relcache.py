"""Relation-cache lifecycle: same (key, dataset) reuses the persisted
relation; switching datasets evicts the stale entry (no block
accumulation — ADVICE r2); clear() empties everything."""

from __future__ import annotations

from risk_dashboard_database_spark.plans import relcache


def test_cached_relation_reuse_and_eviction(spark):
    builds = []

    def builder(tag, n):
        # distinct row counts -> distinct canonicalized plans, so the
        # CacheManager can't alias the two datasets' cache entries
        def build():
            builds.append(tag)
            return spark.range(n).toDF("id")

        return build

    a1 = relcache.cached_relation("k", "dirA", builder("A", 3))
    a2 = relcache.cached_relation("k", "dirA", builder("A2", 3))
    assert a1 is a2 and builds == ["A"]          # same dataset: one build
    assert a1.storageLevel.useMemory             # persisted

    b = relcache.cached_relation("k", "dirB", builder("B", 4))
    assert builds == ["A", "B"]                  # dataset switch rebuilds
    assert not a1.storageLevel.useMemory         # stale entry unpersisted
    assert b.storageLevel.useMemory

    relcache.clear()
    assert not b.storageLevel.useMemory
    assert relcache._CACHE == {}
