"""connected_components: min-label propagation + pointer jumping."""

from pyspark.sql import functions as F

from risk_dashboard_database_spark.operators.graph import connected_components


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df)
    return {r["id"]: r["label"] for r in out.collect()}


def test_two_separate_pairs(spark):
    got = _labels(spark, [(1, 2), (10, 11)])
    assert got == {1: 1, 2: 1, 10: 10, 11: 10}


def test_long_chain_collapses(spark):
    # 0-1-2-...-31: diameter 31, must converge via pointer jumping
    # well inside the max_iter=20 cap (O(log n) rounds).
    got = _labels(spark, [(i, i + 1) for i in range(31)])
    assert set(got.values()) == {0}
    assert len(got) == 32


def test_cycle_and_cross_links(spark):
    got = _labels(spark, [(5, 6), (6, 7), (7, 5), (7, 8), (2, 8)])
    assert set(got) == {2, 5, 6, 7, 8}
    assert set(got.values()) == {2}


def test_duplicate_and_reversed_edges(spark):
    got = _labels(spark, [(3, 4), (4, 3), (3, 4)])
    assert got == {3: 3, 4: 3}
