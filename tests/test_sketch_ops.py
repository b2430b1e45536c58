"""Invariant tests for d37 (MinHash calibration) and d38 (quantile
sketch): the calibration table must be a consistent summary of the d2
candidate universe, and the sketch estimate must bracket the exact
order statistic within one bin width."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from risk_dashboard_database_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


def test_minhash_calibration_consistency(spark):
    from risk_dashboard_database_spark.plans.dedup import (
        d2_minhash_pairs,
        d37_minhash_calibration,
    )

    cal = d37_minhash_calibration(spark, SF_DIR).collect()
    assert cal, "candidate set must be non-empty at sf0.001"
    for r in cal:
        assert 0 <= r["decile"] <= 10
        assert r["n_pairs"] >= 1
        assert 0 <= r["mean_est_ppm"] <= 1_000_000
        assert 0 <= r["mean_exact_ppm"] <= 1_000_000
        # the decile is derived FROM exact_ppm, so the decile's mean
        # must land inside the decile's ppm range
        assert r["decile"] * 100_000 <= r["mean_exact_ppm"]
        if r["decile"] < 10:
            assert r["mean_exact_ppm"] < (r["decile"] + 1) * 100_000
        # Jensen: |mean(est) - mean(exact)| <= mean(|est - exact|)
        assert (
            abs(r["mean_est_ppm"] - r["mean_exact_ppm"])
            <= r["mean_abs_err_ppm"] + 1  # integer-div slack
        )
    # every d2 near-dup pair (exact jaccard >= 0.5) is an LSH
    # candidate, so the calibration's pair mass at deciles >= 5 must
    # cover at least the d2 row count
    d2_rows = d2_minhash_pairs(spark, SF_DIR).count()
    cal_high = sum(r["n_pairs"] for r in cal if r["decile"] >= 5)
    assert cal_high >= d2_rows


def test_quantile_sketch_brackets_exact(spark):
    from pyspark.sql import functions as F

    from risk_dashboard_database_spark.plans.dedup import (
        QSK_BIN_W,
        QSK_PS,
        d38_quantile_sketch,
    )
    from risk_dashboard_database_spark.tables import load_table

    rows = d38_quantile_sketch(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    truth = {
        r["lang"]: r["nd"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("nd")).collect()
    }
    assert {r["lang"] for r in rows} == set(truth)
    for r in rows:
        assert r["n_docs"] == truth[r["lang"]]
        prev_exact = None
        for p in QSK_PS:
            exact, est = r[f"p{p}_exact"], r[f"p{p}_est"]
            # the estimate is the upper bound of the exact value's bin
            assert est >= exact
            assert est - exact < QSK_BIN_W
            assert est % QSK_BIN_W == QSK_BIN_W - 1
            # percentiles are monotone in p
            if prev_exact is not None:
                assert exact >= prev_exact
            prev_exact = exact


def test_quantile_sketch_exact_matches_sorted_list(spark):
    """The 'exact' column really is the ceil(p*n/100)-th smallest."""
    from risk_dashboard_database_spark.plans.dedup import (
        QSK_PS,
        d38_quantile_sketch,
    )
    from risk_dashboard_database_spark.tables import load_table

    rows = {r["lang"]: r for r in d38_quantile_sketch(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").collect()
    by_lang: dict[str, list[int]] = {}
    for d in docs:
        by_lang.setdefault(d["lang"], []).append(d["n_chars"])
    for lang, lens in by_lang.items():
        lens.sort()
        n = len(lens)
        for p in QSK_PS:
            k = (p * n + 99) // 100
            assert rows[lang][f"p{p}_exact"] == lens[k - 1]


def test_embed_recall_ties_to_d7(spark):
    from risk_dashboard_database_spark.plans.dedup import (
        D42_TAU,
        d7_embedding_dedup,
        d42_embed_recall,
    )

    rows = d42_embed_recall(spark, SF_DIR).collect()
    assert rows, "threshold band table must be non-empty at sf0.001"
    for r in rows:
        # bands start at the threshold band
        assert r["band"] >= int(D42_TAU * 20)
        assert r["exact_pairs"] == r["found_pairs"] + r["missed_pairs"]
        assert 0 <= r["recall_ppm"] <= 1_000_000
        assert (
            r["recall_ppm"] == r["found_pairs"] * 1_000_000 // r["exact_pairs"]
        )
    # found is exactly d7's pair set (d7 computes exact cosine on its
    # bucket candidates, so per-band found sums to the d7 row count)
    assert sum(r["found_pairs"] for r in rows) == d7_embedding_dedup(
        spark, SF_DIR
    ).count()
