"""Invariant tests for the round-8 vocabulary/mining operators:
d35_oov_rate must account for every corpus token, and
d36_hard_negatives must agree with d3's brute-force ranking on the
shared candidate universe."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from risk_dashboard_database_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


def test_oov_rate_accounts_for_every_token(spark):
    from pyspark.sql import functions as F

    from risk_dashboard_database_spark.plans.dedup import d35_oov_rate
    from risk_dashboard_database_spark.tables import load_table

    card = d35_oov_rate(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    truth = {
        r["lang"]: (r["nd"], r["nt"])
        for r in docs.groupBy("lang")
        .agg(
            F.count("*").alias("nd"),
            F.sum(F.size(F.split("text", " "))).alias("nt"),
        )
        .collect()
    }
    assert {r["lang"] for r in card} == set(truth)
    for r in card:
        nd, nt = truth[r["lang"]]
        assert r["n_docs"] == nd
        assert r["total_tokens"] == nt
        assert 0 <= r["oov_tokens"] <= r["total_tokens"]
        assert r["oov_ppm"] == r["oov_tokens"] * 1_000_000 // r["total_tokens"]
        assert 0 <= r["high_oov_docs"] <= r["n_docs"]


def test_hard_negatives_agree_with_brute_force(spark):
    from risk_dashboard_database_spark.plans.dedup import (
        HARDNEG_TOPK,
        d3_ann_topk,
        d36_hard_negatives,
    )
    from risk_dashboard_database_spark.tables import load_table

    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    negs = d36_hard_negatives(spark, SF_DIR).collect()
    per_q: dict[int, list] = {}
    for r in sorted(negs, key=lambda r: (r["query_id"], r["rank"])):
        per_q.setdefault(r["query_id"], []).append(r)
    assert per_q, "probe set must be non-empty"
    d3 = {}
    for r in d3_ann_topk(spark, SF_DIR).collect():
        d3.setdefault(r["query_id"], []).append(r)
    for qid, rows in per_q.items():
        assert len(rows) <= HARDNEG_TOPK
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        for r in rows:
            # a hard negative is cross-label by definition
            assert labels[r["candidate_id"]] != labels[qid]
            assert r["neg_label"] == labels[r["candidate_id"]]
        # d3 ranks the SAME scored relation without the label filter,
        # so d36's rank-1 negative can never out-score d3's rank-1
        top_all = max(x["cosine"] for x in d3[qid])
        assert rows[0]["cosine"] <= top_all + 1e-12
        # margin is exactly best_pos - cosine: cross-check via any d3
        # row that is a same-label candidate (if one exists in its
        # top-5, best_pos must be >= that cosine)
        same = [x["cosine"] for x in d3[qid] if labels[x["candidate_id"]] == labels[qid]]
        if same and rows[0]["margin"] is not None:
            best_pos = rows[0]["margin"] + rows[0]["cosine"]
            assert best_pos >= max(same) - 1e-12


def test_vocab_growth_totals_and_monotonicity(spark):
    from pyspark.sql import functions as F

    from risk_dashboard_database_spark.plans.dedup import (
        VG_WAVES,
        d40_vocab_growth,
    )
    from risk_dashboard_database_spark.tables import load_table

    rows = sorted(
        d40_vocab_growth(spark, SF_DIR).collect(), key=lambda r: r["checkpoint"]
    )
    assert 1 <= len(rows) <= VG_WAVES
    docs = load_table(spark, SF_DIR, "documents")
    totals = docs.select(
        F.count("*").alias("nd"),
        F.sum(F.size(F.split("text", " "))).alias("nt"),
    ).collect()[0]
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .select("w")
        .distinct()
        .count()
    )
    last = rows[-1]
    assert last["docs_cum"] == totals["nd"]
    assert last["tokens_cum"] == totals["nt"]
    assert last["vocab_cum"] == vocab
    prev = None
    for r in rows:
        assert r["new_words"] >= 0
        assert r["vocab_cum"] == (prev["vocab_cum"] if prev else 0) + r["new_words"]
        if prev:
            assert r["docs_cum"] > prev["docs_cum"] or r["new_words"] == 0
            assert r["tokens_cum"] >= prev["tokens_cum"]
        prev = r
