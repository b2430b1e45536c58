"""d39_split_gram_overlap must agree with a brute-force plain-Python
recomputation over the d29 split assignment at sf0.001, and be
consistent with d29's totals."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from risk_dashboard_database_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


def test_split_gram_overlap_matches_brute_force(spark):
    from risk_dashboard_database_spark.plans.dedup import (
        SPAN_L,
        d29_split_assign,
        d39_split_gram_overlap,
    )
    from risk_dashboard_database_spark.tables import load_table

    split_of = {
        r["doc_id"]: r["split"]
        for r in d29_split_assign(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    grams: dict[int, set] = {}
    for d in docs:
        tk = d["text"].split(" ")
        grams[d["doc_id"]] = {
            " ".join(tk[i : i + SPAN_L]) for i in range(len(tk) - SPAN_L + 1)
        }
    train_grams: set = set()
    for did, gs in grams.items():
        if split_of[did] == "train":
            train_grams |= gs
    want: dict[str, dict] = {}
    for s in ("val", "test"):
        ids = [d for d, sp in split_of.items() if sp == s]
        shared = {d: len(grams[d] & train_grams) for d in ids}
        dirty = sum(1 for v in shared.values() if v > 0)
        want[s] = {
            "n_docs": len(ids),
            "contaminated_docs": dirty,
            "shared_gram_hits": sum(shared.values()),
            "contaminated_ppm": dirty * 1_000_000 // len(ids),
        }
    got = {r["split"]: r for r in d39_split_gram_overlap(spark, SF_DIR).collect()}
    assert set(got) == {"val", "test"}
    for s, w in want.items():
        for k, v in w.items():
            assert got[s][k] == v, (s, k, got[s][k], v)


def test_cross_source_dups_matches_brute_force(spark):
    from itertools import combinations

    from risk_dashboard_database_spark.plans.dedup import (
        d9_dedup_clusters,
        d41_cross_source_dups,
    )
    from risk_dashboard_database_spark.tables import load_table

    src_of = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source")
        .collect()
    }
    by_cluster: dict[int, set] = {}
    for r in d9_dedup_clusters(spark, SF_DIR).collect():
        by_cluster.setdefault(r["cluster_id"], set()).add(src_of[r["doc_id"]])
    want: dict[tuple, int] = {}
    for srcs in by_cluster.values():
        for a, b in combinations(sorted(srcs), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    got = {
        (r["src_a"], r["src_b"]): r["shared_clusters"]
        for r in d41_cross_source_dups(spark, SF_DIR).collect()
    }
    assert got == want
