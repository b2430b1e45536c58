"""Round-8 additions: overlapping token-window chunking
(d28_chunk_overlap) and leakage-safe train/val/test split assignment
(d29_split_assign). Value exactness vs DuckDB is the oracle gate's
job (both ship full SQL oracles); these pin the semantic invariants a
hash can't explain — chunk coverage/overlap arithmetic, the
no-cluster-straddles-splits guarantee — and the no-shuffle /
broadcast-only plan shapes the 100 TB story depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from risk_dashboard_database_spark.plans.dedup import (
    CHUNK_STRIDE,
    CHUNK_W,
    SPLIT_TRAIN_LT,
    SPLIT_VAL_LT,
    d9_dedup_clusters,
    d28_chunk_overlap,
    d29_split_assign,
)

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_chunks_tile_every_document(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    by_doc = {}
    for r in d28_chunk_overlap(spark, SF_DIR).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_tokens), "every document must chunk"
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n = n_tokens[doc_id]
        # chunk_idx is dense from 0; starts advance by exactly STRIDE
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        assert all(c["chunk_start"] == c["chunk_idx"] * CHUNK_STRIDE for c in chunks)
        # last chunk starts within the doc; one more stride would not
        assert chunks[-1]["chunk_start"] < n
        assert chunks[-1]["chunk_start"] + CHUNK_STRIDE >= n
        # every chunk is clamped to what remains: min(W, n - start) —
        # interior chunks of long docs are full-width, giving the
        # W - STRIDE token overlap with their successor
        for c in chunks:
            assert c["n_chunk_tokens"] == min(CHUNK_W, n - c["chunk_start"])


def test_chunk_plan_has_no_shuffle(spark):
    plan = _executed_plan(d28_chunk_overlap(spark, SF_DIR))
    assert "Exchange" not in plan, "chunking must be scan->generate->project"
    assert "Generate" in plan


def test_split_assignment_never_straddles_a_cluster(spark):
    split_of = {
        r["doc_id"]: (r["rep_id"], r["split"])
        for r in d29_split_assign(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert len(split_of) == docs.count(), "every doc gets exactly one split"
    clusters = {}
    for r in d9_dedup_clusters(spark, SF_DIR).collect():
        clusters.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in clusters.items():
        splits = {split_of[m][1] for m in members}
        assert len(splits) == 1, f"cluster {cid} straddles splits {splits}"
        assert all(split_of[m][0] == cid for m in members)
    # singletons route by their own id
    clustered = {m for ms in clusters.values() for m in ms}
    for doc_id, (rep, _) in split_of.items():
        if doc_id not in clustered:
            assert rep == doc_id
    # all three splits exist and train dominates per the 80/10/10 rule
    from collections import Counter

    n = Counter(s for _, s in split_of.values())
    assert set(n) == {"train", "val", "test"}
    total = sum(n.values())
    assert n["train"] / total > (SPLIT_TRAIN_LT / 100) - 0.15
    assert n["val"] / total < (SPLIT_VAL_LT - SPLIT_TRAIN_LT) / 100 + 0.15


def test_split_plan_broadcasts_the_cluster_map(spark):
    plan = _executed_plan(d29_split_assign(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "SortMergeJoin" not in plan, "cluster map must broadcast, not SMJ"


def test_span_dedup_coverage_invariants(spark):
    from risk_dashboard_database_spark.plans.dedup import SPAN_L, d30_span_dedup

    rows = d30_span_dedup(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert len(rows) == docs.count(), "one row per document"
    hit = 0
    for r in rows:
        assert 0 <= r["covered_tokens"] <= r["n_tokens"]
        assert r["covered_tokens"] <= r["dup_spans"] * SPAN_L
        if r["dup_spans"] > 0:
            hit += 1
            # any duplicated span covers at least its own L tokens
            assert r["covered_tokens"] >= SPAN_L
        else:
            assert r["covered_tokens"] == 0
        if r["n_tokens"] < SPAN_L:
            assert r["dup_spans"] == 0, "short docs produce no grams"
    assert hit > 0, "corpus must contain some verbatim spans"
    # exact-duplicate documents (identical text) are 100% covered
    dup_texts = {
        r["text"]
        for r in docs.groupBy("text")
        .count()
        .where("count >= 2")
        .select("text")
        .collect()
    }
    if dup_texts:
        by_id = {r["doc_id"]: r for r in rows}
        for d in docs.where(docs.text.isin(list(dup_texts))).collect():
            r = by_id[d["doc_id"]]
            if r["n_tokens"] >= SPAN_L:
                assert r["covered_tokens"] == r["n_tokens"], (
                    f"exact dup doc {d['doc_id']} must be fully covered"
                )


def test_split_leakage_audit_proves_the_policy(spark):
    from risk_dashboard_database_spark.plans.dedup import (
        d2_minhash_pairs,
        d31_split_leakage,
    )

    rows = {r["policy"]: r for r in d31_split_leakage(spark, SF_DIR).collect()}
    assert set(rows) == {"cluster_rep", "doc_hash"}
    n_pairs = d2_minhash_pairs(spark, SF_DIR).count()
    assert rows["cluster_rep"]["n_pairs"] == n_pairs
    assert rows["doc_hash"]["n_pairs"] == n_pairs
    # the structural guarantee: rep-routed splits cannot leak a pair
    assert rows["cluster_rep"]["leaked_pairs"] == 0
    # the naive policy leaks ~2 * P(train) * P(eval) of pairs; at any
    # non-trivial pair count some leak (md5 routing is effectively
    # independent across the two endpoints)
    if n_pairs >= 10:
        assert rows["doc_hash"]["leaked_pairs"] > 0


def test_dataset_card_sums_to_d10_accounting(spark):
    from risk_dashboard_database_spark.plans.dedup import (
        d10_corpus_curation,
        d33_dataset_card,
    )

    card = d33_dataset_card(spark, SF_DIR).collect()
    assert {r["split"] for r in card} == {"train", "val", "test"}
    summed = {}
    for r in card:
        acc = summed.setdefault(r["lang"], [0] * 5)
        acc[0] += r["docs_in"]
        acc[1] += r["dropped_near_dup"]
        acc[2] += r["dropped_low_quality"]
        acc[3] += r["kept_docs"]
        acc[4] += r["kept_ws_tokens"]
    d10 = {
        r["lang"]: [
            r["docs_in"],
            r["dropped_near_dup"],
            r["dropped_low_quality"],
            r["kept_docs"],
            r["kept_ws_tokens"],
        ]
        for r in d10_corpus_curation(spark, SF_DIR).collect()
    }
    assert summed == d10, "card must re-partition d10's accounting, not re-derive it"


def test_rag_context_matches_the_chunk_table(spark):
    import hashlib

    from risk_dashboard_database_spark.plans.dedup import (
        RAG_TOPK,
        d28_chunk_overlap,
        d32_rag_context,
    )

    chunks = {}
    for r in d28_chunk_overlap(spark, SF_DIR).collect():
        chunks[(r["doc_id"], r["chunk_idx"])] = r["chunk_hash"]
    top = d32_rag_context(spark, SF_DIR).collect()
    assert 0 < len(top) <= RAG_TOPK
    assert [r["rank"] for r in top] == list(range(1, len(top) + 1))
    scores = [r["kw_hits"] for r in top]
    assert scores == sorted(scores, reverse=True)
    for r in top:
        key = (r["doc_id"], r["chunk_idx"])
        assert chunks[key] == r["chunk_hash"], "hit must be a real d28 chunk"
        prev = chunks.get((r["doc_id"], r["chunk_idx"] - 1), "")
        nxt = chunks.get((r["doc_id"], r["chunk_idx"] + 1), "")
        want = hashlib.md5(
            (prev + r["chunk_hash"] + nxt).encode()
        ).hexdigest()
        assert r["context_hash"] == want, "context must be prev||cur||next"
        assert r["kw_hits"] > 0
