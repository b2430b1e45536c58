"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``risk_dashboard_database_spark``
package; this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from risk_dashboard_database_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.QUERIES["a1_pricing_summary"](spark, "/root/testdata/sf0.001")


# Sampling order for correctness runs: queries whose driver evidence is
# oldest first, so a bounded per-round sample keeps every registry row's
# latest green driver evidence at most two rounds old. Rotated each
# round. Round 13 (VERDICT r12 #2): after r12 the cross-round ledger is
# r12-green for 50 rows, r11 for 46, r10 for 44, r09 for 43 — the 43
# r09 rows ARE the queue, and all fit under the 50-cap:
# tier 1 = the 4 rows the r12 cap deferred (d21/d22/d26/d27 — named as
#   the r13 queue head in the r12 rotation comment and the verdict);
# tier 2 = the remaining 39 r09-green rows in the standing queue order
#   (the d28–d56 cohort, m1–m5, the t_* text-stats family, d44/d47);
# tier 3 = rows whose PLAN changed this round, so their r12 green no
#   longer witnesses the current code: j12_purchase_attribution (the
#   skew guard became memoized-on-feed-signature, VERDICT r12 #1) and
#   o9_diversified_topk (the hard customer broadcast hint dropped,
#   ADVICE r12 — AQE now picks the strategy);
# tier 4 = r13 additions, never driver-sampled (never-sampled rows
#   outrank stale-green ones, the standing precedent; each was
#   oracle-exact at sf0.01 AND sf0.001 on arrival, vanilla-checked,
#   with python brute-force parity tests).
# 43 + 2 + 9 = 54: four rows over the 50-cap, so the cap cuts the
# LAST four tier-4 rows (d73_hot_key_audit, w17_trailing_distinct,
# m8_payload_byte_stats, d74_source_drift) — of every row in the
# sample they carry the freshest compensating evidence (landed this
# round, oracle-exact at both SFs + vanilla + python parity on
# arrival). They lead the r14 queue ahead of the r10 cohort.
_SAMPLE_FIRST = [
    # tier 1 — r12-deferred queue head (latest driver green r09)
    "d21_token_budget_mix", "d22_epoch_shuffle", "d26_kmv_distinct",
    "d27_incremental_neardup",
    # tier 2 — the rest of the r09 cohort, standing queue order
    "d28_chunk_overlap", "d29_split_assign", "d30_span_dedup",
    "d31_split_leakage", "d32_rag_context", "d33_dataset_card",
    "d34_bpe_merges", "d35_oov_rate", "d36_hard_negatives",
    "d37_minhash_calibration", "d38_quantile_sketch", "d3_ann_topk",
    "d40_vocab_growth", "d41_cross_source_dups",
    "d42_embed_recall", "d43_lm_quality_buckets",
    "d45_dup_weighted_sample", "d46_sentence_dedup",
    "d48_retention_curve", "d50_dup_centrality",
    "d51_curation_funnel", "d52_cluster_size_hist", "d54_anneal_mix",
    "d55_packing_efficiency", "d56_quality_dup_cross",
    "m1_binary_meta", "m2_decode_features", "m3_frame_resize",
    "m4_payload_dedup", "m5_frame_dedup",
    "t_code_detect", "t_html_strip", "t_keyword_topk",
    "t_readability", "t_tfidf", "t_ttr", "t_zipf_profile",
    "d44_semantic_prune", "d47_semantic_decontam",
    # tier 3 — plan changed in r13 (r12 green no longer witnesses it)
    "j12_purchase_attribution", "o9_diversified_topk",
    # tier 4 — r13 additions, never driver-sampled: tokenizer
    # fertility by language, length-bucketed inference batches with
    # padding-waste ppm, the SimHash-bucket diversity sampler, the
    # Bloom decontamination card (gate #31's batch twin), the Spark-4
    # VARIANT extraction card, the hot-key skew audit, trailing
    # 7-day distinct users, the decode-free payload byte screen, and
    # the per-source distribution-drift monitor
    # (each oracle-exact at sf0.01 AND sf0.001 on arrival,
    # vanilla-checked, with python brute-force parity in
    # tests/test_r13_ops.py)
    "t_fertility", "d70_length_bucket_batches",
    "d71_eval_diversity_sample", "d72_bloom_decontam",
    "s5_props_variant", "d73_hot_key_audit",
    "w17_trailing_distinct", "m8_payload_byte_stats",
    "d74_source_drift",
    # beyond the 50-cap: the r10 cohort in name order leads the r14
    # queue (44 rows; freshest r11/r12 greens follow implicitly via
    # the registry-order fallback in queries())
    "a10_tag_counts_map", "a11_majority_vote", "a12_bucket_counts",
    "a12b_storylines", "a14_latest_lookup",
    "a15_sector_company_count", "a16_confusion_matrix",
    "a2_control_counts", "a3_feature_index", "a5_top_headlines",
    "a6_screen", "a7_sector_stats", "a8_index_union",
    "a9_evidence_summary", "d10_corpus_curation", "d11_hash_sample",
    "d15_decontaminate", "d16_rerank", "d17_pretrain_build",
    "d4_ngram_jaccard", "d57_span_strip",
    "d58_source_quota_rebalance", "d59_cluster_drift",
    "d5_ann_lsh_bucket", "d6_simhash", "d7_embedding_dedup",
    "e14_narrative_overlay", "e15_processed_serps",
    "e1_trend_summary", "e2_crisis_durations", "e4_crisis_impact",
    "e5_evidence", "e7_narrative_timeline", "e8_crisis_patterns",
    "e9_negative_summary", "j4_entity_daily_metrics",
    "t1_narrative_rollup", "t3_first_wins_dedup", "t_fingerprint",
    "t_lang_id", "t_simpson", "u4_anomaly_rules",
    "w6_anchored_windows", "w9_duration_asof",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    least-recently-validated first (see _SAMPLE_FIRST)."""
    ordered = {n: plans.QUERIES[n] for n in _SAMPLE_FIRST if n in plans.QUERIES}
    for n, fn in plans.QUERIES.items():
        ordered.setdefault(n, fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return dict(plans.ORACLES)
