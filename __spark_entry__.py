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
# round. Round 14 (VERDICT r13 #2): after r13 the cross-round ledger is
# r13-green for 50 rows, r12 for 49, r11 for 45, r10 for 44 (o7
# rows-only by contract). The r14 sample:
# tier 1 = the 4 rows the r13 cap deferred — never driver-sampled
#   (d73/w17/m8/d74, named as the r14 queue head in the r13 rotation
#   comment AND as VERDICT r13 task #2). d73's oracle and d74's shared
#   length-bucket CASE were additionally FIXED this round (ADVICE r13:
#   `//` division, FLOOR before the BIGINT cast), re-verified exact at
#   both SFs + vanilla with planted-corpus engine-parity fixtures in
#   tests/test_r14_ops.py;
# tier 2 = rows whose PLAN or ORACLE changed this round, so their
#   prior greens no longer witness the current code: the narrative
#   family (t1/e3/e4/e7/e8/e11/e12/e14 — the full 30-family regex
#   surface port moved phrase 0 into the suppressed/unmatched pool,
#   both sides updated), s_control_classify (classify_control gained
#   the full slug/handle tail), d72_bloom_decontam (per-(doc, gram)
#   DISTINCT closes the repeated-gram false negative, ADVICE r13
#   high #1), and d70_length_bucket_batches (the FLOOR fix);
# tier 3 = r14 additions, never driver-sampled: the pair-capped
#   SemDeDup leg d44b (VERDICT r13 #3), the stock/trends endpoint
#   assemblies e16/e17, the roster/boards dim selects e18/e19, and
#   s6_control_slug_publisher (driver-checked truth table over the
#   slug/handle/publisher/domain classify_control legs ported this
#   round), and w18_anomaly_days (integer-exact two-sigma spike days
#   over the daily series — cross-multiplied BIGINT test, no float
#   ever reaches the hash) — each oracle-exact at sf0.01 AND sf0.001
#   on arrival,
#   vanilla-checked; d44b with python brute-force parity;
# tier 4 = the r10-stale cohort in name order (39 rows after its 5
#   narrative members moved into tier 2).
# 4 + 11 + 7 + 39 = 61: eleven rows over the 50-cap, so the cap cuts
# the LAST eleven tier-4 rows (e2_crisis_durations, e5_evidence,
# e9_negative_summary,
# j4_entity_daily_metrics, t3_first_wins_dedup, t_fingerprint,
# t_lang_id, t_simpson, u4_anomaly_rules, w6_anchored_windows,
# w9_duration_asof — all r10-green and untouched this round) — they
# lead the r15 queue.
_SAMPLE_FIRST = [
    # tier 1 — r13-deferred queue head, never driver-sampled
    "d73_hot_key_audit", "w17_trailing_distinct",
    "m8_payload_byte_stats", "d74_source_drift",
    # tier 2 — plan/oracle changed in r14 (prior greens stale)
    "t1_narrative_rollup", "e3_storylines", "e4_crisis_impact",
    "e7_narrative_timeline", "e8_crisis_patterns",
    "e11_industry_durations", "e12_narrative_tags",
    "e14_narrative_overlay", "s_control_classify",
    "d72_bloom_decontam", "d70_length_bucket_batches",
    # tier 3 — r14 additions, never driver-sampled
    "d44b_semantic_prune_capped", "e16_stock_series",
    "e17_trends_series", "e18_roster", "e19_boards",
    "s6_control_slug_publisher", "w18_anomaly_days",
    # tier 4 — the r10 cohort in name order (last ten cut by the cap;
    # freshest r11/r12/r13 greens follow implicitly via the
    # registry-order fallback in queries())
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
    "e15_processed_serps", "e1_trend_summary", "e2_crisis_durations",
    "e5_evidence", "e9_negative_summary", "j4_entity_daily_metrics",
    "t3_first_wins_dedup", "t_fingerprint",
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
