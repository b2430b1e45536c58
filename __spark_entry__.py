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
# oldest (or absent) first, so a bounded per-round sample always covers
# the least-recently-validated operators. Tier 1 = no green driver row
# in any round yet; tier 2/3 = last green in r01/r02; the remainder
# (green in r03) follows in registry order.
_SAMPLE_FIRST = [
    # tier 1 — never driver-green
    "f3_hf_batch",
    "f4_sentiment",
    "d12_token_stream_pack",
    "d13_stratified_sample",
    "d14_ann_ivf_nprobe2",
    "w1_weekly_rollup",
    "o1_pagination", "o2_topk_compound", "o3_nulls_last",
    "o6_risk_leaderboard", "o7_fuzzy_topk",
    "p5_ilike_match", "s2_pipe_series_explode", "s_json_array_math",
    "u1_entity_branches", "u2_key_union_dedup", "u3_evidence_union",
    "e10_processed_articles", "e11_industry_durations",
    "e12_narrative_tags", "e13_feature_series", "m3_frame_resize",
    # tier 2 — last green r01
    "w2_anomaly_baselines", "w5_latest_per_key", "w8_activity_episodes",
    "w7_error_streak", "w10_lag_delta",
    # tier 3 — last green r02
    "j1_star_join", "j5_branch_union", "j6_conditional_join",
    "j9_asof_freshness", "j10_scope_semi", "j11_unmatched_anti",
    "m1_binary_meta", "m2_decode_features",
    "a1_pricing_summary", "a1b_rounding_parity", "a1_daily_event_counts",
    "s_url_normalize", "s_control_classify", "s_risk_regex",
    "s_name_normalize", "s_date_bounds",
    # tier 4 — r03-green queries whose perf posture changed this round
    "d8_ann_ivf", "e6_sector_baseline", "e3_storylines",
    "d1_exact_dedup", "d2_minhash_pairs", "d9_dedup_clusters",
    "p2_override_daily", "j4_entity_daily_metrics",
    "t2_crisis_chain", "u4_anomaly_rules",
    "e7_narrative_timeline", "e8_crisis_patterns",
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
