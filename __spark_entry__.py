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
# round. Round 6: tier 1 = the two queries displaced in round 5 (o7 at
# r04/rows-only, a13 at r03) followed by the 45 queries whose latest
# green row is CORRECTNESS_r04; tier 2 = u3 (plan changed this round:
# evidence now served from stored MVs) plus the round's two new
# operator queries (t_repetition, t_ngram_docfreq — green-on-arrival).
# That fills the 50-slot window exactly; the r05-green remainder
# (including a1/j4, whose re-layout A/B changed no plan) follows in
# registry order and is at most one round old.
_SAMPLE_FIRST = [
    # tier 1 — displaced last round; rotate back first (VERDICT r5 #1).
    # o7's driver check is rows-only by contract; its value evidence is
    # the golden-fixture pytest suite (tests/test_fuzzy_golden.py).
    "o7_fuzzy_topk", "a13_distinct_dates",
    # tier 1 — latest driver green is r04 (45 names, registry order)
    "d1_exact_dedup", "d2_minhash_pairs", "d9_dedup_clusters",
    "f4_sentiment", "f3_hf_batch",
    "d12_token_stream_pack", "d13_stratified_sample",
    "e3_storylines", "p2_override_daily", "e6_sector_baseline",
    "e10_processed_articles", "e11_industry_durations",
    "e12_narrative_tags", "e13_feature_series",
    "j1_star_join", "j5_branch_union", "j6_conditional_join",
    "j9_asof_freshness", "j10_scope_semi", "j11_unmatched_anti",
    "m1_binary_meta", "m2_decode_features", "m3_frame_resize",
    "a1b_rounding_parity", "a1_daily_event_counts",
    "s_url_normalize", "s_control_classify", "s_risk_regex",
    "s_name_normalize", "s_date_bounds", "s_json_array_math",
    "p5_ilike_match", "s2_pipe_series_explode",
    "o1_pagination", "o2_topk_compound", "o3_nulls_last",
    "o6_risk_leaderboard",
    "u1_entity_branches", "u2_key_union_dedup",
    "w1_weekly_rollup", "w2_anomaly_baselines", "w5_latest_per_key",
    "w8_activity_episodes", "w7_error_streak", "w10_lag_delta",
    # tier 2 — changed or new in round 6: u3 now serves evidence from
    # stored MVs; t_repetition / t_ngram_docfreq are the round's new
    # corpus-curation queries (green-on-arrival evidence). a1/j4 (the
    # perf-investigated pair) stay r05-green — one round old, inside
    # the rotation contract. d17_pretrain_build (also new) waits for
    # the r7 window: it COMPOSES operators that all have fresh driver
    # rows (d9, d15, t_quality, d12), so its local-gate evidence
    # (exact at sf0.001/sf0.01, tools/check.py) carries it one round.
    "u3_evidence_union", "t_repetition", "t_ngram_docfreq",
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
