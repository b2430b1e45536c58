"""Heuristic NL query planner (SURVEY §2.11 F7).

The reference routes natural-language questions to tool plans with
regex heuristics (`insights agent/query_planner.py:179-416`); every
tool bottoms out in a named analytical query. Here the tools ARE the
registry queries, so a plan is {plan_type, assumption, tool_calls:
[{name: <registry query>, arguments}]} — executable by calling
`plans.QUERIES[name](spark, sf_dir)` and applying the window
arguments as date filters.
"""

from __future__ import annotations

import re
from datetime import date

from .period import resolve_time_window

# Full 15-tool contract (`insights agent/ai-insights-tool-contract.json`)
# -> the engine query that serves each tool. resolve_* are driver-side
# lookups (fuzzy resolution = the o7 machinery); everything else is a
# registry query, exactly as the reference's tools are HTTP wrappers
# over its endpoint queries (`ai_insights_api.py:357-561`).
TOOL_CONTRACT: dict[str, str] = {
    "resolve_entity": "o7_fuzzy_topk",
    "resolve_sector": "s_name_normalize",
    "get_trend_summary": "e1_trend_summary",
    "screen_entities": "a6_screen",
    "get_sector_baseline": "e6_sector_baseline",
    "aggregate_crisis_patterns": "e8_crisis_patterns",
    "aggregate_industry_durations": "e11_industry_durations",
    "find_storylines": "e3_storylines",
    "get_narrative_timeline": "e7_narrative_timeline",
    "get_narrative_tags": "a11_majority_vote",
    "get_search_feature_series": "p2_override_daily",
    "get_search_feature_items": "a3_feature_index",
    "compare_entities": "j4_entity_daily_metrics",
    "get_anomalies": "u4_anomaly_rules",
    "get_evidence": "e5_evidence",
}

_COMPARE_RE = re.compile(
    r"\bcompare\s+(.+?)\s+(?:vs\.?|versus|against|and)\s+(.+?)(?:\s+over|\s+in|\s+for|[.?!]|$)",
    re.IGNORECASE,
)
_TOPK_RE = re.compile(r"\btop\s+(\d{1,2})\b", re.IGNORECASE)

# route table: (predicate over lowered text) -> (plan_type, query name)
_ROUTES = [
    (lambda t: "anomal" in t or "spike" in t or "unusual" in t,
     ("anomaly_scan", "u4_anomaly_rules")),
    (lambda t: "crisis" in t and ("active" in t or "ongoing" in t or "chain" in t),
     ("crisis_state", "t2_crisis_chain")),
    (lambda t: "screen" in t or "top performers" in t or "leaderboard" in t,
     ("entity_screen", "a6_screen")),
    (lambda t: "sector" in t and ("median" in t or "baseline" in t or "stats" in t),
     ("sector_baseline", "e6_sector_baseline")),
    (lambda t: "duplicate" in t or "dedup" in t or "near-dup" in t,
     ("dedup_scan", "d2_minhash_pairs")),
    (lambda t: "similar" in t or "nearest" in t or "neighbors" in t,
     ("similarity_search", "d3_ann_topk")),
    (lambda t: "risk" in t and ("score" in t or "ranking" in t or "riskiest" in t),
     ("risk_leaderboard", "o6_risk_leaderboard")),
    (lambda t: "streak" in t, ("streak_lookup", "w7_error_streak")),
    (lambda t: "trend" in t or "summary" in t or "rollup" in t,
     ("trend_summary", "e1_trend_summary")),
]


def plan_query(user_message: str, today: date | None = None) -> dict | None:
    """NL -> executable plan; None when the question doesn't route
    (reference behavior: the caller falls through to the LLM planner)."""
    text = (user_message or "").strip()
    if not text:
        return None
    lowered = text.casefold()
    window = resolve_time_window(text, today=today, default_days=90)

    m = _COMPARE_RE.search(text)
    if m:
        a, b = m.group(1).strip(), m.group(2).strip()
        return {
            "plan_type": "entity_comparison",
            "assumption": f"Compare {a} and {b} over {window['display_label']}.",
            "tool_calls": [
                {
                    "name": "j4_entity_daily_metrics",
                    "arguments": {"entities": [a, b], "window": window},
                }
            ],
        }

    for pred, (plan_type, query_name) in _ROUTES:
        if pred(lowered):
            args: dict = {"window": window}
            k = _TOPK_RE.search(lowered)
            if k:
                args["limit"] = min(int(k.group(1)), 50)
            return {
                "plan_type": plan_type,
                "assumption": f"Interpret as {plan_type.replace('_', ' ')} over "
                f"{window['display_label']}.",
                "tool_calls": [{"name": query_name, "arguments": args}],
            }
    return None


def execute_plan(plan: dict, spark, sf_dir: str) -> list:
    """Execute a plan's tool calls against the registry
    (`insights agent/ai_insights_api.py:357-561` executes its plans as
    HTTP calls over the same named-query surface). Window arguments
    become date-range filters when the result exposes a date column;
    `limit` caps the result."""
    from pyspark.sql import functions as F

    from ..plans import QUERIES

    results = []
    for call in plan["tool_calls"]:
        df = QUERIES[call["name"]](spark, sf_dir)
        args = call.get("arguments", {})
        window = args.get("window") or {}
        if window.get("mode") == "calendar" and "date" in df.columns:
            df = df.where(
                F.col("date").between(window["start_date"], window["end_date"])
            )
        if "limit" in args:
            df = df.limit(args["limit"])
        results.append(df)
    return results
