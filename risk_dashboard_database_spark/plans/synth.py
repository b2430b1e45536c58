"""Deterministic synthetic text/URL derivations shared by the scalar,
narrative, and classification queries.

The driver's star schema has no article titles or URLs, so queries
that exercise the reference's text/URL operators derive them
deterministically from `events` (k = props->k). The Spark side builds
the string and runs the REAL operator (regex / parse_url pipeline);
each oracle derives the EXPECTED outcome directly from k via CASE
tables — so the two sides never share the operator implementation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Phrase wheel: k%11 — exercises the finance/material-risk regex
# families (`src/risk_rules.py:27-52`) and the narrative tag matchers
# (`dashboard_app/narrative_runtime.py:35-219`).
PHRASES = [
    "massive layoffs announced",            # 0 Workforce Reductions / material
    "data breach exposes users",            # 1 Data Breaches / material
    "lawsuit filed against company",        # 2 Legal & Regulatory / material
    "ceo resigns abruptly",                 # 3 CEO Departures
    "fraud allegations surface",            # 4 Fraud / material
    "factory accident injures workers",     # 5 Accidents & Disasters
    "strike by union workers",              # 6 Labor Disputes
    "activist investor builds stake",       # 7 Activist Investor Interest
    "quarterly earnings beat forecast",     # 8 finance-routine
    "dividend increase and buyback plan",   # 9 finance-routine
    "new product launch event",             # 10 unmatched
]

# tag per phrase index (None = no narrative tag resolves). Phrase 0
# matches the workforce family but the LOW-PRIORITY workforce
# suppressor fires (a layoff headline with no crisis/legal term is
# routine business news — `narrative_runtime.py:281-287`), so under
# the full r14 regex surface it resolves to None and lands in the
# unmatched pool.
PHRASE_TAGS = [
    None,
    "Data Breaches",
    "Legal & Regulatory",
    "CEO Departures (firings, resignations)",
    "Fraud",
    "Accidents & Disasters",
    "Labor Disputes",
    "Activist Investor Interest",
    None,
    None,
    None,
]

# material-risk / finance flags per phrase index (hand-derived truth
# table for the oracles). NOTE: the full finance-routine condition is
# PHRASE_FINANCE[k%11] OR k%9==0 (ticker suffix triggers TICKER_RE,
# risk_rules.py:353) OR k%13==0 (finance source host).
PHRASE_MATERIAL = [True, True, True, False, True, False, False, False, False, False, False]
PHRASE_FINANCE = [False, False, False, False, False, False, False, False, True, True, False]


def k_col() -> Column:
    return F.get_json_object("props", "$.k").cast("int")


K_SQL = "CAST(props->>'$.k' AS INTEGER)"


def title_col(k: Column) -> Column:
    """title = phrase wheel + a ticker suffix every 9th k."""
    phrase = F.element_at(F.array(*[F.lit(p) for p in PHRASES]), (k % 11) + 1)
    return F.when(k % 9 == 0, F.concat(phrase, F.lit(" NYSE: ABC"))).otherwise(phrase)


def title_sql(k: str = K_SQL) -> str:
    cases = " ".join(f"WHEN {i} THEN '{p}'" for i, p in enumerate(PHRASES))
    return (
        f"(CASE ({k}) % 11 {cases} END)"
        f" || CASE WHEN ({k}) % 9 = 0 THEN ' NYSE: ABC' ELSE '' END"
    )


def source_host_col(k: Column) -> Column:
    """source host: every 13th k is a finance source."""
    return F.when(k % 13 == 0, F.lit("finance.yahoo.com")).otherwise(
        F.concat(F.lit("news"), (k % 20).cast("string"), F.lit(".example.com"))
    )


def source_host_sql(k: str = K_SQL) -> str:
    return (
        f"CASE WHEN ({k}) % 13 = 0 THEN 'finance.yahoo.com' "
        f"ELSE 'news' || CAST(({k}) % 20 AS VARCHAR) || '.example.com' END"
    )


def url_col(k: Column, event_type: Column) -> Column:
    """Messy URL: uppercase www host, doubled path slash, tracking
    params (utm_source + sometimes gclid), unsorted query, fragment."""
    return F.concat(
        F.lit("https://WWW.Src"),
        (k % 20).cast("string"),
        F.lit(".com//news/"),
        event_type,
        F.lit("?utm_source=feed&z=9&a="),
        (k % 7).cast("string"),
        F.when(k % 3 == 0, F.lit("&gclid=x")).otherwise(F.lit("")),
        F.lit("#frag"),
    )


def normalized_url_sql(k: str = K_SQL, etype: str = "event_type") -> str:
    """The EXPECTED normalization result, built directly (no URL
    parsing): scheme+host lowered, www stripped, // collapsed,
    tracking params dropped, query sorted (a before z), no fragment."""
    return (
        f"'https://src' || CAST(({k}) % 20 AS VARCHAR) || '.com/news/' || {etype}"
        f" || '?a=' || CAST(({k}) % 7 AS VARCHAR) || '&z=9'"
    )
