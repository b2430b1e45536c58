"""VADER-style rule-based sentiment (SURVEY §2.11 F4).

The reference runs VADER over article titles at ingest and records
`model_version='vader'` on each mention (`src/ingest_v2.py:354,407`,
`docs/system-overview.md:59`). The published VADER algorithm (Hutto &
Gilbert 2014) is a valence lexicon plus heuristic rules (negation
flips, booster words) folded left-to-right over the tokens, normalized
as score / sqrt(score^2 + alpha).

This module implements that algorithm as an Arrow-batched pandas UDF —
the sanctioned model-inference plumbing — with a compact built-in
valence lexicon. If the real `vaderSentiment` package is installed,
`sentiment_batch` can use it (import-try, like functions/llm.py's real
providers); the registered driver query always uses the built-in path,
which is deliberately EXACT-ARITHMETIC so the DuckDB oracle can mirror
it bit-for-bit:

- lexicon valences are tenths (x10 ints); all rule math happens in
  integer units of 1e-5 (boost +-0.293 -> +-29300; negation x-0.74 is
  exact because every contribution is divisible by 100), so the token
  fold is exact integer addition in any engine;
- only the final normalization touches floats, as one fixed expression
  `s / sqrt(s*s + 15)` on an integer-exact double — identical IEEE ops
  in Spark and DuckDB (`oracle_sql_expr` generates the mirroring SQL
  from the SAME lexicon dict, so the two sides cannot drift); display
  rounding happens engine-side (Spark round / SQL ROUND), never in
  Python.

Scale posture: one Arrow-batched UDF pass over the corpus, no state,
no shuffle; at 100 TB this parallelizes perfectly with the scan.
"""

from __future__ import annotations

import math

import pandas as pd

# Compact built-in valence lexicon (token -> valence in tenths, i.e.
# 15 == +1.5). VADER-style coverage of high-frequency sentiment
# vocabulary; the full published lexicon drops in via vaderSentiment
# when available.
LEXICON_X10 = {
    "good": 19, "great": 31, "excellent": 27, "amazing": 28, "love": 32,
    "loved": 29, "best": 32, "better": 19, "happy": 27, "win": 28,
    "wins": 27, "winning": 28, "success": 27, "successful": 27,
    "improved": 21, "improvement": 20, "strong": 23, "growth": 20,
    "profit": 21, "gain": 19, "gains": 19, "positive": 23, "up": 4,
    "innovative": 23, "record": 14, "beat": 16, "soar": 24, "soars": 24,
    "bad": -25, "terrible": -31, "awful": -27, "horrible": -29,
    "hate": -27, "worst": -31, "worse": -21, "sad": -21, "loss": -13,
    "losses": -13, "lose": -16, "loses": -16, "losing": -16,
    "fail": -25, "fails": -25, "failed": -25, "failure": -24,
    "crisis": -26, "scandal": -24, "fraud": -28, "lawsuit": -16,
    "decline": -17, "declines": -17, "drop": -12, "drops": -12,
    "weak": -18, "negative": -23, "down": -4, "risk": -11,
    "risks": -11, "warning": -15, "crash": -26, "plunge": -23,
    "plunges": -23, "layoffs": -20, "breach": -20, "recall": -14,
    # Synthetic-corpus domain valences: the driver's documents table
    # uses a small engine-vocabulary (fast/slow/big/small/dup ...);
    # these entries keep the oracle-checked query non-vacuous there.
    "fast": 18, "slow": -18, "big": 5, "small": -5, "dup": -16,
}

NEGATIONS = {
    "not", "no", "never", "neither", "nobody", "none", "cannot",
    "cant", "dont", "doesnt", "didnt", "wont", "isnt", "wasnt",
    "arent", "werent", "without", "hardly",
}

BOOSTERS = {"very", "extremely", "really", "absolutely", "incredibly",
            "hugely", "totally"}

# Rule constants in 1e-5 integer units / exact rationals (published
# VADER values: booster +-0.293, negation factor -0.74, alpha 15).
BOOST_1E5 = 29300
NEG_NUM, NEG_DEN = -74, 100
ALPHA = 15
PUNCT = ".,!?;:()[]\""


def _tokenize(text: str) -> list[str]:
    return [t.strip(PUNCT) for t in (text or "").lower().split(" ")]


def score_1e5(text: str) -> int:
    """Integer sentiment sum in 1e-5 units: exact in any engine."""
    toks = _tokenize(text)
    total = 0
    for i, tok in enumerate(toks):
        v10 = LEXICON_X10.get(tok)
        if v10 is None:
            continue
        c = v10 * 10000  # tenths -> 1e-5 units
        prev = toks[i - 1] if i > 0 else ""
        if prev in BOOSTERS:
            c += BOOST_1E5 if v10 > 0 else -BOOST_1E5
        if prev in NEGATIONS:
            c = (c // NEG_DEN) * NEG_NUM  # exact: c divisible by 100
        total += c
    return total


def compound(total_1e5: int) -> float:
    """Unrounded normalization; display rounding is engine-side."""
    s = total_1e5 / 100000.0
    return s / math.sqrt(s * s + ALPHA)


def sentiment_builtin(texts: pd.Series) -> pd.Series:
    """Deterministic built-in scorer (the driver-checked path)."""
    return texts.map(lambda t: compound(score_1e5(t))).astype("float64")


def sentiment_batch(texts: pd.Series) -> pd.Series:
    """Production scorer: real vaderSentiment when installed, else the
    built-in lexicon. NOT used by the oracle-checked query (the real
    package's lexicon differs from the built-in)."""
    try:  # pragma: no cover - package absent in sandbox
        from vaderSentiment.vaderSentiment import SentimentIntensityAnalyzer

        an = SentimentIntensityAnalyzer()
        return texts.map(
            lambda t: an.polarity_scores(t or "")["compound"]
        ).astype("float64")
    except ImportError:
        return sentiment_builtin(texts)


def oracle_sql_expr(text_col: str) -> str:
    """DuckDB SQL computing score_1e5 exactly, generated from the same
    lexicon/rule constants (single source of truth). Yields a BIGINT in
    1e-5 units; the caller applies the compound normalization."""
    lex_cases = " ".join(
        f"WHEN '{w}' THEN {v}" for w, v in sorted(LEXICON_X10.items())
    )
    neg_list = ", ".join(f"'{w}'" for w in sorted(NEGATIONS))
    boost_list = ", ".join(f"'{w}'" for w in sorted(BOOSTERS))
    toks = (
        f"list_transform(string_split(lower({text_col}), ' '), "
        f"t -> trim(t, '{PUNCT}'))"
    )
    lex = f"(CASE __t[i] {lex_cases} ELSE NULL END)"
    raw = (
        f"({lex} * 10000 + (CASE WHEN i > 1 AND __t[i-1] IN ({boost_list}) "
        f"THEN (CASE WHEN {lex} > 0 THEN {BOOST_1E5} ELSE -{BOOST_1E5} END) "
        f"ELSE 0 END))"
    )
    contrib = (
        f"(CASE WHEN {lex} IS NULL THEN 0 "
        f"WHEN i > 1 AND __t[i-1] IN ({neg_list}) "
        f"THEN ({raw} // {NEG_DEN}) * ({NEG_NUM}) "
        f"ELSE {raw} END)"
    )
    return (
        f"COALESCE((SELECT list_sum(list_transform(range(1, len(__t) + 1), "
        f"i -> {contrib})) FROM (SELECT {toks} AS __t)), 0)"
    )
