"""Text/name normalization scalar functions (SURVEY §2.8 String).

Ports of `dashboard_app/app.py:964-987` as pure column expressions:

- `normalize_lookup_text`: casefold, `&` -> ' and ', strip
  non-alphanumerics to spaces, collapse whitespace, optionally strip
  trailing company-suffix tokens.
- `singularize_lookup_token`: the reference's heuristic
  (ies->y, ses->se, trailing s unless ss/us/is).

Everything stays JVM-side (regexp + higher-order array functions);
fuzzy scoring (which genuinely needs SequenceMatcher) lives in
plans/toporder.o7 as a pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# app.py COMPANY_SUFFIX_TOKENS analog (src/risk_rules.py:55-60 NAME_IGNORE_TOKENS
# overlap); trailing tokens stripped iteratively by the reference — we
# strip up to three trailing suffix tokens, which covers every real name.
COMPANY_SUFFIX_TOKENS = [
    "inc", "incorporated", "corporation", "corp", "company", "co",
    "llc", "ltd", "limited", "plc", "group", "holdings", "holding",
]

_SUFFIX_ALT = "|".join(COMPANY_SUFFIX_TOKENS)


def normalize_lookup_text(text: Column, strip_company_suffixes: bool = False) -> Column:
    """`app.py:968-979` — lowercase token-normalized lookup key."""
    value = F.lower(F.trim(F.coalesce(text, F.lit(""))))
    value = F.regexp_replace(value, "&", " and ")
    value = F.regexp_replace(value, r"[^a-z0-9]+", " ")
    value = F.trim(F.regexp_replace(value, r" +", " "))
    if strip_company_suffixes:
        # reference pops trailing suffix tokens in a loop; three passes
        # of an anchored regex reach the same fixed point for <=3
        # stacked suffixes ("X holdings group llc").
        for _ in range(3):
            value = F.trim(F.regexp_replace(value, rf"\s(?:{_SUFFIX_ALT})$", ""))
    return value


def singularize_token(token: Column) -> Column:
    """`app.py:977-987` token singularizer."""
    n = F.length(token)
    return (
        F.when((n > 3) & token.endswith("ies"), F.concat(F.substring(token, 1, n - 3), F.lit("y")))
        .when((n > 3) & token.endswith("ses"), F.substring(token, 1, n - 2))
        .when(
            (n > 3)
            & token.endswith("s")
            & ~token.endswith("ss")
            & ~token.endswith("us")
            & ~token.endswith("is"),
            F.substring(token, 1, n - 1),
        )
        .otherwise(token)
    )


def singularize_lookup_text(text: Column) -> Column:
    """Per-token singularization of a normalized lookup key
    (`app.py:993-995`)."""
    tokens = F.split(normalize_lookup_text(text), " ")
    return F.array_join(F.transform(tokens, singularize_token), " ")
