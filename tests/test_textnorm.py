"""Unit tests for lookup-text normalization (`app.py:964-995` parity):
casefold, &->and, punctuation strip, company-suffix strip, token
singularizer edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from risk_dashboard_database_spark.functions.textnorm import (
    normalize_lookup_text,
    singularize_lookup_text,
    singularize_token,
)


def _one(spark, col, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col(F.col("v")).alias("x")).collect()[0]["x"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("  Johnson & Johnson  ", "johnson and johnson"),
        ("AT&T Inc.", "at and t inc"),
        ("Big-Data Co;Ltd", "big data co ltd"),
        ("", ""),
    ],
)
def test_normalize_lookup_text(spark, raw, expected):
    assert _one(spark, normalize_lookup_text, raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Acme Holdings LLC", "acme"),          # two stacked suffixes
        ("Acme Group", "acme"),
        ("Evergreen Limited", "evergreen"),
        ("Plain Name", "plain name"),
    ],
)
def test_suffix_strip(spark, raw, expected):
    col = lambda c: normalize_lookup_text(c, strip_company_suffixes=True)  # noqa: E731
    assert _one(spark, col, raw) == expected


@pytest.mark.parametrize(
    "token,expected",
    [
        ("companies", "company"),   # ies -> y
        ("glasses", "glass"),       # ses: drop trailing 'es' (reference heuristic)
        ("widgets", "widget"),      # trailing s
        ("boss", "boss"),           # ss kept
        ("campus", "campus"),       # us kept
        ("basis", "basis"),         # is kept
        ("gas", "gas"),             # len <= 3 kept
    ],
)
def test_singularize_token(spark, token, expected):
    assert _one(spark, singularize_token, token) == expected


def test_singularize_lookup_text(spark):
    assert (
        _one(spark, singularize_lookup_text, "Auto Parts & Services")
        == "auto part and service"
    )
