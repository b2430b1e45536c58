"""Unit + property tests for URL normalization/hash parity with the
reference semantics (`src/url_utils.py:12-47`): tracking-param
stripping, www/scheme/host case, path collapse, query sorting,
fragment drop, idempotence; sha256 identity."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from risk_dashboard_database_spark.functions.urls import (
    classify_control,
    normalize_url,
    url_hash,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        normalize_url(F.col("url")).alias("n"), url_hash(F.col("url")).alias("h")
    ).collect()
    return [(r["n"], r["h"]) for r in rows]


CASES = [
    # (input, expected normalized)
    ("https://WWW.Example.COM/path", "https://example.com/path"),
    ("http://example.com//a///b", "http://example.com/a/b"),
    ("https://example.com/p?utm_source=x&b=2&a=1", "https://example.com/p?a=1&b=2"),
    ("https://example.com/p?gclid=1&fbclid=2&gaa_ts=3", "https://example.com/p"),
    ("https://example.com/p?z=1#frag", "https://example.com/p?z=1"),
    ("  https://example.com/p  ", "https://example.com/p"),
    ("", ""),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize_cases(spark, raw, expected):
    (n, h), = _norm(spark, [raw])
    assert n == expected
    if expected:
        assert h == hashlib.sha256(expected.encode()).hexdigest()
    else:
        assert h == ""


def test_normalize_idempotent(spark):
    raws = [c[0] for c in CASES if c[0].strip()]
    once = [n for n, _ in _norm(spark, raws)]
    twice = [n for n, _ in _norm(spark, once)]
    assert once == twice


def test_query_key_sort_is_pairwise(spark):
    # 'a1=y' must sort AFTER 'a=x' (key-order, not raw-string order,
    # where '1' < '=' would flip them)
    (n, _), = _norm(spark, ["https://e.com/p?a1=y&a=x"])
    assert n == "https://e.com/p?a=x&a1=y"


@pytest.mark.parametrize(
    "company,url,etype,expected",
    [
        ("Acme", "https://www.facebook.com/AcmePage", "company", True),
        ("Acme", "https://facebook.com/acme/posts/1", "company", False),
        ("Acme", "https://en.wikipedia.org/wiki/Acme", "ceo", False),
        ("Acme", "https://x.com/acme", "company", True),
        ("Acme", "https://x.com/acme/status/5", "company", False),
        ("Acme", "https://acme.com/x", "company", True),
        ("Acme", "https://sub.acme.com/x", "company", True),
        ("Acme", "https://other.com/x", "company", False),
        ("Acme", "https://youtube.com/@acme", "company", True),
        ("Acme", "https://youtube.com/@acme", "ceo", False),
        ("Acme", "https://linkedin.com/company/acme/", "company", True),
        ("A&B Co", "https://x.com/abco", "company", True),  # token-normalized handle
    ],
)
def test_classify_control(spark, company, url, etype, expected):
    df = spark.createDataFrame([(company, url, etype)], "c string, u string, t string")
    got = df.select(
        classify_control(F.col("c"), F.col("u"), F.col("t")).alias("x")
    ).collect()[0]["x"]
    assert got is expected
