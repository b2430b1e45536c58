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


# ---- r14: the full risk_rules.py:141-265 slug/handle tail ----------

def _ctl(spark, company, url, etype="company", person=None, publisher=None,
         domains=None):
    df = spark.createDataFrame(
        [(company, url, etype, person, publisher, domains)],
        "c string, u string, t string, p string, pub string, d array<string>",
    )
    got = df.select(
        classify_control(
            F.col("c"), F.col("u"), F.col("t"),
            person_name=F.col("p"), publisher=F.col("pub"),
            company_domains=F.col("d"),
        ).alias("x")
    ).collect()[0]["x"]
    return got


@pytest.mark.parametrize(
    "company,url,expected",
    [
        # user/<slug> keeps the remainder, slashes erased by the token
        # norm; brand substring-matches (risk_rules.py:150-163)
        ("Acme", "https://youtube.com/user/AcmeOfficial/videos", True),
        # @handle on the mobile host (exact-host set incl. m.youtube.com)
        ("Acme", "https://m.youtube.com/@TheAcmeChannel", True),
        # two-word company: only the FULL normalized name is tested on
        # youtube, so 'acmecorp' is not in 'acmeofficial'
        ("Acme Corp", "https://youtube.com/user/AcmeOfficial", False),
        # non-channel path: first segment 'watch' has no brand
        ("Acme", "https://youtube.com/watch", False),
    ],
)
def test_youtube_brand_channel(spark, company, url, expected):
    assert _ctl(spark, company, url) is expected


@pytest.mark.parametrize(
    "company,url,expected",
    [
        # brand token inside the slug token
        ("Acme Corp", "https://www.linkedin.com/company/acme-corporation/about", True),
        # token-overlap fallback: 'globex' (llc dropped by the ignore
        # list) matches the slug token bidirectionally
        ("Globex Industries LLC", "https://linkedin.com/company/globex", True),
        # regional subdomain is NOT linkedin.com (exact-host rule)
        ("Acme", "https://de.linkedin.com/company/acme", False),
        ("Acme", "https://linkedin.com/feed/update/123", False),
    ],
)
def test_linkedin_company_page(spark, company, url, expected):
    assert _ctl(spark, company, url) is expected


def test_linkedin_person_profile_is_ceo_only(spark):
    url = "https://linkedin.com/in/jane-doe-12345"
    assert _ctl(spark, "Acme", url, etype="ceo", person="Jane Doe") is True
    # pub/<slug> form
    assert _ctl(spark, "Acme", "https://linkedin.com/pub/jdoe", etype="ceo",
                person="Jane Doe") is True
    # company entities never run the person checks
    assert _ctl(spark, "Acme", url, etype="company", person="Jane Doe") is False
    # unrelated person
    assert _ctl(spark, "Acme", url, etype="ceo", person="Bob Smith") is False


def test_x_handles_substring_and_case(spark):
    # handle matching is token-normalized (case-insensitive, substring)
    # — the pre-r14 exact-path form missed 'AcmeCorp' vs 'acmecorp'
    assert _ctl(spark, "Acme Corp", "https://x.com/AcmeCorp") is True
    # first-two-words token: 'acmecorp' in 'acmecorphq'
    assert _ctl(spark, "Acme Corp", "https://twitter.com/AcmeCorpHQ") is True
    # /status/ posts stay uncontrolled even for a brand handle
    assert _ctl(spark, "Acme Corp", "https://x.com/AcmeCorp/status/99") is False
    # ceo person handle
    assert _ctl(spark, "Acme", "https://twitter.com/janedoe", etype="ceo",
                person="Jane Doe") is True


def test_publisher_match_overrides_everything(spark):
    # exact normalized name
    assert _ctl(spark, "Acme Corp", "https://other.com/x",
                publisher="ACME-CORP") is True
    # multi-token subset: {acme, widgets} within the publisher tokens
    assert _ctl(spark, "Acme Widgets", "https://other.com/x",
                publisher="Acme Widgets Blog") is True
    # single token + known suffix
    assert _ctl(spark, "Acme", "https://other.com/x",
                publisher="AcmeNews") is True
    # unknown suffix does not qualify
    assert _ctl(spark, "Acme", "https://other.com/x",
                publisher="AcmeAnalytics") is False


def test_company_domains_leg(spark):
    assert _ctl(spark, "Acme", "https://blog.acme-widgets.io/x",
                domains=["acme-widgets.io"]) is True
    assert _ctl(spark, "Acme", "https://acme-widgets.io/x",
                domains=["acme-widgets.io"]) is True
    assert _ctl(spark, "Acme", "https://acme-widgets.io.evil.com/x",
                domains=["acme-widgets.io"]) is False
