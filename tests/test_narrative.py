"""Unit tests for narrative tag matchers and vote tie-breaks
(`narrative_runtime.py` parity), including the non-crisis tags the
driver queries don't exercise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from risk_dashboard_database_spark.plans.narrative import (
    CRISIS_TAGS,
    TAG_ORDER,
    narrative_tag,
)


@pytest.mark.parametrize(
    "title,expected",
    [
        ("Company announces massive layoffs", "Workforce Reductions"),
        ("Factory explosion injures two", "Accidents & Disasters"),
        ("Major data breach exposes records", "Data Breaches"),
        ("Activist investor builds stake", "Activist Investor Interest"),
        ("Class lawsuits filed by regulators", "Legal & Regulatory"),
        ("Union strike enters second week", "Labor Disputes"),
        ("CEO resigns effective today", "CEO Departures (firings, resignations)"),
        ("Executives charged with fraud", "Fraud"),
        ("Company unveils rebranding", "Rebranding"),
        ("Firm to acquire rival in merger", "Mergers and acquisitions"),
        ("Quarterly results as expected", None),
    ],
)
def test_tag_matchers(spark, title, expected):
    df = spark.createDataFrame([(title,)], "t string")
    got = df.select(narrative_tag(F.col("t")).alias("x")).collect()[0]["x"]
    assert got == expected


def test_canonical_order_prefers_earlier_tag():
    # 'layoffs' (idx 0) outranks 'strike' (idx 6) on vote ties
    assert TAG_ORDER.index("Workforce Reductions") < TAG_ORDER.index("Labor Disputes")
    # crisis tags all precede non-crisis tags
    max_crisis = max(TAG_ORDER.index(t) for t in CRISIS_TAGS)
    non_crisis = [t for t in TAG_ORDER if t not in CRISIS_TAGS]
    assert all(TAG_ORDER.index(t) > max_crisis for t in non_crisis)


def test_first_match_in_canonical_order_wins(spark):
    # title matching both Workforce (earlier) and Labor Disputes
    df = spark.createDataFrame([("union strike leads to layoffs",)], "t string")
    got = df.select(narrative_tag(F.col("t")).alias("x")).collect()[0]["x"]
    assert got == "Workforce Reductions"
