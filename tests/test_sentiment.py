"""F4 sentiment rules: lexicon hits, negation flip, booster
amplification, thresholds, and the exact-integer invariant that makes
the oracle mirror bit-exact."""

from __future__ import annotations

import pandas as pd

from risk_dashboard_database_spark.functions import sentiment as S


def test_lexicon_and_rules_integer_exact():
    base = S.LEXICON_X10["good"] * 10000
    assert S.score_1e5("good") == base

    # negation flips and damps by exactly -0.74 (integer-exact)
    assert S.score_1e5("not good") == (base // 100) * -74

    # booster amplifies away from zero by exactly 0.293
    assert S.score_1e5("very good") == base + S.BOOST_1E5
    assert (
        S.score_1e5("very bad") == S.LEXICON_X10["bad"] * 10000 - S.BOOST_1E5
    )

    # rules key off the IMMEDIATELY previous token only (the simplified
    # window this implementation defines and the SQL mirror shares):
    # in "not very good" the token before "good" is the booster, so
    # negation does NOT fire
    assert S.score_1e5("not very good") == base + S.BOOST_1E5

    # multiple hits fold by addition
    assert (
        S.score_1e5("good good")
        == 2 * base
    )


def test_punctuation_case_and_empty():
    assert S.score_1e5("GOOD!") == S.score_1e5("good")
    assert S.score_1e5('"great"') == S.score_1e5("great")
    assert S.score_1e5("") == 0
    assert S.score_1e5(None) == 0
    assert S.score_1e5("the of and") == 0


def test_compound_normalization_and_labels():
    assert S.compound(0) == 0.0
    pos = S.compound(S.score_1e5("great success"))
    neg = S.compound(S.score_1e5("terrible failure"))
    assert -1.0 < neg < -0.05 < 0.05 < pos < 1.0


def test_batch_path_matches_scalar():
    texts = pd.Series(["very good", "not good", "bad crash", None, ""])
    got = S.sentiment_builtin(texts)
    want = [S.compound(S.score_1e5(t)) for t in texts]
    assert list(got) == want
