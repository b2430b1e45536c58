"""Golden fixtures for the fuzzy resolver (VERDICT r4 #5).

o7 is the one registry query with no DuckDB oracle (SequenceMatcher
has no SQL equivalent), so its thresholds are pinned here instead with
hand-computed cases. Every expected score below is hand-verifiable
arithmetic: ``SequenceMatcher.ratio() = 2*M / (len_a + len_b)`` where
M is the total matched chars, and for these suffix-extended strings M
is simply the shorter length:

- "acme corp" vs "acme corpse":  2*9/20  = 0.9
- "globex"  vs "globexa":        2*6/13  = 0.923077 (both candidates)
- "initech" vs "initechs xy":    2*7/18  = 0.777778
- 21-char probe vs +8 suffix:    2*21/50 = 0.84 (exact threshold)
- 18-char probe vs +14 suffix:   2*18/50 = 0.72 (exact threshold)
- 100 a's vs 110 a's:            200/210 = 0.952381
- 100 a's vs 100 a's + 11 b's:   200/211 = 0.947867 (margin 0.004514)

Reference semantics under test (`app.py:1048-1056,1097-1161,
1204-1217`): suggestion cutoff >= 0.72, acceptance best >= 0.84,
runner-up margin >= 0.01, sort (-score, candidate), top 5,
case-insensitive scoring.
"""

from __future__ import annotations

import pytest

from risk_dashboard_database_spark.plans.toporder import fuzzy_resolve

PROBES = [
    (1, "Acme Corp"),              # clear accept + case-insensitivity
    (2, "globex"),                 # exact tie -> margin 0 -> reject
    (3, "initech"),                # best in [0.72, 0.84) -> suggest only
    (4, "umbrella"),               # nothing >= 0.72 -> no rows at all
    (5, "abcdefghijklmnopqrstu"),  # best exactly 0.84, no runner -> accept
    (6, "a" * 100),                # best 0.9524, runner 0.9479 -> margin < 0.01
]
CANDIDATES = [
    "acme corp", "acme corpse", "acme colossal",   # 1.0 / 0.9 / 0.6364
    "globexa", "globexb",
    "initechs xy",
    "zzzzqqqq",
    "abcdefghijklmnopqrstuvwxyz123",
    "a" * 110, "a" * 100 + "b" * 11,
]

# (probe_id, candidate, score, rank, resolved)
EXPECTED = [
    (1, "acme corp", 1.0, 1, 1),
    (1, "acme corpse", 0.9, 2, 0),
    (2, "globexa", 0.923077, 1, 0),      # tie-break: name asc
    (2, "globexb", 0.923077, 2, 0),      # margin 0.0 < 0.01 -> unresolved
    (3, "initechs xy", 0.777778, 1, 0),  # 0.72 <= s < 0.84 -> suggestion only
    (5, "abcdefghijklmnopqrstuvwxyz123", 0.84, 1, 1),  # >= is inclusive
    (6, "a" * 110, 0.952381, 1, 0),      # margin 0.004514 < 0.01
    (6, "a" * 100 + "b" * 11, 0.947867, 2, 0),
]


@pytest.fixture(scope="module")
def golden_rows(spark):
    probes = spark.createDataFrame(PROBES, "probe_id int, probe_name string")
    cands = spark.createDataFrame([(c,) for c in CANDIDATES], "candidate string")
    out = fuzzy_resolve(probes, cands)
    return sorted(
        (r.probe_id, r.candidate, r.score, r.rank, r.resolved)
        for r in out.collect()
    )


def test_golden_table_exact(golden_rows):
    assert golden_rows == sorted(EXPECTED)


def test_suggestion_threshold_is_072(spark):
    """2*18/50 = 0.72 survives the cutoff; 2*18/51 = 0.7059 does not."""
    p = spark.createDataFrame([(1, "abcdefghijklmnopqr")], "probe_id int, probe_name string")
    c = spark.createDataFrame(
        [("abcdefghijklmnopqr" + "x" * 14,), ("abcdefghijklmnopqr" + "x" * 15,)],
        "candidate string",
    )
    rows = fuzzy_resolve(p, c).collect()
    assert [(r.candidate[-14:], r.score) for r in rows] == [("x" * 14, 0.72)]


def test_no_rows_below_suggestion(golden_rows):
    assert not [r for r in golden_rows if r[0] == 4]


def test_acceptance_needs_084_and_margin(golden_rows):
    resolved = {r[0] for r in golden_rows if r[4] == 1}
    assert resolved == {1, 5}  # 2: margin; 3: threshold; 6: margin
