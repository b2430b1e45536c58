"""Registry consistency: every oracle belongs to a registered query,
names follow the survey-op convention, and the entry module forwards
the registry faithfully."""

from __future__ import annotations

import re

import __spark_entry__ as entry_mod
from risk_dashboard_database_spark.plans import ORACLES, QUERIES


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_only_known_rows_only_queries_lack_oracles():
    # o7 is the single intentional rows-only entry (SequenceMatcher has
    # no SQL equivalent); anything else missing an oracle is a mistake
    assert set(QUERIES) - set(ORACLES) == {"o7_fuzzy_topk"}


def test_names_follow_survey_convention():
    pat = re.compile(r"^[a-z]\d{0,2}b?_[a-z0-9_]+$|^[a-z]_[a-z0-9_]+$")
    for name in QUERIES:
        assert pat.match(name), name


def test_entry_module_forwards_registry():
    assert entry_mod.queries().keys() == QUERIES.keys()
    assert entry_mod.oracle_sql().keys() == ORACLES.keys()


def test_sample_first_names_all_resolve():
    # _SAMPLE_FIRST exists to guarantee least-recently-validated queries
    # are sampled first; a typo or rename must fail loudly, not silently
    # demote the query to the tail of the ordering
    unknown = [n for n in entry_mod._SAMPLE_FIRST if n not in QUERIES]
    assert not unknown, f"_SAMPLE_FIRST names not in registry: {unknown}"
    assert len(set(entry_mod._SAMPLE_FIRST)) == len(entry_mod._SAMPLE_FIRST)
