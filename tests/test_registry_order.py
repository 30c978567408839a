"""The driver's correctness gate checks only the FIRST 50 registered
queries (both r01 and r02 CORRECTNESS files hold exactly 50 entries, in
registration order). Pin that every query that has never received a driver
correctness row sits inside that window, so round 3's file covers them."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from clickhouse_table_copier_spark.queries import _DRIVER_WINDOW_FIRST

DRIVER_WINDOW = 50


def test_never_driver_checked_queries_front_the_window():
    names = list(entry.queries())
    for n in _DRIVER_WINDOW_FIRST:
        assert n in names, f"{n} not registered"
        assert names.index(n) < DRIVER_WINDOW, f"{n} outside the driver window"


def test_oracles_follow_the_same_order():
    qnames = list(entry.queries())
    onames = list(entry.oracle_sql())
    # oracle dict order must be the queries order restricted to oracled names
    assert onames == [n for n in qnames if n in set(onames)]


def test_registry_complete():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 87
    # since round 4 every registered query is oracled (trained IVF included)
    assert set(qs) - set(oracles) == set()
