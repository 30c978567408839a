"""DuckDB parity for the round-7 prep batch (Q12/Q14/Q20 shapes) —
the exact compare() harness the registered-queries gate uses, applied
to queries that are implemented now but registered next round (the
round-6 driver window is full; see queries_round7_prep docstring)."""

from __future__ import annotations

import pytest

from clickhouse_table_copier_spark.queries_round7_prep import (
    PREP_ORACLES,
    PREP_QUERIES,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, run_oracle


@pytest.mark.parametrize("name", sorted(PREP_QUERIES))
def test_prep_query_matches_oracle(spark, name):
    df = PREP_QUERIES[name](spark, SF_ORACLE)
    oracle = run_oracle(PREP_ORACLES[name], SF_ORACLE)
    compare(df, oracle, name)


def test_prep_queries_not_yet_registered():
    """Guard both directions: the prep names must NOT be registered this
    round (the window is full), and the prep dicts stay in lockstep."""
    import __spark_entry__ as entry

    qs = entry.queries()
    assert not set(PREP_QUERIES) & set(qs)
    assert set(PREP_QUERIES) == set(PREP_ORACLES)


def test_prep_plans_obey_repo_guards(spark):
    """The repo-wide no-cartesian / no-global-window-sort invariants
    apply to the prep batch before it ever reaches the registry."""
    import re

    gw = re.compile(r"Window .*\n.*Sort .*\n.*Exchange SinglePartition")
    for name, fn in PREP_QUERIES.items():
        plan = (
            fn(spark, SF_ORACLE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert not gw.search(plan), name
