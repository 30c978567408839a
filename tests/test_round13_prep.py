"""DuckDB parity for the round-13 prep batch (robots filtering +
sitemap frontier) — the exact compare() harness the registered-
queries gate uses, applied to queries implemented at round 12 but
registered at round 13 (the r12 window was fully booked by the
32-DUE + 18-FRESH drain; see queries_round13_prep docstring and
COVERAGE.md "Round-12 window")."""

from __future__ import annotations

import re

import pytest

from clickhouse_table_copier_spark.queries_round13_prep import (
    PREP13_ORACLES,
    PREP13_QUERIES,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, run_oracle


@pytest.mark.parametrize("name", sorted(PREP13_QUERIES))
def test_prep13_query_matches_oracle(spark, name):
    df = PREP13_QUERIES[name](spark, SF_ORACLE)
    oracle = run_oracle(PREP13_ORACLES[name], SF_ORACLE)
    compare(df, oracle, name)


def test_not_yet_registered():
    """Deliberately NOT in the registry until round 13 (flip this to
    the positive assertion when registering — see module docstring):
    registering now would append FRESH obligations to a window whose
    r12 shape (32 DUE + 18 FRESH, backlog 0) is already committed in
    COVERAGE.md."""
    import __spark_entry__ as entry

    qs = entry.queries()
    assert set(PREP13_QUERIES).isdisjoint(qs)
    assert set(PREP13_QUERIES) == set(PREP13_ORACLES)


def test_prep13_plans_obey_repo_guards(spark):
    """Repo-wide invariants apply before these reach the registry: no
    cartesian joins, no global-window sort; the robots rules join must
    broadcast."""
    gw = re.compile(r"Window .*\n.*Sort .*\n.*Exchange SinglePartition")
    for name, fn in PREP13_QUERIES.items():
        plan = (
            fn(spark, SF_ORACLE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert not gw.search(plan), name
    plan = (
        PREP13_QUERIES["robots_allowed_rate"](spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
