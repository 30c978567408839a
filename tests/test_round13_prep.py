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

# Driver-gate lane split (r17): SLOW lane (see pytest.ini) so the
# default gate completes inside the driver's verify budget; run with
#   python -m pytest tests/ -m slow -q
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", sorted(PREP13_QUERIES))
def test_prep13_query_matches_oracle(spark, name):
    df = PREP13_QUERIES[name](spark, SF_ORACLE)
    oracle = run_oracle(PREP13_ORACLES[name], SF_ORACLE)
    compare(df, oracle, name)


def test_registered_at_round13():
    """Flipped at round 13 (was test_not_yet_registered): the batch is
    now IN the main registry with identical oracles — the same
    positive assertion the r7/r12 prep flips pinned."""
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(PREP13_QUERIES) <= set(qs)
    assert set(PREP13_QUERIES) == set(PREP13_ORACLES)
    for name in PREP13_QUERIES:
        assert oracles[name] == PREP13_ORACLES[name]


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
