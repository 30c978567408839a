"""DuckDB parity for the round-14 prep batch (CDXJ selectivity,
multi-script language ID, charset-sniff coverage) — the exact
compare() harness the registered-queries gate uses, applied to
queries implemented at round 13 but registered at round 14 (the r13
window is booked by the r08-green DUE cohort plus the 3-query r13
flip; see queries_round14_prep docstring)."""

from __future__ import annotations

import re

import pytest

from clickhouse_table_copier_spark.queries_round14_prep import (
    PREP14_ORACLES,
    PREP14_QUERIES,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, run_oracle

# Driver-gate lane split (r17): this suite is in the SLOW lane so the
# default `pytest tests/` gate completes inside the driver's verify
# budget (r16 cut at 43% with zero failures).  Run the slow lane with
#   python -m pytest tests/ -m slow -q
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", sorted(PREP14_QUERIES))
def test_prep14_query_matches_oracle(spark, name):
    df = PREP14_QUERIES[name](spark, SF_ORACLE)
    oracle = run_oracle(PREP14_ORACLES[name], SF_ORACLE)
    compare(df, oracle, name)


def test_registered_at_round14():
    """Flipped at round 14 (was test_not_yet_registered): the batch is
    in the live registry with byte-identical oracles — the same
    positive assertion the r7/r12/r13 prep flips pinned."""
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(PREP14_QUERIES) <= set(qs)
    assert set(PREP14_QUERIES) == set(PREP14_ORACLES)
    for name in PREP14_QUERIES:
        assert oracles[name] == PREP14_ORACLES[name]


def test_prep14_plans_obey_repo_guards(spark):
    """Repo-wide invariants apply before these reach the registry: no
    cartesian joins, no global-window sort, no row-at-a-time python
    UDFs (the charset stage is Arrow-batched mapInPandas)."""
    gw = re.compile(r"Window .*\n.*Sort .*\n.*Exchange SinglePartition")
    for name, fn in PREP14_QUERIES.items():
        plan = (
            fn(spark, SF_ORACLE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert not gw.search(plan), name
