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


@pytest.mark.parametrize("name", sorted(PREP14_QUERIES))
def test_prep14_query_matches_oracle(spark, name):
    df = PREP14_QUERIES[name](spark, SF_ORACLE)
    oracle = run_oracle(PREP14_ORACLES[name], SF_ORACLE)
    compare(df, oracle, name)


def test_not_yet_registered():
    """Deliberately NOT in the registry until round 14 (flip this to
    the positive assertion when registering — see module docstring):
    registering now would append FRESH obligations to a window whose
    r13 shape is already committed in COVERAGE.md."""
    import __spark_entry__ as entry

    qs = entry.queries()
    assert set(PREP14_QUERIES).isdisjoint(qs)
    assert set(PREP14_QUERIES) == set(PREP14_ORACLES)


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
