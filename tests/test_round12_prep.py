"""DuckDB parity for the round-12 prep batch (the SQL-expressible
round-9c/10 ingest surface) — the exact compare() harness the
registered-queries gate uses, applied to queries implemented now but
registered at round 12 (the r11–r13 windows are fully priced by DUE
cohorts + the FIFO backlog; see queries_round12_prep docstring and
COVERAGE.md "Round-11 window")."""

from __future__ import annotations

import re

import pytest

from clickhouse_table_copier_spark.queries_round12_prep import (
    PREP12_ORACLES,
    PREP12_QUERIES,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, run_oracle

# Driver-gate lane split (r17): this suite is in the SLOW lane so the
# default `pytest tests/` gate completes inside the driver's verify
# budget (r16 cut at 43% with zero failures).  Run the slow lane with
#   python -m pytest tests/ -m slow -q
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", sorted(PREP12_QUERIES))
def test_prep12_query_matches_oracle(spark, name):
    df = PREP12_QUERIES[name](spark, SF_ORACLE)
    oracle = run_oracle(PREP12_ORACLES[name], SF_ORACLE)
    compare(df, oracle, name)


def test_registered_since_round12():
    """Round 12 flipped the registration flag (the move priced in
    COVERAGE.md "Round-11 window" and VERDICT r11 item 4): all four
    prep queries are live registry entries with oracles, joining the
    FIFO FRESH backlog behind the r11 leftovers."""
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(PREP12_QUERIES) <= set(qs)
    assert set(PREP12_QUERIES) <= set(oracles)
    assert set(PREP12_QUERIES) == set(PREP12_ORACLES)
    for name in PREP12_QUERIES:
        assert qs[name] is PREP12_QUERIES[name]
        assert oracles[name] == PREP12_ORACLES[name]


def test_prep12_plans_obey_repo_guards(spark):
    """Repo-wide invariants apply before these ever reach the registry:
    no cartesian joins, no global-window sort."""
    gw = re.compile(r"Window .*\n.*Sort .*\n.*Exchange SinglePartition")
    for name, fn in PREP12_QUERIES.items():
        plan = (
            fn(spark, SF_ORACLE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert not gw.search(plan), name


def test_psl_histogram_covers_the_null_group(spark):
    """The planted kawasaki branches (the host that IS a public suffix
    and the wildcard suffix) must land in the NULL-domain bucket —
    2 of 8 branches."""
    df = PREP12_QUERIES["psl_domain_histogram"](spark, SF_ORACLE)
    rows = {r["domain"]: r["n_hosts"] for r in df.collect()}
    import duckdb

    expected_null = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_ORACLE}/documents.parquet')"
        " WHERE doc_id % 8 IN (4, 5)"
    ).fetchone()[0]
    assert rows.get(None, 0) == expected_null > 0
    # the ADVICE-r10 pair: one level under the wildcard registers
    assert any(k and k.endswith(".kawasaki.jp") for k in rows if k)
