"""DuckDB parity for the round-8 prep batch — the same compare()
harness the registered-queries gate uses, applied to queries that are
implemented now but registered next round (the round-7 driver window
carries 34 must-verify queries; see queries_round8_prep docstring)."""

from __future__ import annotations

import pytest

from clickhouse_table_copier_spark.queries_round8_prep import (
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


def test_prep_queries_registered_round8():
    """Round 8: the prep batch IS registered (same oracle text, same
    callables), and the prep dicts stay in lockstep."""
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(PREP_QUERIES) <= set(qs)
    assert set(PREP_QUERIES) == set(PREP_ORACLES)
    for name in PREP_QUERIES:
        assert qs[name] is PREP_QUERIES[name]
        assert os_[name] == PREP_ORACLES[name]


def test_prep_plans_obey_repo_guards(spark):
    """The repo-wide no-cartesian / no-global-window-sort invariants
    apply before these ever reach the registry."""
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


def test_basket_lift_pair_fanout_bounded(spark):
    """Every order contributes at most C(6,2)=15 pair rows (type
    cardinality, not basket line count), and all surviving pairs meet
    the support floor."""
    from clickhouse_table_copier_spark.queries_round8_prep import (
        _BASKET_MIN_SUPPORT,
        q_basket_type_lift,
    )

    rows = q_basket_type_lift(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= 15
    assert all(r["c_ab"] >= _BASKET_MIN_SUPPORT for r in rows)
    assert all(r["type_a"] < r["type_b"] for r in rows)


def test_funnel_percentiles_ordered_and_bracketed(spark):
    """p25 ≤ p50 ≤ p75, all inside the horizon, and the median equals a
    driver-side recomputation from the raw durations."""
    from pyspark.sql import functions as F

    from clickhouse_table_copier_spark.queries import _events
    from clickhouse_table_copier_spark.queries_round8_prep import (
        _FTP_HORIZON_D,
        q_funnel_time_percentiles,
    )

    rows = {r["percentile"]: r for r in q_funnel_time_percentiles(spark, SF_ORACLE).collect()}
    assert sorted(rows) == [25, 50, 75]
    d25, d50, d75 = (rows[p]["duration_us"] for p in (25, 50, 75))
    assert 0 < d25 <= d50 <= d75 < _FTP_HORIZON_D * 86_400_000_000

    ev = _events(spark, SF_ORACLE)
    t0 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("t0"))
    )
    tp = (
        ev.where(F.col("event_type") == "purchase")
        .join(t0, "user_id").where(F.col("ts") > F.col("t0"))
        .groupBy("user_id").agg(F.min("ts").alias("tp"))
    )
    dur = (
        F.unix_micros(F.col("tp").cast("timestamp"))
        - F.unix_micros(F.col("t0").cast("timestamp"))
    )
    ds = sorted(
        r["d"]
        for r in t0.join(tp, "user_id").select(dur.alias("d")).collect()
        if r["d"] < _FTP_HORIZON_D * 86_400_000_000
    )
    n = len(ds)
    assert rows[50]["n_converted"] == n
    assert d50 == ds[(50 * (n - 1)) // 100]
