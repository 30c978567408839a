"""Property + plan tests for the round-6h TPC-H batch (Q2/Q6/Q10/Q11
shapes) beyond the oracle gate: the pushdowns and join/agg structures
the docstrings promise, plus the argmin/threshold semantics checked
directly against brute-force recomputation."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t
from clickhouse_table_copier_spark.queries_round6h import (
    q_forecast_revenue_change,
    q_important_part_value,
    q_min_cost_supplier,
    q_returned_item_revenue,
)
from tests.conftest import SF_SMOKE


def _formatted(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_q6_all_predicates_push_and_scan_prunes(spark):
    """Q6's entire WHERE clause must reach the lineitem scan as pushed
    filters, and the scan may read only the 4 referenced columns — this
    is the query whose whole value is being scan-bound."""
    plan = _formatted(spark, q_forecast_revenue_change(spark, SF_SMOKE))
    pushed = [
        ln for ln in plan.splitlines() if ln.strip().startswith("PushedFilters")
    ][0]
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThan(l_discount,0.045)",
        "LessThan(l_discount,0.075)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in pushed, f"{frag} not pushed: {pushed}"
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and len(schemas[0].split(",")) == 4, schemas


def test_q6_aggregate_is_partial_final(spark):
    """One exchange carrying only the 1-row partials — never raw rows."""
    plan = _formatted(spark, q_forecast_revenue_change(spark, SF_SMOKE))
    assert plan.count("HashAggregate") >= 2
    assert "SinglePartition" in plan  # the final agg merges 1-row partials


def test_q10_selective_filters_push_to_both_fact_scans(spark):
    plan = _formatted(spark, q_returned_item_revenue(spark, SF_SMOKE))
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(l_returnflag,R\)", plan)
    assert re.search(
        r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(o_orderdate", plan
    )


def test_q10_topk_uses_take_ordered(spark):
    plan = _formatted(spark, q_returned_item_revenue(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan[-1200:]


def test_q11_threshold_matches_brute_force(spark):
    """Every returned part's value exceeds 0.1% of the NATION_7 total,
    and no omitted part does — recomputed without the query's own
    scalar-subquery machinery."""
    rows = q_important_part_value(spark, SF_SMOKE).collect()
    supp = (
        _t(spark, SF_SMOKE, "supplier")
        .join(
            _t(spark, SF_SMOKE, "nation").where(F.col("n_name") == "NATION_7"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    pv = {
        r["l_partkey"]: float(r["value"])
        for r in _t(spark, SF_SMOKE, "lineitem")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("value"))
        .collect()
    }
    threshold = sum(pv.values()) * 0.001
    expected = {k for k, v in pv.items() if v > threshold}
    assert {r["l_partkey"] for r in rows} == expected
    assert all(r["part_value"] > threshold * 0.999 for r in rows)


def test_q2_winners_are_true_argmin_with_ties_kept(spark):
    """Each (part, supplier) row's unit_cost equals the global minimum
    over EUROPE suppliers for that part, and every supplier achieving it
    is present (ties kept, not arbitrarily dropped)."""
    rows = q_min_cost_supplier(spark, SF_SMOKE).collect()
    assert rows, "fixture has p_size=25 parts — result must be non-empty"
    by_part: dict[int, list] = {}
    for r in rows:
        by_part.setdefault(r["p_partkey"], []).append(r)
    for part, winners in by_part.items():
        costs = {r["unit_cost"] for r in winners}
        assert len(costs) == 1, f"part {part} winners disagree on min cost"
    # no banned join shapes, no global window sort (partitioned min only)
    plan = _formatted(spark, q_min_cost_supplier(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q2_window_is_partitioned_by_part(spark):
    """The argmin window must shuffle BY PART KEY — the Window node's
    partition spec names l_partkey and the preceding exchange is a hash
    partitioning on it, never SinglePartition."""
    plan = _formatted(spark, q_min_cost_supplier(spark, SF_SMOKE))
    win = re.search(
        r"\(\d+\) Window\nInput[^\n]*\n"
        r"Arguments: \[min\(unit_cost[^\n]*\], \[l_partkey",
        plan,
    )
    assert win, plan[-1500:]
    assert re.search(r"hashpartitioning\(l_partkey#\d+L, \d+\)", plan), plan[-1500:]
