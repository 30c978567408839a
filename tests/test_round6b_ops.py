"""Property + plan tests for the round-6b TPC-H batch beyond the oracle
gate: predicate pushdown reaching the scans, the broadcast decisions the
docstrings promise, and brute-force parity for the folded-EXISTS shape."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _formatted(spark, df) -> str:
    """Formatted explain: scan details (PushedFilters etc.) printed in
    full — the treeString form truncates long filter lists at a width
    that shifts with attribute-id length, so substring asserts against
    it are run-order-dependent."""
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_q19_or_predicate_pushes_to_part_scan(spark):
    """The OR-of-conjunctions' projection onto part columns must reach
    the part parquet scan as a pushed filter — the join must not see
    unfiltered part rows."""
    from clickhouse_table_copier_spark.queries_round6b import (
        q_disjunctive_brand_revenue,
    )

    plan = _formatted(spark, q_disjunctive_brand_revenue(spark, SF_SMOKE))
    pushed = [
        ln for ln in plan.splitlines() if ln.strip().startswith("PushedFilters")
    ]
    part_side = [ln for ln in pushed if "p_brand" in ln]
    assert part_side, plan[-1500:]
    assert "Or(" in part_side[0] and "EqualTo(p_brand,Brand#12)" in part_side[0]
    # the quantity arm of the disjunction pushes into the lineitem scan
    li_side = [ln for ln in pushed if "l_quantity" in ln]
    assert li_side and "Or(" in li_side[0], pushed


def test_q8_type_filter_pushes_to_part_scan(spark):
    from clickhouse_table_copier_spark.queries_round6b import (
        q_nation_market_share,
    )

    plan = _formatted(spark, q_nation_market_share(spark, SF_SMOKE))
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(p_type,ECONOMY\)", plan)


def test_q18_every_order_exceeds_threshold(spark):
    from clickhouse_table_copier_spark.queries_round6b import (
        _Q18_QTY,
        q_large_volume_orders,
    )
    from clickhouse_table_copier_spark.queries import _t

    rows = q_large_volume_orders(spark, SF_SMOKE).collect()
    assert rows, "threshold empties the fixture"
    qty = {
        r["l_orderkey"]: r["sum_qty"]
        for r in _t(spark, SF_SMOKE, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .collect()
    }
    for r in rows:
        assert r["sum_qty"] > _Q18_QTY
        assert qty[r["o_orderkey"]] == r["sum_qty"]


def test_q15_returns_exactly_the_argmax_suppliers(spark):
    from clickhouse_table_copier_spark.queries_round6b import (
        _Q15_HI,
        _Q15_LO,
        q_top_revenue_supplier,
    )
    from clickhouse_table_copier_spark.queries import _t

    got = {r["s_suppkey"]: r["total_revenue"] for r in
           q_top_revenue_supplier(spark, SF_SMOKE).collect()}
    li = _t(spark, SF_SMOKE, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q15_LO + " 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(_Q15_HI + " 00:00:00").cast("timestamp_ntz"))
    )
    per = {
        r["l_suppkey"]: r["rev"]
        for r in li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("rev")
        )
        .collect()
    }
    best = max(per.values())
    want = {k for k, v in per.items() if v == best}
    assert set(got) == want
    for k in got:
        assert abs(got[k] - float(per[k])) < 1e-6


def test_q21_matches_bruteforce(spark):
    """Recompute 'only late supplier on a multi-supplier finished order'
    in pure Python from collected rows (sf0.001) and compare numwaits."""
    from clickhouse_table_copier_spark.queries_round6b import (
        _Q21_LATE_DAYS,
        q_waiting_supplier_orders,
    )
    from clickhouse_table_copier_spark.queries import _t

    import datetime

    li = (
        _t(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .collect()
    )
    orders = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in _t(spark, SF_SMOKE, "orders")
        .where(F.col("o_orderstatus") == "F")
        .collect()
    }
    names = {
        r["s_suppkey"]: r["s_name"]
        for r in _t(spark, SF_SMOKE, "supplier").collect()
    }
    per: dict = {}
    for r in li:
        od = orders.get(r["l_orderkey"])
        if od is None:
            continue
        late = r["l_shipdate"] > od + datetime.timedelta(days=_Q21_LATE_DAYS)
        key = (r["l_orderkey"], r["l_suppkey"])
        per[key] = per.get(key, False) or late
    by_order: dict = {}
    for (ok, sk), late in per.items():
        n, nl = by_order.get(ok, (0, 0))
        by_order[ok] = (n + 1, nl + (1 if late else 0))
    want: dict = {}
    for (ok, sk), late in per.items():
        n, nl = by_order[ok]
        if late and n > 1 and nl == 1:
            name = names[sk]
            want[name] = want.get(name, 0) + 1
    got = {
        r["s_name"]: r["numwait"]
        for r in q_waiting_supplier_orders(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_q22_threshold_is_division_free_boundary_exact(spark, tmp_path):
    """Plant a customer whose balance EQUALS the positive average — the
    cross-multiplied comparison (bal·n > Σbal) must exclude it exactly
    (strict >), with no float drift possible."""
    import shutil

    src = tmp_path / "sf"
    src.mkdir()
    for t in ("nation", "orders"):
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", src / f"{t}.parquet")
    # positive balances 100, 300, 200, 200 → avg exactly 200.00; the
    # two boundary customers sit EXACTLY at the average and must be
    # excluded by the strict cross-multiplied comparison (planted
    # custkeys have no orders, so the anti-join keeps all of them)
    spark.createDataFrame(
        [
            (9000001, 0, 100.0),
            (9000002, 0, 300.0),
            (9000003, 1, 200.0),
            (9000004, 1, 200.0),
        ],
        "c_custkey BIGINT, c_nationkey INT, c_acctbal DOUBLE",
    ).write.parquet(str(src / "customer.parquet"))
    from clickhouse_table_copier_spark.queries_round6b import (
        q_idle_customer_balances,
    )

    rows = q_idle_customer_balances(spark, str(src)).collect()
    assert [(r["nation"], r["numcust"], r["totacctbal"]) for r in rows] == [
        ("NATION_0", 1, 300.0)
    ]
