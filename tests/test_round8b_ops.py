"""Round-8b operator tests: forward as-of join, exact weighted
quantiles, and windowFunnel anchor-max semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.operators.ranks import weighted_quantiles
from clickhouse_table_copier_spark.operators.temporal_joins import (
    asof_join_forward,
)

TS = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return TS + dt.timedelta(seconds=seconds)


# ---------------------------------------------------------------------------
# asof_join_forward
# ---------------------------------------------------------------------------


def test_forward_asof_strict_and_earliest(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(20)), (2, _ts(5))], "k int, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "same"), (1, _ts(15), "a"), (1, _ts(16), "b")],
        "k int, ts timestamp_ntz, v string",
    )
    rows = {
        (r["k"], r["ts"]): (r["v"], r["__next_t"])
        for r in asof_join_forward(left, right, "k", "ts").collect()
    }
    # strict: the equal-timestamp right row at t=10 must NOT match
    assert rows[(1, _ts(10))] == ("a", _ts(15))
    # no later right row -> NULLs
    assert rows[(1, _ts(20))] == (None, None)
    assert rows[(2, _ts(5))] == (None, None)


def test_forward_asof_tie_first_by_order_col(spark):
    left = spark.createDataFrame([(1, _ts(0))], "k int, ts timestamp_ntz")
    right = spark.createDataFrame(
        [(1, _ts(5), 9, "late-id"), (1, _ts(5), 3, "early-id")],
        "k int, ts timestamp_ntz, eid int, v string",
    )
    out = asof_join_forward(
        left, right, "k", "ts", value_cols=["v"], order_col="eid"
    ).collect()
    assert out[0]["v"] == "early-id"  # FIRST by order_col wins


def test_forward_asof_plan_has_no_join_node(spark):
    left = spark.createDataFrame([(1, _ts(0))], "k int, ts timestamp_ntz")
    right = spark.createDataFrame(
        [(1, _ts(5), 1.0)], "k int, ts timestamp_ntz, v double"
    )
    plan = (
        asof_join_forward(left, right, "k", "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "Cartesian", "NestedLoop"):
        assert bad not in plan, plan


# ---------------------------------------------------------------------------
# weighted_quantiles
# ---------------------------------------------------------------------------


def _brute_weighted_quantile(pairs, num, den):
    """Smallest v with den * cumw(<= v) >= num * W."""
    total = sum(w for _, w in pairs)
    cum = 0
    for v, w in sorted(pairs):
        cum += w
        if den * cum >= num * total:
            return v
    return None


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=-1000, max_value=1000),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_weighted_quantiles_match_bruteforce(spark, rows):
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {
        r["g"]: (r["p25"], r["p50"], r["p75"])
        for r in weighted_quantiles(
            df, "g", "v", "w",
            quantiles=[("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)],
        ).collect()
    }
    groups = {g for g, _, _ in rows}
    assert set(got) == groups
    for g in groups:
        pairs = [(v, w) for gg, v, w in rows if gg == g]
        want = tuple(
            _brute_weighted_quantile(pairs, n, d)
            for n, d in [(1, 4), (1, 2), (3, 4)]
        )
        assert got[g] == want, f"group {g}: {got[g]} != {want}"


def test_weighted_quantiles_shared_target_bucket(spark):
    # one dominant value carries >75% of the weight: every quantile's
    # target lands in the SAME bucket, exercising the per-label window
    # partition (a (g,bucket)-partitioned cumsum would double-count the
    # join-duplicated rows)
    rows = [("g", 5, 1000)] + [("g", i, 1) for i in range(100)]
    out = weighted_quantiles(
        spark.createDataFrame(rows, "g string, v long, w long"),
        "g", "v", "w",
        quantiles=[("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)],
    ).collect()[0]
    assert (out["p25"], out["p50"], out["p75"]) == (5, 5, 5)


def test_weighted_quantiles_no_global_sort(spark):
    rows = [("x", i % 97, 1 + i % 7) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    plan = (
        weighted_quantiles(df, "g", "v", "w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # window sorts are partitioned by (g, label); a global quantile sort
    # would show a single-partition Exchange
    assert "SinglePartition" not in plan.replace(
        "Exchange SinglePartition", "", 0
    ) or "rangepartitioning" not in plan.lower()


# ---------------------------------------------------------------------------
# windowFunnel anchor-max semantics
# ---------------------------------------------------------------------------


def test_window_funnel_anchor_max_beats_first_anchor(spark, tmp_path):
    """A user whose FIRST view leads nowhere inside the window but whose
    LATER view converts must count at depth 3 — the anchor-max semantics
    that distinguish this operator from event_funnel's min-t1 anchoring."""
    from clickhouse_table_copier_spark.queries_round8b import (
        q_window_funnel_anchors,
    )

    h = 3600
    rows = [
        # user 1: dead first view (next click is 100h away), then a
        # later view with click+purchase inside 48h
        (1, _ts(0), 1, "view"),
        (1, _ts(100 * h), 2, "view"),
        (1, _ts(101 * h), 3, "click"),
        (1, _ts(102 * h), 4, "purchase"),
        # user 2: view then click inside the window, purchase outside
        (2, _ts(0), 5, "view"),
        (2, _ts(h), 6, "click"),
        (2, _ts(100 * h), 7, "purchase"),
        # user 3: only a view
        (3, _ts(0), 8, "view"),
    ]
    df = spark.createDataFrame(
        [(eid, ts, uid, et, 0.0, "{}") for uid, ts, eid, et in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    got = {
        r["depth"]: r["n_users"]
        for r in q_window_funnel_anchors(spark, sf).collect()
    }
    assert got == {3: 1, 2: 1, 1: 1}
