"""Round-8e operator tests: TVD drift, U-shaped attribution credit,
stratified k-fold balance, LOO target encoding, exact two-sample KS."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries_round8e import (
    q_ks_cohort_distance,
    q_multi_touch_attribution,
    q_stratified_kfold_balance,
    q_target_encoding_loo,
    q_value_drift_tvd,
)

SF001 = "/root/testdata/sf0.001"
TS = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return TS + dt.timedelta(seconds=seconds)


# ---------------------------------------------------------------------------
# value_drift_tvd — invariants on the real fixture
# ---------------------------------------------------------------------------


def test_tvd_bounds_and_totals(spark):
    rows = q_value_drift_tvd(spark, SF001).collect()
    assert rows, "expected one row per event type"
    for r in rows:
        # TVD is a [0, 1] metric; ppm floor division keeps it <= 1e6
        assert 0 <= r["tvd_ppm"] <= 1_000_000
        assert r["n_ref"] > 0 and r["n_cur"] > 0


def test_tvd_identical_halves_is_zero(spark):
    # if ref and cur bin counts coincide exactly, every |p-q| term is 0;
    # verified through the same ppm arithmetic the query uses
    n = [10, 20, 30]
    p = [x * 1_000_000 // sum(n) for x in n]
    assert sum(abs(a - b) for a, b in zip(p, p)) // 2 == 0


# ---------------------------------------------------------------------------
# multi_touch_attribution — credit rules on planted chains
# ---------------------------------------------------------------------------


def test_u_shaped_credit_rules(spark):
    # user 1: three touches then a purchase (40/20/40);
    # user 2: one touch then a purchase (100%);
    # user 3: touch with no purchase inside 72h (unattributed)
    events = spark.createDataFrame(
        [
            (1, 1, _ts(0), "view", 0.0),
            (2, 1, _ts(10), "click", 0.0),
            (3, 1, _ts(20), "view", 0.0),
            (4, 1, _ts(30), "purchase", 10.0),  # 1000 cents
            (5, 2, _ts(0), "click", 0.0),
            (6, 2, _ts(5), "purchase", 2.0),  # 200 cents
            (7, 3, _ts(0), "view", 0.0),
            (8, 3, _ts(73 * 3600), "purchase", 5.0),
        ],
        "event_id long, user_id long, ts timestamp_ntz, event_type string,"
        " value double",
    )
    import tempfile, os

    d = tempfile.mkdtemp(prefix="mta_")
    events.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        (r["event_type"], r["position"]): (
            r["n_touches"],
            r["attributed_microcents"],
        )
        for r in q_multi_touch_attribution(spark, d).collect()
    }
    # user 1: first view 40% of 1000c, middle click 20%, last view 40%
    # user 2: single click 100% of 200c
    assert out[("view", "first")] == (1, 1000 * 400_000)
    assert out[("click", "middle")] == (1, 1000 * 200_000)
    assert out[("view", "last")] == (1, 1000 * 400_000)
    assert out[("click", "first")] == (1, 200 * 1_000_000)
    # user 3's touch is outside the window: 4 attributed touches total
    assert sum(n for n, _ in out.values()) == 4


def test_attribution_credit_sums_to_whole_purchase(spark):
    # k=5 touches: 400k + 3*66666 + 400k = 999998 ppm (floor division
    # truncation documented); never exceeds 1e6
    k = 5
    middles = 200_000 // (k - 2)
    total = 400_000 + 400_000 + (k - 2) * middles
    assert total <= 1_000_000 and total >= 1_000_000 - (k - 2)


# ---------------------------------------------------------------------------
# stratified_kfold_balance
# ---------------------------------------------------------------------------


def test_kfold_balance_within_one(spark):
    out = q_stratified_kfold_balance(spark, SF001).collect()
    by_label: dict[int, list[int]] = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r["n"])
    assert by_label, "expected at least one label"
    for label, counts in by_label.items():
        assert len(counts) == 5, f"label {label} missing folds"
        assert max(counts) - min(counts) <= 1, f"label {label} unbalanced"


def test_kfold_assignment_deterministic(spark):
    a = sorted(map(tuple, q_stratified_kfold_balance(spark, SF001).collect()))
    b = sorted(map(tuple, q_stratified_kfold_balance(spark, SF001).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# target_encoding_loo
# ---------------------------------------------------------------------------


def test_loo_encoding_excludes_own_row(spark):
    import tempfile, os

    d = tempfile.mkdtemp(prefix="loo_")
    spark.createDataFrame(
        [(1, 1, 10.0), (2, 1, 20.0), (3, 2, 7.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        [(1, 100), (2, 200)], "c_custkey long, c_nationkey int"
    ).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        [(100, "A"), (200, "B")], "n_nationkey int, n_name string"
    ).write.mode("overwrite").parquet(os.path.join(d, "nation.parquet"))
    enc = {
        r["o_orderkey"]: r["enc_microcents"]
        for r in q_target_encoding_loo(spark, d).collect()
    }
    # nation A has orders 1000c and 2000c: each row's encoding is the
    # OTHER row's value; nation B has one order -> NULL (undefined LOO)
    assert enc[1] == 2000 * 1_000_000
    assert enc[2] == 1000 * 1_000_000
    assert enc[3] is None


# ---------------------------------------------------------------------------
# ks_cohort_distance
# ---------------------------------------------------------------------------


def test_ks_identical_cohorts_zero(spark):
    import tempfile, os

    d = tempfile.mkdtemp(prefix="ks_")
    # users 2 (even->A) and 3 (odd->B) produce IDENTICAL value sets
    rows = [
        (i, u, _ts(i), "click", v)
        for i, (u, v) in enumerate(
            [(2, 1.0), (2, 2.0), (2, 3.0), (3, 1.0), (3, 2.0), (3, 3.0)]
        )
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, event_type string,"
        " value double",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = q_ks_cohort_distance(spark, d).collect()
    assert len(out) == 1
    assert out[0]["ks_num"] == 0 and out[0]["ks_ppm"] == 0


def test_ks_disjoint_cohorts_maximal(spark):
    import tempfile, os

    d = tempfile.mkdtemp(prefix="ks2_")
    # cohort A all values below cohort B: KS distance = 1 exactly
    rows = [
        (1, 2, _ts(1), "click", 1.0),
        (2, 2, _ts(2), "click", 2.0),
        (3, 3, _ts(3), "click", 10.0),
        (4, 3, _ts(4), "click", 20.0),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, event_type string,"
        " value double",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = q_ks_cohort_distance(spark, d).collect()[0]
    assert out["ks_num"] == out["n_a"] * out["n_b"]
    assert out["ks_ppm"] == 1_000_000
