"""Round-8f operator tests: exact ACF, Mann–Whitney U, temporal-split
leakage audit."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from clickhouse_table_copier_spark.queries_round8f import (
    q_daily_autocorr,
    q_mannwhitney_u_cohorts,
    q_temporal_split_leakage,
)

SF001 = "/root/testdata/sf0.001"
TS = dt.datetime(2024, 1, 1)

_EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp_ntz, event_type string,"
    " value double"
)


def _write_events(spark, rows):
    d = tempfile.mkdtemp(prefix="r8f_")
    spark.createDataFrame(rows, _EV_SCHEMA).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


# ---------------------------------------------------------------------------
# daily_autocorr
# ---------------------------------------------------------------------------


def test_acf_alternating_series_is_negative_at_lag1(spark):
    # daily revenue alternating 10, 30, 10, 30 ... over 10 days:
    # lag-1 ACF must be strongly negative, lag-2 strongly positive
    rows = [
        (i, 1, TS + dt.timedelta(days=i), "click", 10.0 if i % 2 == 0 else 30.0)
        for i in range(10)
    ]
    d = _write_events(spark, rows)
    out = {r["lag"]: r for r in q_daily_autocorr(spark, d).collect()}
    assert out[1]["acf"] < -0.5
    assert out[2]["acf"] > 0.5
    # exactness: acf is num/den of the reported integers
    for r in out.values():
        if r["den"]:
            assert abs(r["acf"] - r["num"] / r["den"]) == 0.0


def test_acf_constant_series_is_null_not_nan(spark):
    rows = [
        (i, 1, TS + dt.timedelta(days=i), "click", 5.0) for i in range(9)
    ]
    d = _write_events(spark, rows)
    for r in q_daily_autocorr(spark, d).collect():
        assert r["num"] == 0 and r["den"] == 0
        assert r["acf"] is None  # nullif guard, not Inf/NaN


def test_acf_real_fixture_bounded(spark):
    out = q_daily_autocorr(spark, SF001).collect()
    assert len(out) == 7
    for r in out:
        assert -1.0 <= r["acf"] <= 1.0


# ---------------------------------------------------------------------------
# mannwhitney_u_cohorts
# ---------------------------------------------------------------------------


def test_mw_disjoint_cohorts_maximal(spark):
    # even users all ABOVE odd users: U_A = nA*nB, cles = 1e6
    rows = [
        (1, 2, TS, "click", 10.0),
        (2, 2, TS, "click", 20.0),
        (3, 3, TS, "click", 1.0),
        (4, 3, TS, "click", 2.0),
        (5, 3, TS, "click", 3.0),
    ]
    d = _write_events(spark, rows)
    out = q_mannwhitney_u_cohorts(spark, d).collect()[0]
    assert (out["n_a"], out["n_b"]) == (2, 3)
    assert out["u2"] == 2 * 2 * 3
    assert out["cles_ppm"] == 1_000_000


def test_mw_all_tied_is_half(spark):
    # identical values in both cohorts: every pair is a tie -> U_A = nA*nB/2
    rows = [
        (1, 2, TS, "click", 7.0),
        (2, 2, TS, "click", 7.0),
        (3, 3, TS, "click", 7.0),
    ]
    d = _write_events(spark, rows)
    out = q_mannwhitney_u_cohorts(spark, d).collect()[0]
    assert out["u2"] == 2 * 1  # 2*U, U = 2*1/2 = 1
    assert out["cles_ppm"] == 500_000


# ---------------------------------------------------------------------------
# temporal_split_leakage
# ---------------------------------------------------------------------------


def test_leakage_counts(spark):
    split = dt.datetime(2024, 1, 16)
    rows = [
        # user 1: both sides -> leaked
        (1, 1, split - dt.timedelta(days=1), "click", 1.0),
        (2, 1, split + dt.timedelta(days=1), "click", 1.0),
        # user 2: train only
        (3, 2, split - dt.timedelta(days=2), "click", 1.0),
        # user 3: test only
        (4, 3, split + dt.timedelta(days=2), "click", 1.0),
        # boundary: ts == split counts as TEST (>=)
        (5, 4, split, "view", 1.0),
    ]
    d = _write_events(spark, rows)
    out = {
        r["event_type"]: r for r in q_temporal_split_leakage(spark, d).collect()
    }
    c = out["click"]
    assert (c["n_train_users"], c["n_test_users"], c["n_leaked_users"]) == (
        2,
        2,
        1,
    )
    assert c["leaked_test_ppm"] == 500_000
    v = out["view"]
    assert (v["n_train_users"], v["n_test_users"], v["n_leaked_users"]) == (
        0,
        1,
        0,
    )
