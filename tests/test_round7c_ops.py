"""Property tests for the round-7c batch: bucketed interval join,
join-view IVM, Holt smoothing, debounce, YoY growth. DuckDB value
parity is covered by tests/test_oracle_queries.py; these pin what the
oracle can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_bucketed_range_join_equals_broadcast_path(spark):
    """The bucketized equi-join formulation returns exactly the
    broadcast non-equi join's rows on the same inputs — the scale path
    changes the plan, never the answer."""
    from clickhouse_table_copier_spark.operators.temporal_joins import (
        range_join,
        range_join_bucketed,
    )
    from clickhouse_table_copier_spark.queries import _events

    ev = _events(spark, SF_ORACLE)
    windows = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("s"),
        (
            F.timestamp_micros(
                F.unix_micros(F.col("ts").cast("timestamp")) + 7_200_000_000
            ).cast("timestamp_ntz")
        ).alias("e"),
    )
    probe = ev.select("user_id", "ts", "event_id")
    a = range_join_bucketed(
        probe, windows, key="user_id", time_col="ts",
        start_col="s", end_col="e", bucket_s=3600,
    ).select("event_id", "win_id")
    b = range_join(
        probe, windows, key="user_id", time_col="ts",
        start_col="s", end_col="e",
    ).select("event_id", "win_id")
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0


def test_bucketed_range_join_boundary_buckets(spark):
    """Constructed boundary cases: an interval ending EXACTLY on a
    bucket edge must not claim that bucket; a probe on the interval
    start is included, on the end excluded."""
    from clickhouse_table_copier_spark.operators.temporal_joins import (
        range_join_bucketed,
    )

    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1),  # == start → in
            (1, "2024-01-01 11:59:59", 2),  # inside last bucket → in
            (1, "2024-01-01 12:00:00", 3),  # == end → out
        ],
        "k long, ts string, pid long",
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"), "pid")
    iv = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "2024-01-01 12:00:00", 77)],
        "k long, s string, e string, wid long",
    ).select(
        "k",
        F.col("s").cast("timestamp_ntz").alias("s"),
        F.col("e").cast("timestamp_ntz").alias("e"),
        "wid",
    )
    got = sorted(
        r["pid"]
        for r in range_join_bucketed(
            left, iv, key="k", time_col="ts", start_col="s", end_col="e",
            bucket_s=3600,
        ).collect()
    )
    assert got == [1, 2]


def test_incremental_join_delta_algebra(spark):
    """Union-of-three-deltas == full recompute minus old view, row for
    row (the oracle proves values; this pins the set algebra on the
    DataFrame side including duplicate-freeness)."""
    from clickhouse_table_copier_spark.queries_round7c import (
        q_incremental_join_delta,
    )

    delta = q_incremental_join_delta(spark, SF_ORACLE)
    rows = delta.collect()
    assert len(rows) == delta.select("o_orderkey").distinct().count(), (
        "order keys must be unique in the delta — join keys are unique "
        "per side, so no multiplicity may appear"
    )
    # every delta row involves a delta-side key
    bad = delta.where(
        (F.col("o_orderkey") % 20 != 0) & (F.col("o_custkey") % 10 != 0)
    ).count()
    assert bad == 0


def test_holt_reduces_to_ewma_when_beta_zero_single_point(spark):
    """Algebraic anchors: a single observation yields level = x,
    trend = 0, forecast = x; a linear series x_t = c + d·t is tracked
    with the forecast converging toward the next point."""
    from clickhouse_table_copier_spark.queries_round7c import (
        _HOLT_ALPHA,
        _HOLT_BETA,
    )

    # driver-side reference fold
    def holt(xs):
        l, b = xs[0], 0.0
        for x in xs[1:]:
            nl = _HOLT_ALPHA * x + (1 - _HOLT_ALPHA) * (l + b)
            b = _HOLT_BETA * (nl - l) + (1 - _HOLT_BETA) * b
            l = nl
        return l, b

    from clickhouse_table_copier_spark.queries_round7c import (
        q_holt_linear_trend,
    )
    from clickhouse_table_copier_spark.queries import _events

    got = {
        r["user_id"]: (r["n_events"], r["level"], r["trend"])
        for r in q_holt_linear_trend(spark, SF_ORACLE).collect()
    }
    ev = (
        _events(spark, SF_ORACLE)
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        series.setdefault(r["user_id"], []).append(r["value"])
    for uid, xs in series.items():
        n, level, trend = got[uid]
        assert n == len(xs)
        rl, rb = holt(xs)
        assert level == rl and trend == rb, uid


def test_event_debounce_suppresses_planted_burst(spark, tmp_path):
    """A planted 5-event burst (10 s apart) collapses to its first
    event with n_suppressed = 4; an isolated later event survives as
    its own chain."""
    from clickhouse_table_copier_spark.queries_round7c import q_event_debounce

    rows = [
        (i, f"2024-01-01 00:00:{i * 10:02d}", 7, "click", 1.0, "{}")
        for i in range(5)
    ] + [(99, "2024-01-01 01:00:00", 7, "click", 1.0, "{}")]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).write.parquet(f"{sf}/events.parquet")
    got = sorted(
        (r["kept_event_id"], r["n_suppressed"])
        for r in q_event_debounce(spark, sf).collect()
    )
    assert got == [(0, 4), (99, 0)]


def test_yoy_growth_gap_aware(spark):
    """Growth is emitted only when the immediately prior calendar year
    exists for that nation; first years are NULL."""
    from clickhouse_table_copier_spark.queries_round7c import (
        q_yoy_nation_growth,
    )

    rows = q_yoy_nation_growth(spark, SF_ORACLE).collect()
    by_nation: dict = {}
    for r in sorted(rows, key=lambda r: (r["nation"], r["yr"])):
        by_nation.setdefault(r["nation"], []).append(r)
    assert len(by_nation) > 0
    for nation, rs in by_nation.items():
        assert rs[0]["yoy_growth"] is None  # no prior year
        for prev, cur in zip(rs, rs[1:]):
            if cur["yr"] == prev["yr"] + 1:
                assert cur["yoy_growth"] == pytest.approx(
                    cur["revenue"] / prev["revenue"]
                )
            else:
                assert cur["yoy_growth"] is None
