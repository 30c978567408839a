"""Query batch: round-7c — the bucketed interval-join scale path,
incremental view maintenance for joins, a two-parameter forecasting
fold, burst debouncing, and a year-over-year reporting shape.

- ``bucketed_interval_attribution`` — the fact-×-fact interval join via
  ``operators/temporal_joins.range_join_bucketed``: intervals explode
  into covered time buckets, containment becomes an equi-join — the
  shape that survives when BOTH sides are too big to broadcast.
- ``incremental_join_delta`` — incremental view maintenance for a join
  view: Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, value-proven against the
  full-recompute set difference (the join-side complement of
  incremental_rollup_merge's aggregate IVM).
- ``holt_linear_trend`` — per-key Holt's linear (level + trend) double
  exponential smoothing as an ordered struct fold; exact binary α, β so
  both engines run the identical correctly-rounded float recurrence.
- ``event_debounce`` — burst collapse: keep the first event of every
  ≤N-second same-(user, type) chain, with the suppressed count — the
  retry/double-click cleaner that runs before any funnel analysis.
- ``yoy_nation_growth`` — revenue per (nation, year) with year-over-year
  growth via lag, gap-aware (a missing prior year yields NULL, never the
  ratio to an older year).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _events, _t, register


# ---------------------------------------------------------------------------
# Fact-×-fact interval join, bucketized: each purchase opens a 2-hour
# attribution window; every same-user event inside any window counts
# toward it. Both sides are SF-linear (event-scale), so the broadcast
# range join is off the table at 100 TB — range_join_bucketed turns the
# containment into an equi-join on (user, hour-bucket) with a ≤3-row
# fan-out per interval (2 h / 1 h buckets). Each pair meets in exactly
# one bucket, so the aggregate needs no dedup. Value sums decimal-exact.
# ---------------------------------------------------------------------------
_ATTR_WINDOW_S = 7200


@register(
    "bucketed_interval_attribution",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM p JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >= p.ts
     AND e.ts < p.ts + INTERVAL {_ATTR_WINDOW_S} SECOND
    GROUP BY 1
    """,
)
def q_bucketed_interval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.temporal_joins import (
        range_join_bucketed,
    )

    ev = _events(spark, sf_dir)
    windows = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("win_start"),
        (
            F.timestamp_micros(
                F.unix_micros(F.col("ts").cast("timestamp"))
                + _ATTR_WINDOW_S * 1_000_000
            ).cast("timestamp_ntz")
        ).alias("win_end"),
    )
    probe = ev.select("user_id", "ts", F.col("value").alias("v"))
    joined = range_join_bucketed(
        probe,
        windows,
        key="user_id",
        time_col="ts",
        start_col="win_start",
        end_col="win_end",
        bucket_s=3600,
    )
    return joined.groupBy(F.col("win_id").alias("event_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance for a JOIN view: the enriched
# orders⋈customer view is already materialized for snapshot (A, B);
# deltas ΔA (new orders) and ΔB (new customers) arrive. The delta of
# the view is computed WITHOUT rescanning A⋈B:
#     Δ(A⋈B) = ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB
# — three joins each bounded by a delta side, the reason nightly
# pipelines can maintain 100 TB join views at delta cost. The oracle is
# the definitional spec: full recompute on the updated snapshots minus
# the old view (EXCEPT ALL), so a green hash PROVES the algebra. Join
# keys are unique per side, so set semantics are safe.
# ---------------------------------------------------------------------------
@register(
    "incremental_join_delta",
    oracle="""
    WITH a AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
               WHERE o_orderkey % 20 != 0),
    da AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           WHERE o_orderkey % 20 = 0),
    b AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 10 != 0),
    db AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 10 = 0),
    old_view AS (
      SELECT o_orderkey, a.o_custkey, c_name, o_totalprice
      FROM a JOIN b ON a.o_custkey = b.c_custkey
    ),
    new_view AS (
      SELECT o_orderkey, n.o_custkey, c_name, o_totalprice
      FROM (SELECT * FROM a UNION ALL SELECT * FROM da) n
      JOIN (SELECT * FROM b UNION ALL SELECT * FROM db) m
        ON n.o_custkey = m.c_custkey
    )
    SELECT o_orderkey, o_custkey, c_name,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM (SELECT * FROM new_view EXCEPT ALL SELECT * FROM old_view)
    """,
)
def q_incremental_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a = orders.where(F.col("o_orderkey") % 20 != 0)
    da = orders.where(F.col("o_orderkey") % 20 == 0)
    b = cust.where(F.col("c_custkey") % 10 != 0)
    db = cust.where(F.col("c_custkey") % 10 == 0)

    def view(o, c):
        return o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "o_custkey", "c_name", "o_totalprice"
        )

    delta = view(da, b).unionAll(view(a, db)).unionAll(view(da, db))
    return delta.select(
        "o_orderkey",
        "o_custkey",
        "c_name",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )


# ---------------------------------------------------------------------------
# Holt's linear (double exponential) smoothing per user: level+trend
# recurrence  l ← α·x + (1−α)(l + b),  b ← β(l − l_prev) + (1−β)·b,
# seeded l₀ = x₀, b₀ = 0 — the next step up from the EWMA fold and the
# per-series forecasting primitive (one-step-ahead forecast = l + b).
# α = 0.5 and β = 0.25 are exact binary fractions; both engines fold the
# same (ts, event_id)-ordered list with the same correctly-rounded float
# ops, so the doubles match bit-for-bit (the ewma_user_value argument,
# extended to a struct accumulator). State per key is two doubles — at
# 100 TB this is one grouped fold, partitioned by key.
# ---------------------------------------------------------------------------
_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.25


# Oracle note: the natural list_reduce-with-struct-accumulator
# formulation is NOT usable — DuckDB evaluates the result-struct's
# fields sequentially, so the second field's expression observes the
# FIRST field's already-updated accumulator value (verified: a 3-step
# Holt fold diverges from the functional recurrence at step 2). The
# recursive CTE below is purely functional per step and matches the
# driver-side reference fold exactly.
@register(
    "holt_linear_trend",
    oracle=f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, CAST(value AS DOUBLE) AS x,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    n AS (SELECT user_id, count(*) AS n_events FROM seq GROUP BY 1),
    rec AS (
      SELECT user_id, rn, x AS l, CAST(0.0 AS DOUBLE) AS b
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn,
             {_HOLT_ALPHA} * s.x + {1 - _HOLT_ALPHA} * (r.l + r.b),
             {_HOLT_BETA} * (({_HOLT_ALPHA} * s.x
               + {1 - _HOLT_ALPHA} * (r.l + r.b)) - r.l)
               + {1 - _HOLT_BETA} * r.b
      FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT r.user_id, n.n_events, r.l AS level, r.b AS trend,
           r.l + r.b AS forecast_next
    FROM rec r JOIN n ON r.user_id = n.user_id AND r.rn = n.n_events
    """,
)
def q_holt_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, bta = _HOLT_ALPHA, _HOLT_BETA
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    def step(acc, x):
        new_l = (
            F.lit(a) * x["value"]
            + F.lit(1 - a) * (acc["l"] + acc["b"])
        )
        new_b = (
            F.lit(bta) * (new_l - acc["l"]) + F.lit(1 - bta) * acc["b"]
        )
        return F.struct(
            F.lit(True).alias("init"),
            F.when(acc["init"], new_l).otherwise(x["value"]).alias("l"),
            F.when(acc["init"], new_b).otherwise(F.lit(0.0)).alias("b"),
        )

    fold = F.aggregate(
        arr,
        F.struct(
            F.lit(False).alias("init"),
            F.lit(0.0).alias("l"),
            F.lit(0.0).alias("b"),
        ),
        step,
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        fold["l"].alias("level"),
        fold["b"].alias("trend"),
        (fold["l"] + fold["b"]).alias("forecast_next"),
    )


# ---------------------------------------------------------------------------
# Event debounce: collapse same-(user, type) bursts — an event survives
# only as the FIRST of its chain, where a chain links events ≤ N seconds
# after the previous raw event (double-clicks, retry storms, sensor
# chatter). Gaps-and-islands: lag → new-chain flag → prefix-sum chain
# id (window PARTITIONED by (user, type), never global), keep rank-1
# with the suppressed count. Chain ids count µs-exactly.
# ---------------------------------------------------------------------------
_DEBOUNCE_GAP_S = 120


@register(
    "event_debounce",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {_DEBOUNCE_GAP_S}::BIGINT * 1000000
                  THEN 1 ELSE 0 END AS new_chain
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    ),
    chains AS (
      SELECT *, sum(new_chain) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chain_id
      FROM flagged
    )
    SELECT user_id, event_type,
           min(event_id) FILTER (WHERE rn = 1) AS kept_event_id,
           min(ts) AS chain_start,
           CAST(count(*) - 1 AS BIGINT) AS n_suppressed
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY user_id, event_type, chain_id
               ORDER BY ts, event_id) AS rn
      FROM chains
    )
    GROUP BY user_id, event_type, chain_id
    """,
)
def q_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_chain = F.when(
        prev_us.isNull() | (us - prev_us > _DEBOUNCE_GAP_S * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chains = ev.withColumn("new_chain", new_chain).withColumn(
        "chain_id", F.sum("new_chain").over(wsum)
    )
    wchain = Window.partitionBy("user_id", "event_type", "chain_id").orderBy(
        "ts", "event_id"
    )
    return (
        chains.withColumn("rn", F.row_number().over(wchain))
        .groupBy("user_id", "event_type", "chain_id")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("event_id"))).alias(
                "kept_event_id"
            ),
            F.min("ts").alias("chain_start"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_suppressed"),
        )
        .drop("chain_id")
    )


# ---------------------------------------------------------------------------
# Year-over-year growth per nation: the reporting staple. Revenue is
# exact decimal per (nation, year); growth = this year / prior year as
# ONE double division of two exact decimals — and only when the prior
# calendar year actually exists (lag is gap-aware: a nation silent in
# 1995 gets NULL for 1996, never the ratio to 1994). Window partitioned
# by nation over the (nation, year) AGGREGATE frame — dimension-bounded
# rows at any data scale.
# ---------------------------------------------------------------------------
@register(
    "yoy_nation_growth",
    oracle="""
    WITH rev AS (
      SELECT n_name AS nation,
             CAST(year(o.o_orderdate) AS INT) AS yr,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT nation, yr,
           CAST(rev AS DOUBLE) AS revenue,
           CASE WHEN lag(yr) OVER w = yr - 1
                THEN CAST(CAST(rev AS DOUBLE) /
                          CAST(lag(rev) OVER w AS DOUBLE) AS DOUBLE)
           END AS yoy_growth
    FROM rev
    WINDOW w AS (PARTITION BY nation ORDER BY yr)
    """,
)
def q_yoy_nation_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = Window.partitionBy("nation").orderBy("yr")
    return rev.select(
        "nation",
        "yr",
        F.col("rev").cast("double").alias("revenue"),
        F.when(
            F.lag("yr").over(w) == F.col("yr") - 1,
            F.col("rev").cast("double") / F.lag("rev").over(w).cast("double"),
        ).alias("yoy_growth"),
    )
