"""Round-8b query batch: ClickHouse-dialect funnel parity and exact
weighted quantiles.

- ``window_funnel_anchors`` — true ClickHouse ``windowFunnel`` anchor
  semantics: the funnel depth is maximized over EVERY step-1 event as a
  candidate anchor, not just the user's first one (``event_funnel``
  keeps the min-t1 anchoring; an early dead view must not mask a later
  converting chain).  Greedy earliest-next chaining is optimal per
  anchor (a later step-2 match only shrinks the step-3 candidate set),
  so the whole operator is two FORWARD as-of joins
  (:func:`operators.temporal_joins.asof_join_forward` — union-window,
  one shuffle per step, no join node) plus window-bound checks.
- ``weighted_price_quantiles`` — exact weighted p25/50/75 of line price
  (cents) weighted by quantity per return flag, via
  :func:`operators.ranks.weighted_quantiles`: sketch-partitioned
  buckets, integer rational thresholds (``den·cumw ≥ num·W``), only
  target buckets flow into the cumulative window.  The weighted twin of
  the equi-depth design — no global sort, no float thresholds.

Reference parity note: the Go reference executes no relational
computation itself (`database/database.go` generates metadata SQL
only); both queries are the engine's analytics superset, the funnel one
specifically mirroring the ClickHouse dialect surface the reference's
ecosystem assumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register

_FUNNEL_W_HOURS = 48
_WF_STEPS = ("view", "click", "purchase")


@register(
    "window_funnel_anchors",
    oracle=f"""
    WITH a AS (
      SELECT user_id, event_id, ts AS t1
      FROM events WHERE event_type = '{_WF_STEPS[0]}'
    ),
    n2 AS (
      SELECT a.user_id, a.event_id, a.t1, min(e.ts) AS t2
      FROM a LEFT JOIN events e
        ON e.user_id = a.user_id AND e.event_type = '{_WF_STEPS[1]}'
       AND e.ts > a.t1
      GROUP BY 1, 2, 3
    ),
    n3 AS (
      SELECT n2.user_id, n2.event_id, n2.t1, n2.t2, min(p.ts) AS t3
      FROM n2 LEFT JOIN events p
        ON p.user_id = n2.user_id AND p.event_type = '{_WF_STEPS[2]}'
       AND p.ts > n2.t2
      GROUP BY 1, 2, 3, 4
    ),
    d AS (
      SELECT user_id,
             CASE
               WHEN t2 IS NOT NULL
                AND t2 <= t1 + INTERVAL {_FUNNEL_W_HOURS} HOUR
                AND t3 IS NOT NULL
                AND t3 <= t1 + INTERVAL {_FUNNEL_W_HOURS} HOUR THEN 3
               WHEN t2 IS NOT NULL
                AND t2 <= t1 + INTERVAL {_FUNNEL_W_HOURS} HOUR THEN 2
               ELSE 1
             END AS depth
      FROM n3
    ),
    m AS (SELECT user_id, max(depth) AS md FROM d GROUP BY 1)
    SELECT CAST(md AS INT) AS depth, CAST(count(*) AS BIGINT) AS n_users
    FROM m GROUP BY 1
    """,
)
def q_window_funnel_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel({_FUNNEL_W_HOURS}h)('view','click',
    'purchase')`` anchor-max semantics: per user, the deepest strict
    chain t1 < t2 < t3 with every step inside t1's window, maximized
    over ALL view anchors.  Two forward as-of joins (one user_id shuffle
    each) replace the per-anchor correlated-min the oracle spells out;
    at 100 TB the cost stays sort-within-user-key, with no pair fan-out
    even for users with thousands of anchors."""
    from clickhouse_table_copier_spark.operators.temporal_joins import (
        asof_join_forward,
    )

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    anchors = ev.where(F.col("event_type") == _WF_STEPS[0]).select(
        "user_id", "ts", "event_id"
    )
    step2 = ev.where(F.col("event_type") == _WF_STEPS[1]).select("user_id", "ts")
    step3 = ev.where(F.col("event_type") == _WF_STEPS[2]).select("user_id", "ts")

    a2 = asof_join_forward(anchors, step2, "user_id", "ts").select(
        "user_id",
        F.col("ts").alias("t1"),
        "event_id",
        F.col("__next_t").alias("t2"),
    )
    a3 = asof_join_forward(
        a2.select("user_id", F.col("t2").alias("ts"), "event_id", "t1"),
        step3,
        "user_id",
        "ts",
    ).select(
        "user_id", "t1", F.col("ts").alias("t2"), F.col("__next_t").alias("t3")
    )
    win = F.expr(f"INTERVAL {_FUNNEL_W_HOURS} HOURS")
    in2 = F.col("t2").isNotNull() & (F.col("t2") <= F.col("t1") + win)
    in3 = in2 & F.col("t3").isNotNull() & (F.col("t3") <= F.col("t1") + win)
    depth = F.when(in3, F.lit(3)).when(in2, F.lit(2)).otherwise(F.lit(1))
    return (
        a3.select("user_id", depth.alias("depth"))
        .groupBy("user_id")
        .agg(F.max("depth").alias("md"))
        .groupBy(F.col("md").cast("int").alias("depth"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


@register(
    "weighted_price_quantiles",
    oracle="""
    WITH vw AS (
      SELECT l_returnflag AS g,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT g, v,
             sum(w) OVER (PARTITION BY g ORDER BY v) AS cum,
             sum(w) OVER (PARTITION BY g) AS tot
      FROM vw
    )
    SELECT g AS l_returnflag,
           CAST(min(CASE WHEN 4 * cum >= 1 * tot THEN v END) AS BIGINT)
             AS p25_cents,
           CAST(min(CASE WHEN 2 * cum >= 1 * tot THEN v END) AS BIGINT)
             AS p50_cents,
           CAST(min(CASE WHEN 4 * cum >= 3 * tot THEN v END) AS BIGINT)
             AS p75_cents
    FROM c GROUP BY 1
    """,
)
def q_weighted_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted price quantiles per return flag: smallest
    price with den·(cumulative weight) ≥ num·(total weight) — all
    integer comparisons, so bit-identical to the oracle's cumulative
    window.  The oracle sorts each flag's whole value set through one
    window; :func:`operators.ranks.weighted_quantiles` gets the same
    answer with sketch-partitioned buckets and a window over ONLY the
    ≤|groups|·|quantiles| target buckets (≈ n/32 rows per task)."""
    from clickhouse_table_copier_spark.operators.ranks import weighted_quantiles

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("price_cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    out = weighted_quantiles(
        li,
        "l_returnflag",
        "price_cents",
        "qty",
        quantiles=[("p25_cents", 1, 4), ("p50_cents", 1, 2), ("p75_cents", 3, 4)],
    )
    return out.select(
        "l_returnflag",
        F.col("p25_cents").cast("bigint"),
        F.col("p50_cents").cast("bigint"),
        F.col("p75_cents").cast("bigint"),
    )
