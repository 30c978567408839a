"""Round-8g query batch: ClickHouse AGGREGATE-function dialect parity.

The scalar dialect surface (``functions/ch_dialect.py``) covers the
toX/bit/array/date staples; this batch adds the two behavioral
aggregate families a ClickHouse user reaches for in event analytics,
re-expressed Spark-first:

- ``ch_retention_agg`` — ClickHouse ``retention(cond1, …, condN)``
  semantics: per user an array of flags where r[0] = cond1 fired and
  r[i] = cond1 AND cond(i+1) fired (any order — retention is
  membership, not sequence), summed over users into the funnel-style
  retention counts dashboard tiles divide.  One grouped
  flag-aggregation per level — the flags ARE the distinct sets.
- ``ch_sequence_match`` — ClickHouse
  ``sequenceMatch('(?1).*(?2).*(?3)')(ts, c1, c2, c3)`` existence
  semantics: did the user emit a view, LATER a click, LATER a purchase
  (no window bound, gaps allowed)?  Greedy earliest-chaining is
  optimal for unconstrained patterns (taking the EARLIEST next step
  only enlarges what can follow), so the operator is the per-user
  earliest anchor + two forward as-of joins — one user_id shuffle per
  step, never a pair fan-out — while the oracle spells out the
  correlated-min formulation.

Reference parity note: the Go reference's ecosystem assumes the
ClickHouse dialect these aggregates come from (its generated SQL runs
on ClickHouse — ``database/database.go``); the engine executes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _events, register

_RET_STEPS = ("signup", "view", "purchase")


@register(
    "ch_retention_agg",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = '{_RET_STEPS[0]}' THEN 1 ELSE 0 END)
               AS c1,
             max(CASE WHEN event_type = '{_RET_STEPS[1]}' THEN 1 ELSE 0 END)
               AS c2,
             max(CASE WHEN event_type = '{_RET_STEPS[2]}' THEN 1 ELSE 0 END)
               AS c3
      FROM events GROUP BY 1
    )
    SELECT CAST(sum(c1) AS BIGINT) AS r1,
           CAST(sum(c1 * c2) AS BIGINT) AS r2,
           CAST(sum(c1 * c3) AS BIGINT) AS r3,
           CAST(count(*) AS BIGINT) AS n_users
    FROM u
    """,
)
def q_ch_retention_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention('signup','view','purchase')`` summed over
    users: r1 = users with a signup, r[i] = users with a signup AND
    step i (membership, not order — the CH aggregate's documented
    semantics).  Two map-side-combinable grouped flag-aggregations;
    no distinct-count shuffle at any SF."""
    ev = _events(spark, sf_dir)
    flags = [
        F.max(
            F.when(F.col("event_type") == step, 1).otherwise(0)
        ).alias(f"c{i + 1}")
        for i, step in enumerate(_RET_STEPS)
    ]
    u = ev.groupBy("user_id").agg(*flags)
    return u.agg(
        F.sum("c1").cast("bigint").alias("r1"),
        F.sum(F.col("c1") * F.col("c2")).cast("bigint").alias("r2"),
        F.sum(F.col("c1") * F.col("c3")).cast("bigint").alias("r3"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )


_SEQ_STEPS = ("view", "click", "purchase")


@register(
    "ch_sequence_match",
    oracle=f"""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = '{_SEQ_STEPS[0]}' GROUP BY 1
    ),
    t2 AS (
      SELECT t1.user_id, t1.t1, min(e.ts) AS t2
      FROM t1 JOIN events e
        ON e.user_id = t1.user_id AND e.event_type = '{_SEQ_STEPS[1]}'
       AND e.ts > t1.t1
      GROUP BY 1, 2
    ),
    t3 AS (
      SELECT t2.user_id, min(e.ts) AS t3
      FROM t2 JOIN events e
        ON e.user_id = t2.user_id AND e.event_type = '{_SEQ_STEPS[2]}'
       AND e.ts > t2.t2
      GROUP BY 1
    ),
    au AS (SELECT count(DISTINCT user_id) AS n_users FROM events)
    SELECT CAST((SELECT count(*) FROM t3) AS BIGINT) AS n_matched,
           CAST(au.n_users AS BIGINT) AS n_users,
           CAST((SELECT count(*) FROM t3) * 1000000 // au.n_users AS BIGINT)
             AS matched_ppm
    FROM au
    """,
)
def q_ch_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2).*(?3)')`` existence: a
    strictly-ordered view → click → purchase chain with unbounded gaps.
    Greedy earliest-chaining from each user's FIRST view is optimal for
    an unconstrained pattern (an earlier step choice can only enlarge
    the suffix of candidate matches), so existence needs ONE anchor per
    user and two forward as-of joins — union-window plan, one user_id
    shuffle per step, no join node — where the oracle runs two
    correlated-min joins."""
    from clickhouse_table_copier_spark.operators.temporal_joins import (
        asof_join_forward,
    )

    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    anchors = (
        ev.where(F.col("event_type") == _SEQ_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts"))
    )
    step2 = ev.where(F.col("event_type") == _SEQ_STEPS[1]).select(
        "user_id", "ts"
    )
    step3 = ev.where(F.col("event_type") == _SEQ_STEPS[2]).select(
        "user_id", "ts"
    )
    a2 = asof_join_forward(anchors, step2, "user_id", "ts").select(
        "user_id", F.col("__next_t").alias("ts")
    ).where(F.col("ts").isNotNull())
    a3 = (
        asof_join_forward(a2, step3, "user_id", "ts")
        .where(F.col("__next_t").isNotNull())
        .select("user_id", F.lit(1).alias("m"))
    )
    # per-user matched flag (a3 has <= 1 row per user: anchors are
    # grouped) equi-joined onto the user roster — both sides arrive
    # user_id-partitioned from their aggregations, and the final count
    # is ONE aggregate, so no single-row scalar join exists for
    # Catalyst to degrade to a nested loop.  NOT broadcast: at scale
    # the matched set is user-cardinality, not metadata-sized.
    u = ev.groupBy("user_id").agg(F.lit(1).alias("one"))
    return (
        u.join(a3, "user_id", "left")
        .agg(
            F.sum(F.coalesce(F.col("m"), F.lit(0)))
            .cast("bigint")
            .alias("n_matched"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )
        .select(
            "n_matched",
            "n_users",
            F.expr(
                "CAST(n_matched * 1000000 div n_users AS BIGINT)"
            ).alias("matched_ppm"),
        )
    )
