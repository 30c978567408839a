"""Round-8f query batch: time-series and cohort-test exactness ops.

Three more evaluation/monitoring operators, every statistic exact
integer or a single deterministic IEEE division (no cross-engine
``ln``/libm surface — the chi²-not-KL precedent):

- ``daily_autocorr`` — exact autocorrelation of the daily revenue
  series at lags 1..7: deviations are scaled by n (``n·x_t − S`` is an
  integer), so numerator and denominator are exact integer sums and
  the ACF itself is ONE double division per lag.  The sequencing
  primitive behind seasonality/trend sanity checks on metric streams.
- ``mannwhitney_u_cohorts`` — exact two-sample Mann–Whitney rank-sum
  statistic (midrank tie handling, doubled to stay integer) between
  even/odd user cohorts per event type, from the same tie-collapsed
  value domain the KS query uses; plus the common-language effect size
  in exact ppm.  The distribution-free A/B location test.
- ``temporal_split_leakage`` — train/test temporal-split audit: per
  event type, how many users are active on BOTH sides of the split
  (identity leakage a time-based split must surface before training).

Reference parity note: the Go reference executes no relational
computation itself (``database/database.go`` generates metadata SQL
only); this batch is the engine's analytics superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _events, register

# ---------------------------------------------------------------------------
# daily_autocorr
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7


@register(
    "daily_autocorr",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) // 100 AS BIGINT)
               AS x
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT day, x,
             CAST(count(*) OVER () AS BIGINT) AS n,
             CAST(sum(x) OVER () AS BIGINT) AS sx,
             row_number() OVER (ORDER BY day) AS i
      FROM d
    ),
    dev AS (SELECT i, n, (n * x - sx) AS e FROM s),
    lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS lag),
    num AS (
      SELECT l.lag,
             CAST(sum(a.e * b.e) AS BIGINT) AS num
      FROM lags l
      JOIN dev a ON TRUE
      JOIN dev b ON b.i = a.i + l.lag
      GROUP BY 1
    ),
    den AS (SELECT CAST(sum(e * e) AS BIGINT) AS den FROM dev)
    SELECT CAST(num.lag AS INT) AS lag, num.num AS num, den.den AS den,
           CAST(num.num AS DOUBLE) / nullif(den.den, 0) AS acf
    FROM num, den
    ORDER BY lag
    """,
)
def q_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ACF of daily revenue (whole dollars) at lags 1..{_ACF_MAX_LAG}:
    with S = Σx and n days, ``n·x_t − S`` is an exact integer deviation,
    so num_k = Σ(n·x_t−S)(n·x_{{t+k}}−S) and den = Σ(n·x_t−S)² are exact
    bigints and acf = num/den is one deterministic IEEE division.  The
    daily aggregate is the only SF-linear stage; the series itself is
    CALENDAR-bounded (here 30 rows), so the lag self-join is
    metadata-sized at any SF.  Dollars (not cents) keep n²·x² inside
    bigint through ~sf1; widen to decimal(38,0)/HUGEINT beyond."""
    d = (
        _events(spark, sf_dir)
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.expr(
                "CAST(sum(CAST(round(value * 100) AS BIGINT)) div 100"
                " AS BIGINT)"
            ).alias("x")
        )
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    s = d.select(
        "day",
        "x",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.row_number().over(Window.orderBy("day")).alias("i"),
    )
    # calendar-bounded frame: persist so the lag expansion + denominator
    # replay a ~30-row cache, not the events scan
    dev = s.select(
        "i", (F.col("n") * F.col("x") - F.col("sx")).alias("e")
    ).persist()
    # lag expansion by EXPLODE (never a lags×series nested-loop join):
    # each row emits a (lag, partner-index) probe per lag 0..MAX, then
    # ONE equi-join on the partner index.  Lag 0 pairs each row with
    # itself, so its "autocovariance" IS the denominator Σe² — one
    # grouped agg yields numerators AND denominator, no second join.
    lagged = dev.select(
        F.explode(F.expr(f"sequence(0, {_ACF_MAX_LAG})")).alias("lag"),
        (F.col("i") + F.col("lag")).alias("j"),
        F.col("e").alias("ea"),
    )
    cov = (
        lagged.join(
            dev.select(F.col("i").alias("j"), F.col("e").alias("eb")), "j"
        )
        .groupBy("lag")
        .agg(F.sum(F.col("ea") * F.col("eb")).cast("bigint").alias("num"))
    )
    # bounded window: cov has exactly MAX_LAG+1 grouped rows at any SF
    wall = Window.partitionBy()
    return (
        cov.withColumn(
            "den",
            F.max(F.when(F.col("lag") == 0, F.col("num"))).over(wall),
        )
        .where(F.col("lag") > 0)
        .select(
            F.col("lag").cast("int"),
            "num",
            "den",
            # nullif guards the degenerate constant series (den = 0):
            # double /0 is engine-dependent (Inf/NaN/NULL), NULL is not
            F.expr("CAST(num AS DOUBLE) / nullif(den, 0)").alias("acf"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# mannwhitney_u_cohorts
# ---------------------------------------------------------------------------


@register(
    "mannwhitney_u_cohorts",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS in_a
      FROM events
    ),
    g AS (
      SELECT event_type, v, CAST(sum(in_a) AS BIGINT) AS a_n,
             CAST(sum(1 - in_a) AS BIGINT) AS b_n
      FROM e GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, a_n, b_n,
             sum(b_n) OVER (PARTITION BY event_type ORDER BY v)
               - b_n AS cb_before,
             sum(a_n) OVER (PARTITION BY event_type) AS na,
             sum(b_n) OVER (PARTITION BY event_type) AS nb
      FROM g
    )
    SELECT event_type,
           CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b,
           CAST(sum(2 * a_n * cb_before + a_n * b_n) AS BIGINT) AS u2,
           CAST(sum(2 * a_n * cb_before + a_n * b_n) * 1000000
                // (2 * max(na) * max(nb)) AS BIGINT) AS cles_ppm
    FROM c GROUP BY 1
    """,
)
def q_mannwhitney_u_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann–Whitney U between even/odd user cohorts per event
    type: U_A = Σ_pairs [a>b] + ½[a=b], doubled (u2 = 2·U_A) so midrank
    ties stay integer — per collapsed value v the contribution is
    2·a_n·(#b below) + a_n·b_n.  Same tie-collapsed value-domain frame
    as ks_cohort_distance: the cumulative window runs over ≤ types·50k
    cent rows regardless of SF.  cles_ppm = U_A/(n_A·n_B) in exact ppm
    is the common-language effect size (500000 = no location shift)."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("in_a"),
    )
    g = ev.groupBy("event_type", "v").agg(
        F.sum("in_a").cast("bigint").alias("a_n"),
        F.sum(1 - F.col("in_a")).cast("bigint").alias("b_n"),
    )
    wt = Window.partitionBy("event_type")
    wc = wt.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        "event_type",
        "a_n",
        "b_n",
        (F.sum("b_n").over(wc) - F.col("b_n")).alias("cb_before"),
        F.sum("a_n").over(wt).alias("na"),
        F.sum("b_n").over(wt).alias("nb"),
    )
    return c.groupBy("event_type").agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        F.sum(
            2 * F.col("a_n") * F.col("cb_before") + F.col("a_n") * F.col("b_n")
        )
        .cast("bigint")
        .alias("u2"),
        F.expr(
            "CAST(sum(2 * a_n * cb_before + a_n * b_n) * 1000000"
            " div (2 * max(na) * max(nb)) AS BIGINT)"
        ).alias("cles_ppm"),
    )


# ---------------------------------------------------------------------------
# temporal_split_leakage
# ---------------------------------------------------------------------------

_SPLIT_TS = "2024-01-16 00:00:00"


@register(
    "temporal_split_leakage",
    oracle=f"""
    WITH u AS (
      SELECT event_type, user_id,
             max(CASE WHEN ts < TIMESTAMP '{_SPLIT_TS}' THEN 1 ELSE 0 END)
               AS in_train,
             max(CASE WHEN ts >= TIMESTAMP '{_SPLIT_TS}' THEN 1 ELSE 0 END)
               AS in_test
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(sum(in_train) AS BIGINT) AS n_train_users,
           CAST(sum(in_test) AS BIGINT) AS n_test_users,
           CAST(sum(in_train * in_test) AS BIGINT) AS n_leaked_users,
           CAST(sum(in_train * in_test) * 1000000
                // greatest(sum(in_test), 1) AS BIGINT) AS leaked_test_ppm
    FROM u GROUP BY 1
    """,
)
def q_temporal_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split audit: a user active on both sides of
    the split leaks identity signal from train into test — the standard
    pre-training gate for time-split evaluation.  One grouped
    flag-aggregation to (type, user), one grouped sum to type — both
    map-side-combinable; no distinct-count shuffle (the flags ARE the
    distinct sets).  Exact integer ppm of test users leaked."""
    ev = _events(spark, sf_dir)
    split = F.lit(_SPLIT_TS).cast("timestamp_ntz")
    u = ev.groupBy("event_type", "user_id").agg(
        F.max(F.when(F.col("ts") < split, 1).otherwise(0)).alias("in_train"),
        F.max(F.when(F.col("ts") >= split, 1).otherwise(0)).alias("in_test"),
    )
    return u.groupBy("event_type").agg(
        F.sum("in_train").cast("bigint").alias("n_train_users"),
        F.sum("in_test").cast("bigint").alias("n_test_users"),
        F.sum(F.col("in_train") * F.col("in_test"))
        .cast("bigint")
        .alias("n_leaked_users"),
        F.expr(
            "CAST(sum(in_train * in_test) * 1000000"
            " div greatest(sum(in_test), 1) AS BIGINT)"
        ).alias("leaked_test_ppm"),
    )
