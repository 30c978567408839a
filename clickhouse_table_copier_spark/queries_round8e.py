"""Round-8e query batch: ML-pipeline feature/evaluation operators.

Five operators a training-data platform runs between ingestion and
model training, each with an exact ANSI oracle (every statistic is
integer/rational — the repo's no-cross-engine-``ln`` rule, see the
chi²-not-KL note in queries_round4.py):

- ``value_drift_tvd`` — train/serve drift monitor: total variation
  distance (exact ppm integers) between the first-half and second-half
  value distributions per event type, over fixed cent-width bins.  TVD
  is the ``ln``-free drift statistic (PSI needs a log; TVD bounds it
  and stays exact).
- ``multi_touch_attribution`` — U-shaped (position-based) marketing
  attribution: each view/click is credited to the EARLIEST following
  purchase of the same user within the window via one forward as-of
  join; per-purchase position windows assign 40/20/40 credit in exact
  ppm, revenue attributed in integer micro-cents.
- ``stratified_kfold_balance`` — deterministic stratified 5-fold
  assignment over the embeddings table (fold = per-label ``ntile`` on a
  multiplicative integer hash) with per-(label, fold) balance counts —
  the leakage-free split primitive for classifier training.
- ``target_encoding_loo`` — leave-one-out target encoding of the
  customer nation against order value: enc = (Σ_group − own)/(n−1) in
  exact integer micro-cents, the standard leakage-safe categorical
  feature.
- ``ks_cohort_distance`` — exact two-sample Kolmogorov–Smirnov distance
  per event type between even/odd user cohorts: max |c_A·N_B − c_B·N_A|
  over the collapsed value domain — the classic distribution-equality
  gate for A/B assignment audits, in pure integers.

Reference parity note: the Go reference executes no relational
computation itself (``database/database.go`` generates metadata SQL
only); this batch is the engine's analytics superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _events, _t, register

# ---------------------------------------------------------------------------
# value_drift_tvd
# ---------------------------------------------------------------------------

_DRIFT_SPLIT = "2024-01-16 00:00:00"
_DRIFT_BIN_CENTS = 5000  # 50.00 per bin
_DRIFT_N_BINS = 10


@register(
    "value_drift_tvd",
    oracle=f"""
    WITH e AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0 END
               AS is_ref,
             least(CAST(round(value * 100) AS BIGINT) // {_DRIFT_BIN_CENTS},
                   {_DRIFT_N_BINS - 1}) AS bin
      FROM events
    ),
    b AS (
      SELECT event_type, bin,
             CAST(sum(is_ref) AS BIGINT) AS nr,
             CAST(sum(1 - is_ref) AS BIGINT) AS nc
      FROM e GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, nr, nc,
             sum(nr) OVER (PARTITION BY event_type) AS tr,
             sum(nc) OVER (PARTITION BY event_type) AS tc
      FROM b
    )
    SELECT event_type,
           CAST(max(tr) AS BIGINT) AS n_ref,
           CAST(max(tc) AS BIGINT) AS n_cur,
           CAST(sum(abs(nr * 1000000 // tr - nc * 1000000 // tc)) // 2
                AS BIGINT) AS tvd_ppm
    FROM t GROUP BY 1
    """,
)
def q_value_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/serve drift per event type as EXACT total variation
    distance: bin shares in integer ppm (floor division of exact
    counts), TVD = Σ|p−q|//2.  One grouped count + a window over the
    ≤ types·bins cells — at 100 TB the only SF-linear stage is the
    scan; everything after is a ≤50-row frame.  TVD is used instead of
    PSI because PSI's ln() is the one op JVM and C libm disagree on in
    the last ulp (queries_round4.py chi² precedent)."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.when(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp_ntz"), 1)
        .otherwise(0)
        .alias("is_ref"),
        F.least(
            F.expr(
                f"CAST(round(value * 100) AS BIGINT) div {_DRIFT_BIN_CENTS}"
            ),
            F.lit(_DRIFT_N_BINS - 1).cast("bigint"),
        ).alias("bin"),
    )
    cells = ev.groupBy("event_type", "bin").agg(
        F.sum("is_ref").cast("bigint").alias("nr"),
        F.sum(1 - F.col("is_ref")).cast("bigint").alias("nc"),
    )
    wt = Window.partitionBy("event_type")
    t = cells.select(
        "event_type",
        "nr",
        "nc",
        F.sum("nr").over(wt).alias("tr"),
        F.sum("nc").over(wt).alias("tc"),
    )
    return t.groupBy("event_type").agg(
        F.max("tr").cast("bigint").alias("n_ref"),
        F.max("tc").cast("bigint").alias("n_cur"),
        F.expr(
            "CAST(sum(abs(nr * 1000000 div tr - nc * 1000000 div tc)) div 2"
            " AS BIGINT)"
        ).alias("tvd_ppm"),
    )


# ---------------------------------------------------------------------------
# multi_touch_attribution
# ---------------------------------------------------------------------------

_MTA_WINDOW_HOURS = 72


@register(
    "multi_touch_attribution",
    oracle=f"""
    WITH t AS (
      SELECT event_id, user_id, ts, event_type
      FROM events WHERE event_type IN ('view', 'click')
    ),
    p AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts,
             CAST(round(value * 100) AS BIGINT) AS p_cents
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT t.event_id, t.ts, t.event_type, p.p_id, p.p_cents,
             row_number() OVER (PARTITION BY t.event_id
                                ORDER BY p.p_ts, p.p_id) AS rn
      FROM t JOIN p
        ON p.user_id = t.user_id AND p.p_ts > t.ts
       AND p.p_ts <= t.ts + INTERVAL {_MTA_WINDOW_HOURS} HOUR
    ),
    m AS (SELECT * FROM j WHERE rn = 1),
    c AS (
      SELECT event_type, p_cents,
             count(*) OVER (PARTITION BY p_id) AS k,
             row_number() OVER (PARTITION BY p_id
                                ORDER BY ts, event_id) AS ra,
             row_number() OVER (PARTITION BY p_id
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM m
    ),
    cr AS (
      SELECT event_type, p_cents,
             CASE WHEN k = 1 THEN 1000000
                  WHEN k = 2 THEN 500000
                  WHEN ra = 1 OR rd = 1 THEN 400000
                  ELSE 200000 // (k - 2) END AS credit_ppm,
             CASE WHEN ra = 1 THEN 'first'
                  WHEN rd = 1 THEN 'last'
                  ELSE 'middle' END AS position
      FROM c
    )
    SELECT event_type, position,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(p_cents * credit_ppm) AS BIGINT) AS attributed_microcents
    FROM cr GROUP BY 1, 2
    """,
)
def q_multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution: each touch's purchase is the
    earliest SAME-USER purchase strictly after it within
    {_MTA_WINDOW_HOURS}h — ONE forward as-of join (union-window, one
    user_id shuffle, no join node) where the oracle spells out a pair
    fan-out + rn=1; per-purchase position windows (one p_id shuffle)
    assign first/last 40%, middles splitting 20% by exact integer-ppm
    floor division; revenue lands as integer micro-cents.  At 100 TB
    both shuffles are key-bounded; no stage holds more than a user's
    (resp. purchase's) events in one task."""
    from clickhouse_table_copier_spark.operators.temporal_joins import (
        asof_join_forward,
    )

    ev = _events(spark, sf_dir)
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts", "event_id", "event_type"
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("p_id"),
        F.round(F.col("value") * 100).cast("bigint").alias("p_cents"),
    )
    att = asof_join_forward(
        touches, purch, "user_id", "ts", value_cols=["p_id", "p_cents"],
        order_col="p_id",
    ).where(
        F.col("p_id").isNotNull()
        & (
            F.col("__next_t")
            <= F.col("ts") + F.expr(f"INTERVAL {_MTA_WINDOW_HOURS} HOURS")
        )
    )
    wp = Window.partitionBy("p_id")
    wa = wp.orderBy("ts", "event_id")
    wd = wp.orderBy(F.desc("ts"), F.desc("event_id"))
    c = att.select(
        "event_type",
        "p_cents",
        F.count(F.lit(1)).over(wp).alias("k"),
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    credit = (
        F.when(F.col("k") == 1, F.lit(1000000))
        .when(F.col("k") == 2, F.lit(500000))
        .when((F.col("ra") == 1) | (F.col("rd") == 1), F.lit(400000))
        .otherwise(F.expr("200000 div (k - 2)"))
    )
    pos = (
        F.when(F.col("ra") == 1, F.lit("first"))
        .when(F.col("rd") == 1, F.lit("last"))
        .otherwise(F.lit("middle"))
    )
    return (
        c.select(
            "event_type",
            "p_cents",
            credit.cast("bigint").alias("credit_ppm"),
            pos.alias("position"),
        )
        .groupBy("event_type", "position")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(F.col("p_cents") * F.col("credit_ppm"))
            .cast("bigint")
            .alias("attributed_microcents"),
        )
    )


# ---------------------------------------------------------------------------
# stratified_kfold_balance
# ---------------------------------------------------------------------------

_KFOLD_K = 5
_KFOLD_MULT = 2654435761  # Knuth multiplicative hash constant
_KFOLD_MOD = 2147483647


@register(
    "stratified_kfold_balance",
    oracle=f"""
    WITH h AS (
      SELECT vec_id, label,
             (vec_id * {_KFOLD_MULT}) % {_KFOLD_MOD} AS hv
      FROM embeddings
    ),
    f AS (
      SELECT label,
             ntile({_KFOLD_K}) OVER (PARTITION BY label ORDER BY hv, vec_id)
               - 1 AS fold
      FROM h
    )
    SELECT CAST(label AS INT) AS label, CAST(fold AS INT) AS fold,
           CAST(count(*) AS BIGINT) AS n
    FROM f GROUP BY 1, 2
    """,
)
def q_stratified_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified k-fold: per label, rows ordered by a
    multiplicative integer hash (pure bigint arithmetic — identical in
    any engine) and cut into {_KFOLD_K} ANSI-``ntile`` folds, so fold
    sizes within a label differ by ≤1 and assignment is reproducible
    from ``vec_id`` alone.  Output is the (label, fold) balance audit.
    The per-label window sorts only that label's rows; at 100 TB swap
    the ntile for ``ranks.exact_global_ntile_multi`` per label (same
    mechanism, no single-task label sort) or, when ±ε balance is
    acceptable, ``fold = hv % k`` with no window at all."""
    h = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        ((F.col("vec_id") * F.lit(_KFOLD_MULT)) % F.lit(_KFOLD_MOD)).alias(
            "hv"
        ),
    )
    w = Window.partitionBy("label").orderBy("hv", "vec_id")
    return (
        h.select(
            "label", (F.ntile(_KFOLD_K).over(w) - 1).alias("fold")
        )
        .groupBy(
            F.col("label").cast("int").alias("label"),
            F.col("fold").cast("int").alias("fold"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# ---------------------------------------------------------------------------
# target_encoding_loo
# ---------------------------------------------------------------------------


@register(
    "target_encoding_loo",
    oracle="""
    WITH o AS (
      SELECT o.o_orderkey, n.n_name,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    s AS (
      SELECT n_name, CAST(sum(cents) AS BIGINT) AS s_cents,
             count(*) AS n_rows
      FROM o GROUP BY 1
    )
    SELECT o.o_orderkey, o.n_name,
           CAST(CASE WHEN s.n_rows > 1
                THEN ((s.s_cents - o.cents) * 1000000) // (s.n_rows - 1)
                ELSE NULL END AS BIGINT) AS enc_microcents
    FROM o JOIN s USING (n_name)
    """,
)
def q_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the customer nation against
    order value — the leakage-safe categorical feature: each row's
    encoding excludes its own target, enc = (Σ_group − own)/(n−1) in
    exact integer micro-cents (floor division of exact sums).  Plan:
    dims broadcast onto the orders scan, one grouped agg to the
    25-row per-nation sums, broadcast back — a single shuffle-free
    pass over the fact table plus one tiny exchange.  The canonical
    two-pass feature-engineering shape at any SF."""
    o = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "o_orderkey",
            "n_name",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )
    s = o.groupBy("n_name").agg(
        F.sum("cents").cast("bigint").alias("s_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return o.join(F.broadcast(s), "n_name").select(
        "o_orderkey",
        "n_name",
        F.expr(
            "CAST(CASE WHEN n_rows > 1"
            " THEN ((s_cents - cents) * 1000000) div (n_rows - 1)"
            " ELSE NULL END AS BIGINT)"
        ).alias("enc_microcents"),
    )


# ---------------------------------------------------------------------------
# ks_cohort_distance
# ---------------------------------------------------------------------------


@register(
    "ks_cohort_distance",
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
      SELECT event_type,
             sum(a_n) OVER (PARTITION BY event_type ORDER BY v) AS ca,
             sum(b_n) OVER (PARTITION BY event_type ORDER BY v) AS cb,
             sum(a_n) OVER (PARTITION BY event_type) AS na,
             sum(b_n) OVER (PARTITION BY event_type) AS nb
      FROM g
    )
    SELECT event_type,
           CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b,
           CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS ks_num,
           CAST(max(abs(ca * nb - cb * na)) * 1000000
                // (max(na) * max(nb)) AS BIGINT) AS ks_ppm
    FROM c GROUP BY 1
    """,
)
def q_ks_cohort_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance per event type
    between the even- and odd-user cohorts: KS = max|F_A − F_B| put in
    integers as max|c_A·N_B − c_B·N_A| (cross-multiplied, so no float
    CDF anywhere; the final ppm is one exact floor division).  Ties
    collapse FIRST (one row per (type, value-cent)), so the cumulative
    window runs over the bounded value DOMAIN — ≤ types·50k rows
    regardless of SF — not over events.  The A/B-assignment audit gate:
    a large KS means the hash split is biased for that metric."""
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
        F.sum("a_n").over(wc).alias("ca"),
        F.sum("b_n").over(wc).alias("cb"),
        F.sum("a_n").over(wt).alias("na"),
        F.sum("b_n").over(wt).alias("nb"),
    )
    return c.groupBy("event_type").agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        F.max(F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")))
        .cast("bigint")
        .alias("ks_num"),
        F.expr(
            "CAST(max(abs(ca * nb - cb * na)) * 1000000"
            " div (max(na) * max(nb)) AS BIGINT)"
        ).alias("ks_ppm"),
    )
