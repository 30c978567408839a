"""Query batch: round-7b — linear algebra over embeddings, weighted
sampling, collocations, interpolation, distribution shape, and two
temporal/streaming completions.

- ``embedding_covariance`` — exact quantized covariance (upper triangle)
  via Arrow-batched integer Gram partials (operators/linalg.py): the
  one-pass ``XᵀX`` front end of PCA whitening / Mahalanobis scoring.
- ``priority_sample_wor`` — deterministic weighted sampling WITHOUT
  replacement per group via priority sampling (Duffield, Lund & Thorup
  2007): priority = w/u with u a unit-interval hash of the id; top-k by
  priority. Complements quality_weighted_sample (with-replacement
  importance sampling) and reservoir_sample (unweighted).
- ``collocation_lift`` — top collocations by integer-exact pointwise
  lift N²·c(ab) / (N_b·c(a)·c(b)) with a minimum-support floor — the
  phrase-mining signal PMI ranks, kept in exact integer cross-products
  so no cross-engine log/float drift exists.
- ``locf_gap_fill`` — hourly per-type grid with last-observation-
  carried-forward values: the interpolation complement of the zero-fill
  events_gap_fill.
- ``revenue_concentration`` — Lorenz/decile revenue concentration over
  per-customer revenue, using the distributed exact-rank design of
  equi_depth_deciles (sketch partitions, per-bucket local ranks — never
  a global single-task sort).
- ``asof_nearest_attribution`` — merge_asof(direction='nearest')
  semantics (operators/temporal_joins.asof_join_nearest): both-direction
  union-window carry, microsecond-exact distances, backward-preferring
  tie rule.
- ``streaming_ewma_value`` — the stateful GroupState EWMA
  (streaming/stateful.stateful_ewma, previously property-tested only)
  driven across TWO availableNow runs and value-oracled against the
  batch ordered fold — deterministic float recurrence, so a streaming
  stateful operator gets a FULL value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register
from clickhouse_table_copier_spark.queries_round6 import _TOKS_SQL, _norm_tokens


# ---------------------------------------------------------------------------
# Exact quantized covariance over the embedding corpus. Scale story:
# each Arrow batch contributes one dim×dim integer Gram partial (one
# BLAS call), partials merge by addition — aggregate state is O(dim²)
# regardless of corpus size, the canonical one-pass covariance at 100 TB.
# Cross-engine exactness: values quantized to the embedding_dim_stats
# grid (floor(x·1e6) on the double-widened float), all sums integer; the
# covariance (n·S_ij − S_i·S_j)/n² does the cross-multiplication in
# decimal(38,0) (DuckDB: HUGEINT) and only then casts once to double —
# one cast + two divisions, each correctly rounded, hence identical.
# ---------------------------------------------------------------------------
@register(
    "embedding_covariance",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) - 1 AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS qv
      FROM embeddings
    )
    SELECT a.d AS dim_i, b.d AS dim_j,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(a.qv * b.qv) AS BIGINT) AS s_ij,
           CAST(sum(a.qv) AS BIGINT) AS s_i,
           CAST(sum(b.qv) AS BIGINT) AS s_j,
           CAST(CAST(CAST(count(*) AS HUGEINT) * CAST(sum(a.qv * b.qv) AS HUGEINT)
                     - CAST(sum(a.qv) AS HUGEINT) * CAST(sum(b.qv) AS HUGEINT)
                     AS DOUBLE)
                / CAST(count(*) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                AS DOUBLE) AS q_cov
    FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.d <= b.d
    GROUP BY 1, 2
    """,
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.linalg import covariance_matrix

    return covariance_matrix(_t(spark, sf_dir, "embeddings"), "embedding")


# ---------------------------------------------------------------------------
# Priority sampling (Duffield–Lund–Thorup): k docs per language, chosen
# WITHOUT replacement with probability increasing in weight (n_chars),
# reproducible across runs/engines/partitionings. priority = w/u where
# u = (h+1)/16^12 from the doc-id md5 — served as the single double
# division w/(h+1) of two exactly-representable integers (w ≤ 2^53,
# h+1 ≤ 16^12 < 2^53), correctly rounded hence identical everywhere.
# One window top-k per group over the hash-ranked frame — the same
# shape (and 100 TB threshold-filter refinement) as reservoir_sample.
# ---------------------------------------------------------------------------
_PRIORITY_K = 5


@register(
    "priority_sample_wor",
    oracle=f"""
    WITH pri AS (
      SELECT lang, doc_id, n_chars,
             CAST(n_chars AS DOUBLE) /
             CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                       AS BIGINT) + 1 AS DOUBLE) AS priority
      FROM documents
    ),
    ranked AS (
      SELECT lang, doc_id, n_chars, priority,
             row_number() OVER (
               PARTITION BY lang ORDER BY priority DESC, doc_id) AS rk
      FROM pri
    )
    SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars, priority
    FROM ranked WHERE rk <= {_PRIORITY_K}
    """,
)
def q_priority_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    pri = docs.withColumn(
        "priority",
        F.col("n_chars").cast("double") / (h + F.lit(1)).cast("double"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("priority"), F.asc("doc_id"))
    return (
        pri.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _PRIORITY_K)
        .select(
            "lang", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"),
            "priority",
        )
    )


# ---------------------------------------------------------------------------
# Collocation mining by pointwise lift: for adjacent token pairs with
# support ≥ MIN_SUPPORT, lift = (c_ab/N_b) / ((c_a/N_t)·(c_b/N_t)) —
# the PMI exponent, ranked without ever taking a log. Exactness: both
# numerator c_ab·N_t² and denominator N_b·c_a·c_b are exact
# decimal(38,0)/HUGEINT cross-products; one double cast each + one
# division is correctly rounded, so the ranking is cross-engine total.
# Plan: bigrams assemble MAP-SIDE via zip_with over adjacent slices of
# the token array — zero joins, zero extra shuffles (the positional
# self-join formulation, which the oracle keeps as the obviously-correct
# spec, shuffles every token twice: measured 2.8 vs 1.1 s warm at
# sf0.1); the two corpus totals are one metadata-sized driver collect
# (2 numbers — the important_part_value scalar-subquery pattern);
# unigram joins are vocab-sized, strategy left to AQE.
# ---------------------------------------------------------------------------
_COLLOC_MIN_SUPPORT = 5
_COLLOC_TOP = 20


@register(
    "collocation_lift",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS pos
      FROM (SELECT doc_id, {_TOKS_SQL.format(c="text")} AS ws FROM documents)
    ),
    uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
    nt AS (SELECT count(*) AS n_tokens FROM toks),
    big AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS c_ab
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2
    ),
    nb AS (SELECT sum(c_ab) AS n_bigrams FROM big),
    lifted AS (
      SELECT tok_a, tok_b, c_ab,
             CAST(CAST(CAST(c_ab AS HUGEINT) * n_tokens * n_tokens AS DOUBLE)
                  / CAST(CAST(n_bigrams AS HUGEINT) * ua.c * ub.c AS DOUBLE)
                  AS DOUBLE) AS lift
      FROM big
      JOIN uni ua ON ua.tok = tok_a
      JOIN uni ub ON ub.tok = tok_b
      CROSS JOIN nt CROSS JOIN nb
      WHERE c_ab >= {_COLLOC_MIN_SUPPORT}
    )
    SELECT tok_a, tok_b, CAST(c_ab AS BIGINT) AS c_ab, lift
    FROM lifted
    ORDER BY lift DESC, tok_a, tok_b
    LIMIT {_COLLOC_TOP}
    """,
)
def q_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _norm_tokens("text").alias("ws")
    )
    uni = (
        docs.select(F.explode("ws").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # adjacent pairs map-side: zip the array against itself shifted by
    # one — no positional self-join, no token shuffle before the count
    adj = (
        "zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)),"
        " slice(ws, 2, greatest(size(ws) - 1, 0)),"
        " (x, y) -> struct(x AS tok_a, y AS tok_b))"
    )
    big = (
        docs.select(F.explode(F.expr(adj)).alias("p"))
        .groupBy(F.col("p.tok_a").alias("tok_a"), F.col("p.tok_b").alias("tok_b"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= _COLLOC_MIN_SUPPORT)
    )
    # corpus totals: two numbers from ONE scan — metadata-sized collect
    tot = docs.agg(
        F.sum(F.size("ws")).alias("nt"),
        F.sum(F.greatest(F.size("ws") - 1, F.lit(0))).alias("nb"),
    ).collect()[0]
    n_tokens, n_bigrams = int(tot["nt"]), int(tot["nb"])
    dec = "decimal(38,0)"
    num = (
        F.col("c_ab").cast(dec)
        * F.lit(n_tokens).cast(dec)
        * F.lit(n_tokens).cast(dec)
    )
    den = (
        F.lit(n_bigrams).cast(dec)
        * F.col("ua.c").cast(dec)
        * F.col("ub.c").cast(dec)
    )
    return (
        big.join(uni.alias("ua"), F.col("tok_a") == F.col("ua.tok"))
        .join(uni.alias("ub"), F.col("tok_b") == F.col("ub.tok"))
        .select(
            "tok_a",
            "tok_b",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            (num.cast("double") / den.cast("double")).alias("lift"),
        )
        .orderBy(F.desc("lift"), "tok_a", "tok_b")
        .limit(_COLLOC_TOP)
    )


# ---------------------------------------------------------------------------
# Last-observation-carried-forward gap fill: the hourly per-type grid of
# events_gap_fill, but VALUES interpolate — an hour with no events
# carries the previous hour's average (the time-series join-ready form a
# feature pipeline needs; zero-filling a price-like signal fabricates
# zeros). The LOCF pass is one last(ignorenulls) window PARTITIONED BY
# event_type over the grid frame — rows bounded by calendar span × type
# cardinality at any data volume (the dimension-frame case). Hour
# averages go decimal-sum / bigint-count → one double division each.
# ---------------------------------------------------------------------------
@register(
    "locf_gap_fill",
    oracle="""
    WITH ev AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, value
      FROM events
    ),
    bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
    grid AS (
      SELECT t.event_type, gs.h
      FROM (SELECT DISTINCT event_type FROM ev) t,
           (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
            FROM bounds) gs
    ),
    agg AS (
      SELECT event_type, h, count(*) AS n_events,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  / count(*) AS DOUBLE) AS avg_value
      FROM ev GROUP BY 1, 2
    ),
    joined AS (
      SELECT g.event_type, g.h AS hour_ts,
             CAST(coalesce(a.n_events, 0) AS BIGINT) AS n_events,
             a.avg_value
      FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.h = g.h
    )
    SELECT event_type, hour_ts, n_events,
           last_value(avg_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY hour_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS locf_value,
           CAST(n_events = 0 AS BOOLEAN) AS filled
    FROM joined
    """,
)
def q_locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from clickhouse_table_copier_spark.queries import _events

    ev = _events(spark, sf_dir).select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h"), "value"
    )
    b = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1")).first()
    h0, h1 = b["h0"].isoformat(sep=" "), b["h1"].isoformat(sep=" ")
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.expr(
                    f"sequence(CAST('{h0}' AS TIMESTAMP_NTZ),"
                    f" CAST('{h1}' AS TIMESTAMP_NTZ), INTERVAL 1 HOUR)"
                )
            ).alias("hour_ts"),
        )
    )
    agg = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value"),
    )
    joined = grid.join(
        agg,
        (grid.event_type == agg.event_type) & (grid.hour_ts == agg.h),
        "left",
    ).select(
        grid.event_type,
        "hour_ts",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        "avg_value",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "hour_ts",
        "n_events",
        F.last("avg_value", ignorenulls=True).over(w).alias("locf_value"),
        (F.col("n_events") == 0).alias("filled"),
    )


# ---------------------------------------------------------------------------
# Revenue concentration (Lorenz deciles): what share of total order
# revenue each customer-revenue decile holds — the skew readout behind
# "top 10% of customers drive X% of revenue". Distributed exact-rank
# design copied from equi_depth_deciles: sketch boundaries partition the
# per-customer revenue frame, local ranks per bucket, metadata-sized
# bucket-count collect, exact ntile arithmetic. Revenue is decimal-exact
# throughout; the share is one decimal→double cast per side + one
# division.
# ---------------------------------------------------------------------------
_LORENZ_PARTS = 32


@register(
    "revenue_concentration",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT rev, ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
      FROM cust
    ),
    tot AS (SELECT sum(rev) AS total FROM cust)
    SELECT CAST(decile AS INTEGER) AS decile,
           count(*) AS n_customers,
           CAST(sum(rev) AS DOUBLE) AS decile_revenue,
           CAST(CAST(sum(rev) AS DOUBLE) / CAST(total AS DOUBLE) AS DOUBLE)
             AS revenue_share
    FROM ranked, tot
    GROUP BY 1, total ORDER BY 1
    """,
)
def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    # 1. sketch boundaries on the double view — the sketch only
    # PARTITIONS the frame (decimal→double is monotone), its error never
    # touches output values
    pcts = [i / _LORENZ_PARTS for i in range(1, _LORENZ_PARTS)]
    bounds_row = cust.agg(
        F.percentile_approx(
            F.col("rev").cast("double"), F.array(*[F.lit(p) for p in pcts]), 1000
        ).alias("bs")
    ).collect()[0]
    bounds = sorted(set(float(x) for x in (bounds_row["bs"] or [])))  # percentile_approx -> NULL on empty input
    bucket = F.aggregate(
        F.array(*[F.lit(x) for x in bounds]),
        F.lit(0),
        lambda acc, x: acc
        + F.when(F.col("rev").cast("double") > x, F.lit(1)).otherwise(F.lit(0)),
    )
    wloc = Window.partitionBy("b").orderBy("rev", "o_custkey")
    local = cust.withColumn("b", bucket).withColumn(
        "lr", F.row_number().over(wloc)
    )
    # 2. per-bucket counts → cumulative offsets (≤ 32 rows, metadata)
    cnt_rows = local.groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect()
    cnt = {int(r["b"]): int(r["c"]) for r in cnt_rows}
    n = sum(cnt.values())
    offsets, acc = {}, 0
    for bk in sorted(cnt):
        offsets[bk] = acc
        acc += cnt[bk]
    off_expr = F.lit(0)
    for bk, off in offsets.items():
        off_expr = F.when(F.col("b") == bk, F.lit(off)).otherwise(off_expr)
    # 3. exact ntile(10)
    s, r = n // 10, n % 10
    pivot = r * (s + 1)
    rank = off_expr + F.col("lr")
    decile = (
        F.when(rank <= pivot, F.ceil(rank / F.lit(s + 1)))
        .otherwise(F.lit(r) + F.ceil((rank - pivot) / F.lit(max(s, 1))))
        .cast("int")
    )
    per_dec = (
        local.select(F.col("rev"), decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev").alias("rev_dec"),
        )
    )
    # total as a window sum over the 10-row decile frame — no extra scan
    wtot = Window.partitionBy()
    return (
        per_dec.select(
            "decile",
            "n_customers",
            F.col("rev_dec").cast("double").alias("decile_revenue"),
            (
                F.col("rev_dec").cast("double")
                / F.sum("rev_dec").over(wtot).cast("double")
            ).alias("revenue_share"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Nearest-direction as-of attribution: each purchase takes the CLOSEST
# click within ±4 h — before or after — the merge_asof(direction=
# 'nearest') completion of the as-of family (backward = asof_join_status,
# backward+tolerance = asof_tolerance_attribution). Distances are exact
# integer microseconds (unix_micros/epoch_us — no second-truncation
# drift); ties prefer the backward match, then the max event id. Both
# union-window passes hash-partition on user_id, so the second window
# reuses the first's exchange.
# ---------------------------------------------------------------------------
_NEAREST_TOL_S = 14400


@register(
    "asof_nearest_attribution",
    oracle=f"""
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'click'
    )
    SELECT l.event_id, l.user_id, l.ts,
           (SELECT r.value FROM r
            WHERE r.user_id = l.user_id
              AND abs(epoch_us(r.ts) - epoch_us(l.ts)) <= {_NEAREST_TOL_S}::BIGINT * 1000000
            ORDER BY abs(epoch_us(r.ts) - epoch_us(l.ts)) ASC,
                     r.ts ASC, r.event_id DESC
            LIMIT 1) AS click_value
    FROM l
    """,
)
def q_asof_nearest_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.temporal_joins import (
        asof_join_nearest,
    )
    from clickhouse_table_copier_spark.queries import _events

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("value").alias("click_value")
    )
    out = asof_join_nearest(
        purchases,
        clicks,
        key="user_id",
        time_col="ts",
        value_cols=["click_value"],
        tolerance_s=_NEAREST_TOL_S,
        order_col="event_id",
    )
    return out.select("event_id", "user_id", "ts", "click_value")


# ---------------------------------------------------------------------------
# Streaming stateful EWMA, value-oracled: the GroupState recurrence
# s ← α·x + (1−α)·s (streaming/stateful.stateful_ewma) driven as TWO
# availableNow runs over one checkpoint — the first half of the month
# lands, the run finishes, the second half arrives later — then the
# latest emitted row per user is compared against DuckDB's batch ordered
# fold. The recurrence applies the same correctly-rounded float ops in
# the same (ts, event_id) order in both engines, so this streaming
# operator gets a FULL value oracle (same discipline as
# streaming_heavy_hitters' exact-recount gate: no rows-only weakening).
# ---------------------------------------------------------------------------
_SEWMA_ALPHA = 0.25  # exact binary fraction: α and 1−α are both exact
_SEWMA_SPLIT = "2024-01-16 00:00:00"


@register(
    "streaming_ewma_value",
    oracle=f"""
    SELECT user_id,
           count(*) AS n_events,
           list_reduce(
             list(value ORDER BY ts, event_id),
             (s, x) -> {_SEWMA_ALPHA} * x + {1 - _SEWMA_ALPHA} * s
           ) AS ewma
    FROM events
    GROUP BY 1
    """,
)
def q_streaming_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from clickhouse_table_copier_spark.streaming.stateful import (
        latest_user_stats,
        stateful_ewma,
    )

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    split = F.lit(_SEWMA_SPLIT).cast("timestamp_ntz")
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="ctc_sewma_q_")
    src, out, ck = f"{work}/src", f"{work}/out", f"{work}/ck"
    try:
        # run 1: first half of the month; run 2: the rest — each file is
        # internally time-sorted by the update fn, and file arrival order
        # delivers the halves in event-time order across the checkpoint
        ev.where(F.col("ts") < split).write.parquet(src)
        stateful_ewma(
            spark, src, schema, out, ck, alpha=_SEWMA_ALPHA
        ).awaitTermination()
        ev.where(F.col("ts") >= split).write.mode("append").parquet(src)
        stateful_ewma(
            spark, src, schema, out, ck, alpha=_SEWMA_ALPHA
        ).awaitTermination()
        rows = (
            latest_user_stats(spark, out)
            .select("user_id", "n_events", "ewma")
            .collect()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows, "user_id bigint, n_events bigint, ewma double"
    )
