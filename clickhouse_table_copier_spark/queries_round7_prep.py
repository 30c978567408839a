"""Round-7 batch: the final three TPC-H shapes (Q12/Q14/Q20 adapted)
plus four pipeline/temporal/streaming operators.

History: these were implemented and oracle-tested during round 6 as a
"prep" batch — the round-6 driver window was exactly full
(registry_evidence.must_front == 50), so registering them then would
have pushed evidence-required queries out of the window. As planned,
they are now REGISTERED (round-7 rotation): ``_prep`` feeds both the
local PREP_* dicts (kept so tests/test_round7_prep.py keeps running
the standalone parity harness) and the main registry, and all seven sit
inside the round-7 driver window.

Shapes (fixture has no l_shipmode / partsupp; adaptations keep each
query's distinctive physical-plan exercise):

* Q12 — dual conditional CASE-sums over one filtered fact scan,
  grouped by ship month: the "two counts in one pass" shape.
* Q14 — promo revenue share: a ratio of conditional sum to total sum in
  a single joined aggregate — no second scan, no subquery.
* Q20 — nested semi-join chain: per-(part, supplier) shipped quantity
  vs half the part's total — two stacked aggregates joined back, then a
  semi-join onto the supplier dimension.

Plus one pipeline operator: incremental dedup of a NEW document batch
against the EXISTING corpus (asymmetric inverted-index probe — cost
proportional to the batch, never corpus²), and one window-surface
completion: a trailing-7-day RANGE-frame rolling revenue (the registry's
first rangeBetween — gap-correct where rowsBetween assumes contiguous
days), and one stateful-streaming operator: per-source Misra-Gries
heavy hitters in the state store across two availableNow runs, gated to
exact recounts so the classical > n/k guarantee yields a FULL value
oracle. And one temporal-join variant: tolerance-bounded as-of
(asof_join_tolerance — stale matches refused, merge_asof(tolerance=...)
semantics).

Also queued for the round-7 rotation: switch intra_doc_repeats to the
shared _shared_span_grams frame (see the NOTE above its definition in
queries_round5.py — the swap is a fingerprint change the full round-6
window cannot absorb).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register

# name -> (spark_fn, oracle_sql); mirrored into the main registry below.
PREP_QUERIES: dict = {}
PREP_ORACLES: dict[str, str] = {}


def _prep(name: str, oracle: str):
    def deco(fn):
        PREP_QUERIES[name] = fn
        PREP_ORACLES[name] = oracle
        return register(name, oracle)(fn)

    return deco


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: shipping-priority mode report. The original groups by
# l_shipmode and counts urgent/high-priority orders vs the rest in two
# CASE-sums; the fixture has no shipmode, so the group key is the ship
# month of 1997 — same plan: one pushed-down fact scan, one broadcast-
# joinable orders lookup, TWO conditional aggregates computed in the
# same partial/final pass (never two scans).
# ---------------------------------------------------------------------------
@_prep(
    "priority_shipping_months",
    oracle="""
    SELECT CAST(month(l.l_shipdate) AS INT) AS ship_month,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_priority_shipping_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    li = (
        _t(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_orderkey", "l_shipdate")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.month("l_shipdate").cast("int").alias("ship_month"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_month")
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share. ONE aggregate computes both the
# conditional (PROMO) revenue and the total — the ratio is a final-stage
# double division both engines perform identically on exact decimal
# sums. part joins broadcast (2k rows at sf0.01; at real scale the
# p_type flag would be a fact-side column or a broadcast dim exactly
# like this).
# ---------------------------------------------------------------------------
@_prep(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1996-09-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp_ntz")
    li = (
        _t(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
            .cast("double")
            .alias("promo_rev"),
            F.sum(rev).cast("double").alias("total_rev"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias(
                "promo_revenue_pct"
            )
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: dominant-supplier detection. Without partsupp,
# "excess availability" becomes shipment dominance: a supplier qualifies
# if, for at least one PROMO part, it shipped MORE than half that part's
# total 1996 volume. Two stacked aggregates — per (part, supplier), then
# per part — joined back on the part key (both shuffles carry grouped
# partials), then a LEFT SEMI onto the supplier dimension. Quantities
# are integer-valued doubles: exact under IEEE addition, no decimal
# detour, and the strict > on identically-computed doubles is
# deterministic across engines.
# ---------------------------------------------------------------------------
@_prep(
    "dominant_part_suppliers",
    oracle="""
    WITH promo_lines AS (
      SELECT l.l_partkey, l.l_suppkey, l.l_quantity
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    ),
    per_ps AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM promo_lines GROUP BY 1, 2
    ),
    per_p AS (
      SELECT l_partkey, sum(qty) AS total_qty FROM per_ps GROUP BY 1
    ),
    dominant AS (
      SELECT DISTINCT ps.l_suppkey
      FROM per_ps ps JOIN per_p p ON ps.l_partkey = p.l_partkey
      WHERE ps.qty > 0.5 * p.total_qty
    )
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s JOIN dominant d ON s.s_suppkey = d.l_suppkey
    ORDER BY s.s_suppkey
    """,
)
def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    promo = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    per_p = per_ps.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    dominant = (
        per_ps.join(per_p, "l_partkey")
        .where(F.col("qty") > F.lit(0.5) * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Incremental dedup: match a NEW batch of documents against the EXISTING
# corpus without recomputing corpus-vs-corpus pairs — the production
# delta path (nightly crawl lands, dedup it against the index, done).
# The batch here is exactly the synthetic arrivals the dedup fixtures
# already model: verbatim copies (+100000 of doc_id % 10 = 0) and
# near-dup copies (+200000 of % 10 = 5, one token appended).
#
# Asymmetric inverted-index join: batch shingles probe corpus shingles
# on the shingle key only — cost ∝ Σ_sh df_new · df_old, proportional to
# BATCH size, never corpus²; at 100 TB the corpus side is the persisted
# shingle_index table (built once, reused every delta) and the same
# max_df hot-shingle cap applies. Jaccard stays exact-integer until one
# final double division both engines perform identically.
# ---------------------------------------------------------------------------
@_prep(
    "dedup_incremental_batch",
    oracle="""
    WITH batch AS (
      SELECT doc_id + 100000 AS doc_id, text
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, text || ' extra token appended'
      FROM documents WHERE doc_id % 10 = 5
    ),
    old_sh AS (
      SELECT DISTINCT doc_id, unnest(
        CASE WHEN len(string_split(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')), ' ')) >= 3 THEN
          list_distinct([
            array_to_string(string_split(trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')), ' ')[i:i+2], ' ')
            FOR i IN range(1, len(string_split(trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')), ' ')) - 1)
          ])
        ELSE [trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g'))] END) AS sh
      FROM documents
    ),
    new_sh AS (
      SELECT DISTINCT doc_id, unnest(
        CASE WHEN len(string_split(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')), ' ')) >= 3 THEN
          list_distinct([
            array_to_string(string_split(trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')), ' ')[i:i+2], ' ')
            FOR i IN range(1, len(string_split(trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')), ' ')) - 1)
          ])
        ELSE [trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g'))] END) AS sh
      FROM batch
    ),
    old_sz AS (SELECT doc_id, count(*) AS sz FROM old_sh GROUP BY 1),
    new_sz AS (SELECT doc_id, count(*) AS sz FROM new_sh GROUP BY 1),
    inter AS (
      SELECT n.doc_id AS new_id, o.doc_id AS old_id, count(*) AS inter_cnt
      FROM new_sh n JOIN old_sh o ON n.sh = o.sh
      GROUP BY 1, 2
    )
    SELECT i.new_id, i.old_id,
           CAST(i.inter_cnt AS DOUBLE) /
           CAST(ns.sz + os.sz - i.inter_cnt AS DOUBLE) AS jaccard
    FROM inter i
    JOIN new_sz ns ON ns.doc_id = i.new_id
    JOIN old_sz os ON os.doc_id = i.old_id
    WHERE CAST(i.inter_cnt AS DOUBLE) /
          CAST(ns.sz + os.sz - i.inter_cnt AS DOUBLE) >= 0.5
    """,
)
def q_dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import shingle_index

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    batch = (
        docs.where(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .unionAll(
            docs.where(F.col("doc_id") % 10 == 5).select(
                (F.col("doc_id") + 200000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" extra token appended")).alias(
                    "text"
                ),
            )
        )
    )
    # corpus side: at production scale this is the ALREADY-PERSISTED
    # shingle_index table; built inline here from the same operator
    old_sh = shingle_index(docs, "doc_id", "text", 3).distinct()
    new_sh = shingle_index(batch, "doc_id", "text", 3).distinct()
    old_sz = old_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz_old"))
    new_sz = new_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz_new"))
    inter = (
        new_sh.alias("n")
        .join(old_sh.alias("o"), F.col("n.sh") == F.col("o.sh"))
        .groupBy(
            F.col("n.doc_id").alias("new_id"), F.col("o.doc_id").alias("old_id")
        )
        .agg(F.count(F.lit(1)).alias("inter_cnt"))
    )
    jac = F.col("inter_cnt").cast("double") / (
        F.col("sz_new") + F.col("sz_old") - F.col("inter_cnt")
    ).cast("double")
    return (
        inter.join(new_sz.withColumnRenamed("doc_id", "new_id"), "new_id")
        .join(old_sz.withColumnRenamed("doc_id", "old_id"), "old_id")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= 0.5)
        .select("new_id", "old_id", "jaccard")
    )


# ---------------------------------------------------------------------------
# RANGE-frame window surface: trailing-7-DAY revenue per return flag.
# Unlike moving_avg_daily's rowsBetween(-6, 0) — which silently assumes
# contiguous days — a RANGE frame is anchored to the ORDER value itself
# (epoch-day index), so calendar gaps shorten the window instead of
# pulling in stale rows; this is the first rangeBetween use in the
# registry surface. The window input is the (flag, day) AGGREGATE frame
# — bounded by time span × flag cardinality at any data scale (the
# documented dimension-frame case), partitioned by flag (never a global
# sort). Revenue is exact decimal; only the output casts to double.
# ---------------------------------------------------------------------------
@_prep(
    "rolling_7d_revenue",
    oracle="""
    WITH daily AS (
      SELECT l_returnflag,
             CAST(l_shipdate AS DATE) AS day,
             date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE))
               AS day_idx,
             sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem GROUP BY 1, 2, 3
    )
    SELECT l_returnflag, day,
           CAST(rev AS DOUBLE) AS daily_revenue,
           CAST(sum(rev) OVER (
             PARTITION BY l_returnflag ORDER BY day_idx
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_7d_revenue
    FROM daily
    """,
)
def q_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    daily = li.groupBy(
        "l_returnflag",
        F.to_date("l_shipdate").alias("day"),
        F.datediff(F.to_date("l_shipdate"), F.lit("1995-01-01").cast("date"))
        .alias("day_idx"),
    ).agg(F.sum(rev).alias("rev"))
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("day_idx")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "l_returnflag",
        "day",
        F.col("rev").cast("double").alias("daily_revenue"),
        F.sum("rev").over(w).cast("double").alias("rolling_7d_revenue"),
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters: per-source Misra-Gries summaries maintained
# in the state store across micro-batches and across TWO separate
# availableNow runs (the second half of the corpus arrives after the
# first run finishes — candidates must survive the checkpoint), then the
# candidate set is recounted exactly in batch and gated at the classical
# threshold: a token qualifies iff exact_count · k > n_source. The MG
# guarantee (every token with frequency > n/k survives the summary)
# makes the gated output EXACTLY the true heavy-hitter set, so this
# streaming-stateful operator gets a full value oracle, not a weaker
# rows-only check. k = 25 < vocabulary size, so the decrement path is
# genuinely exercised on the fixture.
# ---------------------------------------------------------------------------
_MG_K = 25

_TOKS_NORM_SQL = (
    "string_split(trim(regexp_replace(regexp_replace(lower(text),"
    " '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')), ' ')"
)


@_prep(
    "streaming_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_NORM_SQL}) AS token FROM documents
    ),
    cnt AS (SELECT source, token, count(*) AS c FROM toks GROUP BY 1, 2),
    tot AS (SELECT source, count(*) AS n FROM toks GROUP BY 1)
    SELECT c.source, c.token, CAST(c.c AS BIGINT) AS exact_count
    FROM cnt c JOIN tot t ON c.source = t.source
    WHERE c.c * {_MG_K} > t.n
    """,
)
def q_streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from clickhouse_table_copier_spark.operators.dedup import normalized_text
    from clickhouse_table_copier_spark.streaming.stateful import (
        latest_mg_candidates,
        streaming_misra_gries,
    )

    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            "source",
            "doc_id",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
    )
    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("token", T.StringType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="ctc_mg_q_")
    src, out, ck = f"{work}/src", f"{work}/out", f"{work}/ck"
    try:
        # run 1: even docs; run 2: odd docs — every source's summary must
        # cross the checkpoint boundary to stay correct
        toks.where(F.col("doc_id") % 2 == 0).write.parquet(src)
        streaming_misra_gries(spark, src, schema, out, ck, k=_MG_K)\
            .awaitTermination()
        toks.where(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
        streaming_misra_gries(spark, src, schema, out, ck, k=_MG_K)\
            .awaitTermination()
        candidates = latest_mg_candidates(spark, out).select("source", "token")
        exact = toks.groupBy("source", "token").agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_count")
        )
        totals = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        result = (
            exact.join(candidates, ["source", "token"], "left_semi")
            .join(totals, "source")
            .where(F.col("exact_count") * _MG_K > F.col("n"))
            .select("source", "token", "exact_count")
        )
        # the streaming outputs live in the temp dir — freeze before cleanup
        rows = result.collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows, "source string, token string, exact_count bigint"
    )


# ---------------------------------------------------------------------------
# Tolerance-bounded as-of: each purchase attributed to the user's latest
# click at-or-before it — but only within 1 day; staler matches are
# refused (NULL), the feature-store freshness rule plain as-of silently
# violates. operators/temporal_joins.asof_join_tolerance: same
# union-window plan as the registered asof_join_status (one shuffle on
# user_id, zero join nodes); the matched (ts, value) travel as one
# struct so the freshness test and the carried value cannot
# desynchronize. Tie order among clicks at one timestamp is made total
# with the unique event id (latent-risk rule from the r5 advisor).
# On the fixture ~1/3 of purchases match at 1 day — both branches of
# the tolerance are exercised.
# ---------------------------------------------------------------------------
_ASOF_TOL_S = 86400


@_prep(
    "asof_tolerance_attribution",
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
            WHERE r.user_id = l.user_id AND r.ts <= l.ts
              AND r.ts >= l.ts - INTERVAL {_ASOF_TOL_S} SECOND
            ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS click_value
    FROM l
    """,
)
def q_asof_tolerance_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.temporal_joins import (
        asof_join_tolerance,
    )
    from clickhouse_table_copier_spark.queries import _events

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("value").alias("click_value")
    )
    out = asof_join_tolerance(
        purchases,
        clicks,
        key="user_id",
        time_col="ts",
        value_cols=["click_value"],
        tolerance_s=_ASOF_TOL_S,
        order_col="event_id",
    )
    return out.select("event_id", "user_id", "ts", "click_value")
