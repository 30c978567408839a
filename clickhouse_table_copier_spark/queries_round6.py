"""Query batch: round-6 operators.

New surface this round: the two classic TPC-H join shapes still missing
(Q3 shipping-priority top-k, Q13 outer-join count distribution), a
tokenizer-training primitive (BPE first-merge pair counts over the
frequency-collapsed word table), corpus vocabulary-growth curves
(Heaps'-law novelty per source), a trailing-window COUNT DISTINCT built
from mergeable per-hour partials, quality-aware dedup survivorship
(keep-best-per-cluster instead of keep-min-id), per-key linear trend
fitting with integer-exact normal equations, and quantized per-dimension
embedding statistics for embedding-table QA.

Cross-engine determinism: integer counts everywhere possible; doubles
only as (a) a single correctly-rounded division of exact integers/
decimals or (b) floor-quantized grids (never round(), whose half-way
rule differs between engines); every LIMIT carries a total tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_table_copier_spark.queries import _events, _t, register

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)
# normalized, empty-filtered token list (DuckDB side) — matches
# operators/dedup.normalized_text + split + filter on the Spark side
_TOKS_SQL = (
    "list_filter(string_split(" + _NORM_SQL + ", ' '), x -> x <> '')"
)


def _norm_tokens(text_col: str):
    from clickhouse_table_copier_spark.operators.dedup import normalized_text

    return F.filter(
        F.split(normalized_text(text_col), " "), lambda t: t != F.lit("")
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: shipping-priority top-k. The canonical 3-way star join
# with selective predicates on BOTH fact branches: the segment filter
# prunes customer before its join, and the two date predicates push into
# the orders/lineitem scans (PushedFilters), so the only large shuffle is
# lineitem ⋈ orders on the order key. Revenue sums go through decimal
# (exact, associative); the top-10 is a TakeOrderedAndProject — per-
# partition heaps + one k-row merge at the driver, never a global sort.
# ---------------------------------------------------------------------------
_Q3_DATE = "1997-06-01"


@register(
    "shipping_priority",
    oracle=f"""
    WITH r AS (
      SELECT l.l_orderkey,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev,
             o.o_orderdate, o.o_orderpriority
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '{_Q3_DATE} 00:00:00'
        AND l.l_shipdate > TIMESTAMP '{_Q3_DATE} 00:00:00'
      GROUP BY 1, 3, 4
    )
    SELECT l_orderkey, CAST(rev AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM r
    ORDER BY rev DESC, l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit(_Q3_DATE + " 00:00:00").cast("timestamp_ntz")
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # the BUILDING key set is SF-linear (1/5 of customers) — its
        # join strategy is left to Catalyst/AQE
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (F.lit(1) - disc)).alias("rev"))
        .select(
            "l_orderkey",
            F.col("rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
            "rev",
        )
        .orderBy(F.desc("rev"), F.asc("l_orderkey"))
        .limit(10)
        .drop("rev")
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution. The LEFT OUTER join
# keeps zero-order customers (an inner join silently drops them — the
# classic Q13 trap), the first aggregation shuffles on the customer key,
# and the second collapses to at most max(order-count) rows — effectively
# free. At 100 TB both aggs partial map-side; no row ever widens.
# ---------------------------------------------------------------------------
@register(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# BPE first-merge candidates: the most frequent adjacent character pairs
# over the corpus, weighted by word frequency — iteration 0 of byte-pair-
# encoding tokenizer training. The scale trick IS the query shape: the
# corpus first collapses to the (word, freq) vocabulary table (bounded by
# vocabulary size, orders of magnitude smaller than the token stream),
# and the quadratic-ish pair explosion runs over THAT, never over raw
# text. Pure integer counts; top-20 via TakeOrdered with total tiebreak.
# ---------------------------------------------------------------------------
@register(
    "bpe_merge_candidates",
    oracle=f"""
    WITH words AS (
      SELECT w, count(*) AS freq
      FROM (SELECT unnest({_TOKS_SQL.format(c="text")}) AS w FROM documents)
      GROUP BY 1
    ),
    positions AS (
      SELECT w, freq, unnest(generate_series(1, len(w) - 1)) AS i
      FROM words WHERE len(w) >= 2
    )
    SELECT substring(w, i, 1) AS sym_a, substring(w, i + 1, 1) AS sym_b,
           CAST(sum(freq) AS BIGINT) AS n_occurrences
    FROM positions
    GROUP BY 1, 2
    ORDER BY n_occurrences DESC, sym_a, sym_b
    LIMIT 20
    """,
)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import spread

    docs = spread(_t(spark, sf_dir, "documents"))
    words = (
        docs.select(F.explode(_norm_tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.where(F.length("w") >= 2).select(
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        F.col("w"),
    )
    return (
        pairs.select(
            F.substring("w", F.col("i"), F.lit(1)).alias("sym_a"),
            F.substring("w", F.col("i") + 1, F.lit(1)).alias("sym_b"),
            "freq",
        )
        .groupBy("sym_a", "sym_b")
        .agg(F.sum("freq").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("sym_a"), F.asc("sym_b"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Vocabulary-growth (Heaps'-law) curve per source: cumulative distinct
# token count as the corpus is ingested in doc_id order. Each token's
# first-seen doc is a grouped MIN (one shuffle on (source, token)); the
# cumulative curve is a window cumsum PARTITIONED BY source — ordered
# within each source only, never globally. The curve is the standard
# diagnostic for "is this source still contributing new vocabulary or
# just repeating itself" when deciding ingestion order/cutoffs.
# ---------------------------------------------------------------------------
@register(
    "token_novelty_curve",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT source, doc_id, unnest({_TOKS_SQL.format(c="text")}) AS tok
      FROM documents
    ),
    first_seen AS (
      SELECT source, tok, min(doc_id) AS first_doc
      FROM toks GROUP BY 1, 2
    ),
    new_per_doc AS (
      SELECT source, first_doc AS doc_id, count(*) AS n_new
      FROM first_seen GROUP BY 1, 2
    )
    SELECT d.source, d.doc_id,
           CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new,
           CAST(sum(coalesce(n.n_new, 0)) OVER (
             PARTITION BY d.source ORDER BY d.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_vocab
    FROM (SELECT DISTINCT source, doc_id FROM documents) d
    LEFT JOIN new_per_doc n ON n.source = d.source AND n.doc_id = d.doc_id
    """,
)
def q_token_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import spread

    docs = spread(_t(spark, sf_dir, "documents"))
    toks = docs.select(
        "source", "doc_id", F.explode(_norm_tokens("text")).alias("tok")
    ).distinct()
    first_seen = toks.groupBy("source", "tok").agg(F.min("doc_id").alias("doc_id"))
    new_per_doc = first_seen.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    base = docs.select("source", "doc_id").distinct()
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(new_per_doc, ["source", "doc_id"], "left")
        .select(
            "source",
            "doc_id",
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
        )
        .withColumn("cum_vocab", F.sum("n_new").over(w).cast("bigint"))
    )


# ---------------------------------------------------------------------------
# Trailing-24h COUNT DISTINCT users per hour. Spark has no DISTINCT over
# a range window, and per-row state would be unbounded. Round-6 rewrite:
# instead of fanning every distinct (hour, user) pair out to the <= 24
# windows it serves (expansion factor 24 on the widest shuffle), the
# count is a SWEEP LINE over per-user coverage intervals:
#
#   1. distinct (hour h, user) partials — mergeable, hour-partitioned;
#   2. per user, hours whose gap is <= 23 h merge into islands (their
#      [h, h+23] coverages overlap) via the gaps-and-islands window
#      PARTITIONED BY user — one lag + one running sum, never global;
#   3. each island [a, b] covers window-ends [a, b+23]: delta +1 at a,
#      −1 at b+24 — TWO rows per island, the 24x fanout is gone;
#   4. prefix-sum the hour-keyed net deltas with the same
#      day-partitioned-cumsum + collected-day-offsets mechanism as
#      concurrent_sessions_curve (no global window sort; the day table
#      is bounded by time span, not data volume);
#   5. report only hours that actually occur (inner join), exactly as
#      the fanout formulation did.
#
# Shuffle volume drops from 24x|distinct pairs| to |distinct pairs| +
# 2x|islands|; the result frame is shared with the HLL sibling below
# (its 5% gate needs the exact counts), computed once per
# (session, sf_dir).
# ---------------------------------------------------------------------------
_SLIDING_EXACT_CACHE: dict = {}


def _sliding_exact_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(window_end_hour, n_users) for every observed hour — exact, via
    the sweep-line formulation above. Persisted per (session, sf_dir);
    consumed by both the exact query and the HLL sibling's gate."""
    from clickhouse_table_copier_spark.queries_pipeline import _cache_get

    def build() -> DataFrame:
        ev = _events(spark, sf_dir)
        hu = ev.select(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("h"),
            "user_id",
        ).distinct()
        wu = Window.partitionBy("user_id").orderBy("h")
        gap_h = (
            F.unix_timestamp(F.col("h").cast("timestamp"))
            - F.unix_timestamp(F.lag(F.col("h").cast("timestamp")).over(wu))
        ) / 3600
        flagged = hu.withColumn(
            "new_island",
            F.when(gap_h.isNull() | (gap_h > 23), F.lit(1)).otherwise(F.lit(0)),
        )
        islands = flagged.withColumn(
            "island",
            F.sum("new_island").over(
                wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        iv = islands.groupBy("user_id", "island").agg(
            F.min("h").alias("a"), F.max("h").alias("b")
        )
        deltas = iv.select(F.col("a").alias("h"), F.lit(1).alias("d")).unionAll(
            iv.select(
                F.expr("timestampadd(HOUR, 24, b)").alias("h"),
                F.lit(-1).alias("d"),
            )
        )
        # observed hours enter the timeline with d=0 so the prefix value
        # is defined AT every reported hour, delta there or not
        hours = hu.select("h").distinct()
        net = (
            deltas.unionAll(hours.select("h", F.lit(0).alias("d")))
            .groupBy("h")
            .agg(F.sum("d").alias("nd"))
            .withColumn("day", F.date_trunc("day", "h"))
            .localCheckpoint(eager=True)  # two consumers below
        )
        day_nets = sorted(
            net.groupBy("day").agg(F.sum("nd").alias("day_nd")).collect(),
            key=lambda r: r["day"],
        )
        offsets, acc = [], 0
        for r in day_nets:
            offsets.append((r["day"], acc))
            acc += r["day_nd"]
        off_df = spark.createDataFrame(
            offsets,
            T.StructType(
                [
                    T.StructField("day", net.schema["day"].dataType),
                    T.StructField("day_offset", T.LongType()),
                ]
            ),
        )
        wday = Window.partitionBy("day").orderBy("h").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        prefix = net.withColumn("cum", F.sum("nd").over(wday)).join(
            F.broadcast(off_df), "day"
        )
        return (
            prefix.join(hours, "h")
            .select(
                F.col("h").alias("window_end_hour"),
                (F.col("cum") + F.col("day_offset"))
                .cast("bigint")
                .alias("n_users"),
            )
        )

    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    return _cache_get(_SLIDING_EXACT_CACHE, key, build)


@register(
    "sliding_distinct_users",
    oracle="""
    WITH hu AS (
      SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, user_id
      FROM events
    ),
    hours AS (SELECT DISTINCT h FROM hu),
    fanout AS (
      SELECT h + INTERVAL 1 HOUR * unnest(generate_series(0, 23)) AS wend,
             user_id
      FROM hu
    )
    SELECT f.wend AS window_end_hour,
           CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users
    FROM fanout f
    JOIN hours ho ON ho.h = f.wend
    GROUP BY 1
    """,
)
def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sliding_exact_counts(spark, sf_dir)


# ---------------------------------------------------------------------------
# Quality-aware dedup survivorship: within each near-dup cluster keep the
# doc with the largest distinct-token vocabulary (tiebreak: smallest id)
# instead of blindly keeping min-id — the production survivorship rule
# (keep the richest copy, drop truncated/boilerplate variants). Reuses
# the shared jaccard-pairs table and the label-propagation components
# operator; the keep choice is one grouped argmax (max_by) over an
# integer quality score — no floats anywhere.
# ---------------------------------------------------------------------------
def _keep_best_oracle() -> str:
    from clickhouse_table_copier_spark.queries_pipeline import _JACCARD_PAIRS_SQL

    return f"""
    WITH RECURSIVE
    {_JACCARD_PAIRS_SQL},
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach AS (
      SELECT u AS id, u AS lbl FROM edges
      UNION
      SELECT e.u AS id, r.lbl FROM edges e JOIN reach r ON e.v = r.id
    ),
    comp AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
    vocab AS (
      SELECT doc_id, count(DISTINCT tok) AS n_vocab
      FROM (SELECT doc_id, unnest({_TOKS_SQL.format(c="text")}) AS tok
            FROM corpus)
      GROUP BY 1
    )
    SELECT c.cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           min(CASE WHEN (v.n_vocab, -v.doc_id) =
                 (SELECT max((v2.n_vocab, -v2.doc_id))
                  FROM comp c2 JOIN vocab v2 ON v2.doc_id = c2.id
                  WHERE c2.cluster_id = c.cluster_id)
               THEN v.doc_id END) AS keep_id,
           CAST(max(v.n_vocab) AS BIGINT) AS kept_vocab
    FROM comp c JOIN vocab v ON v.doc_id = c.id
    GROUP BY c.cluster_id
    """


@register("cluster_keep_best", oracle=_keep_best_oracle())
def q_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries_pipeline import (
        _corpus,
        _shared_dedup_clusters,
    )

    clusters = _shared_dedup_clusters(spark, sf_dir)
    vocab = (
        _corpus(spark, sf_dir)
        .select("doc_id", F.explode(_norm_tokens("text")).alias("tok"))
        .groupBy("doc_id")
        .agg(F.countDistinct("tok").alias("n_vocab"))
    )
    members = clusters.join(
        vocab, clusters.id == vocab.doc_id
    ).select("cluster_id", "doc_id", "n_vocab")
    # argmax by (n_vocab, -doc_id): richest copy wins, min-id breaks ties
    return members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.expr("max_by(doc_id, struct(n_vocab, -doc_id))").alias("keep_id"),
        F.max("n_vocab").cast("bigint").alias("kept_vocab"),
    )


# ---------------------------------------------------------------------------
# Per-user linear trend of event value over time: least-squares slope via
# the normal equations over integer-exact sums — n·Σxy − Σx·Σy over
# n·Σx² − (Σx)², x in whole seconds since a fixed epoch, y through
# decimal. Everything up to the final division is exact decimal
# arithmetic (associative — partial aggregation safe), and the one
# division is a correctly-rounded double op both engines perform
# identically. One map-side-combinable shuffle on user_id; no windows,
# no per-user sort — THE way to fit millions of tiny regressions at
# 100 TB.
# ---------------------------------------------------------------------------
_TREND_EPOCH = "2024-01-01 00:00:00"


@register(
    "user_value_trend",
    oracle=f"""
    WITH pts AS (
      SELECT user_id,
             CAST(date_diff('second', TIMESTAMP '{_TREND_EPOCH}',
                            CAST(ts AS TIMESTAMP)) AS DECIMAL(38,0)) AS x,
             CAST(value AS DECIMAL(18,6)) AS y
      FROM events
    ),
    s AS (
      SELECT user_id, CAST(count(*) AS DECIMAL(38,0)) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts GROUP BY 1
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CAST(CAST(n * sxy - sx * sy AS DOUBLE) /
                CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE) AS slope
    FROM s
    WHERE n >= 2 AND n * sxx - sx * sx <> 0
    """,
)
def q_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    x = F.expr(
        f"CAST(timestampdiff(SECOND, TIMESTAMP_NTZ '{_TREND_EPOCH}', ts)"
        " AS DECIMAL(38,0))"
    )
    y = F.col("value").cast("decimal(18,6)")
    s = (
        ev.select("user_id", x.alias("x"), y.alias("y"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        s.where((F.col("n") >= 2) & (den != 0))
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_events"),
            (num.cast("double") / den.cast("double")).alias("slope"),
        )
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics (embedding-table QA: dead dims,
# scale drift, outlier dims before indexing/quantization). Values are
# floor-quantized to a 1e-6 grid FIRST — floor of a correctly-rounded
# double product is engine-exact, unlike round() whose half-way rule
# differs — then every aggregate is integer arithmetic; means emerge as
# one final division. posexplode is the only expansion (rows × dim),
# aggregated immediately per dimension: 100 TB of vectors reduce to
# `dim` rows via map-side partial aggregation, no shuffle of raw vectors.
# ---------------------------------------------------------------------------
@register(
    "embedding_dim_stats",
    oracle="""
    WITH cells AS (
      SELECT dim - 1 AS dim,
             CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS q
      FROM (SELECT unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings)
    )
    SELECT dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(q) AS BIGINT) AS q_min,
           CAST(max(q) AS BIGINT) AS q_max,
           CAST(sum(q) AS BIGINT) AS q_sum,
           CAST(CAST(sum(q) AS DOUBLE) / count(*) AS DOUBLE) AS q_mean
    FROM cells
    GROUP BY dim
    """,
)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import spread

    emb = spread(_t(spark, sf_dir, "embeddings"))
    cells = emb.select(
        F.posexplode("embedding").alias("dim", "x")
    ).select(
        F.col("dim").cast("bigint").alias("dim"),
        F.floor(F.col("x").cast("double") * 1000000).cast("bigint").alias("q"),
    )
    return cells.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("q").cast("bigint").alias("q_min"),
        F.max("q").cast("bigint").alias("q_max"),
        F.sum("q").cast("bigint").alias("q_sum"),
        (F.sum("q").cast("double") / F.count(F.lit(1))).alias("q_mean"),
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix: the n-gram-marker classifier
# (operators/text.lang_id) evaluated against the corpus's labeled lang
# column — (true, predicted) counts plus per-true-language recall. The
# eval every heuristic filter needs before it gates a 100 TB ingest. One
# expression-only scan + one shuffle on the (true, pred) cell key; recall
# is a window share over the contingency-table-sized cell frame.
# ---------------------------------------------------------------------------
def _lang_confusion_oracle() -> str:
    from clickhouse_table_copier_spark.queries_pipeline import (
        _LANG_ID_SQL,
        _LANG_MARKERS,
        _lang_score_sql,
    )

    return f"""
    WITH scored AS (
      SELECT lang AS true_lang,
             {_lang_score_sql(_LANG_MARKERS["en"])} AS s_en,
             {_lang_score_sql(_LANG_MARKERS["de"])} AS s_de,
             {_lang_score_sql(_LANG_MARKERS["fr"])} AS s_fr,
             {_lang_score_sql(_LANG_MARKERS["es"])} AS s_es
      FROM documents
    ),
    cells AS (
      SELECT true_lang, {_LANG_ID_SQL} AS pred_lang, count(*) AS n
      FROM scored GROUP BY 1, 2
    )
    SELECT true_lang, pred_lang, CAST(n AS BIGINT) AS n,
           CAST(CAST(n AS DOUBLE) /
                sum(n) OVER (PARTITION BY true_lang) AS DOUBLE) AS recall
    FROM cells
    """


@register("lang_id_confusion", oracle=_lang_confusion_oracle())
def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import spread
    from clickhouse_table_copier_spark.operators.text import (
        lang_id_from_scores,
        lang_scores,
    )

    docs = spread(_t(spark, sf_dir, "documents"))
    scored = docs.select(
        F.col("lang").alias("true_lang"),
        *[c.alias(f"s_{lang}") for lang, c in sorted(lang_scores("text").items())],
    )
    cells = (
        scored.select(
            "true_lang",
            lang_id_from_scores(
                {lang: F.col(f"s_{lang}") for lang in ("de", "en", "es", "fr")}
            ).alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("true_lang")
    return cells.select(
        "true_lang",
        "pred_lang",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.sum("n").over(w)).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Approximate sibling of sliding_distinct_users: per-hour HLL sketch
# partials union-merged across each trailing 24-hour window — 24
# constant-size sketches per hour regardless of user count, the shape
# that ALSO runs incrementally (keep 24 hourly sketches hot, merge on
# tick). Same sketch-gate discipline as hll_partition_merge: every
# window's estimate must land within 5% of exact or approx_ok flags it;
# the exact side comes from the shared sweep-line frame above, computed
# once for both siblings.
# ---------------------------------------------------------------------------
@register(
    "sliding_distinct_users_approx",
    oracle="""
    WITH hu AS (
      SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, user_id
      FROM events
    ),
    hours AS (SELECT DISTINCT h FROM hu),
    fanout AS (
      SELECT h + INTERVAL 1 HOUR * unnest(generate_series(0, 23)) AS wend,
             user_id
      FROM hu
    )
    SELECT f.wend AS window_end_hour,
           CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_exact,
           TRUE AS approx_ok
    FROM fanout f
    JOIN hours ho ON ho.h = f.wend
    GROUP BY 1
    """,
)
def q_sliding_distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hu = ev.select(
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("h"),
        "user_id",
    )
    sketches = hu.groupBy("h").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    hours = sketches.select("h")
    merged = (
        sketches.select(
            F.explode(F.sequence(F.lit(0), F.lit(23))).alias("o"), "h", "sk"
        )
        .select(F.expr("timestampadd(HOUR, o, h)").alias("wend"), "sk")
        .join(hours.withColumnRenamed("h", "wend"), "wend")
        .groupBy("wend")
        .agg(F.expr("hll_union_agg(sk)").alias("sk"))
    )
    exact = _sliding_exact_counts(spark, sf_dir).select(
        F.col("window_end_hour").alias("wend"),
        F.col("n_users").alias("n_exact"),
    )
    gate = (
        F.abs(F.expr("hll_sketch_estimate(sk)").cast("double") - F.col("n_exact"))
        <= F.col("n_exact") * F.lit(0.05)
    )
    return merged.join(exact, "wend").select(
        F.col("wend").alias("window_end_hour"), "n_exact", gate.alias("approx_ok")
    )


# ---------------------------------------------------------------------------
# Top-N-plus-OTHER rollup: per nation, the top-2 part types by revenue
# named explicitly and everything else collapsed into one 'OTHER' row —
# the standard reporting shape that keeps dashboards bounded no matter
# how wide the type dimension grows. Rank is a window over the
# (nation x type) AGGREGATE frame (dimension-sized, partitioned by
# nation — never over fact rows); the relabel + regroup is a second
# dimension-sized agg. Revenue stays decimal-exact end to end.
# ---------------------------------------------------------------------------
@register(
    "nation_type_revenue_other",
    oracle="""
    WITH cells AS (
      SELECT n.n_name AS nation, p.p_type AS ptype,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT nation, ptype, rev,
             row_number() OVER (PARTITION BY nation
                                ORDER BY rev DESC, ptype) AS rk
      FROM cells
    )
    SELECT nation,
           CASE WHEN rk <= 2 THEN ptype ELSE 'OTHER' END AS part_type,
           CAST(sum(rev) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_types
    FROM ranked
    GROUP BY 1, 2
    """,
)
def q_nation_type_revenue_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    cells = (
        # part/supplier scale with SF — strategy left to Catalyst/AQE
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("p_type").alias("ptype"))
        .agg(F.sum(price * (F.lit(1) - disc)).alias("rev"))
    )
    rk = F.row_number().over(
        Window.partitionBy("nation").orderBy(F.desc("rev"), F.asc("ptype"))
    )
    return (
        cells.withColumn("rk", rk)
        .select(
            "nation",
            F.when(F.col("rk") <= 2, F.col("ptype"))
            .otherwise(F.lit("OTHER"))
            .alias("part_type"),
            "rev",
        )
        .groupBy("nation", "part_type")
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
        )
    )
