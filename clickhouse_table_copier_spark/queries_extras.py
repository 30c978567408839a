"""Query batch 7: winnowing fingerprints, exact percentiles, SQL front-end.

Winnowing (Schleimer/Wilkerson/Aiken's local fingerprinting) is the
rolling-hash document fingerprint a plagiarism/near-dup pipeline keeps per
document: hash every character k-gram, slide a window of w positions, keep
each window's minimum hash — guaranteeing any shared substring of length
≥ w+k−1 contributes a shared fingerprint. Expressed here entirely with
window functions over an exploded position index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register

K = 8   # k-gram length (chars)
W = 16  # winnowing window (positions)

_NORM = "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# Winnowing fingerprints: per doc, the distinct set of window-min k-gram
# hashes, counted (the fingerprint SET is what a dedup index stores; the
# count + min/max make a compact oracle-checkable projection of it).
# ---------------------------------------------------------------------------
@register(
    "doc_winnowing",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, {_NORM.format(c="text")} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, pos,
             CAST('0x' || substring(md5(substring(t, pos, {K})), 1, 15) AS BIGINT) AS h
      FROM norm, LATERAL (SELECT unnest(range(1, length(t) - {K} + 2)) AS pos)
      WHERE length(t) >= {K}
    ),
    winmins AS (
      SELECT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {W - 1} FOLLOWING) AS wm
      FROM grams
    ),
    fps AS (SELECT DISTINCT doc_id, wm FROM winmins)
    SELECT doc_id, count(*) AS n_fingerprints,
           min(wm) AS min_fp, max(wm) AS max_fp
    FROM fps GROUP BY doc_id
    """,
)
def q_doc_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import normalized_text, spread
    from clickhouse_table_copier_spark.queries import _tc

    docs = spread(_tc(spark, sf_dir, "documents"))
    norm = docs.select("doc_id", normalized_text("text").alias("t"))
    # short docs are dropped by the Generate itself: explode(NULL) emits
    # no rows, exactly like the former where(length(t) >= K) — but a
    # Filter on the aliased t was pushed below the projection, re-inlining
    # the two-pass regex normalize so it ran TWICE per doc (once serially
    # on the scan task before spread's exchange; plan r16 before-file).
    # This way the normalize is computed once, after the exchange.
    grams = norm.select(
        "doc_id",
        F.explode(
            F.when(F.length("t") >= K, F.sequence(F.lit(1), F.length("t") - K + 1))
        ).alias("pos"),
        F.col("t"),
    ).select(
        "doc_id",
        "pos",
        F.conv(F.substring(F.md5(F.expr(f"substring(t, pos, {K})")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, W - 1)
    winmins = grams.select("doc_id", F.min("h").over(w).alias("wm"))
    fps = winmins.distinct()
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("wm").alias("min_fp"),
        F.max("wm").alias("max_fp"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles per group (verified bit-identical interpolation
# between Spark percentile() and DuckDB quantile_cont()).
# ---------------------------------------------------------------------------
@register(
    "order_value_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           count(*) AS cnt
    FROM orders GROUP BY 1
    """,
)
def q_order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.count(F.lit(1)).alias("cnt"),
    )


# ---------------------------------------------------------------------------
# IVF ANN — the TRAINED path, fully oracled. Lloyd training is made
# cross-engine reproducible by train_centroids_exact: every per-(cell,dim)
# mean is an explicit left-to-right fold over values sorted by vec_id,
# which the oracle mirrors with list_reduce(list(x ORDER BY vec_id)) / n.
# The oracle then replays the SAME two Lloyd iterations as CTEs (seed
# cells → chain-distance argmin assignment → ordered-fold means → trained
# cells), and runs assignment + probe selection + in-cell exact top-k
# against the trained centroids — so training AND search are both
# value-checked (rounds 1-3 had this query rows-only).
# ---------------------------------------------------------------------------
IVF_K = 8
IVF_ITERS = 2
IVF_NPROBE = 3


def _ivf_trained_oracle() -> str:
    from clickhouse_table_copier_spark.queries_similarity import (
        _dot_chain_sql,
        _norm_chain_sql,
        _sqdist_chain_sql,
    )

    parts = [
        f"""
    WITH cents0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
             CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings ORDER BY vec_id LIMIT {IVF_K}
    )"""
    ]
    prev = "cents0"
    for i in range(1, IVF_ITERS + 1):
        parts.append(
            f""",
    pairs{i} AS (
      SELECT e.vec_id, c.cell, {_sqdist_chain_sql("e.embedding", "c.cv")} AS d
      FROM embeddings e, {prev} c
    ),
    assigned{i} AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        FROM pairs{i}
      ) WHERE rn = 1
    ),
    means{i} AS (
      SELECT cell, pos,
             list_reduce(list(x ORDER BY vec_id), (acc, x) -> acc + x) / count(*) AS m
      FROM (
        SELECT a.cell, e.vec_id,
               generate_subscripts(e.embedding, 1) AS pos,
               CAST(unnest(e.embedding) AS DOUBLE) AS x
        FROM assigned{i} a JOIN embeddings e USING (vec_id)
      )
      GROUP BY cell, pos
    ),
    cents{i} AS (
      SELECT p.cell, COALESCE(m.cv, p.cv) AS cv
      FROM {prev} p LEFT JOIN (
        SELECT cell, list(m ORDER BY pos) AS cv FROM means{i} GROUP BY cell
      ) m USING (cell)
    )"""
        )
        prev = f"cents{i}"
    parts.append(
        f""",
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    probes AS (
      SELECT c.cell FROM {prev} c, q
      ORDER BY {_sqdist_chain_sql("q.qv", "c.cv")} ASC, c.cell ASC
      LIMIT {IVF_NPROBE}
    ),
    fpairs AS (
      SELECT e.vec_id, e.embedding, c.cell,
             {_sqdist_chain_sql("e.embedding", "c.cv")} AS d
      FROM embeddings e, {prev} c
      WHERE e.vec_id <> 0
    ),
    fassigned AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT vec_id, embedding, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        FROM fpairs
      ) WHERE rn = 1
    ),
    cand AS (
      SELECT a.vec_id, a.embedding, q.qv
      FROM fassigned a, q
      WHERE a.cell IN (SELECT cell FROM probes)
    )
    SELECT vec_id,
           round(({_dot_chain_sql("embedding", "qv")})
                 / ({_norm_chain_sql("embedding")} * {_norm_chain_sql("qv")}), 6)
             AS cosine_sim
    FROM cand
    ORDER BY cosine_sim DESC, vec_id ASC
    LIMIT 10"""
    )
    return "".join(parts)


@register("similarity_ivf_topk", oracle=_ivf_trained_oracle())
def q_similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.ivf import (
        ivf_topk,
        train_centroids_exact,
    )

    emb = _t(spark, sf_dir, "embeddings")
    centroids = train_centroids_exact(emb, k=IVF_K, iters=IVF_ITERS)
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    return ivf_topk(
        emb.where(F.col("vec_id") != 0), centroids, qvec, k=10, n_probe=IVF_NPROBE
    )


# ---------------------------------------------------------------------------
# AS-OF join (ClickHouse ASOF JOIN semantics — an operator Spark lacks,
# composed from union + window carry-forward in operators/temporal_joins).
# Snapshots table derives deterministically from events (every 10th event
# is a "status change"); the rest of the events as-of join to their
# latest prior status. DuckDB validates with its native ASOF LEFT JOIN.
# ---------------------------------------------------------------------------
@register(
    "asof_join_status",
    oracle="""
    WITH snapshots AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value AS status_value
      FROM events WHERE event_id % 10 = 0
    ),
    obs AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE event_id % 10 <> 0
    )
    SELECT o.event_id, o.user_id, s.status_value
    FROM obs o ASOF LEFT JOIN snapshots s
      ON o.user_id = s.user_id AND o.ts >= s.ts
    """,
)
def q_asof_join_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.temporal_joins import asof_join
    from clickhouse_table_copier_spark.queries import _events_c

    ev = _events_c(spark, sf_dir)
    snapshots = ev.where(F.col("event_id") % 10 == 0).select(
        "user_id", "ts", F.col("value").alias("status_value")
    )
    obs = ev.where(F.col("event_id") % 10 != 0).select("user_id", "ts", "event_id")
    joined = asof_join(obs, snapshots, key="user_id", time_col="ts")
    return joined.select("event_id", "user_id", "status_value")


# ---------------------------------------------------------------------------
# Range join: events banded by value intervals per event_type — the
# broadcast non-equi interval join (operators/temporal_joins.range_join).
# ---------------------------------------------------------------------------
@register(
    "range_join_value_bands",
    oracle="""
    WITH bands AS (
      SELECT t.event_type, CAST(b.b AS INTEGER) AS band_id,
             CAST(b.b * 50 AS DOUBLE) AS band_start,
             CAST((b.b + 1) * 50 AS DOUBLE) AS band_end
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(range(0, 5)) AS b) b
    )
    SELECT e.event_id, e.event_type, bands.band_id
    FROM events e
    JOIN bands ON e.event_type = bands.event_type
              AND e.value >= bands.band_start AND e.value < bands.band_end
    """,
)
def q_range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.temporal_joins import range_join
    from clickhouse_table_copier_spark.queries import _events

    ev = _events(spark, sf_dir)
    types = ev.select("event_type").distinct()
    # Bands generated by explode (per-row generator), not crossJoin — keeps the
    # global no-CartesianProduct plan invariant tests/test_plan_properties.py pins.
    bands = types.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("band_id"),
    ).select(
        "event_type",
        F.col("band_id").cast("int").alias("band_id"),
        (F.col("band_id") * 50).cast("double").alias("band_start"),
        ((F.col("band_id") + 1) * 50).cast("double").alias("band_end"),
    )
    joined = range_join(
        ev.select("event_id", "event_type", F.col("value").alias("t")),
        bands,
        key="event_type",
        time_col="t",
        start_col="band_start",
        end_col="band_end",
    )
    return joined.select("event_id", "event_type", "band_id")


# ---------------------------------------------------------------------------
# Fuzzy name matching: near-identical entity names by edit distance — the
# entity-resolution primitive (record linkage across sources). The round-3
# length-bucket blocking was degenerate on this data (every customer name is
# exactly 18 chars, so the "blocked" join was a full O(n²) self-join).
# Replaced with the deletion-neighborhood join (operators/fuzzy.py): each
# name explodes to its ≤3-deletion variants, candidates are pairs sharing a
# variant (exact filter — any ≤3-op edit script leaves a common ≤3-deletion
# skeleton), and one levenshtein per CANDIDATE pair verifies. Join fan-out
# is bounded by variant document frequency, never by n. The oracle stays the
# brute-force pairwise spec.
# ---------------------------------------------------------------------------
@register(
    "fuzzy_name_pairs",
    oracle="""
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS edit_dist
    FROM customer a JOIN customer b
      ON a.c_custkey < b.c_custkey
     AND abs(length(a.c_name) - length(b.c_name)) <= 2
    WHERE levenshtein(a.c_name, b.c_name) <= 3
    """,
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.fuzzy import (
        edit_distance_self_join,
    )

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return edit_distance_self_join(
        cust, "c_custkey", "c_name", max_dist=3, len_tol=2
    )


# ---------------------------------------------------------------------------
# Hypertable rollup: hour/day/month continuous-aggregate tables computed
# in one pass (operators/rollup_time.time_rollup).
# ---------------------------------------------------------------------------
@register(
    "hypertable_rollup",
    oracle="""
    WITH src AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ),
    levels AS (
      SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket, event_type, value FROM src
      UNION ALL
      SELECT 'day', date_trunc('day', ts), event_type, value FROM src
      UNION ALL
      SELECT 'month', date_trunc('month', ts), event_type, value FROM src
    )
    SELECT grain, bucket, event_type,
           count(*) AS n_rows,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM levels GROUP BY 1, 2, 3
    """,
)
def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.rollup_time import time_rollup
    from clickhouse_table_copier_spark.queries import _events_c

    ev = _events_c(spark, sf_dir)
    return time_rollup(ev, "ts", ["event_type"], "value")


# ---------------------------------------------------------------------------
# SQL front-end: the same engine through spark.sql over registered views —
# demonstrating that every capability is reachable from plain SQL (the
# reference's users speak SQL; parity includes the front door).
# ---------------------------------------------------------------------------
@register(
    "sql_frontend_revenue",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def q_sql_frontend_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"ctc_{t}")
    return spark.sql(
        """
        SELECT n.n_name AS nation, r.r_name AS region,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM ctc_lineitem l
        JOIN ctc_orders o ON l.l_orderkey = o.o_orderkey
        JOIN ctc_customer c ON o.o_custkey = c.c_custkey
        JOIN ctc_nation n ON c.c_nationkey = n.n_nationkey
        JOIN ctc_region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
        """
    )


# ---------------------------------------------------------------------------
# Table profiling: per-column null/distinct/bounds stats in ONE scan —
# the DESCRIBE + system.columns-stats analogue a sync tool consults
# before choosing partition keys and cast plans (operators/profile.py).
# Doubles render via %.2f and timestamps via %Y-%m-%d so both engines
# produce identical bound strings.
# ---------------------------------------------------------------------------
@register(
    "table_profile",
    oracle="""
    SELECT 'l_quantity' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(l_quantity) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           printf('%.2f', min(l_quantity)) AS min_val,
           printf('%.2f', max(l_quantity)) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(l_returnflag) AS BIGINT),
           CAST(count(DISTINCT l_returnflag) AS BIGINT),
           min(l_returnflag), max(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(l_shipdate) AS BIGINT),
           CAST(count(DISTINCT l_shipdate) AS BIGINT),
           strftime(min(l_shipdate), '%Y-%m-%d'), strftime(max(l_shipdate), '%Y-%m-%d')
    FROM lineitem
    UNION ALL
    SELECT 'l_linenumber', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(l_linenumber) AS BIGINT),
           CAST(count(DISTINCT l_linenumber) AS BIGINT),
           CAST(min(l_linenumber) AS VARCHAR), CAST(max(l_linenumber) AS VARCHAR)
    FROM lineitem
    """,
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.profile import profile_table

    li = _t(spark, sf_dir, "lineitem")
    fmt = {
        "l_quantity": lambda c: F.format_string("%.2f", c),
        "l_shipdate": lambda c: F.date_format(c, "yyyy-MM-dd"),
    }
    return profile_table(
        li, ["l_quantity", "l_returnflag", "l_shipdate", "l_linenumber"], fmt
    )


# ---------------------------------------------------------------------------
# Equi-width histogram: events.value bucketed per event_type — the
# numeric-profiling companion (floor on exact doubles truncates
# identically in both engines; top edge clamped into the last bucket).
# ---------------------------------------------------------------------------
@register(
    "value_histogram",
    oracle="""
    SELECT event_type,
           CAST(least(floor(value / 50), 9) AS INTEGER) AS bucket,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries import _events

    ev = _events(spark, sf_dir)
    bucket = F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("int")
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
    )


# ---------------------------------------------------------------------------
# ClickHouse SQL dialect front-end: the reference's users' SQL — toInt32 /
# toInt64 / formatReadableSize — runs VERBATIM on this engine after
# functions.ch_dialect registers them as Catalyst SQL scalar functions
# (inlined expressions, no UDFs). The oracle renders the identical
# semantics: truncating casts (DuckDB CAST rounds → trunc) and the same
# ANSI readable-size body (readable_size_sql generates both sides).
# ---------------------------------------------------------------------------
def _ch_dialect_oracle() -> str:
    from clickhouse_table_copier_spark.functions.ch_dialect import readable_size_sql

    sum_expr = "CAST(sum(CAST(trunc(value) AS INTEGER)) AS BIGINT) * 1048576"
    return f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(trunc(max(value)) AS INTEGER) AS max_i,
           {readable_size_sql(f"({sum_expr})")} AS readable
    FROM events
    GROUP BY event_type
    """


@register("ch_dialect_sql", oracle=_ch_dialect_oracle())
def q_ch_dialect_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.functions.ch_dialect import (
        register_clickhouse_functions,
    )
    from clickhouse_table_copier_spark.queries import _events

    register_clickhouse_functions(spark)
    _events(spark, sf_dir).createOrReplaceTempView("ctc_dialect_events")
    return spark.sql(
        """
        SELECT event_type,
               toInt64(count(*)) AS cnt,
               toInt32(max(value)) AS max_i,
               formatReadableSize(toInt64(sum(toInt32(value))) * 1048576) AS readable
        FROM ctc_dialect_events
        GROUP BY event_type
        """
    )


# ---------------------------------------------------------------------------
# Dialect query #2 — the reference's actual reporting shape, verbatim:
# per-month partition stats with toYYYYMM grouping and formatReadableSize
# rendering (the query a ClickHouse user runs against system.parts; here
# it runs over the data itself, same SQL).
# ---------------------------------------------------------------------------
def _ch_dialect_partitions_oracle() -> str:
    from clickhouse_table_copier_spark.functions.ch_dialect import readable_size_sql

    approx_bytes = "CAST(count(*) AS BIGINT) * 128"
    return f"""
    SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INTEGER) AS ym,
           CAST(count(*) AS BIGINT) AS rows_,
           {readable_size_sql(f"({approx_bytes})")} AS readable_rows
    FROM lineitem
    GROUP BY 1
    """


@register("ch_dialect_partitions", oracle=_ch_dialect_partitions_oracle())
def q_ch_dialect_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.functions.ch_dialect import (
        register_clickhouse_functions,
    )

    register_clickhouse_functions(spark)
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("ctc_dialect_li")
    return spark.sql(
        """
        SELECT toYYYYMM(toDate(l_shipdate)) AS ym,
               toInt64(count(*)) AS rows_,
               formatReadableSize(toInt64(count(*)) * 128) AS readable_rows
        FROM ctc_dialect_li
        GROUP BY toYYYYMM(toDate(l_shipdate))
        """
    )


# ---------------------------------------------------------------------------
# Data-quality expectations gate: five rule kinds over orders, evaluated
# in ONE aggregation pass (operators/expectations.py) — the validation
# stage a pipeline runs before ingestion. Oracle mirrors each rule as an
# explicit aggregate.
# ---------------------------------------------------------------------------
@register(
    "dq_expectations",
    oracle="""
    WITH agg AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_rows,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS null_frac_cust,
             CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS DOUBLE) AS dup_keys,
             CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                            AND (o_totalprice < 0 OR o_totalprice > 1000000)
                      THEN 1 ELSE 0 END) AS DOUBLE) AS oob_price,
             CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('O','F','P')
                      THEN 1 ELSE 0 END) AS DOUBLE) AS bad_status
      FROM orders
    )
    SELECT 0 AS rule_idx, 'o_custkey' AS column_, 'not_null' AS check_,
           null_frac_cust AS observed,
           CAST(CASE WHEN null_frac_cust <= 0.0 THEN 1 ELSE 0 END AS INTEGER) AS passed
    FROM agg
    UNION ALL
    SELECT 1, 'o_orderkey', 'unique', dup_keys,
           CAST(CASE WHEN dup_keys = 0 THEN 1 ELSE 0 END AS INTEGER) FROM agg
    UNION ALL
    SELECT 2, 'o_totalprice', 'between', oob_price,
           CAST(CASE WHEN oob_price = 0 THEN 1 ELSE 0 END AS INTEGER) FROM agg
    UNION ALL
    SELECT 3, 'o_orderstatus', 'in_set', bad_status,
           CAST(CASE WHEN bad_status = 0 THEN 1 ELSE 0 END AS INTEGER) FROM agg
    UNION ALL
    SELECT 4, '', 'min_rows', n_rows,
           CAST(CASE WHEN n_rows >= 100 THEN 1 ELSE 0 END AS INTEGER) FROM agg
    """,
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.expectations import validate

    orders = _t(spark, sf_dir, "orders")
    report = validate(
        orders,
        [
            {"column": "o_custkey", "check": "not_null", "max_null_frac": 0.0},
            {"column": "o_orderkey", "check": "unique"},
            {"column": "o_totalprice", "check": "between", "lo": 0, "hi": 1000000},
            {"column": "o_orderstatus", "check": "in_set", "values": ["O", "F", "P"]},
            {"column": None, "check": "min_rows", "n": 100},
        ],
    )
    return report.select(
        "rule_idx",
        F.col("column").alias("column_"),
        F.col("check").alias("check_"),
        "observed",
        "passed",
    )
