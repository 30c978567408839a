"""Query batch 6: window functions, set operations, and the remaining
type-matrix corners (huge ints → decimal(38,0), IPv6 canonicalization).

Set ops are SURVEY §2.5's note made concrete: the reference's partition
diff (J2) IS a set operation over stats tables; ``EXCEPT``/``INTERSECT``
express the same classification declaratively. Window functions are the
engine-extension the survey flags for partition-change auditing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.functions.scalars import canonical_ipv6
from clickhouse_table_copier_spark.queries import _t, _tc, register


# ---------------------------------------------------------------------------
# Window: per-customer running order total + order rank. Deterministic
# frame: ordered by (date, orderkey) — unique per customer. Decimal sums.
# ---------------------------------------------------------------------------
@register(
    "customer_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS BIGINT) AS order_rank
    FROM orders
    """,
)
def q_customer_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _tc(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w).cast("bigint").alias("order_rank"),
    )


# ---------------------------------------------------------------------------
# Window: top-2 orders per customer by price (dense ranking pattern).
# ---------------------------------------------------------------------------
@register(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, rnk FROM (
      SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk
      FROM orders
    ) WHERE rnk <= 2
    """,
)
def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .where(F.col("rnk") <= 2)
    )


# ---------------------------------------------------------------------------
# Sessionization: gap-based sessions over the events stream via layered
# windows (lag → gap flag → cumulative session id) — the classic
# event-pipeline rollup, fully deterministic with (ts, event_id) ordering.
# ---------------------------------------------------------------------------
@register(
    "event_sessions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             lag(CAST(ts AS TIMESTAMP)) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts) > 1800 THEN 1
                  ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           min(ts) AS session_start,
           count(*) AS n_events
    FROM sessions GROUP BY 1, 2
    """,
)
def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries import _events_c

    ev = _events_c(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp(F.col("ts").cast("timestamp"))
                - F.unix_timestamp(F.lag(F.col("ts").cast("timestamp")).over(w))
                > 1800
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("bigint")
        .alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Set ops: the partition-diff classification as EXCEPT/INTERSECT over
# (partition, rows) stats tables — J2 expressed with set algebra (§2.5).
# ---------------------------------------------------------------------------
@register(
    "partition_set_ops",
    oracle="""
    WITH src AS (
      SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month, count(*) AS rows_
      FROM lineitem GROUP BY 1
    ),
    dest AS (
      SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month, count(*) AS rows_
      FROM lineitem WHERE CAST(month(l_shipdate) AS INTEGER) <> 3
        AND NOT (CAST(month(l_shipdate) AS INTEGER) = 5 AND l_linenumber = 1)
      GROUP BY 1
    )
    SELECT 'changed_or_missing' AS side, ship_month, rows_ FROM (
      SELECT * FROM src EXCEPT SELECT * FROM dest
    )
    UNION ALL
    SELECT 'identical' AS side, ship_month, rows_ FROM (
      SELECT * FROM src INTERSECT SELECT * FROM dest
    )
    """,
)
def q_partition_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    month = F.expr("CAST(month(l_shipdate) AS INT)").alias("ship_month")
    src = li.groupBy(month).agg(F.count(F.lit(1)).alias("rows_"))
    dest = (
        li.where(
            (F.expr("CAST(month(l_shipdate) AS INT)") != 3)
            & ~(
                (F.expr("CAST(month(l_shipdate) AS INT)") == 5)
                & (F.col("l_linenumber") == 1)
            )
        )
        .groupBy(month)
        .agg(F.count(F.lit(1)).alias("rows_"))
    )
    changed = src.exceptAll(dest).select(
        F.lit("changed_or_missing").alias("side"), "ship_month", "rows_"
    )
    same = src.intersectAll(dest).select(
        F.lit("identical").alias("side"), "ship_month", "rows_"
    )
    return changed.unionAll(same)


# ---------------------------------------------------------------------------
# Huge-int corner of the cast matrix (§1.3): UInt64/Int128-class values as
# decimal(38,0) with exact arithmetic beyond the bigint range.
# ---------------------------------------------------------------------------
@register(
    "huge_int_casts",
    oracle="""
    SELECT CAST(sum(v) AS VARCHAR) AS sum_str,
           CAST(max(v) AS VARCHAR) AS max_str,
           count(*) AS cnt
    FROM (
      SELECT CAST(o_orderkey AS DECIMAL(38,0)) * 1000000000000 + 999999999999 AS v
      FROM orders
    )
    """,
)
def q_huge_int_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # values beyond bigint range, exact decimal(38,0) arithmetic; rendered
    # as strings so the comparison is representation-exact
    orders = _t(spark, sf_dir, "orders")
    v = (
        F.col("o_orderkey").cast("decimal(38,0)") * F.lit(1000000000000)
        + F.lit(999999999999)
    ).alias("v")
    inner = orders.select(v)
    return inner.agg(
        F.sum("v").cast("string").alias("sum_str"),
        F.max("v").cast("string").alias("max_str"),
        F.count(F.lit(1)).alias("cnt"),
    )


# ---------------------------------------------------------------------------
# Array(String) corner of the cast matrix (§1.3): array construction,
# size, element access, containment, and sort — the operations a
# LowCardinality(Array(String)) column needs after the unwrap.
# ---------------------------------------------------------------------------
@register(
    "array_string_ops",
    oracle="""
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_toks,
           toks[1] AS first_tok,
           toks[len(toks)] AS last_tok,
           CAST(list_contains(toks, 'the') AS BOOLEAN) AS has_the,
           list_sort(list_distinct(toks))[1] AS min_tok
    FROM (
      SELECT doc_id, string_split(trim(text), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    )
    """,
)
def q_array_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    base = docs.where(F.length(F.trim("text")) > 0).select(
        "doc_id", F.split(F.trim("text"), " ").alias("toks")
    )
    return base.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.col("toks").getItem(0).alias("first_tok"),
        F.element_at("toks", -1).alias("last_tok"),
        F.array_contains("toks", "the").alias("has_the"),
        F.array_sort(F.array_distinct("toks")).getItem(0).alias("min_tok"),
    )


# ---------------------------------------------------------------------------
# IPv6 canonicalization (sidefunctions.go:129-130): FULL RFC-5952 —
# expand '::', strip leading zeros per group, compress the longest
# (leftmost on tie) run of ≥2 zero groups. Two input variants per order:
# (1) a full 8-group form with padded groups and an internal zero run,
# (2) a '::'-compressed form — exercising expansion, normalization and
# compression. The oracle renders the IDENTICAL algorithm in DuckDB SQL
# (list ops + the same padded-pattern probe, longest run first).
# ---------------------------------------------------------------------------
_IP6_A = "upper(substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))"
_IP6_B = "upper(substring(md5(CAST(o_orderkey AS VARCHAR)), 5, 4))"
_IP6_N = "CAST(o_orderkey % 65536 AS VARCHAR)"
_IP6_RAW8 = f"'  2001:0DB8:' || {_IP6_A} || ':0000:0000:0000:' || {_IP6_B} || ':' || {_IP6_N} || ' '"
_IP6_RAWDC = f"'2001:DB8:' || {_IP6_A} || '::' || {_IP6_N}"

_IP6_LGRP = "list_filter(string_split(string_split(s, '::')[1], ':'), x -> x <> '')"
_IP6_RGRP = "list_filter(string_split(coalesce(string_split(s, '::')[2], ''), ':'), x -> x <> '')"

_IP6_BRANCHES = "\n".join(
    f"""WHEN instr(p, '{":" + "0:" * n}') > 0 THEN
             regexp_replace(substring(p, 1, instr(p, '{":" + "0:" * n}') - 1), '^:', '')
             || '::' ||
             regexp_replace(substring(p, instr(p, '{":" + "0:" * n}') + {2 * n + 1}), ':$', '')"""
    for n in range(8, 1, -1)
)


@register(
    "ipv6_canon",
    oracle=f"""
    WITH raws AS (
      SELECT o_orderkey, 1 AS variant, {_IP6_RAW8} AS raw FROM orders
      UNION ALL
      SELECT o_orderkey, 2, {_IP6_RAWDC} FROM orders
    ),
    s1 AS (SELECT o_orderkey, variant, lower(trim(raw)) AS s FROM raws),
    ex AS (
      SELECT o_orderkey, variant, s,
        CASE WHEN instr(s, '::') > 0 THEN
          list_concat(list_concat(
            {_IP6_LGRP},
            ['0' FOR i IN range(0, greatest(0, 8 - len({_IP6_LGRP}) - len({_IP6_RGRP})))]),
            {_IP6_RGRP})
        ELSE string_split(s, ':') END AS grps
      FROM s1
    ),
    nm AS (
      SELECT o_orderkey, variant, s, len(grps) AS ng,
             array_to_string(list_transform(grps,
                 g -> CASE WHEN regexp_replace(g, '^0+', '') = '' THEN '0'
                           ELSE regexp_replace(g, '^0+', '') END), ':') AS n8
      FROM ex
    ),
    pd AS (SELECT o_orderkey, variant, s, ng, n8, ':' || n8 || ':' AS p FROM nm)
    SELECT o_orderkey, CAST(variant AS INTEGER) AS variant,
           CASE WHEN ng <> 8 THEN s
           {_IP6_BRANCHES}
           ELSE n8 END AS ip6_canon
    FROM pd
    """,
)
def q_ipv6_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    a = F.upper(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4))
    b = F.upper(F.substring(F.md5(F.col("o_orderkey").cast("string")), 5, 4))
    n = (F.col("o_orderkey") % 65536).cast("string")
    raw8 = F.concat(
        F.lit("  2001:0DB8:"), a, F.lit(":0000:0000:0000:"), b, F.lit(":"), n, F.lit(" ")
    )
    rawdc = F.concat(F.lit("2001:DB8:"), a, F.lit("::"), n)
    variants = orders.select(
        "o_orderkey",
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("variant"), raw8.alias("raw")),
                F.struct(F.lit(2).alias("variant"), rawdc.alias("raw")),
            )
        ).alias("e"),
    )
    return variants.select(
        "o_orderkey",
        F.col("e.variant").alias("variant"),
        canonical_ipv6(F.col("e.raw")).alias("ip6_canon"),
    )
