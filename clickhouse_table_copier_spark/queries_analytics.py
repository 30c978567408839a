"""Query batch 3: analytic breadth over the star schema + events.

The reference ships aggregation/sort/filter SQL to ClickHouse; these queries
demonstrate the same relational semantics executed natively by Catalyst —
grouped aggregation with decimal-exact money math, broadcast-able dimension
joins, deterministic top-k, and the tuple partition key (event_type,
to_date(ts)) that the reference's GenerateWhere mishandles for arity > 2
(sidefunctions.go:227-231).

Scale notes are attached per query; the common thread: aggregate before
join where possible, broadcast dimensions, keep money in decimal (exact AND
fixed-width — faster to shuffle than strings, immune to FP reorder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _events, _events_c, _t, _tc, register


# ---------------------------------------------------------------------------
# Pricing summary (TPC-H Q1 shape) — grouped agg over the fact table.
# Money goes through decimal(18,2) BEFORE summing: exact (reorder-proof)
# and map-side-combinable. avg is sum/count of exact decimals → one
# deterministic double division at the end.
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _tc(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Dimension join: orders per nation — customer joined to nation (tiny dim →
# broadcast; Spark picks BroadcastHashJoin from stats), aggregated AFTER
# the join on the already-reduced orders side? No: orders is the fact, so
# pre-aggregate orders per custkey is pointless (custkey ~unique) — instead
# join orders→customer (broadcast at these SFs; shuffle-hash at 100 TB with
# AQE handling skew) and aggregate once.
# ---------------------------------------------------------------------------
@register(
    "orders_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) AS order_cnt,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _tc(spark, sf_dir, "orders")
    customer = _tc(spark, sf_dir, "customer")
    nation = _tc(spark, sf_dir, "nation")
    return (
        # customer scales with SF — no broadcast hint; Catalyst/AQE
        # broadcast it at test scale and shuffle it on a cluster
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic top-k: most-ordered parts. Ties broken by the unique key so
# LIMIT is stable across engines. Top-k in Spark = TakeOrderedAndProject
# (no global sort of the full aggregate).
# ---------------------------------------------------------------------------
@register(
    "top_parts_by_quantity",
    oracle="""
    SELECT l_partkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           count(*) AS line_cnt
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY total_qty DESC, l_partkey ASC
    LIMIT 10
    """,
)
def q_top_parts_by_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _tc(spark, sf_dir, "lineitem")
    return (
        df.groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
        .orderBy(F.desc("total_qty"), F.asc("l_partkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Tuple partition key over events: (event_type, event_date) — the multi-key
# grouped stats + the 3-key AND predicate done right (the reference's
# GenerateWhere breaks at arity > 2, sidefunctions.go:231).
# event_date derives from epoch arithmetic (TZ-independent on both sides).
# ---------------------------------------------------------------------------
@register(
    "events_multikey_stats",
    oracle="""
    SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
           count(*) AS rows_,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_multikey_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_c(spark, sf_dir)
    return (
        df.groupBy("event_type", F.col("ts").cast("date").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("rows_"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
    )


@register(
    "events_multikey_predicate",
    oracle="""
    SELECT count(*) AS cnt FROM events
    WHERE event_type = 'click'
      AND CAST(CAST(ts AS TIMESTAMP) AS DATE) = DATE '2024-01-05'
      AND user_id % 2 = 0
    """,
)
def q_events_multikey_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.plans.partition_spec import (
        PartitionField,
        PartitionSpec,
    )
    from clickhouse_table_copier_spark.plans.predicates import equality_predicate

    df = _events(spark, sf_dir)
    spec = PartitionSpec.of(
        PartitionField("event_type", "event_type"),
        PartitionField("event_date", "CAST(ts AS DATE)"),
        PartitionField("user_parity", "user_id % 2"),
    )
    import datetime

    pred = equality_predicate(spec, ["click", datetime.date(2024, 1, 5), 0])
    return df.where(pred).agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# Rollup: partition stats at (returnflag, month), (returnflag), and grand
# total in one pass — the hierarchy view of A4's grouped stats.
# ---------------------------------------------------------------------------
@register(
    "partition_stats_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(CAST(ship_month AS VARCHAR), '<all>') AS month_s,
           rows_, qty_sum
    FROM (
      SELECT l_returnflag, CAST(month(l_shipdate) AS INTEGER) AS ship_month,
             count(*) AS rows_,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, CAST(month(l_shipdate) AS INTEGER))
    )
    """,
)
def q_partition_stats_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "lineitem")
    rolled = (
        df.rollup(
            "l_returnflag",
            F.expr("CAST(month(l_shipdate) AS INT)").alias("ship_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("rows_"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty_sum"),
        )
    )
    return rolled.select(
        F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
        F.coalesce(F.col("ship_month").cast("string"), F.lit("<all>")).alias(
            "month_s"
        ),
        "rows_",
        "qty_sum",
    )


# ---------------------------------------------------------------------------
# Exact distinct counts per partition (ClickHouse uniqExact analogue).
# ---------------------------------------------------------------------------
@register(
    "distinct_parts_per_month",
    oracle="""
    SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
           count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_supps
    FROM lineitem GROUP BY 1
    """,
)
def q_distinct_parts_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "lineitem")
    return df.groupBy(
        F.expr("CAST(month(l_shipdate) AS INT)").alias("ship_month")
    ).agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
    )


# ---------------------------------------------------------------------------
# Pivot-shaped matrix: months × return flags as wide columns, expressed as
# conditional aggregation (portable to any SQL engine, unlike PIVOT
# dialects). Spark executes it as one hash aggregate.
# ---------------------------------------------------------------------------
@register(
    "returnflag_month_matrix",
    oracle="""
    SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
           count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS flag_a,
           count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS flag_n,
           count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS flag_r,
           CAST(sum(CASE WHEN l_returnflag = 'R'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE)
             AS returned_value
    FROM lineitem GROUP BY 1
    """,
)
def q_returnflag_month_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    return df.groupBy(
        F.expr("CAST(month(l_shipdate) AS INT)").alias("ship_month")
    ).agg(
        F.count(F.when(F.col("l_returnflag") == "A", 1)).alias("flag_a"),
        F.count(F.when(F.col("l_returnflag") == "N", 1)).alias("flag_n"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("flag_r"),
        F.sum(F.when(F.col("l_returnflag") == "R", price))
        .cast("double")
        .alias("returned_value"),
    )


# ---------------------------------------------------------------------------
# Anti/semi joins — the J2 partition-diff classification is exactly an
# anti join (missing) + semi join (present); shown here on the star
# schema: customers with vs without orders.
# ---------------------------------------------------------------------------
@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "customer_segments_with_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)
def q_customer_segments_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# CUBE with grouping-set ids: all four aggregation levels of
# (returnflag, linestatus) in one pass.
# ---------------------------------------------------------------------------
@register(
    "flag_status_cube",
    oracle="""
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER) AS gid,
           count(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_flag_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "lineitem")
    return (
        df.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("int")
            .alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "gid",
            "cnt",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: shipping-priority revenue — 3-way join, date filters,
# decimal-exact revenue, deterministic top-k.
# ---------------------------------------------------------------------------
@register(
    "shipping_priority_revenue",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 20
    """,
)
def q_shipping_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cutoff = "1995-03-15 00:00:00"
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp_ntz"))
        .join(li, F.col("l_orderkey") == o.o_orderkey)
        .where(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp_ntz"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item losses per customer — selective filter
# BEFORE the join (the optimizer-friendly formulation), top 20.
# ---------------------------------------------------------------------------
@register(
    "returned_item_losses",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS lost_revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def q_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.where(F.col("l_returnflag") == "R")  # filter before the join
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# J1 — schema intersection as a queryable result: common columns of
# lineitem and a retyped/reduced destination schema, in SOURCE order
# (ReturnValuesString, sidefunctions.go:78-97). The oracle states the
# expected intersection as literals — the assertion that the engine's
# planner-side set logic is right.
# ---------------------------------------------------------------------------
@register(
    "schema_intersection",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'l_orderkey'), (2, 'l_partkey'), (3, 'l_suppkey'),
      (4, 'l_linenumber'), (5, 'l_quantity'), (6, 'l_returnflag'),
      (7, 'l_shipdate')
    ) AS t(pos, col_name)
    """,
)
def q_schema_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.plans.casting import common_columns

    src = _t(spark, sf_dir, "lineitem")
    # destination: subset of columns, some retyped, plus an extra column
    dest = src.selectExpr(
        "CAST(l_orderkey AS STRING) AS l_orderkey",
        "l_partkey",
        "l_suppkey",
        "CAST(l_linenumber AS BIGINT) AS l_linenumber",
        "CAST(l_quantity AS DECIMAL(18,2)) AS l_quantity",
        "l_returnflag",
        "CAST(l_shipdate AS DATE) AS l_shipdate",
        "'extra' AS dest_only_col",
    ).limit(0)
    common = common_columns(src, dest)
    rows = [(i + 1, c) for i, c in enumerate(common)]
    return spark.createDataFrame(rows, "pos INT, col_name STRING")
