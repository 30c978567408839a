"""Round-7 prep: the final three TPC-H shapes (Q12/Q14/Q20 adapted),
implemented and oracle-tested now, REGISTERED NEXT ROUND.

The driver's correctness gate verifies only the first 50 registered
queries per round and the round-6 window is exactly full
(registry_evidence.must_front == 50), so registering these now would
push evidence-required queries out of the window
(tests/test_registry_order.py would fail). They ship here with full
DuckDB parity enforced by tests/test_round7_prep.py — the same
compare() harness the registry gate uses — and move to @register at
round-7 start when the window rotates.

Shapes (fixture has no l_shipmode / partsupp; adaptations keep each
query's distinctive physical-plan exercise):

* Q12 — dual conditional CASE-sums over one filtered fact scan,
  grouped by ship month: the "two counts in one pass" shape.
* Q14 — promo revenue share: a ratio of conditional sum to total sum in
  a single joined aggregate — no second scan, no subquery.
* Q20 — nested semi-join chain: per-(part, supplier) shipped quantity
  vs half the part's total — two stacked aggregates joined back, then a
  semi-join onto the supplier dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t

# name -> (spark_fn, oracle_sql); promoted to register() in round 7.
PREP_QUERIES: dict = {}
PREP_ORACLES: dict[str, str] = {}


def _prep(name: str, oracle: str):
    def deco(fn):
        PREP_QUERIES[name] = fn
        PREP_ORACLES[name] = oracle
        return fn

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
