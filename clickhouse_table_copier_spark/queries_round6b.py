"""Query batch: round-6b — the remaining classic TPC-H join shapes.

The fixture schema lacks ``partsupp`` and lineitem's commit/receipt
dates, so each query keeps its reference shape (the join strategy and
the subquery class it exercises) while re-anchoring predicates on the
columns that exist:

- Q8  market share      — 7-table star, conditional-aggregate ratio
- Q9  profit by nation  — part-filtered fact, 2-d (nation × year) agg
- Q15 top supplier      — scalar-max subquery as a broadcast equi-join
- Q16 part variety      — COUNT DISTINCT + NOT IN as broadcast anti-join
- Q18 large orders      — HAVING subquery as a self-semi-join
- Q19 disjunctive rev   — OR-of-conjunctions predicate pushdown
- Q21 waiting supplier  — EXISTS / NOT EXISTS folded into one grouped agg
- Q22 idle balances     — scalar-avg subquery + anti-join, integer-exact

Cross-engine determinism: money flows through DECIMAL(18,2) (exact,
associative) and is cast to double only at output; ratio columns are a
single correctly-rounded division of two exact decimals; the Q22
"above average" comparison is cross-multiplied (bal·n > Σbal) so no
division happens at all; quantity sums are integer-valued doubles
(exact in IEEE754 far below 2^53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register

_DEC = "decimal(18,2)"


def _rev():
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,2)))"
)


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share. The widest star in the suite —
# lineitem joined to FIVE dimension branches (part, orders→customer→
# nation→region on the demand side, supplier→nation on the supply side).
# Broadcast hints go ONLY on the guaranteed-small sides (nation, region,
# and the 25-row region-filtered nation set); customer, supplier, and
# the part slice scale linearly with SF, so their join strategy is left
# to Catalyst + AQE — broadcast at test scale, shuffled hash/SMJ on a
# cluster. The share is a conditional aggregate — sum(CASE
# supplier-nation)/sum(all) — per year, never a second pass.
# ---------------------------------------------------------------------------
@register(
    "nation_market_share",
    oracle=f"""
    WITH f AS (
      SELECT year(o.o_orderdate) AS order_year,
             {_REV_SQL.replace('l_', 'l.l_')} AS rev,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    )
    SELECT order_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             AS nation_revenue,
           CAST(sum(rev) AS DOUBLE) AS total_revenue,
           CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(rev) AS DOUBLE) AS mkt_share
    FROM f GROUP BY order_year
    """,
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    # demand-side nation keys restricted to the AMERICA region — a
    # 25-row broadcast that prunes customers before the fact join
    am_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    nat_rev = F.when(F.col("supp_nation") == "NATION_1", F.col("rev")).otherwise(
        F.lit("0").cast(_DEC)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(am_nations), F.col("c_nationkey") == F.col("cn_key"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            _rev().alias("rev"),
            "supp_nation",
        )
        .groupBy("order_year")
        .agg(
            F.sum(nat_rev).alias("nr"),
            F.sum("rev").alias("tr"),
        )
        .select(
            "order_year",
            F.col("nr").cast("double").alias("nation_revenue"),
            F.col("tr").cast("double").alias("total_revenue"),
            (F.col("nr").cast("double") / F.col("tr").cast("double")).alias(
                "mkt_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: profit by supplier nation × order year over one part
# slice. (The reference Q9 subtracts ps_supplycost; the fixture has no
# partsupp, so profit = discounted revenue — the join/aggregation shape
# is unchanged.) nation carries the only broadcast hint; the PROMO part
# slice and supplier are SF-linear, so Catalyst + AQE pick their join
# strategy. The (nation, year) aggregate partials map-side to
# ≤ 25 × n_years rows per task.
# ---------------------------------------------------------------------------
@register(
    "nation_year_profit",
    oracle=f"""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS order_year,
           CAST(sum({_REV_SQL.replace('l_', 'l.l_')}) AS DOUBLE) AS profit,
           count(*) AS line_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
)
def q_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = (
        _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
        )
        .agg(
            F.sum(_rev()).cast("double").alias("profit"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier by quarterly revenue. The reference
# phrases this as a view + scalar MAX subquery; here the per-supplier
# revenue frame is computed once, its 1-row MAX is joined back as a
# broadcast *equi-join on the revenue value* — a BroadcastHashJoin, not
# the nested-loop a `rev >= (SELECT max…)` correlation would plan, and
# not a global window (which would funnel every supplier through one
# partition). Ties all surface (no LIMIT), matching the reference.
# ---------------------------------------------------------------------------
_Q15_LO = "1997-01-01"
_Q15_HI = "1997-04-01"


@register(
    "top_revenue_supplier",
    oracle=f"""
    WITH r AS (
      SELECT l_suppkey, sum({_REV_SQL}) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_Q15_LO} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{_Q15_HI} 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.rev AS DOUBLE) AS total_revenue
    FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.rev = (SELECT max(rev) FROM r)
    """,
)
def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q15_LO + " 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(_Q15_HI + " 00:00:00").cast("timestamp_ntz"))
    )
    rev = (
        li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("rev"))
    )
    top = rev.agg(F.max("rev").alias("max_rev"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), rev.rev == F.col("max_rev"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("rev").cast("double").alias("total_revenue")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: supplier variety per part descriptor. The NOT IN
# (complaint suppliers) becomes a broadcast LEFT ANTI join — the excluded
# set is supplier-dimension-sized — and COUNT(DISTINCT) shuffles on the
# (brand, type, size) group key with Spark's two-phase distinct
# expansion. (Reference Q16 reads partsupp and matches comments; the
# fixture ships neither, so "supplied" is witnessed from lineitem and
# "complaints" is proxied by a negative account balance.)
# ---------------------------------------------------------------------------
@register(
    "part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collapse the fact to DISTINCT (part, supplier) witness pairs BEFORE
    # any join — count-distinct only sees each pair once anyway, and the
    # dedup's map-side partials shrink everything downstream (the joins,
    # the distinct-expand) from fact-sized to pair-sized. At 100 TB the
    # pairs table is bounded by |part|x|supplier| co-occurrence, orders
    # of magnitude under the line count.
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") != "Brand#5")
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders. The HAVING-subquery membership
# test (`o_orderkey IN (SELECT … HAVING sum(qty) > 300)`) is computed as
# ONE aggregation over lineitem that serves both roles: the sum is the
# output column and its filter is the semi-join set, so lineitem is
# scanned once, not twice. Quantities are integer-valued doubles — exact
# under IEEE754 addition, no decimal detour needed.
# ---------------------------------------------------------------------------
_Q18_QTY = 300


@register(
    "large_volume_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, t.sum_qty
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > {_Q18_QTY}
    ) t
    JOIN orders o ON t.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > _Q18_QTY)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # the HAVING survivor set is tiny (46 orders at sf0.01, ~0.003% of
    # orders at any SF) — broadcast it into orders rather than shuffling
    # the full orders table; customer's strategy is left to AQE
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive discounted revenue. Three OR'd
# brand/size/quantity conjunctions over the part join — the classic test
# that an engine pushes a disjunction of conjunctions down to the scans
# instead of materializing the join first: the part-side prefilter
# (p_brand IN … AND p_size bounds) is the OR's projection onto part
# columns and prunes the build side at the scan; the residual mixed
# predicate evaluates inside the probe's codegen.
# ---------------------------------------------------------------------------
_Q19 = [
    ("Brand#12", 1, 15, 1, 11),
    ("Brand#23", 1, 25, 10, 20),
    ("Brand#24", 1, 35, 20, 30),
]


@register(
    "disjunctive_brand_revenue",
    oracle=f"""
    SELECT CAST(sum({_REV_SQL.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue,
           count(*) AS line_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE {' OR '.join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi}"
        f" AND l.l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in _Q19
    )}
    """,
)
def q_disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    # part-side projection of the disjunction — prunes the build side
    part_pre = None
    clauses = []
    for b, slo, shi, qlo, qhi in _Q19:
        pc = (F.col("p_brand") == b) & F.col("p_size").between(slo, shi)
        part_pre = pc if part_pre is None else (part_pre | pc)
        clauses.append(pc & F.col("l_quantity").between(qlo, qhi))
    part = _t(spark, sf_dir, "part").where(part_pre).select(
        "p_partkey", "p_brand", "p_size"
    )
    full = clauses[0]
    for c in clauses[1:]:
        full = full | c
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(full)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who kept finished orders waiting. The
# reference's EXISTS (another supplier on the order) AND NOT EXISTS
# (another *late* supplier) pair collapses into ONE grouped aggregate
# per (order, supplier) plus order-level windowed totals: a supplier
# "kept the order waiting" iff they were late, the order had > 1
# supplier, and theirs was the only late one. No correlated per-row
# probes — two hash aggregates and one supplier-name join replace
# the double EXISTS. ("Late" is shipped > 180 days after order date;
# the fixture has no commit/receipt dates.)
# ---------------------------------------------------------------------------
_Q21_LATE_DAYS = 180


@register(
    "waiting_supplier_orders",
    oracle=f"""
    WITH per AS (
      SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
             max(CASE WHEN l.l_shipdate >
                        o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY 1, 2
    ), ord AS (
      SELECT ok, count(*) AS n_supp, sum(late) AS n_late FROM per GROUP BY 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM per JOIN ord ON per.ok = ord.ok
    JOIN supplier s ON per.sk = s.s_suppkey
    WHERE per.late = 1 AND ord.n_supp > 1 AND ord.n_late = 1
    GROUP BY 1
    """,
)
def q_waiting_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAYS"),
        F.lit(1),
    ).otherwise(F.lit(0))
    per = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .agg(F.max(late).alias("late"))
    )
    ord_tot = per.groupBy("ok").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per.join(ord_tot, "ok")
        .where((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(supp, F.col("sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: rich customers gone idle. Two subquery classes in one
# query: the scalar "average positive balance" and the NOT EXISTS
# anti-join against recent orders. The scalar is collected as ONE
# metadata-sized row (exact decimal sum + count — the same justified
# pattern as the IVF seeds) and applied *cross-multiplied*:
# bal·n > Σbal in DECIMAL — integer-exact, so no engine ever divides
# and the boundary can't float-drift. The anti-join probes only orders
# placed after the cutoff, pruned at the scan.
# ---------------------------------------------------------------------------
_Q22_CUTOFF = "1999-01-01"


@register(
    "idle_customer_balances",
    oracle=f"""
    SELECT n.n_name AS nation, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) *
          (SELECT count(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2)))
             FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF} 00:00:00'
      )
    GROUP BY 1
    """,
)
def q_idle_customer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    # scalar subquery: exact (Σbal, n) over positive balances — one row,
    # metadata-sized collect (same justification class as IVF seeds)
    pos = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(
            F.sum(F.col("c_acctbal").cast(_DEC)).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate")
            >= F.lit(_Q22_CUTOFF + " 00:00:00").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rich = cust.where(
        F.col("c_acctbal").cast(_DEC) * F.lit(int(pos["n"]))
        > F.lit(str(pos["s"])).cast("decimal(28,2)")
    )
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("totacctbal"),
        )
    )
