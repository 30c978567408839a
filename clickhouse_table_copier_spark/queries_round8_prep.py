"""Round-8 batch (implemented + DuckDB-parity-tested during round 7 as a
prep module, REGISTERED in round 8 — the queries_round7_prep discipline:
the round-7 driver window carried 34 must-verify queries, so holding
these back preserved 16 rotation slots for oldest-green re-verification;
``_prep`` now feeds both the local PREP_* dicts, kept so
tests/test_round8_prep.py keeps running the standalone parity harness,
and the main registry).

- ``basket_type_lift`` — market-basket affinity over orders: for every
  pair of part types co-purchased in one order, lift =
  P(both)/(P(a)·P(b)) ranked by exact integer cross-products (the
  collocation_lift exactness pattern applied to co-occurrence instead
  of adjacency). Candidate pairs come from a distinct (order, type)
  frame self-joined on the order key — fan-out bounded by the TYPE
  cardinality per order (≤6 here), never by basket size in lines.
- ``funnel_time_percentiles`` — how long converting users take:
  signup→purchase durations (first qualifying purchase within 7 days —
  the survival_curve cohort) summarized as EXACT p25/p50/p75 order
  statistics. The duration frame is user-bounded but still SF-linear,
  so the ranks come from the equi_depth_deciles distributed design
  (sketch-partitioned buckets → local ranks → metadata-sized offsets),
  never a global single-task sort; each percentile is then one
  rank-index equality filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _events, _t, register

PREP_QUERIES: dict = {}
PREP_ORACLES: dict[str, str] = {}


def _prep(name: str, oracle: str):
    def deco(fn):
        PREP_QUERIES[name] = fn
        PREP_ORACLES[name] = oracle
        return register(name, oracle)(fn)

    return deco


_BASKET_MIN_SUPPORT = 20


@_prep(
    "basket_type_lift",
    oracle=f"""
    WITH ot AS (
      SELECT DISTINCT l.l_orderkey, p.p_type
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM ot),
    tsup AS (SELECT p_type, count(*) AS c FROM ot GROUP BY 1),
    pairs AS (
      SELECT a.p_type AS type_a, b.p_type AS type_b, count(*) AS c_ab
      FROM ot a JOIN ot b
        ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, CAST(c_ab AS BIGINT) AS c_ab,
           CAST(CAST(CAST(c_ab AS HUGEINT) * n_orders.n AS DOUBLE)
                / CAST(CAST(ta.c AS HUGEINT) * tb.c AS DOUBLE)
                AS DOUBLE) AS lift
    FROM pairs
    JOIN tsup ta ON ta.p_type = type_a
    JOIN tsup tb ON tb.p_type = type_b
    CROSS JOIN n_orders
    WHERE c_ab >= {_BASKET_MIN_SUPPORT}
    ORDER BY lift DESC, type_a, type_b
    """,
)
def q_basket_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    # persisted: FOUR consumers (the corpus count, the support collect,
    # and both sides of the pair self-join) would otherwise each re-run
    # the join+distinct (measured 3.3 -> 2.3 s warm at sf0.1)
    ot = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_type")
        .distinct()
    ).persist()
    # corpus totals: one number + a 6-row type-support frame collected —
    # metadata-sized (type cardinality, not data volume)
    n_orders = ot.select("l_orderkey").distinct().count()
    tsup = {
        r["p_type"]: int(r["c"])
        for r in ot.groupBy("p_type").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    a, b = ot.alias("a"), ot.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_type") < F.col("b.p_type")),
        )
        .groupBy(
            F.col("a.p_type").alias("type_a"), F.col("b.p_type").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= _BASKET_MIN_SUPPORT)
    )
    dec = "decimal(38,0)"
    sup_a = F.lit(0)
    sup_b = F.lit(0)
    for t, c in tsup.items():
        sup_a = F.when(F.col("type_a") == t, F.lit(c)).otherwise(sup_a)
        sup_b = F.when(F.col("type_b") == t, F.lit(c)).otherwise(sup_b)
    num = F.col("c_ab").cast(dec) * F.lit(n_orders).cast(dec)
    den = sup_a.cast(dec) * sup_b.cast(dec)
    return (
        pairs.select(
            "type_a",
            "type_b",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            (num.cast("double") / den.cast("double")).alias("lift"),
        )
        .orderBy(F.desc("lift"), "type_a", "type_b")
    )


_FTP_HORIZON_D = 7
_FTP_PARTS = 16


@_prep(
    "funnel_time_percentiles",
    oracle=f"""
    WITH t0 AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    tp AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN t0 ON e.user_id = t0.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t0.t0
      GROUP BY 1
    ),
    durations AS (
      SELECT t0.user_id,
             epoch_us(tp.tp) - epoch_us(t0.t0) AS dur_us
      FROM t0 JOIN tp ON t0.user_id = tp.user_id
      WHERE epoch_us(tp.tp) - epoch_us(t0.t0)
            < {_FTP_HORIZON_D}::BIGINT * 86400000000
    ),
    ranked AS (
      SELECT dur_us,
             row_number() OVER (ORDER BY dur_us, user_id) AS rk,
             count(*) OVER () AS n
      FROM durations
    )
    SELECT CAST(p AS INTEGER) AS percentile,
           CAST(min(CASE WHEN rk = (p * (n - 1)) // 100 + 1
                         THEN dur_us END) AS BIGINT) AS duration_us,
           CAST(max(n) AS BIGINT) AS n_converted
    FROM ranked, (SELECT unnest([25, 50, 75]) AS p) ps
    GROUP BY p
    ORDER BY 1
    """,
)
def q_funnel_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    horizon_us = _FTP_HORIZON_D * 86_400_000_000
    t0 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    tp = (
        ev.where(F.col("event_type") == "purchase")
        .join(t0, "user_id")
        .where(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    dur = (
        F.unix_micros(F.col("tp").cast("timestamp"))
        - F.unix_micros(F.col("t0").cast("timestamp"))
    )
    durations = (
        t0.join(tp, "user_id")
        .select("user_id", dur.alias("dur_us"))
        .where(F.col("dur_us") < horizon_us)
    )
    # distributed exact order statistics: sketch boundaries partition the
    # user-bounded duration frame, local ranks per bucket + metadata-sized
    # offsets give global ranks with no single-task sort (the
    # equi_depth_deciles design)
    pcts = [i / _FTP_PARTS for i in range(1, _FTP_PARTS)]
    bounds_row = durations.agg(
        F.percentile_approx(
            F.col("dur_us").cast("double"), F.array(*[F.lit(p) for p in pcts]), 1000
        ).alias("bs")
    ).collect()[0]
    bounds = sorted(set(float(x) for x in (bounds_row["bs"] or [])))  # percentile_approx -> NULL on empty input
    # flat IF-sum, not an F.aggregate lambda: higher-order functions
    # evaluate interpreted outside codegen (the operators/ranks.py
    # round-8 ladder; same swap as _bucket_sql there)
    bucket = F.expr(
        "(" + " + ".join(
            f"if(CAST(dur_us AS DOUBLE) > {b!r}D, 1, 0)" for b in bounds
        ) + ")"
        if bounds
        else "0"
    )
    wloc = Window.partitionBy("bk").orderBy("dur_us", "user_id")
    local = durations.withColumn("bk", bucket).withColumn(
        "lr", F.row_number().over(wloc)
    )
    cnt_rows = local.groupBy("bk").agg(F.count(F.lit(1)).alias("c")).collect()
    cnt = {int(r["bk"]): int(r["c"]) for r in cnt_rows}
    n = sum(cnt.values())
    offsets, acc = {}, 0
    for bk in sorted(cnt):
        offsets[bk] = acc
        acc += cnt[bk]
    off_expr = F.lit(0)
    for bk, off in offsets.items():
        off_expr = F.when(F.col("bk") == bk, F.lit(off)).otherwise(off_expr)
    rank = (off_expr + F.col("lr")).alias("rk")
    ranked = local.select("dur_us", rank)
    targets = {p: (p * (n - 1)) // 100 + 1 for p in (25, 50, 75)}
    out = None
    for p, target in targets.items():
        sel = ranked.where(F.col("rk") == target).select(
            F.lit(p).cast("int").alias("percentile"),
            F.col("dur_us").cast("bigint").alias("duration_us"),
            F.lit(n).cast("bigint").alias("n_converted"),
        )
        out = sel if out is None else out.unionAll(sel)
    return out.orderBy("percentile")
