"""Query batch: round-7g — funnel conversion confidence intervals and
hierarchical share rollups.

- ``funnel_conversion_ci`` — step-to-step conversion rates of the
  signup→click→purchase funnel with Wilson 95% score intervals: the
  statistically honest way to read a funnel (a 3-of-7 step beats a
  40-of-100 step only if the intervals say so). Counts come from the
  same staged min-join funnel as event_funnel; the Wilson terms are a
  fixed sequence of correctly-rounded double ops on exact integers,
  written identically in both engines — bit-equal, no tolerance.
- ``hierarchical_share_rollup`` — revenue share at two hierarchy levels
  (nation-within-region, region-within-total) from ONE exact-decimal
  aggregate frame and two window sums over it — the drill-down report
  every BI layer asks of an OLAP engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register

_FUNNEL = ("signup", "click", "purchase")
_WILSON_Z = 1.96


def _wilson_sql(succ: str, n: str) -> tuple[str, str, str]:
    """Wilson lo/center/hi as SQL with one fixed parenthesization —
    MUST stay textually parallel to the Spark expressions below."""
    z = _WILSON_Z
    p = f"(CAST({succ} AS DOUBLE) / CAST({n} AS DOUBLE))"
    nn = f"CAST({n} AS DOUBLE)"
    denom = f"(1.0 + ({z} * {z}) / {nn})"
    center = f"(({p} + ({z} * {z}) / (2.0 * {nn})) / {denom})"
    half = (
        f"(({z} / {denom}) * sqrt({p} * (1.0 - {p}) / {nn}"
        f" + ({z} * {z}) / (4.0 * {nn} * {nn})))"
    )
    return f"({center} - {half})", center, f"({center} + {half})"


def _funnel_oracle() -> str:
    lo, center, hi = _wilson_sql("n_next", "n_at")
    return f"""
    WITH ev AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    s1 AS (SELECT user_id, min(ts) AS t1 FROM ev
           WHERE event_type = '{_FUNNEL[0]}' GROUP BY 1),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM ev e JOIN s1 USING (user_id)
           WHERE e.event_type = '{_FUNNEL[1]}'
             AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOURS
           GROUP BY 1),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM ev e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
           WHERE e.event_type = '{_FUNNEL[2]}'
             AND e.ts > s2.t2 AND e.ts <= s1.t1 + INTERVAL 24 HOURS
           GROUP BY 1),
    steps AS (
      SELECT 1 AS step, '{_FUNNEL[0]}->{_FUNNEL[1]}' AS transition,
             (SELECT count(*) FROM s1) AS n_at,
             (SELECT count(*) FROM s2) AS n_next
      UNION ALL
      SELECT 2, '{_FUNNEL[1]}->{_FUNNEL[2]}',
             (SELECT count(*) FROM s2), (SELECT count(*) FROM s3)
    )
    SELECT step, transition,
           CAST(n_at AS BIGINT) AS n_at, CAST(n_next AS BIGINT) AS n_next,
           CAST(n_next AS DOUBLE) / CAST(n_at AS DOUBLE) AS rate,
           CAST({lo} AS DOUBLE) AS wilson_lo,
           CAST({hi} AS DOUBLE) AS wilson_hi
    FROM steps
    """


@register("funnel_conversion_ci", oracle=_funnel_oracle())
def q_funnel_conversion_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries import _events

    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    win = F.expr("INTERVAL 24 HOURS")
    s1 = (
        ev.where(F.col("event_type") == _FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == _FUNNEL[1])
        .join(s1, "user_id")
        .where((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == _FUNNEL[2])
        .join(s1, "user_id")
        .join(s2, "user_id")
        .where((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    # three scalar counts — metadata-sized collect (scalar-subquery rule)
    n1, n2, n3 = s1.count(), s2.count(), s3.count()

    def wilson(succ: int, n: int):
        # SAME parenthesization as _wilson_sql, driver-side floats —
        # python float ops are the identical IEEE doubles
        z = _WILSON_Z
        p = succ / n
        denom = 1.0 + (z * z) / n
        center = (p + (z * z) / (2.0 * n)) / denom
        import math

        half = (z / denom) * math.sqrt(
            p * (1.0 - p) / n + (z * z) / (4.0 * n * n)
        )
        return center - half, center + half

    rows = []
    for step, (a, b, name) in enumerate(
        [(n1, n2, f"{_FUNNEL[0]}->{_FUNNEL[1]}"),
         (n2, n3, f"{_FUNNEL[1]}->{_FUNNEL[2]}")],
        start=1,
    ):
        lo, hi = wilson(b, a)
        rows.append((step, name, a, b, b / a, lo, hi))
    return spark.createDataFrame(
        rows,
        "step int, transition string, n_at bigint, n_next bigint,"
        " rate double, wilson_lo double, wilson_hi double",
    )


# ---------------------------------------------------------------------------
# Two-level share rollup: nation revenue as a share of its region, and
# region revenue as a share of the total — ONE exact-decimal (region,
# nation) aggregate frame (dimension-bounded: ≤ 25 rows at any data
# scale), two window sums over it, shares as single double divisions of
# exact decimals. The fact scan happens once; every ratio is derived
# from the same partials.
# ---------------------------------------------------------------------------
@register(
    "hierarchical_share_rollup",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(CAST(rev AS DOUBLE) /
                CAST(sum(rev) OVER (PARTITION BY region) AS DOUBLE)
                AS DOUBLE) AS share_of_region,
           CAST(CAST(sum(rev) OVER (PARTITION BY region) AS DOUBLE) /
                CAST(sum(rev) OVER () AS DOUBLE)
                AS DOUBLE) AS region_share_of_total
    FROM rev
    """,
)
def q_hierarchical_share_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.col("rev").cast("double").alias("revenue"),
        (
            F.col("rev").cast("double")
            / F.sum("rev").over(w_region).cast("double")
        ).alias("share_of_region"),
        (
            F.sum("rev").over(w_region).cast("double")
            / F.sum("rev").over(w_all).cast("double")
        ).alias("region_share_of_total"),
    )
