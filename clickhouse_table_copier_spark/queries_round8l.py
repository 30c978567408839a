"""Round-8l query batch: near-dup graph shape statistics and an
arrival-process dispersion test.

- ``graph_degree_distribution`` — degree histogram of the near-dup
  similarity graph (shared jaccard-pairs artifact): the first thing to
  read before trusting dedup survivorship — a heavy tail means one hub
  document glues unrelated clusters together.
- ``graph_assortativity`` — Newman's degree assortativity (Pearson r of
  endpoint degrees over the directed edge list).  Near-dup graphs are
  strongly assortative (duplicate groups are near-cliques of equal
  degree); a DROP in assortativity is the canary for threshold bugs
  that attach low-degree satellites to hubs.  All sufficient statistics
  are exact integers (decimal-widened cross products), so the only
  float ops are two sqrt's and one division written identically in both
  dialects.
- ``arrival_dispersion_index`` — variance-to-mean ratio of daily event
  counts (index of dispersion): =1 for a Poisson arrival process, >1
  for bursty traffic.  The standard load-model sanity check, computed
  from n·Σx² − (Σx)² exact integers over the calendar-bounded daily
  frame; one division at the end.

All three reuse existing substrates (the persisted pair artifact, the
daily aggregate shape); warm cost is joins/aggs over bounded frames.

Reference parity note: the Go reference generates metadata SQL
(``database/database.go``); these queries extend the executed
analytics surface over the dedup graph and the event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _events, register
from clickhouse_table_copier_spark.queries_pipeline import (
    _JACCARD_PAIRS_SQL,
    _shared_jaccard_pairs,
)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed edge list (both orientations) of the near-dup graph,
    from the persisted shared pairs artifact."""
    pairs = _shared_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    return pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionByName(
        pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )


@register(
    "graph_degree_distribution",
    oracle=f"""
    WITH {_JACCARD_PAIRS_SQL},
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS degree FROM edges
            GROUP BY 1)
    SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY 1 ORDER BY 1
    """,
)
def q_graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the near-dup graph: how many documents have
    k near-duplicates.  Two grouped counts over the shared pair
    artifact; output bounded by the max degree.  The heavy-tail check
    before trusting survivorship (a hub degree means the threshold is
    gluing unrelated content)."""
    deg = _edges(spark, sf_dir).groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .orderBy("degree")
    )


@register(
    "graph_assortativity",
    oracle=f"""
    WITH {_JACCARD_PAIRS_SQL},
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    deg AS (SELECT u AS node, count(*) AS d FROM edges GROUP BY 1),
    de AS (
      SELECT du.d AS x, dv.d AS y
      FROM edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ),
    s AS (
      SELECT CAST(count(*) AS DECIMAL(38,0)) AS m,
             CAST(sum(x) AS DECIMAL(38,0)) AS sx,
             CAST(sum(y) AS DECIMAL(38,0)) AS sy,
             CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy,
             CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(y * y) AS DECIMAL(38,0)) AS syy
      FROM de
    )
    SELECT round(CAST(m * sxy - sx * sy AS DOUBLE) /
             NULLIF(sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
                    sqrt(CAST(m * syy - sy * sy AS DOUBLE)), 0), 9)
             AS assortativity,
           CAST(m // 2 AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes
    FROM s
    """,
)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the near-dup graph: Pearson r of
    (deg(u), deg(v)) over directed edges.  Sufficient statistics are
    exact integers decimal-widened against the m·Σxy cross-product
    overflow; the only float ops — two sqrt's and one division — are
    IEEE-exact and written identically in both dialects.  Shape: two
    degree equi-joins onto the edge list (node-id-partitioned at any
    scale), ONE aggregate; the node-count scalar is a metadata-sized
    second action."""
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    de = (
        edges.join(deg.withColumnRenamed("u", "node"), F.col("u") == F.col("node"))
        .select("v", F.col("d").alias("x"))
        .join(
            deg.select(F.col("u").alias("node2"), F.col("d").alias("y")),
            F.col("v") == F.col("node2"),
        )
        .select("x", "y")
    )
    dec = "decimal(38,0)"
    s = de.agg(
        F.count(F.lit(1)).cast(dec).alias("m"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(dec).alias("syy"),
    )
    n_nodes = deg.count()  # metadata-sized action: node count scalar
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        F.round(num / F.nullif(den, F.lit(0.0)), 9).alias("assortativity"),
        F.expr("CAST(m DIV 2 AS BIGINT)").alias("n_edges"),
        F.lit(n_nodes).cast("bigint").alias("n_nodes"),
    )


@register(
    "arrival_dispersion_index",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(c * c) AS DECIMAL(38,0)) AS scc
      FROM daily
    )
    SELECT round(CAST(n AS DOUBLE) *
                 CAST(n * scc - CAST(sc AS DECIMAL(38,0)) *
                      CAST(sc AS DECIMAL(38,0)) AS DOUBLE)
                 / NULLIF(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                          * CAST(sc AS DOUBLE), 0), 9)
             AS dispersion,
           CAST(n AS BIGINT) AS n_days,
           sc AS n_events,
           round(CAST(sc AS DOUBLE) / n, 9) AS mean_daily
    FROM s
    """,
)
def q_arrival_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance/mean) of daily event arrivals: 1
    under Poisson traffic, >1 when arrivals are bursty — the standard
    load-model sanity check before capacity planning.  D = n·(n·Σc² −
    (Σc)²) / (n²·Σc) from exact integer sums over the calendar-bounded
    daily frame; the division is the only float op and is written
    identically in both dialects."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    s = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("decimal(38,0)").alias("scc"),
    )
    n_d = F.col("n").cast("double")
    var_num = (
        F.col("n").cast("decimal(38,0)") * F.col("scc")
        - F.col("sc").cast("decimal(38,0)") * F.col("sc").cast("decimal(38,0)")
    ).cast("double")
    return s.select(
        F.round(
            n_d * var_num
            / F.nullif(n_d * n_d * F.col("sc").cast("double"), F.lit(0.0)),
            9,
        ).alias("dispersion"),
        F.col("n").cast("bigint").alias("n_days"),
        F.col("sc").alias("n_events"),
        F.round(F.col("sc").cast("double") / F.col("n"), 9).alias(
            "mean_daily"
        ),
    )
