"""Query batch: round-7j — survival analysis and dedup-graph shape.

- ``survival_curve`` — Kaplan–Meier survival for time-from-signup-to-
  purchase over a 7-day horizon: per-day at-risk and event counts from
  ONE grouped pass, survival as the ordered product Π(1 − d_i/n_i).
  The day frame is horizon-bounded (≤ 8 rows at any data scale), so
  the product folds over a sorted literal-sized array — deterministic
  float sequence, no tolerance. Users with no qualifying purchase are
  right-censored at the horizon (administrative censoring only — the
  simplification is documented, and both engines apply it identically).
- ``cluster_size_distribution`` — the shape of the near-dup graph the
  dedup pipeline produces: cluster-size histogram plus each size's doc
  share of the clustered population — the first thing to look at before
  trusting survivorship output (one giant component = a threshold bug).
  Reuses the shared label-propagation clusters artifact; the oracle is
  the same recursive-CTE fixpoint as dedup_clusters_jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _events, register

_KM_HORIZON_D = 7


@register(
    "survival_curve",
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
             CASE WHEN tp.tp IS NOT NULL
                   AND epoch_us(tp.tp) - epoch_us(t0.t0)
                       < {_KM_HORIZON_D}::BIGINT * 86400000000
                  THEN CAST((epoch_us(tp.tp) - epoch_us(t0.t0))
                            // 86400000000 AS INT)
             END AS event_day
      FROM t0 LEFT JOIN tp ON t0.user_id = tp.user_id
    ),
    n_total AS (SELECT count(*) AS n FROM durations),
    deaths AS (
      SELECT event_day AS day, count(*) AS d FROM durations
      WHERE event_day IS NOT NULL GROUP BY 1
    ),
    days AS (
      SELECT unnest(generate_series(0, {_KM_HORIZON_D - 1})) AS day
    ),
    at_risk AS (
      SELECT days.day,
             n_total.n - coalesce((
               SELECT sum(d) FROM deaths WHERE deaths.day < days.day), 0)
               AS n_risk,
             coalesce((SELECT d FROM deaths WHERE deaths.day = days.day), 0)
               AS n_events
      FROM days, n_total
    )
    SELECT a.day AS day, CAST(a.n_risk AS BIGINT) AS n_at_risk,
           CAST(a.n_events AS BIGINT) AS n_events,
           list_reduce(
             list(CASE WHEN b.n_risk > 0
                       THEN CAST(1.0 AS DOUBLE)
                            - CAST(b.n_events AS DOUBLE)
                              / CAST(b.n_risk AS DOUBLE)
                       ELSE CAST(1.0 AS DOUBLE) END
                  ORDER BY b.day),
             (s, x) -> s * x
           ) AS survival
    FROM at_risk a
    JOIN at_risk b ON b.day <= a.day
    GROUP BY a.day, a.n_risk, a.n_events
    ORDER BY 1
    """,
)
def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    horizon_us = _KM_HORIZON_D * 86_400_000_000
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
    dur_us = F.unix_micros(F.col("tp").cast("timestamp")) - F.unix_micros(
        F.col("t0").cast("timestamp")
    )
    durations = t0.join(tp, "user_id", "left").select(
        "user_id",
        F.when(
            F.col("tp").isNotNull() & (dur_us < horizon_us),
            F.floor(dur_us / 86_400_000_000).cast("int"),
        ).alias("event_day"),
    )
    # horizon-bounded day frame: ≤ 8 numbers — metadata-sized collect
    n_total = durations.count()
    deaths = {
        int(r["event_day"]): int(r["d"])
        for r in durations.where(F.col("event_day").isNotNull())
        .groupBy("event_day")
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    }
    rows, n_risk, surv = [], n_total, 1.0
    for day in range(_KM_HORIZON_D):
        d = deaths.get(day, 0)
        # nobody left at risk → the hazard term is 1 (survival frozen),
        # mirroring the oracle's CASE guard
        surv = surv * ((1.0 - d / n_risk) if n_risk > 0 else 1.0)
        rows.append((day, n_risk, d, surv))
        n_risk -= d
    return spark.createDataFrame(
        rows, "day bigint, n_at_risk bigint, n_events bigint, survival double"
    )


# ---------------------------------------------------------------------------
# Cluster-size histogram of the near-dup graph (clusters of size ≥ 2 —
# the components of the verified-pairs edge list; unpaired docs are not
# graph nodes). doc_share = size·n_clusters / clustered_docs as one
# double division of exact integers.
# ---------------------------------------------------------------------------
def _cluster_sizes_oracle() -> str:
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
    csize AS (SELECT cluster_id, count(*) AS sz FROM comp GROUP BY 1),
    tot AS (SELECT count(*) AS n_docs FROM comp)
    SELECT sz AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(CAST(sz * count(*) AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)
                AS DOUBLE) AS doc_share
    FROM csize, tot
    GROUP BY sz, tot.n_docs
    ORDER BY 1
    """


@register("cluster_size_distribution", oracle=_cluster_sizes_oracle())
def q_cluster_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries_pipeline import (
        _shared_dedup_clusters,
    )

    comp = _shared_dedup_clusters(spark, sf_dir)
    csize = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    # clustered-doc total: one number — metadata-sized collect
    n_docs = comp.count()
    return (
        csize.groupBy(F.col("sz").alias("cluster_size"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (
                (F.col("cluster_size") * F.col("n_clusters")).cast("double")
                / F.lit(float(n_docs))
            ).alias("doc_share"),
        )
        .orderBy("cluster_size")
    )
