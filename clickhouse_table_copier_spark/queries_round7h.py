"""Query batch: round-7h — contrastive hard-negative mining and
sequential change-point detection.

- ``hard_negative_mining`` — for every class prototype (per-label mean
  embedding), the top-5 most similar vectors from OTHER labels: the
  hard negatives a contrastive trainer wants. Exactness trick: with
  embeddings on the 1e-6 integer grid and the prototype represented by
  its per-dimension integer SUM (never divided!), the quantization and
  1/n factors cancel out of the cosine —
      cos(e, p) = D / sqrt(NE) / sqrt(NP)
  where D = Σ q_e·S_p, NE = Σ q_e², NP = Σ S_p² are exact integers. So
  the whole ranking needs just two sqrts and one division per pair,
  each correctly rounded on identical integers — deterministic
  cross-engine with NO rounding tolerance, where a naive float mean
  prototype would sum in engine-dependent order.
- ``cusum_change_points`` — one-sided CUSUM drift detector per user:
  s_t = max(0, s_{t-1} + (x_t − μ_u − k)), alarm at s > h. The
  sequential complement of weekly_seasonal_anomalies' pointwise
  z-scores: CUSUM accumulates small sustained shifts a 2σ test never
  sees. Deterministic float fold (same argument as Holt/EWMA); oracle
  is the recursive-CTE functional fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register

_HN_TOP = 5
_HN_SCALE = 1_000_000


@register(
    "hard_negative_mining",
    oracle=f"""
    WITH cells AS (
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_HN_SCALE})
                  AS BIGINT) AS q
      FROM embeddings
    ),
    protos AS (
      SELECT label AS proto_label, d, CAST(sum(q) AS BIGINT) AS s
      FROM cells GROUP BY 1, 2
    ),
    np AS (
      SELECT proto_label, sum(CAST(s AS HUGEINT) * s) AS np2
      FROM protos GROUP BY 1
    ),
    ne AS (
      SELECT vec_id, sum(CAST(q AS HUGEINT) * q) AS ne2 FROM cells GROUP BY 1
    ),
    dots AS (
      SELECT c.vec_id, c.label, p.proto_label,
             sum(CAST(c.q AS HUGEINT) * p.s) AS dot
      FROM cells c JOIN protos p ON c.d = p.d
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT d.proto_label, d.vec_id, d.label AS neg_label,
             CAST(CAST(d.dot AS DOUBLE)
                  / sqrt(CAST(ne.ne2 AS DOUBLE))
                  / sqrt(CAST(np.np2 AS DOUBLE)) AS DOUBLE) AS cosine
      FROM dots d
      JOIN ne ON ne.vec_id = d.vec_id
      JOIN np ON np.proto_label = d.proto_label
      WHERE d.label != d.proto_label
    )
    SELECT proto_label, vec_id, neg_label, cosine
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY proto_label ORDER BY cosine DESC, vec_id) AS rk
      FROM scored
    ) WHERE rk <= {_HN_TOP}
    """,
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings")
    qe = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * _HN_SCALE).cast("long"),
    )
    cells = emb.select("vec_id", "label", qe.alias("q"))
    # per-label integer dim sums: label-count × 64 longs — metadata-sized
    # collect (the IVF-seed rule); inlined as literals so the scoring
    # pass is ONE scan with zero joins
    proto_rows = (
        cells.select("label", F.posexplode("q").alias("d", "v"))
        .groupBy("label", "d")
        .agg(F.sum("v").alias("s"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "s"))).alias("sv"))
        .collect()
    )
    protos = {
        int(r["label"]): [int(x["s"]) for x in r["sv"]] for r in proto_rows
    }
    np2 = {lab: sum(s * s for s in sv) for lab, sv in protos.items()}

    # scoring via an Arrow-batched integer GEMM (the gemm_topk_int
    # pattern): one numpy V @ S.T per batch gives every (vec, proto)
    # dot exactly in int64. The earlier zip_with/aggregate formulation
    # computed the same integers through higher-order-function lambdas,
    # which Spark evaluates interpreted — measured 4.3 s warm at sf0.1
    # vs ~0.5 s for the BLAS call.
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    labs = sorted(protos)
    smat = np.array([protos[lab] for lab in labs], dtype=np.int64)
    np2_arr = [float(np2[lab]) for lab in labs]

    def make_fn(labs, smat, np2_arr):
        def fn(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                q = np.stack(
                    [np.asarray(v, dtype=np.int64) for v in pdf["q"]]
                )
                dots = q @ smat.T  # (rows, protos), exact int64
                ne2 = (q * q).sum(axis=1)  # exact int64
                rows = len(pdf)
                out_proto, out_vec, out_lab, out_cos = [], [], [], []
                for j, lab in enumerate(labs):
                    cos = (
                        dots[:, j].astype(np.float64)
                        / np.sqrt(ne2.astype(np.float64))
                        / np.sqrt(np2_arr[j])
                    )
                    out_proto.extend([lab] * rows)
                    out_vec.extend(int(x) for x in pdf["vec_id"])
                    out_lab.extend(int(x) for x in pdf["label"])
                    out_cos.extend(float(x) for x in cos)
                yield pd.DataFrame(
                    {
                        "proto_label": out_proto,
                        "vec_id": out_vec,
                        "neg_label": out_lab,
                        "cosine": out_cos,
                    }
                )

        return fn

    schema = T.StructType(
        [
            T.StructField("proto_label", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("neg_label", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    scored = (
        cells.select("vec_id", "label", "q")
        .mapInPandas(make_fn(labs, smat, np2_arr), schema)
        .where(F.col("neg_label") != F.col("proto_label"))
    )
    w = Window.partitionBy("proto_label").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _HN_TOP)
        .select(
            F.col("proto_label").cast("int").alias("proto_label"),
            "vec_id",
            F.col("neg_label").cast("int").alias("neg_label"),
            "cosine",
        )
    )


# ---------------------------------------------------------------------------
# One-sided CUSUM per user. μ_u is the user's exact-decimal mean (one
# double division); slack k and alarm threshold h are fixed constants
# sized to the fixture's value scale (≈ uniform on [0, 250]: σ ≈ 72, so
# k ≈ σ/2 and h ≈ 3σ). Sequential fold — cross-batch order fixed by
# (ts, event_id) — tracks (s, max s, first alarm id). At scale: one
# grouped fold partitioned by user, state = three numbers per key.
# ---------------------------------------------------------------------------
_CUSUM_K = 35.0
_CUSUM_H = 200.0


@register(
    "cusum_change_points",
    oracle=f"""
    WITH RECURSIVE mu AS (
      SELECT user_id,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  / count(*) AS DOUBLE) AS mu,
             count(*) AS n_events
      FROM events GROUP BY 1
    ),
    seq AS (
      SELECT user_id, CAST(value AS DOUBLE) AS x, event_id,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    rec AS (
      SELECT s.user_id, s.rn,
             greatest(0.0, (s.x - mu.mu) - {_CUSUM_K}) AS cs,
             greatest(0.0, (s.x - mu.mu) - {_CUSUM_K}) AS cs_max,
             CASE WHEN greatest(0.0, (s.x - mu.mu) - {_CUSUM_K})
                       > {_CUSUM_H}
                  THEN s.event_id END AS alarm_id
      FROM seq s JOIN mu ON s.user_id = mu.user_id
      WHERE s.rn = 1
      UNION ALL
      SELECT s.user_id, s.rn,
             greatest(0.0, r.cs + (s.x - mu.mu) - {_CUSUM_K}),
             greatest(r.cs_max,
                      greatest(0.0, r.cs + (s.x - mu.mu) - {_CUSUM_K})),
             coalesce(r.alarm_id,
               CASE WHEN greatest(0.0, r.cs + (s.x - mu.mu) - {_CUSUM_K})
                         > {_CUSUM_H}
                    THEN s.event_id END)
      FROM rec r
      JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
      JOIN mu ON mu.user_id = r.user_id
    )
    SELECT r.user_id, mu.n_events, r.cs_max AS max_cusum,
           r.alarm_id AS first_alarm_event_id
    FROM rec r JOIN mu ON r.user_id = mu.user_id
    WHERE r.rn = mu.n_events
    """,
)
def q_cusum_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries import _events

    k, hthr = _CUSUM_K, _CUSUM_H
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    mu = (
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
        / F.count(F.lit(1))
    ).alias("mu")
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), mu, arr.alias("xs")
    )
    fold = F.aggregate(
        F.col("xs"),
        F.struct(
            F.lit(0.0).alias("cs"),
            F.lit(0.0).alias("cs_max"),
            F.lit(None).cast("long").alias("alarm_id"),
            F.lit(False).alias("any"),
        ),
        lambda acc, x: F.struct(
            F.greatest(
                F.lit(0.0),
                acc["cs"] + (x["value"].cast("double") - F.col("mu")) - F.lit(k),
            ).alias("cs"),
            F.greatest(
                F.when(acc["any"], acc["cs_max"]).otherwise(F.lit(0.0)),
                F.greatest(
                    F.lit(0.0),
                    acc["cs"]
                    + (x["value"].cast("double") - F.col("mu"))
                    - F.lit(k),
                ),
            ).alias("cs_max"),
            F.coalesce(
                acc["alarm_id"],
                F.when(
                    F.greatest(
                        F.lit(0.0),
                        acc["cs"]
                        + (x["value"].cast("double") - F.col("mu"))
                        - F.lit(k),
                    )
                    > hthr,
                    x["event_id"],
                ),
            ).alias("alarm_id"),
            F.lit(True).alias("any"),
        ),
    )
    return per_user.select(
        "user_id",
        "n_events",
        fold["cs_max"].alias("max_cusum"),
        fold["alarm_id"].alias("first_alarm_event_id"),
    )
