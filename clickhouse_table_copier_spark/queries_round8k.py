"""Round-8k query batch: PCA/whitening over the embedding corpus and a
ranking-quality (NDCG) evaluation of the ANN path.

- ``pca_variance_explained`` — eigen-spectrum of the embedding
  covariance: how many principal components carry the corpus variance
  (the first question before dimension reduction / IVF-PQ budgeting).
  The distributed stage is the exact integer Gram reduction
  (``operators/linalg``: O(dim²) partials merged by addition — the
  canonical 100 TB shape); the eigendecomposition runs driver-side on
  the collected 64×64 matrix, which is METADATA (2080 numbers) at any
  corpus size.  Eigenvalues are not SQL-expressible → rows-only driver
  check by design (precedent: similarity_ivf_topk); the math is pinned
  by tests (trace = total variance, planted anisotropy recovered).
- ``embedding_whitening_check`` — ZCA whitening end-to-end: covariance
  → driver-side W = V·diag(1/√(λ+ε))·Vᵀ (64×64, metadata) → broadcast
  W into an Arrow-batched executor transform → SECOND exact Gram pass
  over the whitened vectors → report how close the whitened covariance
  is to identity.  The standard feature-decorrelation preprocessing,
  with its own verification built in.  Rows-only driver check (eigen);
  tests assert near-identity output on anisotropic planted data.
- ``ann_ndcg_eval`` — NDCG@10 of the multi-probe LSH retrieval against
  brute-force graded relevance (rel = 11 − brute rank).  The log2
  position discounts are PINNED rational constants baked identically
  into the Spark plan and the SQL (the repo-wide no-runtime-log rule),
  so the metric is exactly reproducible.  Completes the retrieval-eval
  story: dedup_lsh_eval measures set overlap (precision/recall), NDCG
  measures rank QUALITY.

Reference parity note: the Go reference generates metadata SQL
(``database/database.go``); these queries extend the executed
analytics surface on the embeddings fixture.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register
from clickhouse_table_copier_spark.queries_similarity import (
    DIM,
    NUM_PLANES,
    _bucket_sql,
    _dot_chain_sql,
    _norm_chain_sql,
)

_TOP_PC = 10


def _driver_covariance(spark: SparkSession, sf_dir: str):
    """Collect the exact quantized covariance into a dense numpy matrix,
    RESCALED to real units (q_cov lives on the ×1e6 integer grid, so
    real cov = q_cov / scale² — skipping this would shrink whitened
    vectors by 1e6 and the downstream quantization would zero them).

    The collect is METADATA-sized by construction: dim·(dim+1)/2 = 2080
    rows for dim=64, independent of corpus size — the whole point of the
    integer Gram-partial reduction (operators/linalg)."""
    import numpy as np

    from clickhouse_table_copier_spark.operators.linalg import (
        LINALG_SCALE,
        covariance_matrix,
    )

    rows = covariance_matrix(
        _t(spark, sf_dir, "embeddings"), "embedding"
    ).collect()
    n = int(rows[0]["n"])
    cov = np.zeros((DIM, DIM))
    mu = np.zeros(DIM)
    for r in rows:
        i, j = int(r["dim_i"]), int(r["dim_j"])
        cov[i, j] = cov[j, i] = float(r["q_cov"]) / (
            LINALG_SCALE * LINALG_SCALE
        )
        if i == j:
            # the linear sums ride along on the same rows — per-dim
            # means cost nothing extra (no second corpus scan)
            mu[i] = float(r["s_i"]) / n / LINALG_SCALE
    return cov, mu, n


@register("pca_variance_explained")  # eigenvalues: no SQL oracle (rows-only)
def q_pca_variance_explained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} principal components of the embedding covariance with
    variance-explained ratios.  Distributed work = ONE exact integer
    Gram pass (constant-size partials); the 64×64 eigendecomposition is
    driver arithmetic on metadata, like the IVF seed selection.  Output
    is deterministic: the covariance is exact-integer-derived, and
    eigenvalues of a fixed symmetric matrix are well-defined (sorted
    descending; values rounded to 9dp)."""
    import numpy as np

    cov, _mu, n = _driver_covariance(spark, sf_dir)
    vals = np.linalg.eigvalsh(cov)[::-1]  # descending
    total = float(vals.sum())
    rows, cum = [], 0.0
    for k in range(_TOP_PC):
        ev = float(vals[k])
        cum += ev
        rows.append(
            (
                k + 1,
                round(ev, 9),
                round(ev / total, 9) if total else None,
                round(cum / total, 9) if total else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "pc int, eigenvalue double, var_ratio double, cum_ratio double",
    )


_ZCA_EPS = 1e-9


@register("embedding_whitening_check")  # eigen path: rows-only by design
def q_embedding_whitening_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCA whitening with built-in verification: W from the exact
    covariance's eigensystem (driver, 64×64), applied executor-side in
    Arrow batches, then a SECOND exact Gram pass over the whitened
    vectors; reports the max |off-diagonal| and max |diagonal − 1| of
    the whitened covariance (≈0 and ≈0 when whitening worked).  Scale
    shape: two constant-state reductions + one broadcast-matrix
    map stage — no shuffle grows with the corpus."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from clickhouse_table_copier_spark.operators.linalg import (
        quantized_gram_partials,
    )

    cov, mu, n = _driver_covariance(spark, sf_dir)
    vals, vecs = np.linalg.eigh(cov)
    w = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, 0) + _ZCA_EPS)) @ vecs.T

    # per-dim means for centering came along with the covariance rows
    # (linalg carries the linear sums) — the whitening job is exactly
    # two corpus passes: the covariance Gram and the verify Gram
    emb = _t(spark, sf_dir, "embeddings")
    scale = 1_000_000
    w_b = spark.sparkContext.broadcast(w)
    mu_b = spark.sparkContext.broadcast(mu)

    def transform(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            z = (x - mu_b.value) @ w_b.value.T
            yield pd.DataFrame({"embedding": list(z)})

    schema = T.StructType(
        [T.StructField("embedding", T.ArrayType(T.DoubleType()))]
    )
    whitened = emb.select("embedding").mapInPandas(transform, schema)

    # exact integer Gram of the whitened vectors (values O(1) after
    # whitening, so the same 1e6 grid holds them exactly enough)
    parts = quantized_gram_partials(whitened, "embedding", scale)
    merged = parts.groupBy("i", "j").agg(
        F.sum(F.col("s_ij").cast("decimal(38,0)")).alias("s_ij"),
        F.sum(F.col("s_i").cast("decimal(38,0)")).alias("s_i"),
        F.sum(F.col("s_j").cast("decimal(38,0)")).alias("s_j"),
        F.sum(F.col("n").cast("decimal(38,0)")).alias("nn"),
    )
    num = merged["nn"] * merged["s_ij"] - merged["s_i"] * merged["s_j"]
    cell = merged.select(
        "i",
        "j",
        (
            num.cast("double")
            / F.col("nn").cast("double")
            / F.col("nn").cast("double")
            / (scale * scale)
        ).alias("wcov"),
    )
    return cell.agg(
        F.round(
            F.max(F.when(F.col("i") != F.col("j"), F.abs(F.col("wcov")))), 6
        ).alias("max_offdiag"),
        F.round(
            F.max(
                F.when(F.col("i") == F.col("j"), F.abs(F.col("wcov") - 1))
            ),
            6,
        ).alias("max_diag_err"),
        F.lit(n).cast("bigint").alias("n_rows"),
        F.lit(DIM).cast("int").alias("dim"),
    )


# ---------------------------------------------------------------------------
# ann_ndcg_eval — NDCG@10 of LSH retrieval vs brute-force relevance.
# ---------------------------------------------------------------------------
_NDCG_K = 10
# pinned rational discounts 1/log2(pos+1), rounded once at module load —
# the SAME literals go into the Spark plan and the SQL (no runtime log)
_DISCOUNTS = [round(1.0 / math.log2(p + 1), 12) for p in range(1, _NDCG_K + 1)]


def _disc_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} = {p + 1} THEN {_DISCOUNTS[p]!r}" for p in range(_NDCG_K)
    )
    return f"CASE {whens} ELSE 0 END"


@register(
    "ann_ndcg_eval",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv, {_bucket_sql("embedding")} AS qb
               FROM embeddings WHERE vec_id = 0),
    brute AS (
      SELECT b.vec_id,
             round(({_dot_chain_sql("b.embedding", "q.qv")})
                   / ({_norm_chain_sql("b.embedding")}
                      * {_norm_chain_sql("q.qv")}), 6) AS sim
      FROM embeddings b, q WHERE b.vec_id <> 0
    ),
    rel AS (
      SELECT vec_id, {_NDCG_K + 1} - CAST(row_number() OVER
               (ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS rel
      FROM brute ORDER BY sim DESC, vec_id ASC LIMIT {_NDCG_K}
    ),
    cand AS (
      SELECT b.vec_id, b.embedding, q.qv
      FROM embeddings b, q
      WHERE b.vec_id <> 0
        AND ({_bucket_sql("b.embedding")} = q.qb
             OR {" OR ".join(f"({_bucket_sql('b.embedding')} = xor(q.qb, {1 << p}))" for p in range(NUM_PLANES))})
    ),
    lsh AS (
      SELECT vec_id, CAST(row_number() OVER (ORDER BY sim DESC, vec_id ASC)
               AS INTEGER) AS pos
      FROM (SELECT vec_id,
                   round(({_dot_chain_sql("embedding", "qv")})
                         / ({_norm_chain_sql("embedding")}
                            * {_norm_chain_sql("qv")}), 6) AS sim
            FROM cand)
      ORDER BY sim DESC, vec_id ASC LIMIT {_NDCG_K}
    ),
    joined AS (
      SELECT l.pos, r.rel
      FROM lsh l FULL OUTER JOIN rel r ON l.vec_id = r.vec_id
    ),
    agg AS (
      -- sums stay DECIMAL (exact, order-independent); cast to DOUBLE
      -- only at the boundary so both engines divide identical doubles
      SELECT CAST(coalesce(sum(coalesce(rel, 0) * {_disc_case("pos")}), 0)
                  AS DOUBLE) AS dcg,
             CAST(coalesce(sum(CASE WHEN rel IS NOT NULL THEN
               rel * {_disc_case(f"({_NDCG_K + 1} - rel)")}
               ELSE 0 END), 0) AS DOUBLE) AS idcg,
             count(*) FILTER (WHERE pos IS NOT NULL AND rel IS NOT NULL)
               AS n_overlap
      FROM joined
    )
    SELECT round(dcg, 9) AS dcg, round(idcg, 9) AS idcg,
           round(dcg / NULLIF(idcg, 0), 9) AS ndcg,
           CAST(n_overlap AS BIGINT) AS n_overlap
    FROM agg
    """,
)
def q_ann_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the multi-probe LSH retrieval, graded against
    brute-force cosine relevance (rel = 11 − brute rank; 0 outside the
    true top-10).  Position discounts 1/log2(pos+1) are pinned rational
    literals shared by both engines — no runtime log anywhere near a
    hashed value.  Scale shape: both rankings are TakeOrdered top-k
    frames; the position windows, relevance join, and the two sums run
    on ≤10-row frames."""
    from clickhouse_table_copier_spark.operators.dedup import spread
    from clickhouse_table_copier_spark.operators.similarity import (
        cosine,
        lsh_topk,
    )

    emb = spread(_t(spark, sf_dir, "embeddings"))
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]
    qcol = F.array(*[F.lit(x) for x in qvec])
    brute = (
        emb.where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), qcol), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(_NDCG_K)
    )
    rel = brute.select(
        "vec_id",
        (
            _NDCG_K
            + 1
            - F.row_number().over(
                Window.orderBy(F.desc("sim"), F.asc("vec_id"))
            )
        )
        .cast("int")
        .alias("rel"),
    )
    lsh = lsh_topk(
        emb.where(F.col("vec_id") != 0), qvec, k=_NDCG_K,
        num_planes=NUM_PLANES,
    ).select(
        "vec_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cosine_sim"), F.asc("vec_id")))
        .cast("int")
        .alias("pos"),
    )
    # ONE aggregate over the outer-joined (<= 20-row) frame computes
    # dcg, idcg, and the overlap together — no scalar-combining join
    # exists for Catalyst to degrade to a nested loop
    joined = lsh.join(rel, "vec_id", "full_outer").select("pos", "rel")
    disc_pos = F.expr(_disc_case("pos"))
    disc_ideal = F.expr(_disc_case(f"({_NDCG_K + 1} - rel)"))
    # sums stay DECIMAL (exact, order-independent — the discount
    # literals parse as decimal in BOTH dialects); cast to DOUBLE only
    # at the boundary so both engines divide identical doubles
    zero_dec = F.lit(0).cast("decimal(20,12)")
    agg = joined.agg(
        F.coalesce(
            F.sum(F.coalesce(F.col("rel"), F.lit(0)) * disc_pos), zero_dec
        )
        .cast("double")
        .alias("dcg"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("rel").isNotNull(), F.col("rel") * disc_ideal
                ).otherwise(zero_dec)
            ),
            zero_dec,
        )
        .cast("double")
        .alias("idcg"),
        F.count(
            F.when(F.col("pos").isNotNull() & F.col("rel").isNotNull(), 1)
        ).alias("n_overlap"),
    )
    return agg.select(
        F.round(F.col("dcg"), 9).alias("dcg"),
        F.round(F.col("idcg"), 9).alias("idcg"),
        F.round(
            F.col("dcg") / F.nullif(F.col("idcg"), F.lit(0.0)), 9
        ).alias("ndcg"),
        F.col("n_overlap").cast("bigint").alias("n_overlap"),
    )
