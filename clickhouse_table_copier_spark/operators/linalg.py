"""Distributed dense linear algebra over embedding columns.

One-pass second-moment / covariance accumulation — the front end of PCA
whitening, ZCA, and Mahalanobis scoring over an embedding corpus. The
scale shape is the classic outer-product trick: each Arrow batch
contributes a dim×dim partial Gram matrix ``Xᵀ X`` (one BLAS call), and
partials merge by plain addition — state is O(dim²) per task regardless
of row count, so 100 TB of vectors reduces to a constant-size aggregate.

Determinism is the design constraint (same as ``similarity.gemm_topk_int``):
float accumulation orders differ across partitionings and engines, so
values are quantized to an integer grid first and every sum is exact
int64 arithmetic — associative, order-independent, and reproducible
bit-for-bit against a SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Same grid as embedding_dim_stats: q = floor(x * 1e6) on the
# double-widened value. |x| < 1 in the fixtures ⇒ |q| ≤ 1e6; a pairwise
# product is ≤ 1e12 and an int64 Gram entry stays exact up to ~9.2e6
# rows per PARTIAL — far beyond any Arrow batch; the cross-partial merge
# and the final covariance cross-multiplication go through decimal(38,0).
LINALG_SCALE = 1_000_000


def quantized_gram_partials(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = LINALG_SCALE,
) -> DataFrame:
    """Upper-triangle integer Gram partials: one (i, j, s_ij, n) row set
    per Arrow batch, where ``s_ij = Σ q_i·q_j`` over the batch's rows and
    ``q = floor(x·scale)`` (embedding_dim_stats' grid). ``n`` rides along
    on the diagonal rows (i == j) so consumers get the row count without
    a second scan."""

    def make_fn(vec_col, scale):
        def fn(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.stack(
                    [np.asarray(e, dtype=np.float64) for e in pdf[vec_col]]
                )
                q = np.floor(x * scale).astype(np.int64)
                g = q.T @ q  # (dim, dim), exact int64
                s = q.sum(axis=0)  # per-dim linear sums, exact int64
                dim = g.shape[0]
                iu, ju = np.triu_indices(dim)
                yield pd.DataFrame(
                    {
                        "i": iu.astype(np.int64),
                        "j": ju.astype(np.int64),
                        "s_ij": g[iu, ju],
                        "s_i": s[iu],
                        "s_j": s[ju],
                        "n": np.int64(len(pdf)),
                    }
                )

        return fn

    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("j", T.LongType()),
            T.StructField("s_ij", T.LongType()),
            T.StructField("s_i", T.LongType()),
            T.StructField("s_j", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    return df.select(vec_col).mapInPandas(make_fn(vec_col, scale), schema)


def covariance_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = LINALG_SCALE,
) -> DataFrame:
    """Exact quantized covariance, upper triangle: (i, j, n, s_ij, s_i,
    s_j, cov) with ``cov = (n·s_ij − s_i·s_j) / n²`` on the quantized
    grid. The numerator is exact decimal(38,0); the only float ops are
    one decimal→double cast and two divisions — each correctly rounded
    under IEEE-754, hence identical in any engine."""
    partials = quantized_gram_partials(df, vec_col, scale)
    # sums run IN decimal (not cast after): int64 partials are safe per
    # batch, but the cross-batch total must not wrap at corpus scale
    merged = partials.groupBy("i", "j").agg(
        F.sum(F.col("s_ij").cast("decimal(38,0)")).alias("s_ij"),
        F.sum(F.col("s_i").cast("decimal(38,0)")).alias("s_i"),
        F.sum(F.col("s_j").cast("decimal(38,0)")).alias("s_j"),
        F.sum(F.col("n").cast("decimal(38,0)")).alias("n"),
    )
    num = merged["n"] * merged["s_ij"] - merged["s_i"] * merged["s_j"]
    return merged.select(
        F.col("i").cast("bigint").alias("dim_i"),
        F.col("j").cast("bigint").alias("dim_j"),
        F.col("n").cast("bigint").alias("n"),
        F.col("s_ij").cast("bigint").alias("s_ij"),
        F.col("s_i").cast("bigint").alias("s_i"),
        F.col("s_j").cast("bigint").alias("s_j"),
        (
            num.cast("double")
            / F.col("n").cast("double")
            / F.col("n").cast("double")
        ).alias("q_cov"),
    )
