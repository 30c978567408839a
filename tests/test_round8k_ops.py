"""Round-8k tests: eigen-spectrum recovery on planted anisotropy,
whitening-to-identity, and NDCG arithmetic on constructed rankings."""

from __future__ import annotations

import math
import os
import tempfile

from clickhouse_table_copier_spark.queries_round8k import (
    _DISCOUNTS,
    q_ann_ndcg_eval,
    q_embedding_whitening_check,
    q_pca_variance_explained,
)

_EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _write(spark, rows, d=None):
    d = d or tempfile.mkdtemp(prefix="r8k_")
    spark.createDataFrame(rows, _EMB_SCHEMA).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    return d


def _aniso_vectors(n=160):
    """Deterministic vectors: dim 0 swings ±0.9 (dominant variance),
    every other dim gets a small hash-derived wiggle.  n must exceed the
    64 dims by a healthy margin — with n < dim the sample covariance is
    rank-deficient and whitening CANNOT reach identity (that's a data
    property, not an operator bug)."""
    rows = []
    for i in range(n):
        v = [0.0] * 64
        v[0] = 0.9 if i % 2 == 0 else -0.9
        for d in range(1, 64):
            # per-dim multiplier keeps columns decorrelated (an additive
            # mod-1000 variant left the covariance rank-deficient: two
            # exactly-zero eigenvalues)
            h = (i * (d * 2 + 1) * 2654435761) % (2**32)
            v[d] = (h / 2**32 - 0.5) / 5.0  # ±0.1 pseudo-random wiggles
        rows.append((i, v, 0))
    return rows


def test_pca_finds_the_planted_dominant_axis(spark):
    d = _write(spark, _aniso_vectors())
    out = q_pca_variance_explained(spark, d).collect()
    assert [r["pc"] for r in out] == list(range(1, 11))
    # dim 0 variance 0.81 dwarfs the ~0.003-scale wiggle dims: PC1
    # dominates (63 wiggles together sum to ~0.2) and ratios sort
    # non-increasing
    assert out[0]["var_ratio"] > 0.5
    assert out[0]["eigenvalue"] > 50 * out[1]["eigenvalue"]
    ratios = [r["var_ratio"] for r in out]
    assert ratios == sorted(ratios, reverse=True)
    assert out[-1]["cum_ratio"] <= 1.0 + 1e-9


def test_whitening_produces_identity_covariance(spark):
    d = _write(spark, _aniso_vectors())
    out = q_embedding_whitening_check(spark, d).collect()[0]
    assert out["dim"] == 64 and out["n_rows"] == 160
    # quantization noise only: the whitened covariance is identity to
    # well under a percent
    assert out["max_offdiag"] < 0.01
    assert out["max_diag_err"] < 0.01


def test_ndcg_perfect_when_lsh_equals_brute(spark):
    # all vectors in one hyperplane bucket family and far apart in
    # cosine: LSH candidates == everything, so the LSH top-10 IS the
    # brute top-10 -> NDCG == 1 exactly, overlap 10.
    rows = [(0, [1.0] + [0.0] * 63, 0)]
    for i in range(1, 13):
        v = [1.0] + [0.0] * 63
        v[1] = i / 100.0  # decreasing cosine to the query as i grows
        rows.append((i, v, 0))
    d = _write(spark, rows)
    out = q_ann_ndcg_eval(spark, d).collect()[0]
    assert out["n_overlap"] == 10
    assert out["ndcg"] == 1.0
    # idcg is the fixed sum of rel*discount for rel = 10..1
    idcg = sum((10 - p) * _DISCOUNTS[p] for p in range(10))
    assert math.isclose(out["idcg"], idcg, rel_tol=1e-9)
