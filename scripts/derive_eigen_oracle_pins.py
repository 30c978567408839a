#!/usr/bin/env python
"""Re-derive the pinned literal oracles for the two eigen queries.

``pca_variance_explained`` and ``embedding_whitening_check`` compute
eigendecompositions, which no SQL dialect expresses — but their ANSWERS
on the committed sf0.01 fixture are fixed values: the covariance is
exact-integer-derived (``operators/linalg`` quantizes to the 1e6 grid
and sums in exact integer arithmetic), so the spectrum and the
whitened-covariance deviation are deterministic. This script is the
INDEPENDENT derivation path: it reads the parquet fixture with
pyarrow + numpy (no Spark anywhere), replicates the quantized-Gram
arithmetic step for step, and writes the results as a generated module
(``clickhouse_table_copier_spark/eigen_oracle_pins.py``) whose literal
``SELECT`` oracles DuckDB can run. The driver's hash check then
compares the Spark execution against this second derivation — a real
cross-engine signal, closing the round-8 verdict's "no_oracle" gap.

Arithmetic parity notes (each mirrors a specific line of the Spark path):
- floats widen float32→float64 BEFORE quantization
  (``linalg.quantized_gram_partials``: ``np.asarray(e, dtype=np.float64)``);
- ``q = floor(x · 1e6)`` as int64; all Gram/linear sums are exact
  integers (batch-split order cannot matter — addition is associative);
- ``q_cov = double(n·s_ij − s_i·s_j) / double(n) / double(n)`` — the
  numerator is converted to double FIRST, then divided twice, exactly
  as ``covariance_matrix`` casts then divides;
- ``cov = q_cov / scale²`` and ``mu_i = double(s_i) / n / scale`` as in
  ``queries_round8k._driver_covariance``;
- whitening ``W = V · diag(1/√(max(λ,0)+1e-9)) · Vᵀ`` from
  ``np.linalg.eigh`` and the verify pass re-quantizes the whitened
  vectors on the same grid, as in ``q_embedding_whitening_check``.

Re-run after regenerating the sf0.01 fixture:

    python scripts/derive_eigen_oracle_pins.py

and commit the refreshed ``eigen_oracle_pins.py``.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(__file__),
    "..",
    "clickhouse_table_copier_spark",
    "eigen_oracle_pins.py",
)

SCALE = 1_000_000  # operators/linalg.LINALG_SCALE
TOP_PC = 10  # queries_round8k._TOP_PC
ZCA_EPS = 1e-9  # queries_round8k._ZCA_EPS


def load_embeddings(sf_dir: str) -> np.ndarray:
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    col = tbl.column("embedding").to_pylist()
    # float32 parquet values widened to float64 exactly as the Spark
    # mapInPandas batches do (np.asarray(e, dtype=np.float64))
    return np.stack([np.asarray(e, dtype=np.float64) for e in col])


def quantized_cov_and_mu(x: np.ndarray):
    """Exact-integer covariance + means on the 1e6 grid, replicating
    linalg.covariance_matrix followed by _driver_covariance's rescale.
    Sums run over the whole corpus at once — associative integer
    addition makes batch boundaries irrelevant by construction."""
    n, dim = x.shape
    q = np.floor(x * SCALE).astype(np.int64)
    g = (q.T @ q).astype(object)  # exact (int64 safe at this n, but keep object for the cross products)
    s = q.sum(axis=0).astype(object)
    cov = np.zeros((dim, dim))
    mu = np.zeros(dim)
    for i in range(dim):
        for j in range(i, dim):
            num = int(n) * int(g[i, j]) - int(s[i]) * int(s[j])
            q_cov = float(num) / float(n) / float(n)
            cov[i, j] = cov[j, i] = q_cov / (SCALE * SCALE)
        mu[i] = float(int(s[i])) / n / SCALE
    return cov, mu, n


def pca_rows(cov: np.ndarray):
    vals = np.linalg.eigvalsh(cov)[::-1]
    total = float(vals.sum())
    rows, cum = [], 0.0
    for k in range(TOP_PC):
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
    return rows


def whitening_row(x: np.ndarray, cov: np.ndarray, mu: np.ndarray, n: int):
    dim = x.shape[1]
    vals, vecs = np.linalg.eigh(cov)
    w = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, 0) + ZCA_EPS)) @ vecs.T
    z = (x - mu) @ w.T
    q = np.floor(z * SCALE).astype(np.int64)
    g = q.T @ q
    s = q.sum(axis=0)
    max_off, max_diag = 0.0, 0.0
    for i in range(dim):
        for j in range(i, dim):
            num = int(n) * int(g[i, j]) - int(s[i]) * int(s[j])
            wcov = float(num) / float(n) / float(n) / (SCALE * SCALE)
            if i == j:
                max_diag = max(max_diag, abs(wcov - 1.0))
            else:
                max_off = max(max_off, abs(wcov))
    return (round(max_off, 6), round(max_diag, 6), n, dim)


def main() -> None:
    x = load_embeddings(SF_DIR)
    cov, mu, n = quantized_cov_and_mu(x)
    pca = pca_rows(cov)
    whiten = whitening_row(x, cov, mu, n)
    with open(OUT, "w") as f:
        f.write(
            '"""GENERATED by scripts/derive_eigen_oracle_pins.py — do not\n'
            "hand-edit. Pinned literal oracle rows for the two eigen\n"
            "queries, independently re-derived from the sf0.01 fixture\n"
            "with pyarrow + numpy (no Spark). The embedded row-count\n"
            "guard scopes each oracle to that fixture: at any other\n"
            "scale factor the oracle returns zero rows, turning a\n"
            "wrong-fixture comparison into a loud row-count mismatch\n"
            'instead of a silent wrong-value pass."""\n\n'
        )
        f.write(f"PIN_SF_ROWS = {n}\n")
        f.write(f"PCA_ROWS = {pca!r}\n")
        f.write(f"WHITEN_ROW = {whiten!r}\n")
    print(f"wrote {os.path.normpath(OUT)}: n={n}, pca[0]={pca[0]}, whiten={whiten}")


if __name__ == "__main__":
    main()
