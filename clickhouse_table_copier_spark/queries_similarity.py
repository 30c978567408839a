"""Query batch 5: similarity search over the embeddings fixture.

Determinism approach: the oracle SQL renders dot products / norms as an
explicit left-to-right addition chain over the 64 dimensions — the exact
evaluation order of Spark's ``F.aggregate`` fold — so both engines produce
bit-identical doubles (IEEE754 is deterministic given operand order). The
LSH variant's ±1 hyperplanes are md5-derived constants baked identically
into both the Spark plan and the generated SQL.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.operators.similarity import (
    cosine,
    dot,
    hyperplane_lsh_buckets,
    norm,
)
from clickhouse_table_copier_spark.operators.dedup import spread
from clickhouse_table_copier_spark.queries import _t, _tc, register

DIM = 64
NUM_PLANES = 8


def _dot_chain_sql(a: str, b: str) -> str:
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, DIM + 1)
    )


def _norm_chain_sql(a: str) -> str:
    return (
        "sqrt("
        + " + ".join(
            f"CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE)"
            for i in range(1, DIM + 1)
        )
        + ")"
    )


def _sqdist_chain_sql(a: str, b: str) -> str:
    """Squared L2 distance as the explicit left-to-right chain matching the
    evaluation order of operators.ivf._sq_dist's F.aggregate fold."""
    return " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        f" * (CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        for i in range(1, DIM + 1)
    )


def _plane_sign(p: int, d: int) -> int:
    return 1 if int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16) % 2 == 0 else -1


def _bucket_sql(vec: str) -> str:
    terms = []
    for p in range(NUM_PLANES):
        chain = " + ".join(
            f"({_plane_sign(p, d)}.0) * CAST({vec}[{d + 1}] AS DOUBLE)"
            for d in range(DIM)
        )
        terms.append(f"CASE WHEN ({chain}) > 0 THEN {2 ** p} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


# ---------------------------------------------------------------------------
# Exact brute-force cosine top-k: query = vec_id 0's embedding.
# ---------------------------------------------------------------------------
@register(
    "similarity_brute_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT b.vec_id,
           round(({_dot_chain_sql("b.embedding", "q.qv")})
                 / ({_norm_chain_sql("b.embedding")} * {_norm_chain_sql("q.qv")}),
                 6) AS cosine_sim
    FROM embeddings b, q
    WHERE b.vec_id <> 0
    ORDER BY cosine_sim DESC, b.vec_id ASC
    LIMIT 10
    """,
)
def q_similarity_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.similarity import _vec_literal

    # query vector: fetched from the UNspread relation so the one-row
    # lookup is a pushed-filter scan task, not a scan+exchange job (the
    # spread() exchange only helps the wide per-row scoring downstream)
    base = _tc(spark, sf_dir, "embeddings")
    emb = spread(base)
    qvec = [float(x) for x in base.where(F.col("vec_id") == 0).first()["embedding"]]
    q = _vec_literal(qvec)
    scored = emb.where(F.col("vec_id") != 0).select(
        "vec_id", F.round(cosine(F.col("embedding"), q), 6).alias("cosine_sim")
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(10)


# ---------------------------------------------------------------------------
# LSH bucket histogram: vectors per hyperplane-sign bucket — verifies the
# bucketing layer the approximate path prunes with.
# ---------------------------------------------------------------------------
@register(
    "similarity_lsh_buckets",
    oracle=f"""
    SELECT CAST({_bucket_sql("embedding")} AS BIGINT) AS bucket, count(*) AS n_vectors
    FROM embeddings GROUP BY 1
    """,
)
def q_similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(_t(spark, sf_dir, "embeddings"))
    return (
        hyperplane_lsh_buckets(emb, NUM_PLANES, dim=DIM)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


# ---------------------------------------------------------------------------
# Approximate top-k via multi-probe LSH (query bucket + hamming-1 probes),
# exact cosine on the candidate set only.
# ---------------------------------------------------------------------------
@register(
    "similarity_lsh_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv, {_bucket_sql("embedding")} AS qb
               FROM embeddings WHERE vec_id = 0),
    cand AS (
      SELECT b.vec_id, b.embedding, q.qv
      FROM embeddings b, q
      WHERE b.vec_id <> 0
        AND ({_bucket_sql("b.embedding")} = q.qb
             OR {" OR ".join(f"({_bucket_sql('b.embedding')} = xor(q.qb, {1 << p}))" for p in range(NUM_PLANES))})
    )
    SELECT vec_id,
           round(({_dot_chain_sql("embedding", "qv")})
                 / ({_norm_chain_sql("embedding")} * {_norm_chain_sql("qv")}), 6) AS cosine_sim
    FROM cand
    ORDER BY cosine_sim DESC, vec_id ASC
    LIMIT 10
    """,
)
def q_similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.similarity import lsh_topk

    base = _tc(spark, sf_dir, "embeddings")
    emb = spread(base)
    qvec = [float(x) for x in base.where(F.col("vec_id") == 0).first()["embedding"]]
    return lsh_topk(
        emb.where(F.col("vec_id") != 0), qvec, k=10, num_planes=NUM_PLANES
    )


# ---------------------------------------------------------------------------
# IVF ANN *search* path with PINNED centroids (the deterministic seed
# vectors: the 8 lowest vec_ids). Given fixed centroids, cell assignment +
# probe selection + in-cell exact top-k is pure arithmetic, rendered below
# as explicit addition chains so DuckDB reproduces Spark's fold order
# bit-for-bit. Cell assignment tie-breaks to the lowest cell id, probe
# selection orders by (distance, cell) — both mirrored in the SQL. The
# TRAINED path (`similarity_ivf_topk`, queries_extras.py) is ALSO oracled
# since round 4: train_centroids_exact makes Lloyd means ordered folds the
# oracle replays as CTEs.
# ---------------------------------------------------------------------------
N_CELLS = 8
N_PROBE = 3


@register(
    "similarity_ivf_search",
    oracle=f"""
    WITH cents AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT {N_CELLS}
    ),
    q AS (SELECT cv AS qv FROM cents WHERE cell = 0),
    probes AS (
      SELECT c.cell FROM cents c, q
      ORDER BY {_sqdist_chain_sql("q.qv", "c.cv")} ASC, c.cell ASC
      LIMIT {N_PROBE}
    ),
    pairs AS (
      SELECT e.vec_id, e.embedding, c.cell,
             {_sqdist_chain_sql("e.embedding", "c.cv")} AS d
      FROM embeddings e, cents c
      WHERE e.vec_id <> 0
    ),
    assigned AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT vec_id, embedding, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        FROM pairs
      ) WHERE rn = 1
    ),
    cand AS (
      SELECT a.vec_id, a.embedding, q.qv
      FROM assigned a, q
      WHERE a.cell IN (SELECT cell FROM probes)
    )
    SELECT vec_id,
           round(({_dot_chain_sql("embedding", "qv")})
                 / ({_norm_chain_sql("embedding")} * {_norm_chain_sql("qv")}), 6)
             AS cosine_sim
    FROM cand
    ORDER BY cosine_sim DESC, vec_id ASC
    LIMIT 10
    """,
)
def q_similarity_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.ivf import ivf_topk

    emb = spread(_t(spark, sf_dir, "embeddings"))
    seeds = emb.orderBy("vec_id").limit(N_CELLS).select("embedding").collect()
    centroids = [[float(x) for x in r["embedding"]] for r in seeds]
    return ivf_topk(
        emb.where(F.col("vec_id") != 0),
        centroids,
        centroids[0],
        k=10,
        n_probe=N_PROBE,
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs within each label group — the
# "semantic dedup" operator: bucket by label (cheap blocking key), compare
# within buckets only, keep pairs above threshold.
# ---------------------------------------------------------------------------
@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding,
             {_norm_chain_sql("embedding")} AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(({_dot_chain_sql("a.embedding", "b.embedding")})
                 / (a.nrm * b.nrm), 6) AS cosine_sim
    FROM e a JOIN e b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(({_dot_chain_sql("a.embedding", "b.embedding")})
                / (a.nrm * b.nrm), 6) >= 0.4
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Norms are precomputed ONCE per vector before the self-join (linear
    # work), so each of the O(sum n_label²) candidate pairs evaluates only
    # the dot-product chain — ~3× less per-pair arithmetic than folding
    # both norms again per pair. Bit-identical to the oracle: each engine
    # computes the per-vector norm with the same left-to-right chain, and
    # the final divide multiplies the same two doubles. (r4 bench flagged
    # a 2× regression here; min-of-3 at sf0.1 went 0.99 s → 0.63 s with
    # this shape on the same fixture.)
    emb = spread(_tc(spark, sf_dir, "embeddings")).withColumn(
        "nrm", norm(F.col("embedding"))
    )
    a = emb.alias("a")
    b = emb.alias("b")
    sim = F.round(
        dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= 0.4)
    )
