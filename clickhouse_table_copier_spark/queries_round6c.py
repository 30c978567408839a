"""Query batch: round-6c — graph, corpus-statistics, streaming-dedup,
and storage-layout operators.

- ``similarity_triangle_count`` — triangle enumeration over the verified
  near-dup pair graph (the standard ordered-edge join), the structural
  signal that separates "chains of borderline pairs" from genuinely
  dense duplicate families.
- ``vocab_frequency_spectrum`` — the frequency-of-frequencies (Zipf
  spectrum) of the corpus vocabulary: for each corpus frequency f, how
  many types occur exactly f times. Integer-exact end to end.
- ``streaming_dedup_survivors`` — the ONLINE exact-dedup operator
  (``streaming/dedup.py``) driven as two availableNow ingests sharing a
  checkpoint, proving first-seen-wins state carries across runs; the
  oracle is the batch distinct count.
- ``bucketed_colocated_join`` — the co-located join layout: both fact
  tables written bucketed on the join key, so the join plans with ZERO
  shuffle exchanges (pinned by a plan test). The 100 TB answer to "this
  join runs every hour — stop paying its shuffle".
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_table_copier_spark.queries import _t, register
from clickhouse_table_copier_spark.queries_round6 import _norm_tokens, _NORM_SQL, _TOKS_SQL


# ---------------------------------------------------------------------------
# Triangle count per node over the jaccard-pairs graph, via the
# DEGREE-ORIENTED wedge join (operators/graph.py): edges are directed
# from their (degree, id)-smaller endpoint, so out-degrees — and hence
# the wedge join's fan-out — are bounded by O(√m) even if a hub vertex
# appears (the arboricity argument). The id-oriented variant is kept in
# the operator and proven equal by test; the oracle enumerates
# triangles directly from the undirected pair list, so the driver hash
# also proves orientation-invariance. Shares the persisted pairs table —
# no shingle work is redone here.
# ---------------------------------------------------------------------------
def _triangle_oracle() -> str:
    from clickhouse_table_copier_spark.queries_pipeline import _JACCARD_PAIRS_SQL

    return f"""
    WITH {_JACCARD_PAIRS_SQL},
    tri AS (
      SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.id_a = e1.id_b
      JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    )
    SELECT doc_id, count(*) AS n_triangles
    FROM (SELECT unnest([a, b, c]) AS doc_id FROM tri)
    GROUP BY 1
    """


@register("similarity_triangle_count", oracle=_triangle_oracle())
def q_similarity_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.graph import triangles_per_node
    from clickhouse_table_copier_spark.queries_pipeline import _shared_jaccard_pairs

    pairs = _shared_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    return triangles_per_node(pairs, orient="degree")


# ---------------------------------------------------------------------------
# Vocabulary frequency spectrum (frequency of frequencies): the corpus
# statistic behind Good–Turing smoothing and tokenizer-vocab sizing —
# "how many types occur once, twice, …". Two map-side-combinable
# aggregations (token → count, count → type-count); the second one's
# keyspace is at most max-frequency, effectively free. No floats.
# ---------------------------------------------------------------------------
@register(
    "vocab_frequency_spectrum",
    oracle=f"""
    SELECT cnt AS freq, count(*) AS n_types
    FROM (
      SELECT tok, count(*) AS cnt
      FROM (SELECT unnest({_TOKS_SQL.format(c="text")}) AS tok FROM documents)
      GROUP BY 1
    )
    GROUP BY 1
    """,
)
def q_vocab_frequency_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(_norm_tokens("text")).alias("tok"))
    )
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        tf.groupBy("cnt")
        .agg(F.count(F.lit(1)).alias("n_types"))
        .select(F.col("cnt").alias("freq"), "n_types")
    )


# ---------------------------------------------------------------------------
# Streaming exact-dedup survivors: the online first-seen-wins operator
# (streaming/dedup.py, dropDuplicates state store) run as TWO
# availableNow ingests over one checkpoint — the second batch's copies
# of keys seen in the first batch MUST be dropped, which only happens if
# dedup state genuinely persists across runs. The emitted-survivor count
# equals the batch COUNT(DISTINCT normalized text) — arrival order
# decides which doc_id represents a key, so the deterministic
# cross-engine surface is the (ingested, survivors) pair, not the
# representative ids. Exact-forever state regime (watermark_delay=None)
# — the bounded-state watermark regime is exercised in test_streaming.
# ---------------------------------------------------------------------------
_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


@register(
    "streaming_dedup_survivors",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 200000, text || ' extra token appended'
      FROM documents WHERE doc_id % 10 = 5
    )
    SELECT count(*) AS n_ingested,
           count(DISTINCT {_NORM_SQL.format(c="text")}) AS n_survivors
    FROM corpus
    """,
)
def q_streaming_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries_pipeline import _corpus
    from clickhouse_table_copier_spark.streaming.dedup import streaming_exact_dedup

    corpus = _corpus(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="ctc_sdedup_q_")
    src, out, ck = f"{work}/src", f"{work}/out", f"{work}/ck"
    try:
        # ingest 1: the originals; ingest 2: every injected copy — so
        # EVERY exact-duplicate pair straddles the two runs and is only
        # deduped if the checkpoint state genuinely carries across them
        corpus.where(F.col("doc_id") < 100000).write.parquet(src)
        streaming_exact_dedup(
            spark, src, _DOC_SCHEMA, "text", out, ck, watermark_delay=None
        ).awaitTermination()
        corpus.where(F.col("doc_id") >= 100000).write.mode("append").parquet(src)
        streaming_exact_dedup(
            spark, src, _DOC_SCHEMA, "text", out, ck, watermark_delay=None
        ).awaitTermination()
        n_ingested = corpus.count()
        n_survivors = spark.read.parquet(out).count()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(n_ingested, n_survivors)], "n_ingested BIGINT, n_survivors BIGINT"
    )


# ---------------------------------------------------------------------------
# Co-located (bucketed) join: lineitem and orders written bucketed +
# sorted on the join key, then joined WITHOUT any shuffle — the join
# reads matching buckets pairwise (SortMergeJoin over pre-sorted bucket
# files, zero Exchange; pinned by test_round6c_ops). This is the layout
# decision that amortizes a recurring join's shuffle into a one-time
# write: at 100 TB a fact-fact join that runs hourly pays its exchange
# once at ingest, not per query. Values are layout-independent — the
# oracle is the plain join — so the driver hash proves the bucketed
# path changes nothing but the plan.
# ---------------------------------------------------------------------------
_BUCKETS = 8


@register(
    "bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderstatus,
           count(*) AS line_cnt,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = bucketed_join_frame(spark, sf_dir)
    try:
        rows = df.collect()  # materialize before the backing tables drop
        out = spark.createDataFrame(rows, df.schema)
    finally:
        drop_bucketed_tables(spark)
    return out


def bucketed_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write both sides bucketed on the join key (via the round-4
    ``operators.bucketing`` layout primitives), return the joined agg.

    Exposed separately so the plan test can assert the no-Exchange
    property on the same frame the registered query materializes.
    """
    from clickhouse_table_copier_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    # repartition to the bucket count first so each side writes exactly
    # one file per bucket instead of input-splits × buckets
    write_bucketed(
        li.repartition(_BUCKETS, "l_orderkey"),
        "ctc_bucketed_lineitem",
        "l_orderkey",
        n_buckets=_BUCKETS,
    )
    write_bucketed(
        orders.repartition(_BUCKETS, "l_orderkey"),
        "ctc_bucketed_orders",
        "l_orderkey",
        n_buckets=_BUCKETS,
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        bucketed_join(
            spark, "ctc_bucketed_lineitem", "ctc_bucketed_orders", "l_orderkey"
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
        )
    )


def drop_bucketed_tables(spark: SparkSession) -> None:
    # managed tables: DROP removes the warehouse files too
    for t in ("ctc_bucketed_lineitem", "ctc_bucketed_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
