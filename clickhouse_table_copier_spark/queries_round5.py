"""Query batch: round-5 operators.

Training-data-pipeline additions beyond the round-4 surface: substring-
level (span) dedup, batch CDC changelog apply, embedding-based eval-set
decontamination, content-defined chunking, robust (MAD) outlier gating,
and GROUPING SETS rollups.

Cross-engine determinism: every hash is md5-derived (identical in both
engines); float aggregation goes through decimals or stays rational;
window orderings carry total tiebreaks (see queries.py module docstring
for the full rule set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register

# Word-gram width / minimum consecutive-gram run for span dedup. k=4 keeps
# gram document-frequency near 1 on natural text (df ≤ 4 on the fixture's
# 20-word vocabulary — measured), so the inverted-index join cost Σ df²
# stays linear-ish; min_run=2 means a reported span is ≥ 5 shared words.
SPAN_K = 4
SPAN_MIN_RUN = 2

# Shared span-runs artifact: cross_doc_spans (min_run=2) and
# span_dedup_survivors (min_run=7) both consume repeated_span_runs — the
# normalize → gram-hash → inverted-index join → gaps-and-islands pipeline
# that dominates both queries. Persist it once per (session, sf_dir) and
# let each query apply its own threshold; same LRU pattern (and fingerprint
# exclusion via the *_CACHE suffix) as the jaccard-pairs artifact.
_SPAN_RUNS_CACHE: dict = {}
# The positional gram-hash frame under the runs table is ALSO the front
# end of the intra-document repeat signal (same normalize → explode →
# md5 pipeline, different self-join key), so it persists separately and
# both consumers start from it.
_SPAN_GRAMS_CACHE: dict = {}


def _shared_span_grams(spark: SparkSession, sf_dir: str):
    from clickhouse_table_copier_spark.operators.dedup import span_grams
    from clickhouse_table_copier_spark.queries_pipeline import _cache_get

    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), SPAN_K)
    return _cache_get(
        _SPAN_GRAMS_CACHE,
        key,
        lambda: span_grams(
            _t(spark, sf_dir, "documents"), "doc_id", "text", k=SPAN_K
        ),
    )


def _shared_span_runs(spark: SparkSession, sf_dir: str):
    from clickhouse_table_copier_spark.operators.dedup import repeated_span_runs
    from clickhouse_table_copier_spark.queries_pipeline import _cache_get

    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), SPAN_K)
    return _cache_get(
        _SPAN_RUNS_CACHE,
        key,
        lambda: repeated_span_runs(
            _t(spark, sf_dir, "documents"),
            "doc_id",
            "text",
            k=SPAN_K,
            grams=_shared_span_grams(spark, sf_dir),
        ),
    )

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)


# ---------------------------------------------------------------------------
# Substring-level dedup: maximal cross-document repeated word spans
# (operators/dedup.py::repeated_span_pairs). The oracle replays the same
# gaps-and-islands construction: k-gram md5 hashes, inverted-index join,
# runs via pos − row_number per (pair, offset) diagonal.
# ---------------------------------------------------------------------------
@register(
    "cross_doc_spans",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL.format(c="text")}, ' ') AS w
      FROM documents
    ),
    pos_t AS (
      SELECT doc_id, w,
             unnest(generate_series(1, greatest(len(w) - {SPAN_K} + 1, 0))) AS pos
      FROM norm WHERE len(w) >= {SPAN_K}
    ),
    grams AS (
      SELECT doc_id, pos,
             CAST('0x' || substring(
               md5(array_to_string(w[pos:pos+{SPAN_K}-1], ' ')), 1, 15)
               AS BIGINT) AS h
      FROM pos_t
    ),
    m AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
             a.pos - b.pos AS diag
      FROM grams a JOIN grams b ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    runs AS (
      SELECT id_a, id_b, diag, pa,
             pa - row_number() OVER (PARTITION BY id_a, id_b, diag ORDER BY pa)
               AS grp
      FROM m
    ),
    spans AS (
      SELECT id_a, id_b, count(*) AS run_len
      FROM runs GROUP BY id_a, id_b, diag, grp
      HAVING count(*) >= {SPAN_MIN_RUN}
    )
    SELECT id_a, id_b,
           CAST(max(run_len) + {SPAN_K} - 1 AS BIGINT) AS longest_span_words,
           CAST(count(*) AS BIGINT) AS n_spans
    FROM spans GROUP BY 1, 2
    """,
)
def q_cross_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import repeated_span_pairs

    docs = _t(spark, sf_dir, "documents")
    return repeated_span_pairs(
        docs,
        "doc_id",
        "text",
        k=SPAN_K,
        min_run=SPAN_MIN_RUN,
        runs=_shared_span_runs(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# Batch CDC apply (operators/cdc.py): a deterministic changelog derived
# from the customer table itself — two overlapping update generations
# (seq 1 and 2, proving last-writer-wins), deletes that override updates
# (seq 3), and inserts of brand-new keys — merged into the post-image.
# Output is the per-segment post-image summary, so every op type moves
# the numbers. Decimal sums keep the totals reorder-proof.
# ---------------------------------------------------------------------------
_CDC_CHANGES_SQL = """
      SELECT c_custkey, 1 AS seq, 'U' AS op, c_name, c_nationkey,
             c_acctbal + 100.0 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey, 2, 'U', c_name, c_nationkey,
             c_acctbal + 250.0, c_mktsegment
      FROM customer WHERE c_custkey % 21 = 0
      UNION ALL
      SELECT c_custkey, 3, 'D', NULL, NULL, NULL, NULL
      FROM customer WHERE c_custkey % 13 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 1, 'U', c_name, c_nationkey,
             50.0, c_mktsegment
      FROM customer WHERE c_custkey % 11 = 0
"""


@register(
    "cdc_merge_apply",
    oracle=f"""
    WITH changes AS ({_CDC_CHANGES_SQL}),
    latest AS (
      SELECT * FROM (
        SELECT c_custkey, op, c_name, c_nationkey, c_acctbal, c_mktsegment,
               row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
        FROM changes
      ) WHERE rn = 1
    ),
    final AS (
      SELECT coalesce(l.c_custkey, b.c_custkey) AS c_custkey,
             CASE WHEN l.op = 'U' THEN l.c_acctbal ELSE b.c_acctbal END AS c_acctbal,
             CASE WHEN l.op = 'U' THEN l.c_mktsegment ELSE b.c_mktsegment END AS c_mktsegment
      FROM customer b FULL OUTER JOIN latest l USING (c_custkey)
      WHERE l.op IS NULL OR l.op <> 'D'
    )
    SELECT c_mktsegment, count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM final GROUP BY 1
    """,
)
def q_cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.cdc import apply_changelog

    cust = _t(spark, sf_dir, "customer")

    def gen(pred: str, seq: int, op: str, bal_expr: str, key_expr: str = "c_custkey"):
        return cust.where(F.expr(pred)).select(
            F.expr(key_expr).alias("c_custkey"),
            F.lit(seq).alias("seq"),
            F.lit(op).alias("op"),
            *(
                [
                    F.col("c_name"),
                    F.col("c_nationkey"),
                    F.expr(bal_expr).alias("c_acctbal"),
                    F.col("c_mktsegment"),
                ]
                if op == "U"
                else [
                    F.lit(None).cast("string").alias("c_name"),
                    F.lit(None).cast("int").alias("c_nationkey"),
                    F.lit(None).cast("double").alias("c_acctbal"),
                    F.lit(None).cast("string").alias("c_mktsegment"),
                ]
            ),
        )

    changes = (
        gen("c_custkey % 7 = 0", 1, "U", "c_acctbal + 100.0")
        .unionAll(gen("c_custkey % 21 = 0", 2, "U", "c_acctbal + 250.0"))
        .unionAll(gen("c_custkey % 13 = 0", 3, "D", "NULL"))
        .unionAll(
            gen("c_custkey % 11 = 0", 1, "U", "50.0", "c_custkey + 1000000")
        )
    )
    final = apply_changelog(cust, changes, key="c_custkey")
    return final.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_acctbal"),
    )


# ---------------------------------------------------------------------------
# Embedding decontamination: flag TRAIN vectors too close (cosine) to any
# EVAL vector — the semantic complement of the shingle-based
# `decontamination` query (benchmark rephrasings that n-gram overlap
# misses). Eval set = the 10 lowest vec_ids (deterministic); its vectors
# are driver-collected (10×64 floats — metadata-sized, the IVF-seed
# pattern) and inlined as literals, so the scan is ONE pass over train
# with no join at all: per row, greatest() over 10 inline dot/norm
# chains. At 100 TB this is the exact shape: eval sets are tiny and
# broadcast; train is scanned once, embarrassingly parallel.
# Python computes the eval norms with the same left-to-right double fold
# the SQL chain uses, so literals match the oracle bit-for-bit.
# ---------------------------------------------------------------------------
_DECON_N_EVAL = 10
_DECON_TAU = 0.4


def _decon_oracle() -> str:
    from clickhouse_table_copier_spark.queries_similarity import (
        _dot_chain_sql,
        _norm_chain_sql,
    )

    return f"""
    WITH ev AS (
      SELECT vec_id AS eval_id, embedding AS evec,
             {_norm_chain_sql("embedding")} AS enrm
      FROM embeddings WHERE vec_id < {_DECON_N_EVAL}
    ),
    tr AS (
      SELECT vec_id, embedding, {_norm_chain_sql("embedding")} AS tnrm
      FROM embeddings WHERE vec_id >= {_DECON_N_EVAL}
    ),
    scored AS (
      SELECT t.vec_id,
             max(round(({_dot_chain_sql("t.embedding", "e.evec")})
                       / (t.tnrm * e.enrm), 6)) AS max_cos
      FROM tr t, ev e
      GROUP BY t.vec_id
    )
    SELECT vec_id, max_cos FROM scored WHERE max_cos >= {_DECON_TAU}
    """


@register(
    "embedding_decontamination",
    oracle=_decon_oracle(),
)
def q_embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from clickhouse_table_copier_spark.operators.dedup import spread
    from clickhouse_table_copier_spark.operators.similarity import dot, norm

    emb = _t(spark, sf_dir, "embeddings")
    evals = (
        emb.where(F.col("vec_id") < _DECON_N_EVAL)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )  # metadata-sized: N_EVAL × dim floats, constant in corpus size
    train = spread(emb.where(F.col("vec_id") >= _DECON_N_EVAL)).withColumn(
        "tnrm", norm(F.col("embedding"))
    )
    sims = []
    for r in evals:
        vec = [float(x) for x in r["embedding"]]
        # left-to-right fold, same order as the SQL chain
        enrm = 0.0
        for x in vec:
            enrm += x * x
        enrm = math.sqrt(enrm)
        evec = F.array(*[F.lit(x) for x in vec])
        sims.append(
            F.round(
                dot(F.col("embedding"), evec) / (F.col("tnrm") * F.lit(enrm)), 6
            )
        )
    return (
        train.select("vec_id", F.greatest(*sims).alias("max_cos"))
        .where(F.col("max_cos") >= _DECON_TAU)
    )


# ---------------------------------------------------------------------------
# Content-defined chunking: boundaries where the rolling word-bigram hash
# ≡ 0 (mod divisor) — unlike doc_chunking's fixed-size slices, an edit
# early in a document does NOT shift later chunk boundaries (the
# rsync/CDC-storage property, here for document-level incremental
# re-embedding: only chunks whose content changed re-embed). Expression
# only: explode positions, md5 bigram hash, boundary flag, chunk id =
# prefix-sum of flags over a doc-partitioned window.
# ---------------------------------------------------------------------------
_CDC_CHUNK_K = 2
_CDC_CHUNK_MOD = 16


@register(
    "content_defined_chunks",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL.format(c="text")}, ' ') AS w
      FROM documents
    ),
    pos_t AS (
      SELECT doc_id, len(w) AS n,
             unnest(generate_series(1, greatest(len(w) - {_CDC_CHUNK_K} + 1, 0))) AS pos,
             w
      FROM norm WHERE len(w) >= {_CDC_CHUNK_K}
    ),
    flags AS (
      SELECT doc_id, pos,
             CASE WHEN CAST('0x' || substring(
                    md5(array_to_string(w[pos:pos+{_CDC_CHUNK_K}-1], ' ')), 1, 15)
                    AS BIGINT) % {_CDC_CHUNK_MOD} = 0
                  THEN 1 ELSE 0 END AS b
      FROM pos_t
    ),
    chunked AS (
      SELECT doc_id,
             sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS chunk_id
      FROM flags
    ),
    per_chunk AS (
      SELECT doc_id, chunk_id, count(*) AS chunk_words
      FROM chunked GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(min(chunk_words) AS BIGINT) AS min_chunk_words,
           CAST(max(chunk_words) AS BIGINT) AS max_chunk_words
    FROM per_chunk GROUP BY 1
    """,
)
def q_content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import (
        normalized_text,
        spread,
    )

    k, mod = _CDC_CHUNK_K, _CDC_CHUNK_MOD
    docs = spread(_t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.split(normalized_text("text"), " ").alias("w")
    ).where(F.size("w") >= k)
    flags = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("w") - k + 1)).alias("pos"),
        F.col("w"),
    ).select(
        "doc_id",
        "pos",
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.array_join(F.expr(f"slice(w, pos, {k})"), " ")),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % mod
            == 0,
            1,
        )
        .otherwise(0)
        .alias("b"),
    )
    wc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = flags.select("doc_id", F.sum("b").over(wc).alias("chunk_id"))
    per_chunk = chunked.groupBy("doc_id", "chunk_id").agg(
        F.count(F.lit(1)).alias("chunk_words")
    )
    return per_chunk.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.min("chunk_words").cast("bigint").alias("min_chunk_words"),
        F.max("chunk_words").cast("bigint").alias("max_chunk_words"),
    )


# ---------------------------------------------------------------------------
# Robust outliers: per-series median + MAD (median absolute deviation),
# flag |x − med| > 3σ̂ where σ̂ = 1.4826·MAD — the robust z-score that a
# mean/stddev gate gets wrong under the very outliers it hunts. Exact
# medians interpolate identically in both engines
# (order_value_percentiles precedent). Two grouped passes with the tiny
# per-series bounds broadcast back — the winsorized_stats shape; its
# _approx sibling documents the constant-memory sketch path that replaces
# percentile() when a series outgrows one task's buffer.
# ---------------------------------------------------------------------------
@register(
    "mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           CAST(any_value(d.med) AS DOUBLE) AS med,
           CAST(any_value(m.mad) AS DOUBLE) AS mad,
           CAST(sum(CASE WHEN d.adev > 4.4478 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           count(*) AS n_events
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1 ORDER BY 1
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries import _events

    ev = _events(spark, sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").cast("double").alias("med"),
            F.first("mad").cast("double").alias("mad"),
            F.sum(
                F.when(F.col("adev") > F.lit(4.4478) * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# GROUPING SETS: the multi-granularity rollup surface between cube
# (flag_status_cube) and plain GROUP BY — one shuffle produces the
# (flag, status), (flag), and grand-total granularities. Absent keys are
# rendered '*' via coalesce (both columns are non-null in the schema), so
# the output is engine-agnostic without relying on GROUPING() parity.
# ---------------------------------------------------------------------------
@register(
    "flag_status_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, '*') AS rf,
           coalesce(l_linestatus, '*') AS ls,
           count(*) AS cnt,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_flag_status_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "lineitem")
    df.createOrReplaceTempView("ctc_gs_lineitem")
    return df.sparkSession.sql(
        """
        SELECT coalesce(l_returnflag, '*') AS rf,
               coalesce(l_linestatus, '*') AS ls,
               count(*) AS cnt,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM ctc_gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# Domain-mixture resampling (the DoReMi/data-mixing materialization step):
# given target mixture weights per source, find the largest total corpus
# T the weights can serve (T = min_s n_s/w_s — the scarcest source binds)
# and deterministically select k_s = w_s·T docs per source. ALL mixture
# arithmetic is integer (weights in basis points, floor division), so
# both engines agree exactly; selection order is the portable md5 rank,
# so the chosen doc SET is engine-identical (checksummed by sum(doc_id)).
# One grouped count (20 rows) + one source-partitioned rank window.
# Weights derive from the source number (r_s = 1 + src%4, normalized to
# 10000 bp) instead of a 20-literal table.
# ---------------------------------------------------------------------------
@register(
    "mixture_resample",
    oracle="""
    WITH wt AS (
      SELECT source, count(*) AS n_s,
             (1 + CAST(substring(source, 4) AS INTEGER) % 4) * 200 AS bp
      FROM documents GROUP BY 1
    ),
    t AS (
      SELECT source, n_s, bp,
             min(n_s * 10000 // bp) OVER () AS t_total
      FROM wt
    ),
    quota AS (SELECT source, n_s, bp * t_total // 10000 AS k_s FROM t),
    ranked AS (
      SELECT d.source, d.doc_id, q.k_s, q.n_s,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
               AS rn
      FROM documents d JOIN quota q USING (source)
    )
    SELECT source,
           CAST(any_value(n_s) AS BIGINT) AS n_source,
           CAST(count(*) AS BIGINT) AS n_selected,
           CAST(sum(doc_id) AS BIGINT) AS sel_checksum
    FROM ranked WHERE rn <= k_s
    GROUP BY 1
    """,
)
def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    wt = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s")).withColumn(
        "bp",
        (1 + F.substring("source", 4, 10).cast("int") % 4) * 200,
    )
    # global min over the 20-row weight table: unordered window, no sort,
    # metadata-sized exchange
    t = wt.withColumn(
        "t_total",
        F.min(F.expr("n_s * 10000 div bp")).over(Window.partitionBy()),
    )
    quota = t.withColumn("k_s", F.expr("bp * t_total div 10000")).select(
        "source", "n_s", "k_s"
    )
    wrank = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = (
        docs.join(F.broadcast(quota), "source")
        .withColumn("rn", F.row_number().over(wrank))
        .where(F.col("rn") <= F.col("k_s"))
    )
    return ranked.groupBy("source").agg(
        F.first("n_s").cast("bigint").alias("n_source"),
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.sum("doc_id").cast("bigint").alias("sel_checksum"),
    )


# ---------------------------------------------------------------------------
# Span-dedup SURVIVORS — the action step after cross_doc_spans: any pair
# sharing a span of ≥ SPAN_DROP_WORDS words drops its higher doc_id
# (keep-min survivorship, the exact_dedup convention), and the cleaned
# corpus is the anti-join against that drop set. Output is the
# per-source survivor summary with a sum(doc_id) checksum proving both
# engines kept the same document SET.
# ---------------------------------------------------------------------------
SPAN_DROP_WORDS = 10


@register(
    "span_dedup_survivors",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL.format(c="text")}, ' ') AS w
      FROM documents
    ),
    pos_t AS (
      SELECT doc_id, w,
             unnest(generate_series(1, greatest(len(w) - {SPAN_K} + 1, 0))) AS pos
      FROM norm WHERE len(w) >= {SPAN_K}
    ),
    grams AS (
      SELECT doc_id, pos,
             CAST('0x' || substring(
               md5(array_to_string(w[pos:pos+{SPAN_K}-1], ' ')), 1, 15)
               AS BIGINT) AS h
      FROM pos_t
    ),
    m AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
             a.pos - b.pos AS diag
      FROM grams a JOIN grams b ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    runs AS (
      SELECT id_a, id_b, diag, pa,
             pa - row_number() OVER (PARTITION BY id_a, id_b, diag ORDER BY pa)
               AS grp
      FROM m
    ),
    spans AS (
      SELECT id_b FROM runs GROUP BY id_a, id_b, diag, grp
      HAVING count(*) + {SPAN_K} - 1 >= {SPAN_DROP_WORDS}
    ),
    drops AS (SELECT DISTINCT id_b AS doc_id FROM spans)
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_survivors,
           CAST(sum(d.doc_id) AS BIGINT) AS survivor_checksum
    FROM documents d LEFT JOIN drops x USING (doc_id)
    WHERE x.doc_id IS NULL
    GROUP BY 1
    """,
)
def q_span_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import repeated_span_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = repeated_span_pairs(
        docs,
        "doc_id",
        "text",
        k=SPAN_K,
        min_run=SPAN_DROP_WORDS - SPAN_K + 1,
        runs=_shared_span_runs(spark, sf_dir),
    )
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = docs.join(drops, "doc_id", "left_anti")
    return survivors.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_survivors"),
        F.sum("doc_id").cast("bigint").alias("survivor_checksum"),
    )


# ---------------------------------------------------------------------------
# EWMA per series — the order-dependent RECURRENCE (s_i = α·x_i +
# (1−α)·s_{i−1}) that plain window sums can't express. Formulated as the
# established ordered-fold pattern (train_centroids_exact, pagerank):
# Spark folds the (ts, event_id)-sorted series left-to-right with a
# seeded-by-first-element accumulator; DuckDB's list_reduce seeds the
# same way by definition, so the doubles match bit-for-bit (α = 0.25 and
# 1−α = 0.75 are exact binary fractions). collect_list buffers one
# series per group — the VERIFICATION shape; at stream scale the same
# recurrence runs incrementally in the streaming state store
# (streaming/incremental.py holds the per-key state machinery).
# ---------------------------------------------------------------------------
_EWMA_ALPHA = 0.25


@register(
    "ewma_user_value",
    oracle=f"""
    SELECT user_id,
           count(*) AS n_events,
           list_reduce(
             list(value ORDER BY ts, event_id),
             (s, x) -> {_EWMA_ALPHA} * x + {1 - _EWMA_ALPHA} * s
           ) AS ewma
    FROM events
    GROUP BY 1
    """,
)
def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries import _events

    a = _EWMA_ALPHA
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    fold = F.aggregate(
        arr,
        F.struct(F.lit(False).alias("init"), F.lit(0.0).alias("s")),
        lambda acc, x: F.struct(
            F.lit(True).alias("init"),
            F.when(
                acc["init"], F.lit(a) * x["value"] + F.lit(1 - a) * acc["s"]
            )
            .otherwise(x["value"])
            .alias("s"),
        ),
        lambda acc: acc["s"],
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        fold.alias("ewma"),
    )


# ---------------------------------------------------------------------------
# INTRA-document repeated spans — the within-doc complement of
# cross_doc_spans and the span-level Gopher repetition signal: a
# document that repeats its own ≥(k+min_run−1)-word span is boilerplate-
# or loop-generated. Same gaps-and-islands machinery on the self-join
# diagonal (pos_b − pos_a > 0 keeps one triangle and excludes the
# trivial self-match).
#
# Round-7: now consumes the persisted _shared_span_grams artifact (the
# swap queued in r6 — it was a fingerprint change the full round-6
# window couldn't absorb), so all three span-level consumers
# (cross_doc_spans, span_dedup_survivors, intra_doc_repeats) start from
# ONE materialized gram frame per (session, sf_dir).
# ---------------------------------------------------------------------------
@register(
    "intra_doc_repeats",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL.format(c="text")}, ' ') AS w
      FROM documents
    ),
    pos_t AS (
      SELECT doc_id, w,
             unnest(generate_series(1, greatest(len(w) - {SPAN_K} + 1, 0))) AS pos
      FROM norm WHERE len(w) >= {SPAN_K}
    ),
    grams AS (
      SELECT doc_id, pos,
             CAST('0x' || substring(
               md5(array_to_string(w[pos:pos+{SPAN_K}-1], ' ')), 1, 15)
               AS BIGINT) AS h
      FROM pos_t
    ),
    m AS (
      SELECT a.doc_id, a.pos AS pa, b.pos - a.pos AS diag
      FROM grams a JOIN grams b
        ON a.doc_id = b.doc_id AND a.h = b.h AND b.pos > a.pos
    ),
    runs AS (
      SELECT doc_id, diag, pa,
             pa - row_number() OVER (PARTITION BY doc_id, diag ORDER BY pa)
               AS grp
      FROM m
    ),
    spans AS (
      SELECT doc_id, count(*) AS run_len
      FROM runs GROUP BY doc_id, diag, grp
      HAVING count(*) >= {SPAN_MIN_RUN}
    )
    SELECT doc_id,
           CAST(max(run_len) + {SPAN_K} - 1 AS BIGINT) AS longest_repeat_words,
           CAST(count(*) AS BIGINT) AS n_repeat_spans
    FROM spans GROUP BY 1
    """,
)
def q_intra_doc_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = SPAN_K
    grams = _shared_span_grams(spark, sf_dir)
    a, b = grams.alias("a"), grams.alias("b")
    m = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("a.h") == F.col("b.h"))
        & (F.col("b.pos") > F.col("a.pos")),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.pos").alias("pa"),
        (F.col("b.pos") - F.col("a.pos")).alias("diag"),
    )
    wrun = Window.partitionBy("doc_id", "diag").orderBy("pa")
    spans = (
        m.withColumn("grp", F.col("pa") - F.row_number().over(wrun))
        .groupBy("doc_id", "diag", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .where(F.col("run_len") >= SPAN_MIN_RUN)
    )
    return spans.groupBy("doc_id").agg(
        (F.max("run_len") + k - 1).cast("bigint").alias("longest_repeat_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_repeat_spans"),
    )


# ---------------------------------------------------------------------------
# Nation-pair trade volume (TPC-H Q7 shape): supplier nation → customer
# nation revenue flows through the full fact join. Both dims broadcast;
# the only real shuffle is the lineitem⋈orders equi-join — the same
# distributed graph-build stage pagerank_nations starts from, here kept
# as the classic analytics rollup. Decimal revenue keeps sums exact.
# ---------------------------------------------------------------------------
@register(
    "nation_pair_trade",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           count(*) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE ns.n_nationkey <> nc.n_nationkey
    GROUP BY 1, 2
    HAVING count(*) >= 100
    """,
)
def q_nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    # exact rational revenue: price decimal × integer discount-percent
    # floor(x+0.5), not a raw BIGINT cast: Spark's double->long cast
    # truncates while DuckDB's rounds, so 93.99999999999999 would diverge
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.floor(
        (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("bigint")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer/supplier scale with SF — strategy left to Catalyst/AQE
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("s_nk") != F.col("c_nk"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(rev) / 100.0).cast("double").alias("revenue"),
        )
        .where(F.col("n_items") >= 100)
    )


# ---------------------------------------------------------------------------
# Ranking-window surface: percent_rank, cume_dist, lag with default, and
# full-frame last_value over each customer's order sequence, aggregated
# per customer. Rank-based doubles are exact rationals ((rank−1)/(n−1));
# the lag gap uses the INTEGER order key (cross-engine exact, unlike
# subtracting computed doubles); the window ordering carries the total
# (o_orderdate, o_orderkey) tiebreak.
# ---------------------------------------------------------------------------
@register(
    "order_window_functions",
    oracle="""
    WITH w_vals AS (
      SELECT o_custkey,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd,
             o_orderkey - lag(o_orderkey, 1, 0) OVER w AS key_gap,
             first_value(o_totalprice) OVER w AS first_price,
             last_value(o_totalprice) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN pr <= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_first_half,
           CAST(max(cd) AS DOUBLE) AS max_cume_dist,
           CAST(sum(key_gap) AS BIGINT) AS key_gap_sum,
           CAST(any_value(first_price) AS DOUBLE) AS first_price,
           CAST(any_value(last_price) AS DOUBLE) AS last_price
    FROM w_vals GROUP BY 1
    """,
)
def q_order_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    vals = orders.select(
        "o_custkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        (F.col("o_orderkey") - F.lag("o_orderkey", 1, 0).over(w)).alias(
            "key_gap"
        ),
        F.first_value("o_totalprice").over(w).alias("first_price"),
        F.last_value("o_totalprice").over(wfull).alias("last_price"),
    )
    return vals.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("pr") <= 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_first_half"),
        F.max("cd").cast("double").alias("max_cume_dist"),
        F.sum("key_gap").cast("bigint").alias("key_gap_sum"),
        F.first("first_price").cast("double").alias("first_price"),
        F.first("last_price").cast("double").alias("last_price"),
    )


# ---------------------------------------------------------------------------
# Two-stage ANN: IVF-PQ candidate generation + EXACT re-rank (the FAISS
# "refine" read path; Jégou et al. 2011 §V). Stage 1 is the composed
# ann_ivf_pq_adc pipeline — cell-pruned, codes-only, no raw vectors —
# widened to 30 candidates; stage 2 joins ONLY those 30 ids back to the
# raw embedding table and orders by exact squared L2. At 100 TB stage 1
# touches M-byte codes inside n_probe partitions and stage 2 is a
# broadcast semi-join fetching 30 vectors — the raw-vector scan never
# happens. The oracle replays both stages with every float chain in
# Spark's fold order.
# ---------------------------------------------------------------------------
_REFINE_C = 30  # stage-1 candidate count (3x the final k)


def _refine_oracle() -> str:
    from clickhouse_table_copier_spark.queries_round3 import (
        _PQ_ADC_SUM,
        _PQ_DT_COLS,
        _PQ_ENC_CTES,
        _PQ_K,
        _PQ_M,
    )
    from clickhouse_table_copier_spark.queries_similarity import _sqdist_chain_sql

    enc_joins = " ".join(
        f"JOIN enc{m} e{m} ON e{m}.vec_id = e0.vec_id" for m in range(1, _PQ_M)
    )
    dt_joins = " ".join(f"JOIN dt t{m} ON t{m}.code = e{m}.c{m}" for m in range(_PQ_M))
    return f"""
    WITH cents AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    codes AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT {_PQ_K}
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    probes AS (
      SELECT c.cell FROM cents c, q
      ORDER BY {_sqdist_chain_sql("q.qv", "c.cv")} ASC, c.cell ASC
      LIMIT 3
    ),
    pairs AS (
      SELECT e.vec_id, c.cell, {_sqdist_chain_sql("e.embedding", "c.cv")} AS d
      FROM embeddings e, cents c WHERE e.vec_id <> 0
    ),
    assigned AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        FROM pairs
      ) WHERE rn = 1
    ),
    {_PQ_ENC_CTES},
    dt AS (SELECT c.code, {_PQ_DT_COLS} FROM codes c, q),
    cand AS (
      SELECT e0.vec_id, round({_PQ_ADC_SUM}, 6) AS adc_dist
      FROM assigned a
      JOIN enc0 e0 ON e0.vec_id = a.vec_id
      {enc_joins}
      {dt_joins}
      WHERE a.cell IN (SELECT cell FROM probes)
      ORDER BY adc_dist ASC, e0.vec_id ASC
      LIMIT {_REFINE_C}
    )
    SELECT c.vec_id,
           round({_sqdist_chain_sql("e.embedding", "q.qv")}, 6) AS exact_dist
    FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id, q
    ORDER BY exact_dist ASC, c.vec_id ASC
    LIMIT 10
    """


@register("ann_ivf_pq_refine", oracle=_refine_oracle())
def q_ann_ivf_pq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import spread
    from clickhouse_table_copier_spark.operators.ivf import (
        _sq_dist,
        assign_cells,
        probe_cells,
    )
    from clickhouse_table_copier_spark.operators.pq import (
        pq_adc_scores,
        pq_codebooks_from_seeds,
        pq_encode,
    )
    from clickhouse_table_copier_spark.queries_round3 import _PQ_K, _PQ_M

    emb = spread(_t(spark, sf_dir, "embeddings"))
    seeds = emb.orderBy("vec_id").limit(_PQ_K).select("embedding").collect()
    seed_vecs = [[float(x) for x in r["embedding"]] for r in seeds]
    books = pq_codebooks_from_seeds(seed_vecs, _PQ_M)
    probe = probe_cells(seed_vecs, seed_vecs[0], 3)
    base = emb.where(F.col("vec_id") != 0)
    cells = assign_cells(base, seed_vecs).where(F.col("cell").isin(probe))
    scored = pq_adc_scores(pq_encode(cells, books), books, seed_vecs[0])
    cand = (
        scored.select("vec_id", F.round("adc_dist", 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(_REFINE_C)
    )
    # exact re-rank: the candidate ids broadcast onto the vector table —
    # only these 30 raw vectors are ever materialized
    refined = base.join(F.broadcast(cand.select("vec_id")), "vec_id").select(
        "vec_id",
        F.round(_sq_dist(F.col("embedding"), seed_vecs[0]), 6).alias("exact_dist"),
    )
    return refined.orderBy(F.asc("exact_dist"), F.asc("vec_id")).limit(10)


# ---------------------------------------------------------------------------
# Leakage-safe dataset split: train/val/test assignment keyed by the
# near-dup CLUSTER representative, not the document id — so two near-
# duplicate documents can never straddle train and eval (the benchmark-
# contamination failure mode hash-per-doc splits have). Pipeline: exact
# jaccard pairs (>= 0.5, shared shingle index) → connected components
# (iterative min-label propagation) → rep_id = coalesce(cluster min id,
# own id) → md5(rep_id) bucketed 80/10/10. n_rehomed counts docs whose
# cluster split differs from the naive doc-hash split — the docs a
# per-doc split would have leaked. Scale: the components operator is the
# established label-propagation loop; everything after is hash arithmetic
# + one groupBy.
# ---------------------------------------------------------------------------
def _split_case_sql(idexpr: str) -> str:
    b = f"CAST('0x' || substring(md5(CAST({idexpr} AS VARCHAR)), 1, 2) AS INTEGER)"
    return (
        f"CASE WHEN {b} < 204 THEN 'train' "
        f"WHEN {b} < 230 THEN 'val' ELSE 'test' END"
    )


def _cluster_split_oracle() -> str:
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
    assigned AS (
      SELECT c.doc_id, coalesce(k.cluster_id, c.doc_id) AS rep_id
      FROM corpus c LEFT JOIN comp k ON k.id = c.doc_id
    ),
    sp AS (
      SELECT doc_id, rep_id,
             {_split_case_sql("rep_id")} AS split,
             {_split_case_sql("doc_id")} AS doc_split
      FROM assigned
    )
    SELECT split,
           count(*) AS n_docs,
           count(DISTINCT rep_id) AS n_clusters,
           CAST(sum(CASE WHEN split <> doc_split THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rehomed
    FROM sp GROUP BY 1
    """


@register("cluster_safe_split", oracle=_cluster_split_oracle())
def q_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries_pipeline import (
        _corpus,
        _shared_dedup_clusters,
    )

    clusters = _shared_dedup_clusters(spark, sf_dir)

    def bucket(c):
        return F.conv(F.substring(F.md5(c.cast("string")), 1, 2), 16, 10).cast("int")

    def split_of(c):
        b = bucket(c)
        return (
            F.when(b < 204, F.lit("train"))
            .when(b < 230, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    assigned = (
        _corpus(spark, sf_dir)
        .select("doc_id")
        .join(clusters, F.col("doc_id") == F.col("id"), "left")
        .select("doc_id", F.coalesce("cluster_id", "doc_id").alias("rep_id"))
    )
    sp = assigned.select(
        "doc_id",
        "rep_id",
        split_of(F.col("rep_id")).alias("split"),
        split_of(F.col("doc_id")).alias("doc_split"),
    )
    return sp.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("rep_id").alias("n_clusters"),
        F.sum(F.when(F.col("split") != F.col("doc_split"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_rehomed"),
    )


# ---------------------------------------------------------------------------
# Priority-waiting orders (TPC-H Q4 shape): orders in one quarter that
# have at least one LATE lineitem (shipped > 90 days after the order
# date), counted per priority. The join strategy is the point: EXISTS
# renders as a LEFT SEMI hash join on l_orderkey — lineitem is never
# widened, duplicates never multiply the count, and the date predicate
# prunes orders before the join. At 100 TB: one keyed shuffle, semi-join
# short-circuits on first match per key.
# ---------------------------------------------------------------------------
@register(
    "priority_waiting_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= DATE '1995-01-01'
      AND o.o_orderdate < DATE '1995-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY 1
    """,
)
def q_priority_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    waiting = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)),
        "left_semi",
    )
    return waiting.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


# ---------------------------------------------------------------------------
# Small-quantity revenue (TPC-H Q17 shape): revenue from lineitems whose
# quantity is below 20% of their part's average quantity, for one brand.
# The correlated scalar subquery becomes a two-pass plan: per-part avg
# quantities aggregated once (a small dim-sized table), then BROADCAST
# back onto the brand-filtered fact scan. Quantities are small integers,
# so 5*qty < avg-sum*... is kept EXACT by comparing 5*qty*cnt < sum (no
# division, no doubles) — decimal money for the revenue sum.
# ---------------------------------------------------------------------------
@register(
    "small_quantity_revenue",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey,
             sum(CAST(l_quantity AS BIGINT)) AS qty_sum,
             count(*) AS qty_cnt
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS small_qty_revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
    JOIN pavg a ON a.l_partkey = l.l_partkey
    WHERE CAST(l.l_quantity AS BIGINT) * 5 * a.qty_cnt < a.qty_sum
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    pavg = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_cnt"),
    )
    small = (
        # part and the per-part stats both scale with SF — no broadcast
        # hints; at cluster scale this is the classic partkey co-shuffle
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            pavg.withColumnRenamed("l_partkey", "a_partkey"),
            F.col("a_partkey") == F.col("l_partkey"),
        )
        .where(
            F.col("l_quantity").cast("bigint") * 5 * F.col("qty_cnt")
            < F.col("qty_sum")
        )
    )
    return small.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("small_qty_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Multi-query similarity via integer GEMM (operators/similarity.py::
# gemm_topk_int): top-5 neighbors for each of 4 query vectors in ONE
# Arrow-batched pass — V @ Q.T per batch, fixed-point int64 so the scores
# are exact and order-independent (float GEMM would sum in BLAS-dependent
# order and break the cross-engine hash gate). The oracle replays the
# same quantization (floor(x*2^20 + 0.5)) with a DuckDB list
# comprehension and ranks with the same (score DESC, vec_id ASC) window.
# ---------------------------------------------------------------------------
_GEMM_Q = 4
_GEMM_K = 5


def _gemm_oracle() -> str:
    from clickhouse_table_copier_spark.operators.similarity import GEMM_SCALE

    term = (
        f"CAST(floor(CAST(c.embedding[i] AS DOUBLE) * {GEMM_SCALE} + 0.5) AS BIGINT)"
        f" * CAST(floor(CAST(q.qe[i] AS DOUBLE) * {GEMM_SCALE} + 0.5) AS BIGINT)"
    )
    return f"""
    WITH qv AS (
      SELECT vec_id AS q_id, embedding AS qe FROM embeddings
      WHERE vec_id < {_GEMM_Q}
    ),
    c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {_GEMM_Q}),
    scored AS (
      SELECT q.q_id, c.vec_id,
             CAST(list_sum([{term} FOR i IN range(1, 65)]) AS BIGINT) AS score
      FROM qv q, c
    )
    SELECT q_id, vec_id, score FROM (
      SELECT q_id, vec_id, score,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score DESC, vec_id ASC) AS rn
      FROM scored
    ) WHERE rn <= {_GEMM_K}
    """


@register("similarity_gemm_topk", oracle=_gemm_oracle())
def q_similarity_gemm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import spread
    from clickhouse_table_copier_spark.operators.similarity import gemm_topk_int

    emb = spread(_t(spark, sf_dir, "embeddings"))
    qrows = (
        emb.where(F.col("vec_id") < _GEMM_Q)
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    qvecs = [[float(x) for x in r["embedding"]] for r in qrows]
    qids = [int(r["vec_id"]) for r in qrows]
    corpus = emb.where(F.col("vec_id") >= _GEMM_Q)
    return gemm_topk_int(corpus, qvecs, qids, k=_GEMM_K)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) token frequency: d=4
# md5-derived hash rows x w=1024 slots, built with ONE shuffle of
# (d, slot) pairs; estimates for the true top-20 tokens are min over the
# d counters. Every hash is md5 — both engines build the IDENTICAL
# sketch, so the oracle checks the estimates by VALUE, not by bound
# (lower_ok additionally pins the CMS guarantee est >= true). At 100 TB
# the sketch is a 4096-row table: constant state, mergeable by addition,
# probe joins broadcast.
# ---------------------------------------------------------------------------
_CMS_D = 4
_CMS_W = 1024
_CMS_PROBES = 20

_CMS_SLOT_SQL = (
    "CAST('0x' || substring(md5(CAST({d} AS VARCHAR) || '|' || {tok}), 1, 8)"
    f" AS BIGINT) % {_CMS_W}"
)


@register(
    "cms_token_frequency",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split({_NORM_SQL.format(c="text")}, ' ')) AS tok
      FROM documents
    ),
    clean AS (SELECT tok FROM toks WHERE tok <> ''),
    counts AS (SELECT tok, count(*) AS c FROM clean GROUP BY 1),
    probes AS (SELECT tok, c FROM counts ORDER BY c DESC, tok ASC LIMIT {_CMS_PROBES}),
    ds AS (SELECT unnest(range(0, {_CMS_D})) AS d),
    cms AS (
      SELECT d, {_CMS_SLOT_SQL.format(d="d", tok="tok")} AS slot, count(*) AS cnt
      FROM clean, ds GROUP BY 1, 2
    ),
    probe_slots AS (
      SELECT p.tok, p.c, ds.d,
             {_CMS_SLOT_SQL.format(d="ds.d", tok="p.tok")} AS slot
      FROM probes p, ds
    )
    SELECT ps.tok,
           CAST(any_value(ps.c) AS BIGINT) AS true_cnt,
           CAST(min(m.cnt) AS BIGINT) AS est_cnt,
           min(m.cnt) >= any_value(ps.c) AS lower_ok
    FROM probe_slots ps JOIN cms m ON m.d = ps.d AND m.slot = ps.slot
    GROUP BY ps.tok
    """,
)
def q_cms_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import normalized_text, spread

    docs = spread(_t(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(F.split(normalized_text("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")

    def slot(d_col, tok_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(d_col.cast("string"), F.lit("|"), tok_col)), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % _CMS_W
        )

    ds = F.explode(F.array(*[F.lit(d) for d in range(_CMS_D)])).alias("d")
    cms = (
        toks.select("tok", ds)
        .select("d", slot(F.col("d"), F.col("tok")).alias("slot"))
        .groupBy("d", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(_CMS_PROBES)
    )
    probe_slots = probes.select("tok", "c", ds).select(
        "tok", "c", "d", slot(F.col("d"), F.col("tok")).alias("slot")
    )
    return (
        F.broadcast(probe_slots)
        .join(cms, ["d", "slot"])
        .groupBy("tok")
        .agg(
            F.first("c").cast("bigint").alias("true_cnt"),
            F.min("cnt").cast("bigint").alias("est_cnt"),
            (F.min("cnt") >= F.first("c")).alias("lower_ok"),
        )
    )


# ---------------------------------------------------------------------------
# HLL partial-sketch merge: per-month HLL sketches of distinct parts,
# RE-AGGREGATED into the global distinct estimate via hll_union_agg —
# the incremental_rollup_merge pattern for COUNT(DISTINCT), which plain
# partial counts cannot do (distincts don't add). The gate licenses the
# sketch path exactly like sketch_distinct_bounds: every per-month
# estimate AND the merged-total estimate must land within 5% of exact.
# At 100 TB: partials are one constant-size binary per partition,
# mergeable without rescanning history.
# ---------------------------------------------------------------------------
@register(
    "hll_partition_merge",
    oracle="""
    SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
           TRUE AS approx_ok
    FROM lineitem GROUP BY 1
    UNION ALL
    SELECT -1 AS ship_month,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
           TRUE AS approx_ok
    FROM lineitem
    """,
)
def q_hll_partition_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One fact scan: collapse to DISTINCT (month, partkey) pairs first —
    # every downstream number is insensitive to duplicates (count distinct
    # by definition, HLL sketches by construction), so the dedup shuffle
    # replaces THREE full-fact aggregations (per-month countDistinct,
    # global countDistinct, per-month sketch build) with cheap passes over
    # the pairs frame. localCheckpoint because three consumers share it.
    li = _t(spark, sf_dir, "lineitem")
    pairs = (
        li.select(
            F.month("l_shipdate").cast("int").alias("ship_month"), "l_partkey"
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    per_month = pairs.groupBy("ship_month").agg(
        F.expr("hll_sketch_agg(l_partkey)").alias("sk"),
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
    )
    gate = (
        F.abs(
            F.expr("hll_sketch_estimate(sk)").cast("double") - F.col("n_exact")
        )
        <= F.col("n_exact") * F.lit(0.05)
    )
    per = per_month.select("ship_month", "n_exact", gate.alias("approx_ok"))
    # Assemble the merged-total row WITHOUT a join: union the per-month
    # sketch partials with the 1-row global-exact aggregate (null-padded on
    # the other side) and fold both in one single-partition agg —
    # hll_union_agg and max() each skip nulls, so each output column picks
    # up exactly its own input rows. A crossJoin of the two 1-row frames
    # would plan BroadcastNestedLoopJoin Cross and trip the repo-wide
    # no-cartesian plan guard (tests/test_plan_properties.py); a
    # constant-key equi-join constant-folds back into the same cross.
    global_exact = pairs.agg(
        F.countDistinct("l_partkey").cast("bigint").alias("n_exact")
    )
    unioned = per_month.select(
        "sk", F.lit(None).cast("bigint").alias("n_exact")
    ).unionAll(global_exact.select(F.lit(None).cast("binary").alias("sk"), "n_exact"))
    merged = unioned.agg(
        F.expr("hll_union_agg(sk)").alias("sk"),
        F.max("n_exact").alias("n_exact"),
    ).select(
        F.lit(-1).cast("int").alias("ship_month"), "n_exact", gate.alias("approx_ok")
    )
    return per.unionAll(merged)
