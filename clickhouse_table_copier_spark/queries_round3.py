"""Query batch 8 (round 3): the remaining training-data-pipeline stages a
100 TB corpus engine runs between "raw crawl" and "training shards" —
benchmark decontamination, PII redaction, sequence packing, semantic
(centroid-blocked) dedup, the dedup summary report, and one multi-join
supplier-volume rollup exercising the broadcast-join planner.

Determinism follows the house rules (see queries.py): decimal-carried
double sums, explicit result casts on both sides, single final divisions,
md5-derived keys so both engines compute identical hashes, pinned seed
centroids for anything k-means-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register
from clickhouse_table_copier_spark.queries_pipeline import (
    _CORPUS_SQL,
    _NORM_SQL,
    _SHINGLES_SQL,
    _corpus,
)
from clickhouse_table_copier_spark.queries_similarity import (
    _dot_chain_sql,
    _norm_chain_sql,
    _sqdist_chain_sql,
)

# Shingles over the RAW documents table (not the mutated dedup corpus):
# the decontamination check runs against the corpus as ingested.
_DOC_SHINGLES_SQL = """
  SELECT doc_id, unnest(
    CASE WHEN len(string_split({norm}, ' ')) >= 3 THEN
      list_distinct([
        array_to_string(string_split({norm}, ' ')[i:i+2], ' ')
        FOR i IN range(1, len(string_split({norm}, ' ')) - 1)
      ])
    ELSE [{norm}] END
  ) AS sh
  FROM documents
""".format(norm=_NORM_SQL.format(c="text"))


# ---------------------------------------------------------------------------
# Benchmark decontamination: which training documents share word-3-gram
# shingles with the held-out eval split (doc_id % 50 == 0 — deterministic
# in both engines)? The standard pre-training hygiene pass: an n-gram
# inverted-index JOIN against the eval set, never a quadratic text scan.
# At 100 TB: shingle the (small) eval set, broadcast it, stream the
# corpus index past it — the plan below is exactly that shape.
# ---------------------------------------------------------------------------
@register(
    "decontamination",
    oracle=f"""
    WITH shing AS ({_DOC_SHINGLES_SQL}),
    eval_sh AS (SELECT DISTINCT sh FROM shing WHERE doc_id % 50 = 0),
    doc_sizes AS (
      SELECT doc_id, count(*) AS n_shingles FROM shing
      WHERE doc_id % 50 <> 0 GROUP BY 1
    ),
    hits AS (
      SELECT s.doc_id, count(DISTINCT s.sh) AS n_overlap
      FROM shing s JOIN eval_sh e USING (sh)
      WHERE s.doc_id % 50 <> 0
      GROUP BY 1
    )
    SELECT h.doc_id,
           CAST(h.n_overlap AS BIGINT) AS n_overlap,
           CAST(d.n_shingles AS BIGINT) AS n_shingles,
           CAST(h.n_overlap AS DOUBLE) / CAST(d.n_shingles AS DOUBLE)
             AS overlap_ratio
    FROM hits h JOIN doc_sizes d USING (doc_id)
    """,
)
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import shingle_index

    docs = _t(spark, sf_dir, "documents")
    idx = shingle_index(docs, "doc_id", "text", 3)
    is_eval = F.col("doc_id") % 50 == 0
    eval_sh = idx.where(is_eval).select("sh").distinct()
    train = idx.where(~is_eval)
    doc_sizes = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        train.join(eval_sh, "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("n_overlap"))
    )
    return hits.join(doc_sizes, "doc_id").select(
        "doc_id",
        F.col("n_overlap").cast("bigint").alias("n_overlap"),
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        (
            F.col("n_overlap").cast("double") / F.col("n_shingles").cast("double")
        ).alias("overlap_ratio"),
    )


# ---------------------------------------------------------------------------
# PII redaction: detect + scrub emails/phone numbers, report counts and
# the redacted-content hash. The fixture text is clean word soup, so both
# engines INJECT identical deterministic PII first (id-derived), then run
# the same regex pipeline — the patterns stay inside the RE2 ∩ Java-regex
# common subset so Spark and DuckDB match byte-for-byte.
# Expression-only (regexp_extract_all / regexp_replace): codegen, no UDFs.
# ---------------------------------------------------------------------------
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+"
_PHONE_RE = "555-[0-9]{3}-[0-9]{4}"

_PII_TEXT_SQL = (
    "text || (CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com now' ELSE '' END)"
    " || (CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || CAST(100 + doc_id % 900 AS VARCHAR)"
    " || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END)"
)


@register(
    "pii_redaction",
    oracle=f"""
    WITH pii AS (SELECT doc_id, {_PII_TEXT_SQL} AS t FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS INTEGER) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_hash
    FROM pii
    """,
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import spread

    docs = spread(_t(spark, sf_dir, "documents"))
    # the CASE/concat part has no backslashes → safe through the SQL
    # parser; the REGEX patterns go through the python column API only
    # (F.expr string literals would strip the backslash escapes that
    # DuckDB's standard-conforming strings keep — a silent regex drift)
    pii_text = F.expr(_PII_TEXT_SQL.replace("AS VARCHAR", "AS STRING"))
    redacted = F.regexp_replace(
        F.regexp_replace(pii_text, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(pii_text, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(pii_text, F.lit(_PHONE_RE), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_hash"),
    )


# ---------------------------------------------------------------------------
# Sequence packing: fill fixed-token-budget training sequences by streaming
# documents in id order within each language shard. Bin assignment is a
# prefix-sum window (exclusive cumulative token count DIV budget) — fully
# parallel per shard, no driver loop; at 100 TB the shard column is the
# partition key and each shard packs independently.
# ---------------------------------------------------------------------------
_PACK_BUDGET = 512
_TOKEN_CNT_SQL = "len(regexp_extract_all(text, '\\w+'))"


@register(
    "seq_packing",
    oracle=f"""
    WITH toks AS (
      SELECT lang, doc_id, {_TOKEN_CNT_SQL} AS n_tokens FROM documents
    ),
    packed AS (
      SELECT lang, doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {_PACK_BUDGET} AS INTEGER) AS bin
      FROM toks
    )
    SELECT lang, bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(doc_id) AS from_doc, max(doc_id) AS to_doc
    FROM packed GROUP BY lang, bin
    """,
)
def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from clickhouse_table_copier_spark.operators.dedup import spread

    docs = spread(_t(spark, sf_dir, "documents"))
    toks = docs.select(
        "lang",
        "doc_id",
        F.size(F.expr("regexp_extract_all(text, '\\\\w+', 0)")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "bin",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / _PACK_BUDGET).cast(
            "int"
        ),
    )
    return packed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("from_doc"),
        F.max("doc_id").alias("to_doc"),
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style): block by k-means cell (the PINNED seed
# centroids of the IVF search query — deterministic in both engines), then
# exact cosine within cells only. The centroid block replaces the label
# block of dedup_embedding_cosine: this is the shape used when no labels
# exist — cells partition the corpus so the pair search never crosses
# cell boundaries (at scale: cell = storage partition, per-cell self-join).
# ---------------------------------------------------------------------------
_SD_CELLS = 8
_SD_THRESHOLD = 0.4


@register(
    "semantic_dedup",
    oracle=f"""
    WITH cents AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT {_SD_CELLS}
    ),
    pairs AS (
      SELECT e.vec_id, e.embedding, c.cell,
             {_sqdist_chain_sql("e.embedding", "c.cv")} AS d
      FROM embeddings e, cents c
    ),
    assigned AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT vec_id, embedding, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        FROM pairs
      ) WHERE rn = 1
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(a.cell AS INTEGER) AS cell,
           round(({_dot_chain_sql("a.embedding", "b.embedding")})
                 / ({_norm_chain_sql("a.embedding")} * {_norm_chain_sql("b.embedding")}), 6)
             AS cosine_sim
    FROM assigned a JOIN assigned b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE round(({_dot_chain_sql("a.embedding", "b.embedding")})
                / ({_norm_chain_sql("a.embedding")} * {_norm_chain_sql("b.embedding")}), 6)
          >= {_SD_THRESHOLD}
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import spread
    from clickhouse_table_copier_spark.operators.ivf import assign_cells
    from clickhouse_table_copier_spark.operators.similarity import cosine

    emb = spread(_t(spark, sf_dir, "embeddings"))
    seeds = emb.orderBy("vec_id").limit(_SD_CELLS).select("embedding").collect()
    centroids = [[float(x) for x in r["embedding"]] for r in seeds]
    assigned = assign_cells(emb, centroids).persist()
    a, b = assigned.alias("a"), assigned.alias("b")
    sim = F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.cell").cast("int").alias("cell"),
            sim.alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= _SD_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# Dedup summary report: the one-row corpus-health readout every dedup run
# ends with (total docs, distinct contents, dropped count, dup ratio) —
# computed from the exact-dedup groups in one aggregation pass.
# ---------------------------------------------------------------------------
@register(
    "corpus_dedup_summary",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    g AS (
      SELECT md5({_NORM_SQL.format(c="text")}) AS k, count(*) AS c
      FROM corpus GROUP BY 1
    )
    SELECT CAST(sum(c) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(c) - count(*) AS BIGINT) AS n_dropped,
           CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_ratio
    FROM g
    """,
)
def q_corpus_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import exact_dedup

    groups = exact_dedup(_corpus(spark, sf_dir), "doc_id", "text")
    return groups.agg(
        F.sum("dup_cnt").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        (F.sum("dup_cnt") - F.count(F.lit(1))).cast("bigint").alias("n_dropped"),
        (
            (F.sum("dup_cnt") - F.count(F.lit(1))).cast("double")
            / F.sum("dup_cnt").cast("double")
        ).alias("dup_ratio"),
    )


# ---------------------------------------------------------------------------
# Local supplier volume (TPC-H Q5 shape): revenue per nation where the
# customer and supplier share a nation, one region + one year. Exercises
# the join planner across 6 tables — dims broadcast (region/nation/
# supplier/customer), facts shuffle on keys; the c_nationkey = s_nationkey
# equi-condition rides the same hash join, no extra shuffle.
# ---------------------------------------------------------------------------
@register(
    "local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           count(*) AS line_cnt
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = 1995
    GROUP BY n.n_name
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1995)
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer/supplier scale with SF — strategy left to Catalyst/AQE
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# Part-type revenue share (TPC-H Q14 flavor): lineitem joined to the part
# dimension (broadcast), revenue per part type plus its share of total.
# Shares divide two decimal-exact sums as doubles (one final division —
# deterministic), never decimal/decimal (whose result scale differs
# between engines). Closes the last unread fixture table (part).
# ---------------------------------------------------------------------------
@register(
    "part_type_revenue",
    oracle="""
    WITH t AS (
      SELECT p.p_type,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS r,
             count(*) AS line_cnt
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    )
    SELECT p_type,
           CAST(r AS DOUBLE) AS revenue,
           line_cnt,
           CAST(r AS DOUBLE) / CAST(sum(r) OVER () AS DOUBLE) AS revenue_share
    FROM t
    """,
)
def q_part_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    t = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(F.sum(rev).alias("r"), F.count(F.lit(1)).alias("line_cnt"))
    )
    w = Window.partitionBy()
    return t.select(
        "p_type",
        F.col("r").cast("double").alias("revenue"),
        "line_cnt",
        (F.col("r").cast("double") / F.sum("r").over(w).cast("double")).alias(
            "revenue_share"
        ),
    )


# ---------------------------------------------------------------------------
# Product-quantization ANN (Jégou et al. 2011): encode every vector as 8
# sub-codes from pinned seed codebooks, answer the query by ADC lookup —
# the compressed-domain scale path (8 bytes/vector instead of 256; scans
# read codes only). The oracle re-derives sub-assignments via per-subspace
# row_number argmin and the ADC sum via an 8×8 distance CTE, with every
# float chain rendered in Spark's fold order (see operators/pq.py).
# ---------------------------------------------------------------------------
_PQ_M = 8  # subspaces (64 dims / 8)
_PQ_K = 8  # codes per subspace = pinned seed vectors 0..7
_PQ_SUB = 8


def _pq_sub_chain(a: str, b: str, m: int) -> str:
    lo = m * _PQ_SUB + 1
    return " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        f" * (CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        for i in range(lo, lo + _PQ_SUB)
    )


_PQ_ENC_CTES = ",\n".join(
    f"""enc{m} AS (
      SELECT vec_id, code AS c{m} FROM (
        SELECT e.vec_id, c.code,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_pq_sub_chain("e.embedding", "c.cv", m)} ASC, c.code ASC)
                 AS rn
        FROM embeddings e, codes c WHERE e.vec_id <> 0
      ) WHERE rn = 1
    )"""
    for m in range(_PQ_M)
)

_PQ_DT_COLS = ",\n".join(
    f"{_pq_sub_chain('q.qv', 'c.cv', m)} AS d{m}" for m in range(_PQ_M)
)

_PQ_ADC_SUM = " + ".join(f"t{m}.d{m}" for m in range(_PQ_M))

_PQ_JOINS = "\n".join(
    [f"JOIN enc{m} e{m} USING (vec_id)" for m in range(1, _PQ_M)]
    + [f"JOIN dt t{m} ON t{m}.code = e{m}.c{m}" for m in range(_PQ_M)]
)


@register(
    "ann_pq_adc",
    oracle=f"""
    WITH codes AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT {_PQ_K}
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    {_PQ_ENC_CTES},
    dt AS (SELECT c.code, {_PQ_DT_COLS} FROM codes c, q)
    SELECT e0.vec_id, round({_PQ_ADC_SUM}, 6) AS adc_dist
    FROM enc0 e0
    {_PQ_JOINS}
    ORDER BY adc_dist ASC, e0.vec_id ASC
    LIMIT 10
    """,
)
def q_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import spread
    from clickhouse_table_copier_spark.operators.pq import (
        pq_codebooks_from_seeds,
        pq_topk,
    )

    emb = spread(_t(spark, sf_dir, "embeddings"))
    seeds = emb.orderBy("vec_id").limit(_PQ_K).select("embedding").collect()
    seed_vecs = [[float(x) for x in r["embedding"]] for r in seeds]
    books = pq_codebooks_from_seeds(seed_vecs, _PQ_M)
    return pq_topk(emb.where(F.col("vec_id") != 0), books, seed_vecs[0], k=10)


# ---------------------------------------------------------------------------
# Cross-document duplicated-n-gram fraction (the C4/RefinedWeb dup-span
# signal): for every corpus document, the share of its distinct word
# 3-grams that also occur in at least one other document. Two map-reduce
# passes over the SHARED shingle index — df per shingle, then a per-doc
# rollup; at 100 TB both shuffles carry (hashable key, count) pairs only.
# ---------------------------------------------------------------------------
@register(
    "doc_dup_ngram_fraction",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    shing AS ({_SHINGLES_SQL}),
    dfreq AS (SELECT sh, count(*) AS df FROM shing GROUP BY 1)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           CAST(sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS dup_fraction
    FROM shing s JOIN dfreq d ON s.sh = d.sh
    GROUP BY 1
    """,
)
def q_doc_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries_pipeline import _shared_shingle_index

    idx = _shared_shingle_index(spark, sf_dir)
    dfreq = idx.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    shared = F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
    return (
        idx.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            shared.cast("bigint").alias("n_shared"),
            (shared.cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "dup_fraction"
            ),
        )
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval over the documents table for a fixed 3-term query.
# Expression-only tf (higher-order array filter), corpus stats via empty
# windows, Okapi weighting with a RATIONAL idf — (N - df + 0.5)/(df + 0.5)
# without the log — because ln() is the one piece whose last-ulp behavior
# libraries may disagree on; the rational form is order-preserving for
# ranking and keeps the whole score inside cross-engine-exact arithmetic.
# At 100 TB the empty-window stats become a separate tiny aggregate bound
# as literals (two-pass); the per-doc scoring is embarrassingly parallel.
# ---------------------------------------------------------------------------
_BM25_TERMS = ("table", "join", "merge")
_BM25_NORM = _NORM_SQL.format(c="text")


def _bm25_comp_sql(t: str) -> str:
    return (
        f"((n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * (CAST(tf_{t} AS DOUBLE) * 2.2)"
        f" / (CAST(tf_{t} AS DOUBLE)"
        f" + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))"
    )


@register(
    "bm25_rank",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split({_BM25_NORM}, ' '), t -> t <> '') AS toks
      FROM documents
    ),
    base AS (
      SELECT doc_id,
             CAST(len(toks) AS INTEGER) AS dl,
             {", ".join(f"CAST(len(list_filter(toks, t -> t = '{t}')) AS INTEGER) AS tf_{t}" for t in _BM25_TERMS)}
      FROM tok
    ),
    g AS (
      SELECT *,
             CAST(count(*) OVER () AS DOUBLE) AS n_docs,
             CAST(sum(dl) OVER () AS DOUBLE)
               / CAST(count(*) OVER () AS DOUBLE) AS avgdl,
             {", ".join(f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) OVER () AS DOUBLE) AS df_{t}" for t in _BM25_TERMS)}
      FROM base
    )
    SELECT doc_id, dl, {", ".join(f"tf_{t}" for t in _BM25_TERMS)},
           round({" + ".join(_bm25_comp_sql(t) for t in _BM25_TERMS)}, 6) AS bm25
    FROM g
    WHERE {" + ".join(f"tf_{t}" for t in _BM25_TERMS)} > 0
    """,
)
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from clickhouse_table_copier_spark.operators.dedup import normalized_text, spread

    docs = spread(_t(spark, sf_dir, "documents"))
    toks = F.filter(
        F.split(normalized_text("text"), " "), lambda t: t != F.lit("")
    )

    # ONE fold computes dl and every per-term tf in a single traversal of
    # the token array — separate size/filter columns would re-evaluate
    # the normalize+split+filter subtree once per column (higher-order
    # lambdas defeat subexpression elimination; measured ~2× on sf0.1).
    # NB: a 2-arg lambda in F.filter/aggregate means (element, index) — a
    # default arg would be silently replaced by the index column.
    def _step(acc, x):
        fields = [(acc["dl"] + F.lit(1)).alias("dl")]
        for t in _BM25_TERMS:
            fields.append(
                (
                    acc[f"tf_{t}"]
                    + F.when(x == F.lit(t), F.lit(1)).otherwise(F.lit(0))
                ).alias(f"tf_{t}")
            )
        return F.struct(*fields)

    zero = F.struct(
        F.lit(0).alias("dl"),
        *[F.lit(0).alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    counted = docs.select(
        "doc_id", F.aggregate(toks, zero, _step).alias("c")
    )
    base = counted.select(
        "doc_id",
        F.col("c.dl").cast("int").alias("dl"),
        *[F.col(f"c.tf_{t}").cast("int").alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    w = Window.partitionBy()
    n_docs = F.count(F.lit(1)).over(w).cast("double")
    avgdl = F.sum("dl").over(w).cast("double") / F.count(F.lit(1)).over(w).cast(
        "double"
    )
    dl_d = F.col("dl").cast("double")

    def comp(t: str):
        tf_d = F.col(f"tf_{t}").cast("double")
        df_t = (
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).over(w).cast("double")
        )
        return (
            ((n_docs - df_t + F.lit(0.5)) / (df_t + F.lit(0.5)))
            * (tf_d * F.lit(2.2))
            / (tf_d + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * (dl_d / avgdl)))
        )

    score = comp(_BM25_TERMS[0]) + comp(_BM25_TERMS[1]) + comp(_BM25_TERMS[2])
    tf_any = (
        F.col(f"tf_{_BM25_TERMS[0]}")
        + F.col(f"tf_{_BM25_TERMS[1]}")
        + F.col(f"tf_{_BM25_TERMS[2]}")
    )
    return base.select(
        "doc_id",
        "dl",
        *[f"tf_{t}" for t in _BM25_TERMS],
        F.round(score, 6).alias("bm25"),
    ).where(tf_any > 0)


# ---------------------------------------------------------------------------
# Quality-weighted sampling: keep a document with probability equal to its
# (driver-verified) quality score / 100, decided by the portable md5
# bucket — deterministic importance sampling that upweights clean text in
# the training mix without a shuffle (pure row filter, reproducible
# across runs and engines).
# ---------------------------------------------------------------------------
from clickhouse_table_copier_spark.queries_pipeline import (  # noqa: E402
    _QUALITY_BASE_SQL,
    _QUALITY_EXPR_SQL,
    _SAMPLE_BUCKET_SQL,
)


@register(
    "quality_weighted_sample",
    oracle=f"""
    WITH base AS ({_QUALITY_BASE_SQL}),
    q AS (SELECT doc_id, {_QUALITY_EXPR_SQL} AS quality FROM base)
    SELECT doc_id, quality, CAST({_SAMPLE_BUCKET_SQL} AS INTEGER) AS bucket
    FROM q
    WHERE {_SAMPLE_BUCKET_SQL} < quality
    """,
)
def q_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import spread
    from clickhouse_table_copier_spark.operators.text import quality_score

    docs = spread(_t(spark, sf_dir, "documents"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 100
    )
    return docs.select(
        "doc_id",
        quality_score("text").alias("quality"),
        bucket.cast("int").alias("bucket"),
    ).where(F.col("bucket") < F.col("quality"))


# ---------------------------------------------------------------------------
# Event funnel (ClickHouse windowFunnel parity, first-match-greedy form):
# per user, step 1 = first 'view', step 2 = first 'click' after step 1,
# step 3 = first 'purchase' after step 2, all within 24 h of step 1;
# output = users per funnel level reached. Three per-step min-aggregations
# + equi-joins on user_id (shuffle carries (user, ts) pairs only) — the
# set-oriented funnel, not a per-user UDF loop.
# ---------------------------------------------------------------------------
_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WINDOW_SQL = "INTERVAL 24 HOURS"


@register(
    "event_funnel",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    s1 AS (SELECT user_id, min(ts) AS t1 FROM ev
           WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY 1),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM ev e JOIN s1 USING (user_id)
           WHERE e.event_type = '{_FUNNEL_STEPS[1]}'
             AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOURS
           GROUP BY 1),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM ev e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
           WHERE e.event_type = '{_FUNNEL_STEPS[2]}'
             AND e.ts > s2.t2 AND e.ts <= s1.t1 + INTERVAL 24 HOURS
           GROUP BY 1),
    lvl AS (
      SELECT u.user_id,
             CASE WHEN s3.user_id IS NOT NULL THEN 3
                  WHEN s2.user_id IS NOT NULL THEN 2
                  WHEN s1.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS funnel_level
      FROM (SELECT DISTINCT user_id FROM ev) u
      LEFT JOIN s1 USING (user_id)
      LEFT JOIN s2 USING (user_id)
      LEFT JOIN s3 USING (user_id)
    )
    SELECT CAST(funnel_level AS INTEGER) AS funnel_level,
           CAST(count(*) AS BIGINT) AS n_users
    FROM lvl GROUP BY 1
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries import _events

    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    win = F.expr(_FUNNEL_WINDOW_SQL)
    s1 = (
        ev.where(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == _FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .where((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == _FUNNEL_STEPS[2])
        .join(s1, "user_id")
        .join(s2, "user_id")
        .where((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    users = ev.select("user_id").distinct()
    lvl = (
        users.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("funnel_level")
        )
    )
    return lvl.groupBy("funnel_level").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


# ---------------------------------------------------------------------------
# Retention cohorts (ClickHouse retention() parity): cohort = a user's
# first active day; for offsets 0..7 days, how many cohort users were
# active again. DISTINCT (cohort_day, user, offset) then a count rollup —
# integer day arithmetic, exact in both engines.
# ---------------------------------------------------------------------------
@register(
    "retention_cohorts",
    oracle="""
    WITH ev AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      FROM events
    ),
    cohort AS (SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY 1),
    hits AS (
      SELECT DISTINCT c.cohort_day, e.user_id,
             date_diff('day', c.cohort_day, e.d) AS offset_days
      FROM ev e JOIN cohort c USING (user_id)
      WHERE date_diff('day', c.cohort_day, e.d) BETWEEN 0 AND 7
    )
    SELECT cohort_day, CAST(offset_days AS INTEGER) AS offset_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM hits GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries import _events

    ev = (
        _events(spark, sf_dir)
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    cohort = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    off = F.datediff(F.col("d"), F.col("cohort_day"))
    hits = (
        ev.join(cohort, "user_id")
        .where((off >= 0) & (off <= 7))
        .select("cohort_day", "user_id", off.cast("int").alias("offset_days"))
        .distinct()
    )
    return hits.groupBy("cohort_day", "offset_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


# ---------------------------------------------------------------------------
# Hourly gap-fill (timeseries densification): the complete event_type ×
# hour grid over the data's span, zero-filled where no events landed —
# what a dashboard needs before charting. The grid is generated by
# exploding sequence() per event_type (a generator over the 5-type dim,
# never a cartesian join); the span bounds are one metadata-sized driver
# collect rendered as TZ-free string literals.
# ---------------------------------------------------------------------------
@register(
    "events_gap_fill",
    oracle="""
    WITH ev AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, value
      FROM events
    ),
    bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
    grid AS (
      SELECT t.event_type, gs.h
      FROM (SELECT DISTINCT event_type FROM ev) t,
           (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
            FROM bounds) gs
    ),
    agg AS (
      SELECT event_type, h, count(*) AS n_events,
             sum(CAST(value AS DECIMAL(18,2))) AS v
      FROM ev GROUP BY 1, 2
    )
    SELECT g.event_type, g.h AS hour_ts,
           CAST(coalesce(a.n_events, 0) AS BIGINT) AS n_events,
           CAST(coalesce(a.v, 0) AS DOUBLE) AS total_value
    FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.h = g.h
    """,
)
def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.queries import _events

    ev = _events(spark, sf_dir).select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h"), "value"
    )
    b = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1")).first()
    h0, h1 = b["h0"].isoformat(sep=" "), b["h1"].isoformat(sep=" ")
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.expr(
                    f"sequence(CAST('{h0}' AS TIMESTAMP_NTZ),"
                    f" CAST('{h1}' AS TIMESTAMP_NTZ), INTERVAL 1 HOUR)"
                )
            ).alias("hour_ts"),
        )
    )
    agg = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
    )
    return (
        grid.join(
            agg,
            (grid.event_type == agg.event_type) & (grid.hour_ts == agg.h),
            "left",
        )
        .select(
            grid.event_type,
            "hour_ts",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(F.col("v"), F.lit(0)).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Two-pass heavy hitters over document terms (operators/sketches.py):
# per-partition Misra-Gries summaries (bounded state, mergeable) → exact
# recount of the surviving candidates → exact top-10. Oracled because the
# two-pass pattern returns EXACT counts whenever the true top-N exceeds
# n/(k+1) — guaranteed here (k=64; the constructed-skew guarantee case
# is pinned in tests/test_sketches.py).
# ---------------------------------------------------------------------------
@register(
    "heavy_hitter_terms",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split({_NORM_SQL.format(c="text")}, ' ')) AS term
      FROM documents
    )
    SELECT term, CAST(count(*) AS BIGINT) AS freq
    FROM toks WHERE term <> ''
    GROUP BY 1 ORDER BY freq DESC, term ASC LIMIT 10
    """,
)
def q_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import normalized_text, spread
    from clickhouse_table_copier_spark.operators.sketches import heavy_hitters_exact_topk

    docs = spread(_t(spark, sf_dir, "documents"))
    # token ARRAYS, one row per document: the sketch pass ships one Arrow
    # row per doc (not per token) and counts with numpy; the recount pass
    # explodes JVM-side into the broadcast semi-join (r03: per-token Arrow
    # transfer was 2.8× the next extended query)
    toks = docs.select(
        F.filter(
            F.split(normalized_text("text"), " "), lambda t: t != F.lit("")
        ).alias("term")
    )
    return heavy_hitters_exact_topk(toks, "term", k_counters=64, topn=10)


# ---------------------------------------------------------------------------
# Distinct-count sketch with a verified error bound: per ship month,
# exact distinct parts AND Spark's HLL++ approx_count_distinct
# (rsd=0.02), reported as a within-5% boolean. HLL++ is deterministic
# given the data, so the flag is stable; the oracle recomputes the exact
# count and asserts the flag TRUE — the sketch's accuracy is part of the
# verified contract, not an assumption. At 100 TB the approx path is the
# one that runs (no per-month distinct-value shuffle, constant-size
# sketch state); this query is the harness that licenses it.
# ---------------------------------------------------------------------------
@register(
    "sketch_distinct_bounds",
    oracle="""
    SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
           TRUE AS approx_ok
    FROM lineitem GROUP BY 1
    """,
)
def q_sketch_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.month("l_shipdate").cast("int").alias("ship_month"))
        .agg(
            F.count_distinct("l_partkey").cast("bigint").alias("n_exact"),
            F.approx_count_distinct("l_partkey", 0.02).alias("n_approx"),
        )
        .select(
            "ship_month",
            "n_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_exact"))
                <= F.col("n_exact") * F.lit(0.05)
            ).alias("approx_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit: orphan counts for every foreign key in the
# star schema, each an anti-join that shuffles only the key column. The
# data-quality gate a sync pipeline runs after a copy (complements the
# fingerprint verdicts, which compare content but not cross-table links).
# ---------------------------------------------------------------------------
_FK_RELS = (
    ("orders_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
)


@register(
    "fk_integrity_audit",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{name}' AS fk, CAST(count(*) AS BIGINT) AS n_orphans
        FROM {child} c WHERE NOT EXISTS
          (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})"""
        for name, child, ck, parent, pk in _FK_RELS
    ),
)
def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, child, ck, parent, pk in _FK_RELS:
        orphans = (
            _t(spark, sf_dir, child)
            .select(ck)
            .join(_t(spark, sf_dir, parent).select(pk), F.col(ck) == F.col(pk), "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )
        out = orphans if out is None else out.unionAll(orphans)
    return out


# ---------------------------------------------------------------------------
# Quantile sketch with a verified error bound (complements
# sketch_distinct_bounds): per ship month, the EXACT median of
# l_quantity and a flag that percentile_approx (Greenwald-Khanna-style
# sketch, accuracy 10000) landed within 5% of it. Exact medians of small
# integers interpolate to n+0.5 halves — bit-exact in both engines.
# At 100 TB the sketch path is mergeable constant state per group; this
# gate is what licenses it.
# ---------------------------------------------------------------------------
@register(
    "sketch_quantile_bounds",
    oracle="""
    SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
           CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS p50_exact,
           TRUE AS approx_ok
    FROM lineitem GROUP BY 1
    """,
)
def q_sketch_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.month("l_shipdate").cast("int").alias("ship_month"))
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50_exact"),
            F.percentile_approx("l_quantity", 0.5, 10000).alias("p50_approx"),
        )
        .select(
            "ship_month",
            F.col("p50_exact").cast("double").alias("p50_exact"),
            (
                F.abs(F.col("p50_approx") - F.col("p50_exact"))
                <= F.col("p50_exact") * F.lit(0.05)
            ).alias("approx_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Composed IVF-PQ search (the FAISS-style 100 TB ANN read path) as an
# oracled query: assign cells from the pinned seed centroids, prune to
# the 3 probe cells, then score by PQ-ADC lookup — cell pruning × an
# 8-byte-code scan. The oracle re-derives cell assignment (row_number
# argmin), probe selection, per-subspace encodings and the 8×8 ADC
# table, every float chain in Spark's fold order. The stored form of
# this exact pipeline (codes parquet-partitioned by cell) is proven to
# partition-prune in tests/test_pipeline_ops.py.
# ---------------------------------------------------------------------------
@register(
    "ann_ivf_pq_adc",
    oracle=f"""
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
    dt AS (SELECT c.code, {_PQ_DT_COLS} FROM codes c, q)
    SELECT e0.vec_id, round({_PQ_ADC_SUM}, 6) AS adc_dist
    FROM assigned a
    JOIN enc0 e0 ON e0.vec_id = a.vec_id
    {" ".join(f"JOIN enc{m} e{m} ON e{m}.vec_id = e0.vec_id" for m in range(1, _PQ_M))}
    {" ".join(f"JOIN dt t{m} ON t{m}.code = e{m}.c{m}" for m in range(_PQ_M))}
    WHERE a.cell IN (SELECT cell FROM probes)
    ORDER BY adc_dist ASC, e0.vec_id ASC
    LIMIT 10
    """,
)
def q_ann_ivf_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import spread
    from clickhouse_table_copier_spark.operators.ivf import assign_cells, probe_cells
    from clickhouse_table_copier_spark.operators.pq import (
        pq_adc_scores,
        pq_codebooks_from_seeds,
        pq_encode,
    )

    emb = spread(_t(spark, sf_dir, "embeddings"))
    seeds = emb.orderBy("vec_id").limit(_PQ_K).select("embedding").collect()
    seed_vecs = [[float(x) for x in r["embedding"]] for r in seeds]
    books = pq_codebooks_from_seeds(seed_vecs, _PQ_M)
    probe = probe_cells(seed_vecs, seed_vecs[0], 3)
    cells = assign_cells(emb.where(F.col("vec_id") != 0), seed_vecs).where(
        F.col("cell").isin(probe)
    )
    scored = pq_adc_scores(pq_encode(cells, books), books, seed_vecs[0])
    return (
        scored.select("vec_id", F.round("adc_dist", 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Document chunking: split each document's token stream into fixed
# context windows (64 tokens, stride 48 → 16-token overlap) — the
# pretraining chunker between cleaning and packing. Chunk boundaries are
# pure arithmetic on the token count; the md5 of each chunk's joined
# tokens pins the SLICED CONTENT, not just the bounds, across engines.
# Embarrassingly parallel (explode per doc, no shuffle before the
# output); at 100 TB this runs in the same scan as tokenization.
# ---------------------------------------------------------------------------
_CHUNK = 64
_STRIDE = 48


@register(
    "doc_chunking",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split({_NORM_SQL.format(c="text")}, ' '),
                         t -> t <> '') AS toks
      FROM documents
    ),
    sized AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= {_CHUNK} THEN 1
                  ELSE CAST(ceil(CAST(len(toks) - {_CHUNK} AS DOUBLE)
                                 / {_STRIDE}) AS BIGINT) + 1 END AS n_chunks
      FROM tok WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_idx,
           CAST(i * {_STRIDE} + 1 AS INTEGER) AS start_tok,
           CAST(len(toks[i * {_STRIDE} + 1 : i * {_STRIDE} + {_CHUNK}]) AS INTEGER)
             AS chunk_len,
           md5(array_to_string(toks[i * {_STRIDE} + 1 : i * {_STRIDE} + {_CHUNK}], ' '))
             AS chunk_hash
    FROM sized, unnest(range(0, n_chunks)) AS t(i)
    """,
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import normalized_text, spread

    docs = spread(_t(spark, sf_dir, "documents"))
    toks = F.filter(F.split(normalized_text("text"), " "), lambda t: t != F.lit(""))
    sized = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        "toks",
        F.size("toks").alias("n"),
    ).where(F.col("n") > 0).select(
        "doc_id",
        "toks",
        F.when(F.col("n") <= _CHUNK, F.lit(1).cast("bigint"))
        .otherwise(
            F.ceil((F.col("n") - _CHUNK).cast("double") / _STRIDE).cast("bigint") + 1
        )
        .alias("n_chunks"),
    )
    chunked = sized.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), (F.col("n_chunks") - 1).cast("int"))).alias("i"),
    )
    chunk = F.slice(F.col("toks"), F.col("i") * _STRIDE + 1, _CHUNK)
    return chunked.select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_idx"),
        (F.col("i") * _STRIDE + 1).cast("int").alias("start_tok"),
        F.size(chunk).cast("int").alias("chunk_len"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# Hourly anomaly detection on the event stream: per event_type, flag the
# hours whose event count deviates ≥ 2.5 σ from that type's hourly mean.
# Sum and sum-of-squares stay exact integers until ONE final double
# conversion on each side, so mean/variance/z are bit-identical across
# engines. The per-type stats are window aggregates (partitioned by the
# 5-row type dimension; at scale: a tiny separate aggregate joined back).
# ---------------------------------------------------------------------------
@register(
    "events_anomaly_hours",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT *,
             CAST(sum(cnt) OVER w AS DOUBLE)
               / CAST(count(*) OVER w AS DOUBLE) AS mean_,
             CAST(sum(cnt * cnt) OVER w AS DOUBLE)
               / CAST(count(*) OVER w AS DOUBLE) AS meansq
      FROM hourly WINDOW w AS (PARTITION BY event_type)
    )
    SELECT event_type, h AS hour_ts, CAST(cnt AS BIGINT) AS cnt,
           round((CAST(cnt AS DOUBLE) - mean_)
                 / sqrt(meansq - mean_ * mean_), 6) AS z_score
    FROM stats
    WHERE meansq - mean_ * mean_ > 0
      AND abs((CAST(cnt AS DOUBLE) - mean_) / sqrt(meansq - mean_ * mean_)) >= 2.5
    """,
)
def q_events_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from clickhouse_table_copier_spark.queries import _events

    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type")
    mean_ = F.sum("cnt").over(w).cast("double") / F.count(F.lit(1)).over(w).cast(
        "double"
    )
    meansq = F.sum(F.col("cnt") * F.col("cnt")).over(w).cast("double") / F.count(
        F.lit(1)
    ).over(w).cast("double")
    var = meansq - mean_ * mean_
    z = (F.col("cnt").cast("double") - mean_) / F.sqrt(var)
    return (
        hourly.select(
            "event_type",
            F.col("h").alias("hour_ts"),
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(z, 6).alias("z_score"),
            var.alias("_var"),
            z.alias("_z"),
        )
        .where((F.col("_var") > 0) & (F.abs(F.col("_z")) >= 2.5))
        .drop("_var", "_z")
    )
