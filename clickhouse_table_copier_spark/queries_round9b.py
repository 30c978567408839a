"""Round-9b query batch: corpus quality-filtering operators — the three
standing gaps in the training-data pipeline story.

- ``quality_filter_funnel`` — sequential filter attrition per source:
  the "funnel" report every pretraining pipeline publishes (docs and
  tokens surviving after each pinned filter stage, in order).  The
  stages compose the registry's per-doc heuristics into ONE cumulative
  report: minimum length, repetition screen (top-token share), and
  lexical-diversity floor.  Every predicate is an exact INTEGER
  comparison (``ratio ≥ a/b`` ⇔ ``b·x ≥ a·n``), so the whole report is
  integer-exact cross-engine.
- ``doc_perplexity_buckets`` — CCNet-style LM quality scoring: train an
  add-one-smoothed bigram model on the corpus, score every document's
  mean negative log-likelihood, and bucket the corpus by pinned NLL
  edges.  ``bigram_lm`` builds the model; this is the missing half that
  *scores documents with it* — the classic perplexity filter used to
  rank web text against a reference corpus.  Counts are exact integers;
  the only doubles are the per-position ``ln`` of a ratio of exact
  integers, summed per doc and rounded at 9dp before bucketing (same
  transcendental discipline as psi_feature_stability).
- ``oov_rate_by_lang`` — tokenizer-fit signal: share of token
  occurrences outside the corpus's top-K vocabulary, per language.
  High OOV ⇒ the vocabulary under-serves that language (the
  whole-token analogue of token_fertility_by_lang's fragmentation
  read).  Vocabulary selection is deterministic (count DESC, term ASC)
  and the rate is an exact integer ppm division.

Reference parity note: the Go reference executes no relational
computation (`database/database.go` generates metadata SQL only); all
three are the engine's analytics superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register

# Shared DuckDB-side normalized token list — identical semantics to
# operators.dedup.normalized_text + split + filter (the bigram_lm idiom).
_TOKS_SQL = (
    "list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),"
    " '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')), ' '), x -> x <> '')"
)

# Funnel thresholds, pinned as integer rationals (never float ratios):
# stage 1 keeps docs with ≥ MIN_TOKENS tokens; stage 2 additionally
# requires top-token share ≤ 3/20 (repetition screen); stage 3
# additionally requires distinct/total ≥ 1/3 (lexical diversity).
_FUNNEL_MIN_TOKENS = 20

# Perplexity bucket edges on the 9dp-rounded mean NLL. Pinned literals
# (identical in both engines); the corpus distribution spans ~3.26-3.83
# with mass around 3.39-3.42, so every bucket is populated at sf0.01+.
_NLL_EDGES = ("3.36", "3.39", "3.41", "3.44")


@register(
    "quality_filter_funnel",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, unnest({_TOKS_SQL}) AS w FROM documents
    ),
    tc AS (
      SELECT doc_id, source, w, count(*) AS c FROM toks GROUP BY 1, 2, 3
    ),
    per_doc AS (
      SELECT doc_id, source,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS dn,
             CAST(max(c) AS BIGINT) AS topc
      FROM tc GROUP BY 1, 2
    ),
    flags AS (
      SELECT source, n,
             CASE WHEN n >= {_FUNNEL_MIN_TOKENS} THEN 1 ELSE 0 END AS s1,
             CASE WHEN n >= {_FUNNEL_MIN_TOKENS}
                   AND 20 * topc <= 3 * n THEN 1 ELSE 0 END AS s2,
             CASE WHEN n >= {_FUNNEL_MIN_TOKENS}
                   AND 20 * topc <= 3 * n
                   AND 3 * dn >= n THEN 1 ELSE 0 END AS s3
      FROM per_doc
    ),
    agg AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS d0, CAST(sum(n) AS BIGINT) AS t0,
             CAST(sum(s1) AS BIGINT) AS d1, CAST(sum(s1 * n) AS BIGINT) AS t1,
             CAST(sum(s2) AS BIGINT) AS d2, CAST(sum(s2 * n) AS BIGINT) AS t2,
             CAST(sum(s3) AS BIGINT) AS d3, CAST(sum(s3 * n) AS BIGINT) AS t3
      FROM flags GROUP BY 1
    )
    SELECT source, CAST(stage AS INTEGER) AS stage, stage_name, docs, tokens
    FROM (
      SELECT source, 0 AS stage, 'ingest' AS stage_name, d0 AS docs, t0 AS tokens FROM agg
      UNION ALL SELECT source, 1, 'min_tokens', d1, t1 FROM agg
      UNION ALL SELECT source, 2, 'repetition', d2, t2 FROM agg
      UNION ALL SELECT source, 3, 'diversity', d3, t3 FROM agg
    )
    """,
)
def q_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative filter funnel per source. One token explode, one
    (doc, term) count pass (map-side combinable), one doc-sized rollup
    to (n, distinct, top-count), then ONE grouped conditional aggregate
    per source unpivoted with ``stack`` — 4 rows per source, all exact
    integers.  At 100 TB the only corpus-sized shuffles are the
    (doc, term) and doc_id aggregations; the funnel itself runs over the
    |sources|-row frame."""
    from clickhouse_table_copier_spark.operators.dedup import normalized_text, spread

    docs = spread(_t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(normalized_text("text"), " ")).alias("w"),
    ).where(F.col("w") != "")
    tc = toks.groupBy("doc_id", "source", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = tc.groupBy("doc_id", "source").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("dn"),
        F.max("c").cast("bigint").alias("topc"),
    )
    s1 = F.col("n") >= _FUNNEL_MIN_TOKENS
    s2 = s1 & (20 * F.col("topc") <= 3 * F.col("n"))
    s3 = s2 & (3 * F.col("dn") >= F.col("n"))
    one = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")  # noqa: E731
    ntk = lambda cond: F.sum(F.when(cond, F.col("n")).otherwise(0)).cast("bigint")  # noqa: E731
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("d0"),
        F.sum("n").cast("bigint").alias("t0"),
        one(s1).alias("d1"),
        ntk(s1).alias("t1"),
        one(s2).alias("d2"),
        ntk(s2).alias("t2"),
        one(s3).alias("d3"),
        ntk(s3).alias("t3"),
    )
    return agg.select(
        "source",
        F.expr(
            "stack(4,"
            " 0, 'ingest',     d0, t0,"
            " 1, 'min_tokens', d1, t1,"
            " 2, 'repetition', d2, t2,"
            " 3, 'diversity',  d3, t3"
            ") AS (stage, stage_name, docs, tokens)"
        ),
    ).select(
        "source",
        F.col("stage").cast("int").alias("stage"),
        "stage_name",
        F.col("docs").cast("bigint").alias("docs"),
        F.col("tokens").cast("bigint").alias("tokens"),
    )


@register(
    "doc_perplexity_buckets",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ),
    vocab AS (
      SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
      FROM (SELECT unnest(t) AS w FROM toks)
    ),
    pos AS (
      SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
      FROM toks WHERE len(t) >= 2
    ),
    uni AS (
      SELECT w1 AS w, CAST(count(*) AS BIGINT) AS c1 FROM pos GROUP BY 1
    ),
    bg AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pos GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.doc_id,
             round(-sum(ln(CAST(b.c12 + 1 AS DOUBLE)
                           / CAST(u.c1 + (SELECT v FROM vocab) AS DOUBLE)))
                   / count(*), 9) AS mean_nll
      FROM pos p
      JOIN uni u ON p.w1 = u.w
      JOIN bg b ON p.w1 = b.w1 AND p.w2 = b.w2
      GROUP BY 1
    ),
    bucketed AS (
      SELECT CASE WHEN mean_nll < {_NLL_EDGES[0]} THEN 0
                  WHEN mean_nll < {_NLL_EDGES[1]} THEN 1
                  WHEN mean_nll < {_NLL_EDGES[2]} THEN 2
                  WHEN mean_nll < {_NLL_EDGES[3]} THEN 3
                  ELSE 4 END AS ppl_bucket,
             mean_nll
      FROM scored
    )
    SELECT CAST(ppl_bucket AS INTEGER) AS ppl_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(mean_nll), 9) AS avg_nll
    FROM bucketed GROUP BY 1
    """,
)
def q_doc_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-filter histogram: add-one bigram NLL per document,
    bucketed by pinned edges.  Train-and-score in two corpus passes:
    the bigram frame is built from each doc's token ARRAY (``transform``
    over ``sequence`` — zero self-joins), counted once for the model
    (unigram contexts + bigrams), then joined back by bigram key — both
    sides are data-sized, so the joins sort-merge and AQE broadcasts the
    model side when it is small.  Exactness: every count is integer; the
    per-position ``ln`` ratio is a double whose ~1-ulp engine variance
    is absorbed by the 9dp rounding of the per-doc mean (error after a
    ~100-term sum is ~1e-13, five orders below the rounding grain; the
    pinned bucket edges sit far outside any doc's rounding
    neighbourhood — asserted by the margin test).  Docs with fewer than
    two tokens carry no bigram position and are out of scope (none exist
    at any shipped SF; min doc length is 10 tokens)."""
    from clickhouse_table_copier_spark.operators.dedup import normalized_text, spread

    docs = spread(_t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(normalized_text("text"), " "), lambda t: t != F.lit("")
        ).alias("t"),
    )
    # vocab size: one scalar (metadata-sized collect — a single count)
    v_total = (
        toks.select(F.explode("t").alias("w"))
        .agg(F.countDistinct("w").alias("v"))
        .collect()[0]["v"]
    )
    # sub-2-token docs are dropped by the Generate itself (explode of the
    # NULL when-branch emits no rows — same semantics as the former
    # where(size(t) >= 2), which was pushed below the projection and
    # re-inlined the normalize+split+filter chain into a serial pre-
    # exchange Filter, computing it twice per doc)
    pairs = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN"
                    " transform(sequence(2, size(t)),"
                    " i -> struct(element_at(t, i - 1) AS w1,"
                    "             element_at(t, i) AS w2)) END"
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    uni = pairs.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    bg = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    scored = (
        pairs.join(uni, "w1")
        .join(bg, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.round(
                -F.sum(
                    F.log(
                        (F.col("c12") + 1).cast("double")
                        / (F.col("c1") + F.lit(int(v_total))).cast("double")
                    )
                )
                / F.count(F.lit(1)),
                9,
            ).alias("mean_nll")
        )
    )
    edges = [F.lit(float(e)) for e in _NLL_EDGES]
    bucket = (
        F.when(F.col("mean_nll") < edges[0], 0)
        .when(F.col("mean_nll") < edges[1], 1)
        .when(F.col("mean_nll") < edges[2], 2)
        .when(F.col("mean_nll") < edges[3], 3)
        .otherwise(4)
    )
    return (
        scored.select(bucket.cast("int").alias("ppl_bucket"), "mean_nll")
        .groupBy("ppl_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("mean_nll"), 9).alias("avg_nll"),
        )
    )


_OOV_TOP_K = 16  # the corpus vocabulary is tiny by design; K below it
# keeps the rate non-vacuous at every SF (at real scale K is the
# tokenizer vocabulary size and the mechanism is unchanged)


@register(
    "oov_rate_by_lang",
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest({_TOKS_SQL}) AS w FROM documents
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, count(*) AS n FROM toks GROUP BY 1
        ORDER BY n DESC, w LIMIT {_OOV_TOP_K}
      )
    ),
    s AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS total_tokens,
             CAST(sum(CASE WHEN w NOT IN (SELECT w FROM vocab)
                           THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens
      FROM toks GROUP BY 1
    )
    SELECT lang, total_tokens, oov_tokens,
           CAST(oov_tokens * 1000000 // total_tokens AS BIGINT) AS oov_ppm
    FROM s
    """,
)
def q_oov_rate_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary share per language against the corpus top-K
    vocabulary.  The vocabulary is a deterministic top-K
    (count DESC, term ASC — a total order, so ties cannot flip the set
    cross-engine) taken with TakeOrderedAndProject (bounded heap per
    partition, never a global sort); the K-row frame broadcasts into
    the token stream as a membership flag, and the per-language rate is
    one grouped integer pass with an exact integer-division ppm."""
    from clickhouse_table_copier_spark.operators.dedup import normalized_text, spread

    docs = spread(_t(spark, sf_dir, "documents"))
    toks = docs.select(
        "lang", F.explode(F.split(normalized_text("text"), " ")).alias("w")
    ).where(F.col("w") != "")
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(_OOV_TOP_K)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    flagged = toks.join(F.broadcast(vocab), "w", "left")
    s = flagged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("oov_tokens"),
    )
    return s.select(
        "lang",
        "total_tokens",
        "oov_tokens",
        F.expr("CAST(oov_tokens * 1000000 div total_tokens AS BIGINT)").alias(
            "oov_ppm"
        ),
    )
