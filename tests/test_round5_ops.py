"""Semantics tests for the round-5 operators, independent of the DuckDB
oracle gate: planted-input checks for span dedup, MERGE-semantics edge
cases for the CDC apply, the content-defined-chunking stability property
(an early edit must not shift later chunk boundaries), and determinism
of the mixture resampler under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# repeated_span_pairs
# ---------------------------------------------------------------------------


def test_repeated_span_detects_planted_span(spark):
    from clickhouse_table_copier_spark.operators.dedup import repeated_span_pairs

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 shared words
    docs = _docs(
        spark,
        [
            (1, f"one two three {span} four five"),
            (2, f"six seven {span} eight nine ten"),
            (3, "totally different words only here"),
        ],
    )
    out = repeated_span_pairs(docs, "doc_id", "text", k=4, min_run=2).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["id_a"], row["id_b"]) == (1, 2)
    # 8 shared words with k=4 → run of 5 grams → span of 8 words
    assert row["longest_span_words"] == 8
    assert row["n_spans"] == 1


def test_repeated_span_requires_consecutive_grams(spark):
    from clickhouse_table_copier_spark.operators.dedup import repeated_span_pairs

    # docs share two separated 4-word phrases, but never 5+ consecutive
    # words → single-gram matches only, below min_run=2
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta xx yy zz epsilon zeta eta theta qq"),
            (2, "pp alpha beta gamma delta rr ss epsilon zeta eta theta tt"),
        ],
    )
    out = repeated_span_pairs(docs, "doc_id", "text", k=4, min_run=2).collect()
    assert out == []


def test_repeated_span_max_df_bounds_hot_gram_join(spark):
    """A boilerplate phrase planted in 120 docs (df≫max_df) must be
    anti-joined out BEFORE the inverted-index self-join: with the cap the
    output contains only the one genuinely-shared rare span, while the
    uncapped run materializes all 120·119/2 boilerplate pairs — the Σ df²
    blow-up the cap exists to prevent."""
    from clickhouse_table_copier_spark.operators.dedup import repeated_span_pairs

    boiler = "all rights reserved by the publisher"  # 6 words → 3 grams at k=4
    rare_span = "alpha beta gamma delta epsilon zeta"  # 6 shared rare words
    rows = [(i, f"document number {i} says {boiler} uniquely{i}") for i in range(120)]
    rows += [
        (1000, f"prefix words here {rare_span} suffix words"),
        (1001, f"other opening text {rare_span} closing text"),
    ]
    docs = _docs(spark, rows)

    capped = repeated_span_pairs(
        docs, "doc_id", "text", k=4, min_run=2, max_df=100
    ).collect()
    assert len(capped) == 1
    assert (capped[0]["id_a"], capped[0]["id_b"]) == (1000, 1001)
    assert capped[0]["longest_span_words"] == 6

    uncapped = repeated_span_pairs(
        docs, "doc_id", "text", k=4, min_run=2, max_df=None
    )
    # every boilerplate doc pair (120·119/2) plus the rare pair survives
    # without the cap — the quadratic term the cap collapses
    assert uncapped.count() == 120 * 119 // 2 + 1


# ---------------------------------------------------------------------------
# apply_changelog
# ---------------------------------------------------------------------------


def test_apply_changelog_merge_semantics(spark):
    from clickhouse_table_copier_spark.operators.cdc import apply_changelog

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    changes = spark.createDataFrame(
        [
            (1, 1, "U", "a1", 11.0),  # overridden by seq 2
            (1, 2, "U", "a2", 12.0),  # last writer wins
            (2, 1, "D", None, None),  # delete
            (4, 1, "U", "d", 40.0),  # insert (new key)
            (3, 1, "D", None, None),  # delete...
            (3, 2, "U", "c2", 33.0),  # ...then re-insert (U after D wins)
        ],
        "k long, seq int, op string, name string, bal double",
    )
    out = {
        r["k"]: (r["name"], r["bal"])
        for r in apply_changelog(base, changes, key="k").collect()
    }
    assert out == {1: ("a2", 12.0), 3: ("c2", 33.0), 4: ("d", 40.0)}


def test_apply_changelog_untouched_keys_pass_through(spark):
    from clickhouse_table_copier_spark.operators.cdc import apply_changelog

    base = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    changes = spark.createDataFrame([], "k long, seq int, op string, v double")
    out = sorted(
        (r["k"], r["v"]) for r in apply_changelog(base, changes, key="k").collect()
    )
    assert out == [(1, 1.0), (2, 2.0)]


# ---------------------------------------------------------------------------
# content-defined chunking: stability under a prefix edit
# ---------------------------------------------------------------------------


def _chunks_of(spark, text: str) -> list[str]:
    """Chunk word-contents via the same boundary rule as the registered
    query (bigram hash % 16 == 0)."""
    from clickhouse_table_copier_spark.operators.dedup import normalized_text
    from pyspark.sql import Window

    k, mod = 2, 16
    df = _docs(spark, [(1, text)])
    toks = df.select("doc_id", F.split(normalized_text("text"), " ").alias("w"))
    flags = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("w") - k + 1)).alias("pos"),
        F.col("w"),
    ).select(
        "doc_id",
        "pos",
        F.expr(f"element_at(w, pos)").alias("word"),
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.array_join(F.expr(f"slice(w, pos, {k})"), " ")), 1, 15
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
    rows = (
        flags.select("pos", "word", F.sum("b").over(wc).alias("chunk_id"))
        .orderBy("pos")
        .collect()
    )
    chunks: dict[int, list[str]] = {}
    for r in rows:
        chunks.setdefault(r["chunk_id"], []).append(r["word"])
    return [" ".join(v) for _, v in sorted(chunks.items())]


def test_cdc_chunk_boundaries_survive_prefix_edit(spark):
    import random

    rng = random.Random(7)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    body = " ".join(rng.choice(vocab) for _ in range(120))
    prefix = "inserted words at the front of the document"

    base_chunks = _chunks_of(spark, body)
    edited_chunks = _chunks_of(spark, f"{prefix} {body}")

    # every base chunk except possibly the first (whose leading boundary
    # context straddles the edit) must reappear verbatim in the edited
    # doc's chunks — fixed-size chunking would shift ALL of them
    assert len(base_chunks) >= 3, "fixture too short to be meaningful"
    surviving = [c for c in base_chunks[1:] if c in edited_chunks]
    assert surviving == base_chunks[1:], (
        f"chunks shifted after prefix edit: {base_chunks[1:]} vs {edited_chunks}"
    )


# ---------------------------------------------------------------------------
# mixture resampling: determinism + quota feasibility
# ---------------------------------------------------------------------------


def test_mixture_resample_deterministic_under_repartition(spark):
    from clickhouse_table_copier_spark.queries_round5 import q_mixture_resample

    def run():
        return {
            r["source"]: (r["n_selected"], r["sel_checksum"])
            for r in q_mixture_resample(spark, SF_ORACLE).collect()
        }

    a = run()
    assert a, "empty resample output"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # different reducer count → different physical partitioning of the
        # rank shuffle; the selected SET must not change
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
    for _src, (n_sel, _) in a.items():
        assert n_sel > 0


def test_mixture_resample_quota_never_exceeds_source(spark):
    from clickhouse_table_copier_spark.queries_round5 import q_mixture_resample

    for r in q_mixture_resample(spark, SF_ORACLE).collect():
        assert r["n_selected"] <= r["n_source"]


# ---------------------------------------------------------------------------
# ann_ivf_pq_refine: exact re-rank can only improve recall over raw ADC
# ---------------------------------------------------------------------------


def test_refine_recall_at_least_adc(spark):
    """recall@10 vs brute-force exact L2: the refine stage re-orders the
    30 ADC candidates by true distance, so its top-10 must overlap the
    exact top-10 at least as much as the pure-ADC top-10 does."""
    from clickhouse_table_copier_spark.operators.dedup import spread
    from clickhouse_table_copier_spark.operators.ivf import _sq_dist
    from clickhouse_table_copier_spark.queries_round3 import q_ann_ivf_pq_adc
    from clickhouse_table_copier_spark.queries_round5 import q_ann_ivf_pq_refine

    sf = SF_ORACLE
    emb = spread(spark.read.parquet(f"{sf}/embeddings.parquet"))
    qv = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").head()["embedding"]
    ]
    exact_ids = {
        r["vec_id"]
        for r in emb.where(F.col("vec_id") != 0)
        .select("vec_id", _sq_dist(F.col("embedding"), qv).alias("d"))
        .orderBy(F.asc("d"), F.asc("vec_id"))
        .limit(10)
        .collect()
    }
    adc_ids = {r["vec_id"] for r in q_ann_ivf_pq_adc(spark, sf).collect()}
    refine_ids = {r["vec_id"] for r in q_ann_ivf_pq_refine(spark, sf).collect()}
    assert len(refine_ids & exact_ids) >= len(adc_ids & exact_ids)
    assert len(refine_ids) == 10

    # every refined id must come from the stage-1 ADC candidate pool:
    # rebuild the same 30-candidate scan the query runs and assert subset
    from clickhouse_table_copier_spark.operators.ivf import assign_cells, probe_cells
    from clickhouse_table_copier_spark.operators.pq import (
        pq_adc_scores,
        pq_codebooks_from_seeds,
        pq_encode,
    )
    from clickhouse_table_copier_spark.queries_round3 import _PQ_K, _PQ_M
    from clickhouse_table_copier_spark.queries_round5 import _REFINE_C

    seeds = emb.orderBy("vec_id").limit(_PQ_K).select("embedding").collect()
    seed_vecs = [[float(x) for x in r["embedding"]] for r in seeds]
    books = pq_codebooks_from_seeds(seed_vecs, _PQ_M)
    probe = probe_cells(seed_vecs, seed_vecs[0], 3)
    base = emb.where(F.col("vec_id") != 0)
    cells = assign_cells(base, seed_vecs).where(F.col("cell").isin(probe))
    scored = pq_adc_scores(pq_encode(cells, books), books, seed_vecs[0])
    cand_ids = {
        r["vec_id"]
        for r in scored.select("vec_id", F.round("adc_dist", 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(_REFINE_C)
        .collect()
    }
    assert len(cand_ids) == _REFINE_C
    assert refine_ids <= cand_ids


# ---------------------------------------------------------------------------
# cluster_safe_split: near-dups never straddle splits
# ---------------------------------------------------------------------------


def test_cluster_safe_split_no_leakage(spark):
    """Every jaccard-cluster lands in exactly one split, and the operator
    is not vacuous: at least one doc was rehomed relative to the naive
    per-doc hash split (the fixture corpus plants near-dup copies)."""
    from clickhouse_table_copier_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )
    from clickhouse_table_copier_spark.queries_pipeline import (
        _corpus,
        _shared_shingle_index,
    )
    from clickhouse_table_copier_spark.queries_round5 import q_cluster_safe_split

    sf = SF_ORACLE
    pairs = ngram_jaccard_pairs(
        _corpus(spark, sf), "doc_id", "text", threshold=0.5,
        index=_shared_shingle_index(spark, sf),
    ).select("id_a", "id_b")
    clusters = dedup_clusters(pairs)

    def bucket(c):
        return F.conv(F.substring(F.md5(c.cast("string")), 1, 2), 16, 10).cast("int")

    def split_of(c):
        b = bucket(c)
        return (
            F.when(b < 204, F.lit("train"))
            .when(b < 230, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    per_doc = clusters.select(
        "id", "cluster_id", split_of(F.col("cluster_id")).alias("split")
    )
    straddlers = (
        per_doc.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0
    agg = {r["split"]: r for r in q_cluster_safe_split(spark, sf).collect()}
    assert sum(r["n_rehomed"] for r in agg.values()) > 0
    assert set(agg) == {"train", "val", "test"}


# ---------------------------------------------------------------------------
# gemm_topk_int
# ---------------------------------------------------------------------------


def test_gemm_topk_partition_invariance_and_exactness(spark):
    """The partial-topk + global-window plan must give identical results
    regardless of physical partitioning, and the integer scores must
    equal a driver-side exact recomputation."""
    import numpy as np

    from clickhouse_table_copier_spark.operators.similarity import (
        GEMM_SCALE,
        gemm_topk_int,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qrows = emb.where(F.col("vec_id") < 2).orderBy("vec_id").collect()
    qvecs = [[float(x) for x in r["embedding"]] for r in qrows]
    qids = [int(r["vec_id"]) for r in qrows]
    corpus = emb.where(F.col("vec_id") >= 2)

    base = sorted(
        map(tuple, gemm_topk_int(corpus, qvecs, qids, k=4).collect())
    )
    shuffled = sorted(
        map(tuple, gemm_topk_int(corpus.repartition(13), qvecs, qids, k=4).collect())
    )
    assert base == shuffled

    # driver-side exact recomputation of one returned score
    all_vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in corpus.collect()
    }
    qi = [int(np.floor(x * GEMM_SCALE + 0.5)) for x in qvecs[0]]
    for q_id, vec_id, score in base:
        if q_id != qids[0]:
            continue
        vi = [int(np.floor(x * GEMM_SCALE + 0.5)) for x in all_vecs[vec_id]]
        assert score == sum(a * b for a, b in zip(qi, vi))


def test_shared_span_runs_cache_is_reused_and_consistent(spark):
    """Both span queries consume ONE persisted runs frame per
    (session, sf_dir): a second _shared_span_runs call returns the same
    object, and thresholding the shared frame at min_run reproduces
    repeated_span_pairs built from scratch."""
    from pyspark.sql import functions as F

    from clickhouse_table_copier_spark.operators.dedup import (
        repeated_span_pairs,
    )
    from clickhouse_table_copier_spark.queries import _t
    from clickhouse_table_copier_spark.queries_round5 import (
        SPAN_K,
        SPAN_MIN_RUN,
        _shared_span_runs,
    )
    from tests.conftest import SF_SMOKE

    runs1 = _shared_span_runs(spark, SF_SMOKE)
    runs2 = _shared_span_runs(spark, SF_SMOKE)
    assert runs1 is runs2, "cache must return the SAME persisted frame"
    assert runs1.storageLevel.useMemory, "runs frame must be persisted"

    docs = _t(spark, SF_SMOKE, "documents")
    fresh = {
        (r["id_a"], r["id_b"], r["longest_span_words"], r["n_spans"])
        for r in repeated_span_pairs(
            docs, "doc_id", "text", k=SPAN_K, min_run=SPAN_MIN_RUN
        ).collect()
    }
    shared = {
        (r["id_a"], r["id_b"], r["longest_span_words"], r["n_spans"])
        for r in repeated_span_pairs(
            docs, "doc_id", "text", k=SPAN_K, min_run=SPAN_MIN_RUN, runs=runs1
        ).collect()
    }
    assert fresh == shared
