"""Planted-data semantics for the round-9b corpus quality-filtering
batch (quality_filter_funnel, doc_perplexity_buckets, oov_rate_by_lang):
tiny parquet fixtures with hand-computable answers, plus the pinned
bucket-edge margin assertion that backs doc_perplexity_buckets'
cross-engine exactness claim.  The DuckDB hash gate
(test_oracle_queries) checks cross-engine agreement; these tests check
the MATH is the intended one.
"""

from __future__ import annotations

import math

import duckdb

from clickhouse_table_copier_spark import queries_round9b as r9b
from tests.conftest import SF_ORACLE


def _docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_funnel_each_stage_drops_its_planted_doc(spark, tmp_path):
    """Four planted docs, each failing exactly one later stage:
    5-token doc (min_tokens), 1×10-of-20 doc (repetition, top share
    1/2 > 3/20), 8-distinct×4 doc (diversity, 8 < 32/3), and a
    30-distinct singleton doc that survives everything."""
    short = " ".join(f"s{i}" for i in range(5))
    repeaty = " ".join(["dup"] * 10 + [f"r{i}" for i in range(10)])
    lowdiv = " ".join(f"w{i % 8}" for i in range(32))
    clean = " ".join(f"c{i:02d}" for i in range(30))
    rows = [
        (1, short, "en", "srcA", len(short)),
        (2, repeaty, "en", "srcA", len(repeaty)),
        (3, lowdiv, "en", "srcA", len(lowdiv)),
        (4, clean, "en", "srcA", len(clean)),
    ]
    sf = _docs(spark, tmp_path, rows)
    out = {
        r["stage"]: r
        for r in r9b.q_quality_filter_funnel(spark, sf).collect()
    }
    assert [out[s]["stage_name"] for s in range(4)] == [
        "ingest",
        "min_tokens",
        "repetition",
        "diversity",
    ]
    assert [out[s]["docs"] for s in range(4)] == [4, 3, 2, 1]
    assert [out[s]["tokens"] for s in range(4)] == [
        5 + 20 + 32 + 30,
        20 + 32 + 30,
        32 + 30,
        30,
    ]


def test_funnel_monotone_and_nonvacuous_on_corpus(spark):
    """On the shipped sf0.01 corpus every source's funnel is monotone
    non-increasing and at least one stage drops at least one doc
    overall (the pinned thresholds are calibrated to discriminate)."""
    rows = r9b.q_quality_filter_funnel(spark, SF_ORACLE).collect()
    by_src: dict[str, dict[int, tuple[int, int]]] = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["stage"]] = (r["docs"], r["tokens"])
    total_drop = 0
    for src, stages in by_src.items():
        assert sorted(stages) == [0, 1, 2, 3]
        for s in range(1, 4):
            assert stages[s][0] <= stages[s - 1][0], (src, s)
            assert stages[s][1] <= stages[s - 1][1], (src, s)
        total_drop += stages[0][0] - stages[3][0]
    assert total_drop > 0


def _brute_nll(texts: list[str]) -> dict[int, float]:
    """Pure-Python add-one bigram NLL, the query's documented formula."""
    toks = {i: t.split() for i, t in enumerate(texts)}
    vocab = {w for t in toks.values() for w in t}
    pairs = [(i, a, b) for i, t in toks.items() for a, b in zip(t, t[1:])]
    uni: dict[str, int] = {}
    bg: dict[tuple[str, str], int] = {}
    for _, a, b in pairs:
        uni[a] = uni.get(a, 0) + 1
        bg[(a, b)] = bg.get((a, b), 0) + 1
    out: dict[int, float] = {}
    for i, t in toks.items():
        ps = [(a, b) for a, b in zip(t, t[1:])]
        if not ps:
            continue
        s = sum(
            math.log((bg[(a, b)] + 1) / (uni[a] + len(vocab))) for a, b in ps
        )
        out[i] = round(-s / len(ps), 9)
    return out


def test_perplexity_matches_brute_force_and_orders_docs(spark, tmp_path):
    """A fully deterministic alternating doc scores strictly lower NLL
    than a doc of one-off bigrams, and the bucketed output matches the
    brute-force reimplementation of the formula."""
    predictable = " ".join(["a b"] * 15)  # every bigram seen many times
    surprising = " ".join(f"u{i}" for i in range(30))  # all bigrams unique
    texts = [predictable, surprising]
    rows = [
        (i, t, "en", "srcA", len(t)) for i, t in enumerate(texts)
    ]
    sf = _docs(spark, tmp_path, rows)
    nll = _brute_nll(texts)
    assert nll[0] < nll[1]

    def bucket(v: float) -> int:
        for k, e in enumerate((3.36, 3.39, 3.41, 3.44)):
            if v < e:
                return k
        return 4

    expect: dict[int, list[float]] = {}
    for v in nll.values():
        expect.setdefault(bucket(v), []).append(v)
    out = {
        r["ppl_bucket"]: r
        for r in r9b.q_doc_perplexity_buckets(spark, sf).collect()
    }
    assert sorted(out) == sorted(expect)
    for b, vals in expect.items():
        assert out[b]["n_docs"] == len(vals)
        assert out[b]["avg_nll"] == round(sum(vals) / len(vals), 9)


def test_perplexity_edge_margin_on_corpus():
    """Every doc's 9dp-rounded mean NLL sits ≥ 1e-6 from every pinned
    bucket edge on the shipped corpus — the engines' ≤1e-13 summation
    variance cannot flip a bucket (the exactness precondition the query
    docstring claims)."""
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_ORACLE}/documents.parquet'"
    )
    edges = ", ".join(f"abs(mean_nll - {e})" for e in r9b._NLL_EDGES)
    toks = r9b._TOKS_SQL
    margin = con.sql(
        f"""
        WITH toks AS (SELECT doc_id, {toks} AS t FROM documents),
        vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
                  FROM (SELECT unnest(t) AS w FROM toks)),
        pos AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS w1,
                       unnest(t[2:len(t)]) AS w2
                FROM toks WHERE len(t) >= 2),
        uni AS (SELECT w1 AS w, count(*) AS c1 FROM pos GROUP BY 1),
        bg AS (SELECT w1, w2, count(*) AS c12 FROM pos GROUP BY 1, 2),
        scored AS (
          SELECT p.doc_id,
                 round(-sum(ln(CAST(b.c12 + 1 AS DOUBLE)
                               / CAST(u.c1 + (SELECT v FROM vocab) AS DOUBLE)))
                       / count(*), 9) AS mean_nll
          FROM pos p JOIN uni u ON p.w1 = u.w
          JOIN bg b ON p.w1 = b.w1 AND p.w2 = b.w2
          GROUP BY 1)
        SELECT min(least({edges})) FROM scored
        """
    ).fetchone()[0]
    assert margin is not None and margin > 1e-6, margin


def test_oov_rate_planted_vocab_cut(spark, tmp_path):
    """18 words with strictly decreasing frequencies; the top-16 cut is
    unambiguous, so OOV = all occurrences of the two rarest words, and
    they are planted entirely in one language."""
    # word wi appears (20 - i) times; w16 (4×) and w17 (3×) are OOV
    common = " ".join(
        " ".join(f"w{i:02d}" for _ in range(20 - i)) for i in range(16)
    )
    rare = " ".join(["w16"] * 4 + ["w17"] * 3)
    rows = [
        (1, common, "en", "srcA", len(common)),
        (2, rare, "xx", "srcA", len(rare)),
    ]
    sf = _docs(spark, tmp_path, rows)
    out = {r["lang"]: r for r in r9b.q_oov_rate_by_lang(spark, sf).collect()}
    n_common = sum(20 - i for i in range(16))
    assert out["en"]["total_tokens"] == n_common
    assert out["en"]["oov_tokens"] == 0
    assert out["en"]["oov_ppm"] == 0
    assert out["xx"]["total_tokens"] == 7
    assert out["xx"]["oov_tokens"] == 7
    assert out["xx"]["oov_ppm"] == 1_000_000


def test_oov_rate_tie_break_is_term_order(spark, tmp_path):
    """Two words tied in frequency straddling the K boundary: the ASC
    term tie-break admits the lexicographically smaller one — pinned so
    both engines cut the identical vocabulary."""
    # 15 words at distinct high freqs + 'aa' and 'zz' tied at 2 → only
    # 'aa' joins the top-16; 'zz' is OOV
    head = " ".join(
        " ".join(f"h{i:02d}" for _ in range(20 - i)) for i in range(15)
    )
    tied = "aa aa zz zz"
    rows = [(1, head + " " + tied, "en", "srcA", 0)]
    sf = _docs(spark, tmp_path, rows)
    out = r9b.q_oov_rate_by_lang(spark, sf).collect()[0]
    assert out["oov_tokens"] == 2  # the two 'zz' occurrences
