"""Property tests for round-7d: iterative BPE training and readability.
DuckDB value parity is covered by tests/test_oracle_queries.py; these
pin hand-computable semantics on planted corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, texts):
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_bpe_merges_hand_computed(spark, tmp_path):
    """Corpus of 10×'xxy' + 1×'zz': iter1 merges (x,x) — tied with
    (x,y) at 10, lexicographic tiebreak — iter2 merges the NEW symbol
    ('xx','y') proving merged symbols re-enter the counts, iter3 takes
    the leftover (z,z)."""
    from clickhouse_table_copier_spark.queries_round7d import (
        q_bpe_iterative_merges,
    )

    sf = _write_docs(spark, tmp_path, ["xxy"] * 10 + ["zz"])
    got = [
        (r["iteration"], r["sym_a"], r["sym_b"], r["merged"],
         r["n_occurrences"])
        for r in q_bpe_iterative_merges(spark, sf).orderBy("iteration").collect()
    ]
    assert got == [
        (1, "x", "x", "xx", 10),
        (2, "xx", "y", "xxy", 10),
        (3, "z", "z", "zz", 1),
    ]


def test_bpe_greedy_leftmost(spark, tmp_path):
    """'aaaa' under merge (a,a) must become [aa, aa] — the greedy
    leftmost non-overlapping rule — so iteration 2 counts (aa, aa),
    never a straddling (a, aa)."""
    from clickhouse_table_copier_spark.queries_round7d import (
        q_bpe_iterative_merges,
    )

    sf = _write_docs(spark, tmp_path, ["aaaa"] * 3)
    got = [
        (r["iteration"], r["sym_a"], r["sym_b"], r["n_occurrences"])
        for r in q_bpe_iterative_merges(spark, sf).orderBy("iteration").collect()
    ]
    # the word is fully merged after two rounds — the loop stops at
    # BPE's natural exhaustion instead of erroring on an empty argmax
    assert got == [(1, "a", "a", 9), (2, "aa", "aa", 3)]


def test_readability_hand_computed(spark, tmp_path):
    """'Hello world. This is a test!' → 6 words, 2 sentences, 7 vowel
    groups; flesch follows the exact formula."""
    from clickhouse_table_copier_spark.queries_round7d import (
        q_readability_scores,
    )

    sf = _write_docs(spark, tmp_path, ["Hello world. This is a test!"])
    r = q_readability_scores(spark, sf).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 7)
    assert r["flesch"] == pytest.approx(
        206.835 - 1.015 * (6 / 2) - 84.6 * (7 / 6)
    )


def test_readability_sentence_floor(spark, tmp_path):
    """No terminal punctuation at all still scores (sentence count
    floors at 1 instead of dividing by zero)."""
    from clickhouse_table_copier_spark.queries_round7d import (
        q_readability_scores,
    )

    sf = _write_docs(spark, tmp_path, ["no punctuation here at all"])
    r = q_readability_scores(spark, sf).collect()[0]
    assert r["n_sentences"] == 1 and r["flesch"] is not None
