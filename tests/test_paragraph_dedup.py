"""Paragraph-level exact dedup: planted cross-document boilerplate.

Documents share one long disclaimer paragraph; the stats operator must
flag exactly it, and the rewrite must keep only its canonical (lowest
id, lowest position) occurrence while leaving unique prose intact.
"""

from clickhouse_table_copier_spark.operators.dedup import (
    drop_duplicate_paragraphs,
    paragraph_dedup_stats,
)

_BOILER = (
    "This transmission is confidential and intended solely for the "
    "named recipient; unauthorized review or distribution is strictly "
    "prohibited by the applicable statutes."
)
_P1 = (
    "A perfectly ordinary paragraph about rivers and hills that exists "
    "in exactly one document of this small corpus."
)
_P2 = (
    "Another unique stretch of prose, this one concerning harvest "
    "moons and the patience of orchard keepers through autumn."
)
_SHORT = "Too short to count."


def _docs(spark):
    rows = [
        (1, f"{_P1}\n\n{_BOILER}\n\n{_SHORT}"),
        (2, f"{_BOILER}\n\n{_P2}"),
        (3, f"{_BOILER}"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stats_flag_only_the_shared_paragraph(spark):
    got = {
        r["doc_id"]: r
        for r in paragraph_dedup_stats(_docs(spark), "doc_id", "text").collect()
    }
    # short paragraph is below min_len: doc 1 counts 2 paragraphs
    assert got[1]["n_paras"] == 2 and got[1]["n_dup_paras"] == 1
    assert got[1]["dup_ratio_ppm"] == 500_000
    assert got[2]["n_paras"] == 2 and got[2]["n_dup_paras"] == 1
    assert got[3]["n_paras"] == 1 and got[3]["dup_ratio_ppm"] == 1_000_000


def test_drop_keeps_canonical_occurrence(spark):
    got = {
        r["doc_id"]: r["text"]
        for r in drop_duplicate_paragraphs(
            _docs(spark), "doc_id", "text"
        ).collect()
    }
    # doc 1 is the canonical holder (lowest id): keeps everything
    assert got[1] == f"{_P1}\n\n{_BOILER}\n\n{_SHORT}"
    # doc 2 loses the boilerplate, keeps its unique prose
    assert got[2] == _P2
    # doc 3 was ONLY boilerplate: comes back empty, not missing
    assert got[3] == ""


def test_whitespace_variants_collapse(spark):
    df = spark.createDataFrame(
        [
            (1, _BOILER),
            (2, _BOILER.replace(" ", "  ")),  # doubled inner spaces
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_dup_paras"]
        for r in paragraph_dedup_stats(df, "doc_id", "text").collect()
    }
    assert got == {1: 1, 2: 1}  # normalization makes them the same


def test_deterministic_under_repartitioning(spark):
    df = _docs(spark)
    a = drop_duplicate_paragraphs(df.repartition(7), "doc_id", "text")
    b = drop_duplicate_paragraphs(df.coalesce(1), "doc_id", "text")
    ra = sorted((r["doc_id"], r["text"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["text"]) for r in b.collect())
    assert ra == rb


def test_rebuild_preserves_intra_paragraph_formatting(spark):
    """The rewrite must not reformat surviving text: a code block's
    inner newlines and indentation come back verbatim (normalization
    is for MATCHING only)."""
    code = (
        "def f(x):\n    y = x + 1\n    return y  # a code block kept "
        "long enough to clear the minimum paragraph length gate"
    )
    df = spark.createDataFrame(
        [(1, f"{code}\n\n{_P1}")], "doc_id long, text string"
    )
    got = drop_duplicate_paragraphs(df, "doc_id", "text").collect()[0]
    assert got["text"] == f"{code}\n\n{_P1}"


def test_stats_keep_docs_with_no_qualifying_paragraphs(spark):
    df = spark.createDataFrame(
        [(1, _P1), (2, "short"), (3, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in paragraph_dedup_stats(df, "doc_id", "text").collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[2]["n_paras"] == 0 and got[2]["dup_ratio_ppm"] == 0
    assert got[3]["n_paras"] == 0 and got[3]["dup_ratio_ppm"] == 0
