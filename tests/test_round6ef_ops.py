"""Property tests for the round-6e/6f operators beyond the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_schema_evolution_nulls_exactly_the_old_generation(spark):
    """gen1 files predate l_tax: merged rows from them must surface it
    as NULL, and ONLY them — the null set is exactly the even-key half."""
    from clickhouse_table_copier_spark.queries_round6f import (
        evolved_generations_path,
    )

    merged = spark.read.option("mergeSchema", "true").parquet(
        evolved_generations_path(spark, SF_SMOKE)
    )
    assert "l_tax" in merged.columns and "gen" in merged.columns
    r = merged.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("l_tax").alias("with_tax"),
        F.count(F.when((F.col("l_orderkey") % 2 == 0) & F.col("l_tax").isNotNull(), 1)).alias("even_with_tax"),
        F.count(F.when((F.col("l_orderkey") % 2 == 1) & F.col("l_tax").isNull(), 1)).alias("odd_without_tax"),
    ).collect()[0]
    assert r["even_with_tax"] == 0  # no gen1 row carries a tax value
    assert r["odd_without_tax"] == 0  # every gen2 row carries one
    from clickhouse_table_copier_spark.queries import _t

    li = _t(spark, SF_SMOKE, "lineitem")
    assert r["n"] == li.count()
    assert r["with_tax"] == li.where(F.col("l_orderkey") % 2 == 1).count()


def test_vocab_spectrum_mass_conservation(spark):
    """Σ freq·n_types must equal the corpus token count and Σ n_types
    the vocabulary size — the spectrum is a partition of both."""
    from clickhouse_table_copier_spark.queries_round6c import (
        q_vocab_frequency_spectrum,
    )
    from clickhouse_table_copier_spark.queries_round6 import _norm_tokens
    from clickhouse_table_copier_spark.queries import _t

    spec = q_vocab_frequency_spectrum(spark, SF_SMOKE).collect()
    toks = _t(spark, SF_SMOKE, "documents").select(
        F.explode(_norm_tokens("text")).alias("tok")
    )
    n_tokens = toks.count()
    n_vocab = toks.distinct().count()
    assert sum(r["freq"] * r["n_types"] for r in spec) == n_tokens
    assert sum(r["n_types"] for r in spec) == n_vocab


def test_chi2_zero_on_perfectly_independent_table(spark, tmp_path):
    """When every cell is exactly proportional (o·t = r·c), each
    quantized term is exactly 0 — the integer-exact formulation makes
    independence land on 0, not on 1e-12 noise."""
    rows = []
    doc = 0
    # counts: source s0 has 2×(en) 4×(fr); s1 has 3×(en) 6×(fr) —
    # column ratios identical across rows → independent
    for src, lang, cnt in [
        ("s0", "en", 2), ("s0", "fr", 4), ("s1", "en", 3), ("s1", "fr", 6),
    ]:
        for _ in range(cnt):
            rows.append((doc, "text", lang, src, 4))
            doc += 1
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from clickhouse_table_copier_spark.queries_round6e import q_source_lang_chi2

    r = q_source_lang_chi2(spark, str(tmp_path)).collect()[0]
    assert r["chi2_q9_sum"] == 0
    assert r["n_cells"] == 4 and r["dof"] == 1
