"""Round-8c pinned-value tests: Benford digit extraction and exact Gini."""

from __future__ import annotations

from pyspark.sql import functions as F


def _gini(spark, cents_by_cust):
    from clickhouse_table_copier_spark.queries_round8c import q_gini_by_nation

    o = spark.createDataFrame(
        [
            (cust, float(cents) / 100.0)
            for cust, cents in cents_by_cust
        ],
        "o_custkey long, o_totalprice double",
    )
    c = spark.createDataFrame(
        [(cust, 7) for cust, _ in cents_by_cust],
        "c_custkey long, c_nationkey int",
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    o.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    c.write.mode("overwrite").parquet(f"{d}/customer.parquet")
    row = q_gini_by_nation(spark, d).collect()[0]
    return row["gini"], row["n_customers"]


def test_gini_all_equal_is_zero(spark):
    g, n = _gini(spark, [(i, 500) for i in range(1, 9)])
    assert n == 8
    assert g == 0.0


def test_gini_single_holder_is_n_minus_1_over_n(spark):
    # one customer holds everything except epsilon: Σ(2i-n-1)x over n·Σx
    # approaches (n-1)/n; with exactly one nonzero holder it's exact
    g, n = _gini(spark, [(1, 0), (2, 0), (3, 0), (4, 1000)])
    assert n == 4
    assert g == (4 - 1) / 4


def test_benford_digit_from_cents_string(spark, tmp_path):
    from clickhouse_table_copier_spark.queries_round8c import (
        q_benford_first_digit,
    )

    # 0.05 -> cents "5" -> digit 5; 987.65 -> "98765" -> digit 9;
    # 0.00 filtered out by the positivity guard
    o = spark.createDataFrame(
        [(1, 0.05), (2, 987.65), (3, 0.0)],
        "o_custkey long, o_totalprice double",
    )
    sf = str(tmp_path / "sf")
    o.write.parquet(f"{sf}/orders.parquet")
    got = {
        r["digit"]: r["n"] for r in q_benford_first_digit(spark, sf).collect()
    }
    assert got == {5: 1, 9: 1}


def test_fertility_matches_per_doc_counters(spark, tmp_path):
    from clickhouse_table_copier_spark.queries_round8c import (
        q_token_fertility_by_lang,
    )

    docs = spark.createDataFrame(
        [
            (1, "hello world", "en", "s", 11),
            (2, "it's a test", "en", "s", 11),
            (3, "uno", "es", "s", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    got = {
        r["lang"]: (r["ws_tokens"], r["bpe_tokens"], r["fertility"])
        for r in q_token_fertility_by_lang(spark, sf).collect()
    }
    # "hello world" ws=2; "it's a test" ws=3; GPT-2 pre-tokens:
    # [hello][ world]=2, [it]['s][ a][ test]=4
    assert got["en"][0] == 5
    assert got["en"][1] == 6
    assert got["en"][2] == 6 / 5
    assert got["es"] == (1, 1, 1.0)
