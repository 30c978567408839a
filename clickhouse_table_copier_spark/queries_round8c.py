"""Round-8c query batch: data-quality profiling and inequality metrics.

- ``benford_first_digit`` — first-significant-digit distribution of
  order totals vs the Benford expectation, the classic bulk-data fraud /
  synthetic-data QA screen.  Everything cross-engine-risky stays
  integer: the digit comes from the CENTS string (never float log10),
  shares are exact parts-per-million integer divisions, and the Benford
  expectations are pinned integer ppm constants, so the only doubles
  are one per-digit χ² contribution with a fixed operation order.
- ``token_fertility_by_lang`` — tokens-per-word fertility per language:
  the single most-watched tokenizer-health metric when mixing languages
  in a training corpus (high fertility ⇒ the tokenizer fragments that
  language).  Exact integer token sums (the registry's ws/BPE-ish
  counters), one final division.
- ``gini_by_nation`` — exact Gini coefficient of customer revenue
  within each nation: ``G = Σ(2i−n−1)·x(i) / (n·Σx)`` over
  revenue-sorted customers.  The rank window partitions by NATION
  (bounded groups, never a global sort) and the numerator is an exact
  decimal sum — the scalar companion to revenue_concentration's Lorenz
  deciles.

Reference parity note: the Go reference executes no relational
computation (`database/database.go` generates metadata SQL only); all
three are the engine's analytics superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register
from clickhouse_table_copier_spark.queries_pipeline import _BPE_SQL_PATTERN

# Benford expectations as pinned integer ppm: round(log10(1+1/d)*1e6).
# Hard constants (identical literals in both engines) — never computed
# via log10 at query time, whose last-ulp rounding may differ by engine.
_BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)


@register(
    "benford_first_digit",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
      WHERE o_totalprice > 0
    ),
    c AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(count(*)) OVER () AS BIGINT) AS total
      FROM d GROUP BY 1
    ),
    e AS (
      SELECT * FROM (VALUES {", ".join(f"({i + 1}, {p})" for i, p in enumerate(_BENFORD_PPM))})
             AS t(digit, exp_ppm)
    )
    SELECT c.digit, c.n,
           CAST(c.n * 1000000 // c.total AS BIGINT) AS obs_ppm,
           CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
           CAST(c.n * 1000000 // c.total - e.exp_ppm AS DOUBLE)
             * CAST(c.n * 1000000 // c.total - e.exp_ppm AS DOUBLE)
             / CAST(e.exp_ppm AS DOUBLE) AS chi2_ppm
    FROM c JOIN e ON c.digit = e.digit
    """,
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford screen: digit from the cents STRING (exact for any
    decimal), observed share as integer-div ppm, χ² contribution per
    digit from integer ppm differences (two exactly-representable ints →
    one multiply, one divide — correctly rounded identically anywhere).
    Group count is ≤9 rows; the scan is the only SF-linear stage."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    c = (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "digit",
            "n",
            F.sum("n").over(Window.partitionBy()).cast("bigint").alias("total"),
        )
    )
    e = spark.createDataFrame(
        [(i + 1, p) for i, p in enumerate(_BENFORD_PPM)],
        "digit int, exp_ppm bigint",
    )
    # integer division — Spark `div`, DuckDB `//`
    obs_ppm = F.expr("CAST(n * 1000000 div total AS BIGINT)")
    diff = (obs_ppm - F.col("exp_ppm")).cast("double")
    return (
        c.join(F.broadcast(e), "digit")
        .select(
            "digit",
            "n",
            obs_ppm.alias("obs_ppm"),
            F.col("exp_ppm").cast("bigint").alias("exp_ppm"),
            (diff * diff / F.col("exp_ppm").cast("double")).alias("chi2_ppm"),
        )
    )


@register(
    "token_fertility_by_lang",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
               AS ws,
             CASE WHEN length(text) = 0 THEN 0
                  ELSE len(regexp_extract_all(text, '{_BPE_SQL_PATTERN}')) END
               AS bpe
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ws) AS BIGINT) AS ws_tokens,
           CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
           CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE) AS fertility
    FROM t GROUP BY 1
    """,
)
def q_token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: exact integer token sums (the
    same ws/BPE-ish counters token_counts verifies per-doc), one double
    division per language row.  Map-side combinable; output is
    language-cardinality."""
    from clickhouse_table_copier_spark.operators.text import (
        bpe_token_count,
        token_count,
    )
    from clickhouse_table_copier_spark.queries_pipeline import spread

    docs = spread(_t(spark, sf_dir, "documents"))
    t = docs.select(
        "lang",
        token_count("text").cast("bigint").alias("ws"),
        bpe_token_count("text").cast("bigint").alias("bpe"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ws").cast("bigint").alias("ws_tokens"),
        F.sum("bpe").cast("bigint").alias("bpe_tokens"),
        (
            F.sum("bpe").cast("double") / F.sum("ws").cast("double")
        ).alias("fertility"),
    )


@register(
    "gini_by_nation",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey AS custkey,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT nationkey, cents,
             row_number() OVER (
               PARTITION BY nationkey ORDER BY cents, custkey) AS i,
             count(*) OVER (PARTITION BY nationkey) AS n
      FROM rev
    )
    SELECT CAST(nationkey AS INT) AS nationkey,
           CAST(max(n) AS BIGINT) AS n_customers,
           CAST(sum((2 * i - n - 1) * CAST(cents AS HUGEINT)) AS DOUBLE)
             / (CAST(max(n) AS DOUBLE) * CAST(sum(cents) AS DOUBLE)) AS gini
    FROM r GROUP BY 1
    """,
)
def q_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact within-nation Gini of customer revenue: integer numerator
    Σ(2i−n−1)·xᵢ over the (cents, custkey)-sorted rank — the rank window
    partitions by nation (bounded groups; never a global sort), sums run
    in decimal, and the one double division per nation is correctly
    rounded identically in any engine."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nationkey"),
    )
    rev = (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy("nationkey", F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    wn = Window.partitionBy("nationkey")
    wr = wn.orderBy("cents", "custkey")
    r = rev.select(
        "nationkey",
        "cents",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    num = F.sum(
        (2 * F.col("i") - F.col("n") - 1).cast("decimal(38,0)")
        * F.col("cents").cast("decimal(38,0)")
    )
    return r.groupBy(F.col("nationkey").cast("int").alias("nationkey")).agg(
        F.max("n").cast("bigint").alias("n_customers"),
        (
            num.cast("double")
            / (
                F.max("n").cast("double")
                * F.sum("cents").cast("decimal(38,0)").cast("double")
            )
        ).alias("gini"),
    )
