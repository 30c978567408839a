"""Query batch: round-6e — relational-surface completions.

- ``flag_month_unpivot`` — the UNPIVOT/melt surface (Spark's
  ``DataFrame.unpivot``), shown as the inverse of the engine's pivot
  query: the wide per-month flag matrix melts back to tidy
  (month, flag, cnt) rows equal to the plain grouped count.
- ``source_lang_chi2`` — χ² independence statistic over the
  (source, lang) contingency table. Row/column/grand totals are window
  sums over the CELLS frame (contingency-table-sized — sources×langs
  rows at any data scale, so even its unordered global window moves a
  bounded frame); each cell's χ² term is quantized to a floor 1e-9 grid
  and summed as integers, so the cross-engine result is exact despite
  the per-cell double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register


# ---------------------------------------------------------------------------
# UNPIVOT: melt the wide flag-count matrix back to tidy rows. The wide
# frame is month-keyed (≤ 12 rows after its aggregate) so the melt is
# free; the point is the surface — wide→long without hand-written
# UNION ALL per column, and provably the inverse of the pivot (the
# oracle is the plain grouped count the pivot started from).
# ---------------------------------------------------------------------------
@register(
    "flag_month_unpivot",
    oracle="""
    SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
           'flag_' || lower(l_returnflag) AS flag,
           count(*) AS cnt
    FROM lineitem GROUP BY 1, 2
    """,
)
def q_flag_month_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "lineitem")
    wide = df.groupBy(
        F.expr("CAST(month(l_shipdate) AS INT)").alias("ship_month")
    ).agg(
        F.count(F.when(F.col("l_returnflag") == "A", 1)).alias("flag_a"),
        F.count(F.when(F.col("l_returnflag") == "N", 1)).alias("flag_n"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("flag_r"),
    )
    long = wide.unpivot(
        ids=["ship_month"],
        values=["flag_a", "flag_n", "flag_r"],
        variableColumnName="flag",
        valueColumnName="cnt",
    )
    # the pivot materializes absent cells as 0; the tidy form has no row
    return long.where(F.col("cnt") > 0)


# ---------------------------------------------------------------------------
# χ² independence over (source, lang): the corpus-QA statistic for "is
# language mix independent of source" (a drifted source shows up as a
# large cell term). e = r·c/t, so (o−e)²/e = (o·t − r·c)²/(r·c·t) —
# numerator exact in int64 at the cell level, ONE double chain per cell
# rendered identically in both engines ((1e9·x)·x then /((r·c)·t),
# left-associative), floor-quantized and summed as integers.
# ---------------------------------------------------------------------------
_CHI2_TERM_SQL = (
    "CAST(floor(((1e9 * CAST(o * t - r * c AS DOUBLE))"
    " * CAST(o * t - r * c AS DOUBLE))"
    " / ((CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) * CAST(t AS DOUBLE)))"
    " AS BIGINT)"
)


@register(
    "source_lang_chi2",
    oracle=f"""
    WITH cells AS (
      SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2
    ),
    aug AS (
      SELECT source, lang, o,
             sum(o) OVER (PARTITION BY source) AS r,
             sum(o) OVER (PARTITION BY lang) AS c,
             sum(o) OVER () AS t
      FROM cells
    )
    SELECT CAST(sum({_CHI2_TERM_SQL}) AS BIGINT) AS chi2_q9_sum,
           count(*) AS n_cells,
           (count(DISTINCT source) - 1) * (count(DISTINCT lang) - 1) AS dof
    FROM aug
    """,
)
def q_source_lang_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = (
        _t(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    aug = cells.select(
        "source",
        "lang",
        "o",
        F.sum("o").over(Window.partitionBy("source")).alias("r"),
        F.sum("o").over(Window.partitionBy("lang")).alias("c"),
        # unordered global window over the CELLS frame — bounded by
        # sources×langs at any SF (the documented dimension-frame case)
        F.sum("o").over(Window.partitionBy()).alias("t"),
    )
    term = F.expr(_CHI2_TERM_SQL)
    return aug.agg(
        F.sum(term).alias("chi2_q9_sum"),
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.count_distinct("source") - F.lit(1))
            * (F.count_distinct("lang") - F.lit(1))
        ).alias("dof"),
    )
