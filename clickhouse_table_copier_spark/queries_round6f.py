"""Query batch: round-6f — schema evolution across file generations.

A long-lived table accretes columns; old files simply lack them. The
copier has handled column drift at the CAST level since round 1
(plans/casting.py §1.3 matrix); this operator exercises the FILE level:
two parquet generations — gen1 written before ``l_tax`` existed, gen2
after — read as ONE table via ``mergeSchema``, with the missing column
null-filled for gen1 rows exactly as a metastore backfill would.

The generations are derived deterministically from the fixture (gen1 =
even order keys without the column, gen2 = odd with it), so the static
DuckDB oracle reproduces the same union with CASE arithmetic — no temp
paths leak into the oracle SQL.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register

_EVOLVED_LAYOUT_CACHE: dict = {}


def evolved_generations_path(spark: SparkSession, sf_dir: str) -> str:
    """Write the two generations once per (session, sf_dir): gen1
    lacks ``l_tax`` (pre-evolution files), gen2 carries it."""
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    path = _EVOLVED_LAYOUT_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="ctc_evolved_") + "/lineitem_gens"
        li = _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_shipdate", "l_tax"
        )
        (
            li.where(F.col("l_orderkey") % 2 == 0)
            .drop("l_tax")
            .write.parquet(f"{path}/gen=1")
        )
        li.where(F.col("l_orderkey") % 2 == 1).write.parquet(f"{path}/gen=2")
        _EVOLVED_LAYOUT_CACHE[key] = path
    return path


@register(
    "schema_evolution_read",
    oracle="""
    SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
           count(*) AS cnt,
           count(CASE WHEN l_orderkey % 2 = 1 THEN 1 END) AS rows_with_tax,
           CAST(sum(CASE WHEN l_orderkey % 2 = 1
                         THEN CAST(l_tax AS DECIMAL(18,2)) END) AS DOUBLE)
             AS tax_sum
    FROM lineitem GROUP BY 1
    """,
)
def q_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mergeSchema unions the generations' footers at planning time —
    per-file, not per-row, so the cost is one footer read per file even
    with millions of files; gen1 rows surface l_tax as NULL. The
    partition column ``gen`` comes free from the directory layout."""
    path = evolved_generations_path(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    return merged.groupBy(
        F.expr("CAST(month(l_shipdate) AS INT)").alias("ship_month")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count("l_tax").alias("rows_with_tax"),
        F.sum(F.col("l_tax").cast("decimal(18,2)"))
        .cast("double")
        .alias("tax_sum"),
    )
