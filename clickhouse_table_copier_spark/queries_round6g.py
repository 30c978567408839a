"""Query batch: round-6g — changelog GENERATION from snapshot pairs.

``cdc_merge_apply`` (round 5) consumes a changelog; this is its
inverse: given two snapshots of a keyed table and no change feed at
all, derive the row-level changelog (insert / update / delete per key)
— how a copier backfills CDC when the source system never produced
one. One full-outer hash join on the key, verdict per row from null
sides + value comparison; the same single-join shape as the engine's
partition-level diff (operators/diff.py), pushed down to row
granularity.

Snapshot B is derived deterministically from the fixture (delete keys
≡0 mod 97, shift o_totalprice by +1.0 for keys ≡0 mod 89, insert
key+10⁷ copies for keys ≡0 mod 83), so the static oracle reproduces it
exactly; the update arithmetic is a plain double add — no round(),
whose half-way rule differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register

_SNAPSHOT_B_SQL = """
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 83 = 0
"""


def _snapshot_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    survivors = o.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + F.lit(1.0)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    inserts = o.where(F.col("o_orderkey") % 83 == 0).select(
        (F.col("o_orderkey") + F.lit(10000000)).alias("o_orderkey"),
        "o_orderstatus",
        "o_totalprice",
    )
    return survivors.unionAll(inserts)


@register(
    "snapshot_changelog",
    oracle=f"""
    WITH b AS ({_SNAPSHOT_B_SQL}),
    j AS (
      SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
             CASE WHEN a.o_orderkey IS NULL THEN 'I'
                  WHEN b.o_orderkey IS NULL THEN 'D'
                  WHEN a.o_totalprice <> b.o_totalprice
                    OR a.o_orderstatus <> b.o_orderstatus THEN 'U'
             END AS op,
             b.o_totalprice AS new_totalprice
      FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    )
    SELECT o_orderkey, op, new_totalprice FROM j WHERE op IS NOT NULL
    """,
)
def q_snapshot_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .alias("a")
    )
    b = _snapshot_b(spark, sf_dir).alias("b")
    op = (
        F.when(F.col("a.o_orderkey").isNull(), F.lit("I"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("D"))
        .when(
            (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus")),
            F.lit("U"),
        )
    )
    return (
        a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
        .select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
                "o_orderkey"
            ),
            op.alias("op"),
            F.col("b.o_totalprice").alias("new_totalprice"),
        )
        .where(F.col("op").isNotNull())
    )
