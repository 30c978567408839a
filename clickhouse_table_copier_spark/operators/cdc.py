"""Batch CDC: apply an upsert/delete changelog to a base table.

The reference copies whole partitions (copy/copy.go); real sync pipelines
also need the finer-grained primitive: given a BASE snapshot and a
CHANGELOG of keyed mutations (op ∈ {U, D} with a monotonically increasing
sequence number per key — the shape every CDC source emits: Debezium,
ClickHouse's ReplacingMergeTree (version, is_deleted), Delta CDF), produce
the post-image. This is SQL MERGE / ReplacingMergeTree FINAL semantics as
one declarative plan.

Scale shape: one partitioned window over the changelog (rn=1 per key by
seq desc — last writer wins) + one full-outer hash join against the base
on the key. Both shuffle only on the key; no driver-side state. At 100 TB
the base side is the big one and the changelog is the small delta —
exactly the asymmetry AQE's broadcast conversion exploits when the delta
fits, and a plain shuffle join handles when it doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Post-image of ``base`` after ``changes``: latest op per key wins;
    ``U`` upserts the change row's payload columns, ``D`` deletes the key.
    Payload columns are every base column except the key; the changelog
    must carry the same payload columns (nullable for deletes).
    """
    payload = [c for c in base.columns if c != key]
    w = Window.partitionBy(key).orderBy(F.desc(seq_col))
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            key,
            F.col(op_col).alias("__op"),
            *[F.col(c).alias(f"__chg_{c}") for c in payload],
        )
    )
    merged = base.join(latest, key, "full_outer")
    alive = merged.where(F.col("__op").isNull() | (F.col("__op") != F.lit("D")))
    return alive.select(
        key,
        *[
            F.when(F.col("__op") == "U", F.col(f"__chg_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
    )
