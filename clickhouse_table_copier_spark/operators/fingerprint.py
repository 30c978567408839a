"""Order-insensitive partition fingerprints (SURVEY §2.4 A1-A3).

The reference's signature operator: per partition it computes
``SELECT groupBitXor(cityHash64(*)) FROM (SELECT cols … WHERE partition)``
(``/root/reference/database/database.go:509-551``) — one round-trip per
partition per side, sequentially from a driver loop.

The Spark-first formulation computes ALL partitions' fingerprints in one
grouped aggregation per side:

    df.groupBy(partition_cols).agg(count(*), bit_xor(xxhash64(cols…)))

XOR is commutative/associative, so the fingerprint is row-order- and
partitioning-insensitive, and Spark executes it as a partial (map-side)
XOR followed by a final XOR per key — no row ever crosses the network, only
64-bit partials. At 100 TB this is a single scan with a tiny shuffle
(#partitions × 16 bytes), versus the reference's O(#partitions) round trips.

Hash-comparability contract (SURVEY §7.5): both sides must hash
identically-ordered, identically-typed columns. Callers pass the aligned
column list (plans.casting.align on the source side) so the bytes hashed
match what the destination stores — mirroring how the reference hashes
*cast* values via destinationValues (copy/copy.go:221).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.functions.scalars import row_hash
from clickhouse_table_copier_spark.plans.partition_spec import PartitionSpec


def table_fingerprint(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A3 over the whole table: one row, columns (rows, fingerprint)."""
    cols = cols or df.columns
    return df.select(row_hash(*cols).alias("h")).agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor("h").alias("fingerprint"),
    )


def file_fingerprints(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-physical-file (rows, fingerprint) — the ``use_virtual_column``
    mode (C7): the reference's ``WHERE _part='…'`` unit of work
    (copy/copy.go:207-211) mapped to Spark's ``_metadata.file_path``.

    File-granular fingerprints let a sync skip at file level even when the
    logical partition is coarse — useful when partitions are huge and
    files are the real unit of re-copy.
    """
    cols = cols or df.columns
    return (
        df.select(
            F.col("_metadata.file_path").alias("file_path"),
            row_hash(*cols).alias("__h"),
        )
        .groupBy("file_path")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor("__h").alias("fingerprint"),
        )
    )


def partition_fingerprints(
    df: DataFrame,
    spec: PartitionSpec,
    cols: list[str] | None = None,
) -> DataFrame:
    """A2+A3 for every partition at once: (partition…, rows, fingerprint).

    The set-oriented replacement for the reference's per-partition
    GetPartitionHashAsync loop (database.go:532-551, copy/copy.go:217-232).
    """
    cols = cols or df.columns
    # a pre-existing __h would make the appended hash column ambiguous
    # in the bit_xor below (select appends; the old withColumn replaced)
    assert "__h" not in df.columns, "input already has a __h column"
    with_parts = spec.with_partition_columns(df)
    # select, not withColumn: every Dataset transformation eagerly
    # re-analyzes the plan JVM-side (~25 ms each on the growing diff
    # lineage); one select keeps the per-call driver cost flat
    return (
        with_parts.select("*", row_hash(*cols).alias("__h"))
        .groupBy(*spec.names)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor("__h").alias("fingerprint"),
        )
    )
