"""Continuous sync: streaming change detection driving targeted repairs.

The reference's incremental story is "re-run the tool, fingerprints skip
clean partitions" — still a full fingerprint scan of BOTH sides per run
(copy/copy.go:194-271). This module does better using the file-source
checkpoint: each run,

1. an ``availableNow`` stream over the SOURCE directory processes only
   files added since the last run and emits the partition values they
   touch (no full scan of the source);
2. only those partitions are re-fingerprinted and re-synced (the sync
   scan is pruned to the touched partitions).

Unchanged partitions cost ZERO I/O — neither side reads them. At 100 TB
with append-mostly sources this turns every sync after the first into
work proportional to the delta, not the table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_table_copier_spark.operators.sync import SyncOptions, SyncResult, sync
from clickhouse_table_copier_spark.plans.partition_spec import PartitionSpec


@dataclass
class ContinuousSyncResult:
    touched_partitions: list
    sync_result: SyncResult | None  # None when nothing changed


def _touched_partitions(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    spec: PartitionSpec,
    checkpoint_dir: str,
    staging_dir: str,
) -> list:
    """Partition values present in files added since the last run."""
    # stateless: per micro-batch, record the DISTINCT partition keys of the
    # new rows (no streaming aggregation state — 'complete'/'update' modes
    # would re-emit or accumulate history)
    try:
        prev_max = (
            spark.read.parquet(staging_dir)
            .agg(F.max("batch_id").alias("b"))
            .collect()[0]["b"]
        )
        prev_max = -1 if prev_max is None else prev_max
    except Exception:
        prev_max = -1

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "128")
        .parquet(source_dir)
    )
    keyed = spec.with_partition_columns(stream).select(*spec.names)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.distinct().withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(staging_dir)

    q = (
        keyed.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        staged = spark.read.parquet(staging_dir)
    except Exception:
        return []  # no batches ever written
    rows = (
        staged.where(F.col("batch_id") > prev_max)
        .select(*spec.names)
        .distinct()
        .collect()
    )
    return [tuple(r[n] for n in spec.names) for r in rows]


def incremental_sync(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    dest_path: str,
    spec: PartitionSpec,
    checkpoint_dir: str,
    staging_dir: str,
    options: SyncOptions = SyncOptions(),
) -> ContinuousSyncResult:
    """One continuous-sync tick: detect touched partitions, repair them.

    The source read for the repair is FILTERED to the touched partitions
    before sync — pruning both the fingerprint pass and the write. A
    never-before-seen checkpoint (first run) touches everything, which
    degenerates to a plain full sync: correct bootstrap behavior.
    """
    touched = _touched_partitions(
        spark, source_dir, schema, spec, checkpoint_dir, staging_dir
    )
    if not touched:
        return ContinuousSyncResult(touched_partitions=[], sync_result=None)

    src = spark.read.parquet(source_dir)
    src_parts = spec.with_partition_columns(src)
    key = F.struct(*[F.col(n) for n in spec.names])
    pruned = src_parts.where(
        key.isin([F.struct(*[F.lit(v) for v in k]) for k in touched])
    )
    # hand sync a plain source frame: drop only DERIVED partition columns
    # (bare-column keys ARE data columns and must stay)
    derived = [f.name for f in spec.fields if f.expr != f.name]
    if derived:
        pruned = pruned.drop(*derived)
    result = sync(spark, pruned, dest_path, spec, options)
    return ContinuousSyncResult(touched_partitions=touched, sync_result=result)
