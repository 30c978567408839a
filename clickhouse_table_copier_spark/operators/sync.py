"""The sync engine (SURVEY §2.7 D1-D2, §2.9 C5-C7): make dest match source.

Reference algorithm (``/root/reference/copy/copy.go:139-271``): per source
partition — probe dest count, compare fingerprints, then delete
(``ALTER TABLE … DELETE``, database.go:463-484) and re-copy
(``INSERT … SELECT … FROM remote(…)``, database.go:486-507) according to the
``skip_delete`` / ``skip_reimport`` / ``check_hashes`` flags
(config/config.go:34-37).

Spark-first formulation — three set-oriented steps instead of a
per-partition loop:

1. ``diff_partitions`` → verdict per partition (one grouped agg per side +
   a tiny join; see operators.diff).
2. ONE dynamic-partition-overwrite write of all partitions needing data
   (``copy`` + ``inconsistent`` unless flags say otherwise). Dynamic
   overwrite replaces exactly the partitions present in the written
   DataFrame — the reference's delete-then-reinsert window becomes a single
   atomic-per-partition step, strictly better (no moment where the
   partition is empty).
3. Optional directory deletes for the delete-only path
   (``skip_reimport`` without ``skip_delete``).

At scale: the data write shuffles nothing (read → filter partitions →
write partitioned); the verdict plan reuses the already-computed stats.
The partition-pruning filter (``isin`` over verdict partitions) prunes the
source scan when the source itself is partition-laid-out.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.operators.diff import Verdict, diff_partitions
from clickhouse_table_copier_spark.plans.partition_spec import PartitionSpec


@dataclass(frozen=True)
class SyncOptions:
    """The reference's four behavior flags (config/config.go:34-37)."""

    check_hashes: bool = True  # C6: fingerprint vs row-count compare
    skip_delete: bool = False  # C5: don't delete inconsistent partitions
    skip_reimport: bool = False  # C5: don't re-copy after delete
    dry_run: bool = False  # C11: --info mode — report only


@dataclass
class SyncResult:
    report: DataFrame  # partition, src_rows, dest_rows, verdict, action
    copied_partitions: int
    deleted_partitions: int


def _dest_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def _delete_partition_dirs(spark: SparkSession, dest_path: str, spec: PartitionSpec, part_rows) -> int:
    """Remove hive-style partition directories — the engine's
    ``ALTER TABLE … DELETE WHERE partition`` for the delete-only path."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(dest_path).getFileSystem(conf)
    deleted = 0
    for row in part_rows:
        subdir = "/".join(f"{n}={row[n]}" for n in spec.names)
        p = jvm.org.apache.hadoop.fs.Path(f"{dest_path.rstrip('/')}/{subdir}")
        if fs.exists(p):
            fs.delete(p, True)
            deleted += 1
    return deleted


def sync(
    spark: SparkSession,
    src: DataFrame,
    dest_path: str,
    spec: PartitionSpec,
    options: SyncOptions = SyncOptions(),
    semantic: dict | None = None,
) -> SyncResult:
    """Synchronize a hive-partitioned parquet destination with ``src``.

    Returns the per-partition report (the --info output, C11) plus action
    counts. ``dry_run`` computes the identical report with no writes —
    exactly the reference's Info()/Copy() split (copy/copy.go:12 vs :139).
    """
    if semantic:
        # canonicalize UUID/IP/JSON columns before hashing/writing —
        # cast-before-hash comparability (copy/copy.go:221)
        from clickhouse_table_copier_spark.plans.casting import apply_semantic

        src = apply_semantic(src, semantic)
    src_parts = spec.with_partition_columns(src)
    data_cols = [c for c in src.columns if c not in spec.names]

    if not _dest_exists(spark, dest_path):
        # Destination absent → everything is a 'copy' (copy.go:262-266).
        report = (
            src_parts.groupBy(*spec.names)
            .agg(F.count(F.lit(1)).alias("src_rows"))
            .withColumn("dest_rows", F.lit(None).cast("bigint"))
            .withColumn("verdict", F.lit(Verdict.COPY.value))
            .withColumn("action", F.lit("copied" if not options.dry_run else "none"))
        )
        copied = 0
        if not options.dry_run:
            src_parts.write.partitionBy(*spec.names).mode("overwrite").parquet(dest_path)
            copied = report.count()
        return SyncResult(report=report, copied_partitions=copied, deleted_partitions=0)

    dest = spark.read.parquet(dest_path)
    # Hash-comparability contract (SURVEY §7.5): compare in the
    # DESTINATION's type domain, the direction the reference hashes — the
    # source goes through the same dest-type cast exprs it would INSERT
    # with (copy/copy.go:217-221) and the dest is hashed raw. The other
    # direction (casting dest back to source types) diverges under any
    # lossy cast: a just-repaired partition (written as dest types) would
    # re-hash 'inconsistent' on every subsequent run and sync would never
    # converge. Partition columns read back from hive directory names are
    # re-cast to the source spec's types so the diff join keys align.
    src_types = dict(src_parts.dtypes)
    dest_types = dict(dest.dtypes)
    common = [c for c in data_cols if c in dest.columns]
    src_cmp = src_parts.select(
        *spec.names,
        *[F.col(c).cast(dest_types[c]).alias(c) for c in common],
    )
    dest_norm = dest.select(
        *[F.col(n).cast(src_types[n]).alias(n) for n in spec.names],
        *common,
    )

    report = diff_partitions(
        src_cmp,
        dest_norm,
        PartitionSpec.bare(*spec.names),
        cols=common,
        check_hashes=options.check_hashes,
    )

    action = (
        F.when(F.col("verdict") == Verdict.COPY.value, F.lit("copied"))
        .when(
            (F.col("verdict") == Verdict.INCONSISTENT.value)
            & F.lit(not options.skip_delete)
            & F.lit(not options.skip_reimport),
            F.lit("overwritten"),
        )
        .when(
            (F.col("verdict") == Verdict.INCONSISTENT.value)
            & F.lit(options.skip_delete)
            & F.lit(not options.skip_reimport),
            F.lit("appended"),
        )
        .when(
            (F.col("verdict") == Verdict.INCONSISTENT.value)
            & F.lit(not options.skip_delete)
            & F.lit(options.skip_reimport),
            F.lit("deleted"),
        )
        .otherwise(F.lit("none"))
    )
    report = report.withColumn(
        "action", action if not options.dry_run else F.lit("none")
    )

    if options.dry_run:
        return SyncResult(report=report, copied_partitions=0, deleted_partitions=0)

    # Materialize the report NOW: it lazily references the destination
    # files this sync is about to replace. One collect of metadata-sized
    # rows (the reference holds the same list from system.parts).
    report_rows = report.collect()
    report = spark.createDataFrame(report_rows, report.schema)

    # What gets WRITTEN is the reference's S6 insert: the common columns,
    # cast to the DESTINATION's types (INSERT INTO dest (cols) SELECT
    # castExprs — database.go:486-507), so repaired partitions stay
    # readable under the destination's schema. Source-only columns are
    # not copied; dest-only columns are absent from rewritten partitions
    # (parquet's honest analogue of ClickHouse filling defaults —
    # readers see NULLs via schema merging).
    src_parts = src_parts.select(
        *spec.names,
        *[F.col(c).cast(dest_types[c]).alias(c) for c in common],
    )

    # Driver-side partition lists are metadata-sized (the reference collects
    # the same lists from system.parts, database.go:390-417).
    to_write = report.where(F.col("action").isin("copied", "overwritten")).select(*spec.names)
    write_keys = [tuple(r[n] for n in spec.names) for r in to_write.collect()]
    copied = deleted = 0

    if write_keys:
        # ONE dynamic-partition-overwrite write for every partition that
        # needs data — replaces the reference's per-partition
        # delete+insert round trips (D1+D2 fused, atomic per partition).
        key_col = F.struct(*[F.col(n) for n in spec.names])
        filtered = src_parts.where(
            key_col.isin([F.struct(*[F.lit(v) for v in k]) for k in write_keys])
        )
        # partitionOverwriteMode is forced per-write (overrides the session
        # conf): under Spark's default STATIC mode this overwrite would
        # delete every dest partition not in the written set — silent data
        # loss for library callers who built their own SparkSession.
        (
            filtered.write.partitionBy(*spec.names)
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(dest_path)
        )
        copied = len(write_keys)

    append_rows = report.where(F.col("action") == "appended").select(*spec.names).collect()
    if append_rows:
        keys = [tuple(r[n] for n in spec.names) for r in append_rows]
        key_col = F.struct(*[F.col(n) for n in spec.names])
        src_parts.where(
            key_col.isin([F.struct(*[F.lit(v) for v in k]) for k in keys])
        ).write.partitionBy(*spec.names).mode("append").parquet(dest_path)
        copied += len(keys)

    delete_rows = report.where(F.col("action") == "deleted").collect()
    if delete_rows:
        deleted = _delete_partition_dirs(spark, dest_path, spec, delete_rows)

    return SyncResult(report=report, copied_partitions=copied, deleted_partitions=deleted)
