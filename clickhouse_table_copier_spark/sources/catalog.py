"""Metadata scans (SURVEY §2.1 S2-S5, §2.2 P6).

The reference issues five metadata queries per table when building its
``tableSettings`` (``/root/reference/database/database.go:52-62``):
EXISTS, DESCRIBE, system.tables info, count(*), and a grouped scan of
``system.parts``. Spark equivalents: schema from the parquet footer /
catalog, existence from the filesystem/catalog, counts and partition stats
as grouped aggregations (see ``operators.partition_stats``).

Everything here returns driver-side metadata (small), mirroring the
reference's rule that only metadata — never data rows — enters the tool's
process (SURVEY §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouse_table_copier_spark.sources.table import TableRef, load_table


def describe_table(df: DataFrame) -> list[tuple[str, str]]:
    """Ordered (name, type) pairs — DESCRIBE TABLE (database.go:322-330)."""
    return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]


def table_exists(spark: SparkSession, ref: TableRef) -> bool:
    """Existence probe — `EXISTS db.tbl` (database.go:342-364)."""
    if ref.fmt == "parquet":
        # Use the Hadoop FS API through the JVM so this works for any
        # supported filesystem (local, HDFS, s3a), not just local paths.
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(ref.location)
        return path.getFileSystem(conf).exists(path)
    try:
        load_table(spark, ref).schema
        return True
    except Exception:
        return False


def row_count(df: DataFrame) -> int:
    """Total row count — `SELECT count(*)` (database.go:366-388, A1)."""
    return df.count()
