"""Per-partition statistics (SURVEY §2.1 S4 / §2.4 A4 / §2.5 O1).

The reference enumerates partitions from ``system.parts`` with a grouped
aggregation — ``sum(rows)``, ``sum(bytes)``, ``min_time``/``max_time``,
``max(modification_time)``, ``any(engine)``, ordered ``bytes_size DESC``
(``/root/reference/database/database.go:390-417``). ClickHouse maintains
that metadata table; on parquet the engine computes the same stats with ONE
grouped scan over the data — which Catalyst evaluates with a partial/final
hash aggregate, so at 100 TB it is a single map-side-combined pass, not a
per-partition loop.

Largest-first ordering (database.go:409) is preserved: it is the
longest-job-first schedule that minimizes makespan when partition copies
run in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.plans.partition_spec import PartitionSpec


def partition_stats(
    df: DataFrame,
    spec: PartitionSpec,
    time_col: str | None = None,
    size_cols: list[str] | None = None,
) -> DataFrame:
    """Partition listing: rows, approx bytes, time bounds per partition.

    Output columns: partition key fields + ``rows``, ``bytes_size``,
    ``min_time``, ``max_time`` — the engine's ``system.parts`` view.
    ``bytes_size`` approximates in-memory width from the schema (parquet
    doesn't expose per-row bytes through SQL; the *ordering* property A4/O1
    needs is monotone-in-rows, which this is).
    """
    with_parts = spec.with_partition_columns(df)
    aggs = [F.count(F.lit(1)).alias("rows")]
    # Width estimate: fixed-width fields by type size, strings/arrays by
    # measured length — cheap, JVM-side, good enough for largest-first order.
    width_terms = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t in ("bigint", "double", "timestamp", "timestamp_ntz"):
            width_terms.append(F.lit(8))
        elif t in ("int", "float", "date"):
            width_terms.append(F.lit(4))
        elif t in ("smallint",):
            width_terms.append(F.lit(2))
        elif t in ("tinyint", "boolean"):
            width_terms.append(F.lit(1))
        elif t == "string":
            width_terms.append(F.coalesce(F.length(F.col(f.name)), F.lit(0)))
        else:
            width_terms.append(F.lit(16))
    row_width = width_terms[0]
    for term in width_terms[1:]:
        row_width = row_width + term
    aggs.append(F.sum(row_width).cast("bigint").alias("bytes_size"))
    if time_col is not None:
        aggs.append(F.min(time_col).alias("min_time"))
        aggs.append(F.max(time_col).alias("max_time"))
    return (
        with_parts.groupBy(*spec.names)
        .agg(*aggs)
        .orderBy(F.desc("bytes_size"))  # largest-first (database.go:409)
    )
