"""Partition predicate generation (SURVEY §2.2 P3-P5).

The reference's ``GenerateWhere`` (``/root/reference/database/
sidefunctions.go:194-236``) builds WHERE text per partition:

- equality per key component, AND-joined for tuple keys (``:218-224``,
  ``:227-231``) — note the reference's ``tmp = +1`` bug breaks AND-joining
  beyond two keys; this engine implements the *intended* any-arity AND.
- a time-range branch for Date/DateTime keys using the partition's min/max
  bounds (``:215-220``), with an epoch-zero sentinel that hardcodes
  ``+03:00`` (``:216``) — replaced here by honest NULL-bound handling under
  the session timezone.
- a ``_part='…'`` virtual-column mode (``copy/copy.go:207-211``) — mapped to
  Spark's ``_metadata.file_path`` pseudo-column.

Everything returns Column expressions, so Catalyst pushes them into the
parquet/JDBC scan (partition pruning + predicate pushdown for free).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.plans.partition_spec import PartitionField, PartitionSpec


def equality_predicate(spec: PartitionSpec, values: list) -> Column:
    """P3: ``key1=v1 AND key2=v2 AND …`` for any key arity.

    Fixes the reference's two-key limit (sidefunctions.go:231 ``tmp = +1``).
    """
    if len(values) != len(spec.fields):
        raise ValueError(
            f"partition value arity {len(values)} != key arity {len(spec.fields)}"
        )
    preds = [F.expr(f.expr).eqNullSafe(F.lit(v)) for f, v in zip(spec.fields, values)]
    return reduce(lambda a, b: a & b, preds)


def time_range_predicate(
    field: PartitionField, min_time, max_time
) -> Column:
    """P4: ``src_col >= min AND src_col <= max`` for temporal partition keys.

    The reference emits ``key >= toDateTime(min) AND key <= toDateTime(max)``
    from the partition's recorded bounds (sidefunctions.go:215-218), falling
    back to equality on the raw key expression when bounds are the epoch-zero
    sentinel (``:216``, with its hardcoded ``+03:00`` bug). Here: if either
    bound is NULL/None the caller falls back to equality_predicate on the
    derived key — no timezone-dependent sentinel.
    """
    if field.source_col is None:
        raise ValueError(f"field {field.name} has no raw source column for range predicate")
    c = F.col(field.source_col)
    return (c >= F.lit(min_time).cast("timestamp_ntz")) & (
        c <= F.lit(max_time).cast("timestamp_ntz")
    )


def partition_predicate(
    spec: PartitionSpec,
    values: list,
    bounds: dict[str, tuple] | None = None,
) -> Column:
    """Full GenerateWhere: per-field, range branch for temporal fields with
    known bounds, equality otherwise; AND-joined across the tuple.

    ``bounds`` maps field name → (min_time, max_time) when partition stats
    recorded real bounds (A4 provides them).
    """
    preds: list[Column] = []
    for f, v in zip(spec.fields, values):
        b = (bounds or {}).get(f.name)
        if f.is_temporal and b is not None and b[0] is not None and b[1] is not None:
            preds.append(time_range_predicate(f, b[0], b[1]))
        else:
            preds.append(F.expr(f.expr).eqNullSafe(F.lit(v)))
    return reduce(lambda a, b: a & b, preds)


def virtual_column_predicate(part_file: str) -> Column:
    """P5: the ``WHERE _part='name'`` mode (copy/copy.go:207-211).

    Spark's physical-file pseudo-column is ``_metadata.file_path``; matching
    on suffix tolerates absolute-vs-relative path rendering.
    """
    return F.col("_metadata.file_path").endswith(part_file)
