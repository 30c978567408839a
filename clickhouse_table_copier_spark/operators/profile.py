"""Table profiling — per-column stats in one pass (long format).

The engine-side analogue of ClickHouse's ``DESCRIBE`` + ``system.columns``
statistics (row counts, null counts, distinct counts, value bounds): the
input a sync/migration tool consults before choosing partition keys and
cast plans, and the first step of any data-quality gate.

One aggregation computes every column's stats (Catalyst evaluates them in
a single scan); ``stack`` unpivots the 1-row wide result into the long
(col_name, stats...) table. ``n_distinct`` is exact (count distinct per
column in the same pass); value bounds are rendered to strings by a
caller-supplied formatter per column so heterogeneous types coexist in
one output column deterministically.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str],
    fmt: dict[str, Callable[[Column], Column]] | None = None,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_val, max_val) per column.

    ``fmt``: optional per-column renderer Column→string Column for the
    min/max bounds (default: plain string cast). Use an explicit format
    for doubles/timestamps when cross-engine string parity matters.
    """
    fmt = fmt or {}

    def render(c: str, col: Column) -> Column:
        f = fmt.get(c)
        return f(col) if f is not None else col.cast("string")

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            render(c, F.min(c)).alias(f"__mn_{c}"),
            render(c, F.max(c)).alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_val, max_val)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "col_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_val",
        "max_val",
    )
