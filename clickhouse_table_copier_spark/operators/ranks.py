"""Exact distributed ranking — global ntile without a global sort.

Factored out of ``queries_round4.q_equi_depth_deciles`` (the r4 verdict's
scale fix for ``ntile() OVER ()``) so any query needing exact global
quantile membership (RFM scoring, calibration deciles, …) reuses ONE
audited mechanism instead of re-inlining it:

1. a mergeable ``percentile_approx`` sketch picks ~``parts`` boundary
   values — the sketch only *partitions* rows, so its error never
   reaches the output;
2. rows bucket by boundary comparison (pure expression) and a window
   PARTITIONED BY bucket computes local ranks — ≈ n/parts rows per task
   instead of n through one;
3. per-bucket counts (≤ ``parts`` rows, metadata-sized collect) become
   cumulative offsets: global rank = offset + local rank;
4. exact ntile arithmetic (the first n % k tiles get one extra row)
   maps ranks to tiles — bit-identical to ``ntile(k) OVER (ORDER BY
   value, tie)`` in DuckDB/ANSI engines.

Reference parity: the Go reference executes no ranking at all
(database/database.go generates metadata SQL only); this is part of the
engine's analytics superset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_global_ntile(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    n_tiles: int,
    out_col: str,
    parts: int = 32,
) -> DataFrame:
    """Append ``out_col`` = exact ``ntile(n_tiles)`` of ``df`` rows under
    the total order ``(value_col, tie_col)``, without funneling rows
    through a single-task global sort. ``tie_col`` must make the order
    total (unique within equal values) or tile membership at tile
    boundaries is engine-dependent."""
    pcts = [i / parts for i in range(1, parts)]
    bounds_row = df.agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(p) for p in pcts]), 1000
        ).alias("bs")
    ).collect()[0]  # metadata-sized: parts-1 scalars, row-count independent
    raw = bounds_row["bs"] or []
    bounds = sorted({float(b) for b in raw if b is not None})

    if bounds:
        # Flat sum of CASE WHENs, not an F.aggregate lambda: higher-order
        # functions evaluate interpreted outside whole-stage codegen
        # (SCALE.md, round-7 ladder), and this expression runs once per
        # input row. len(bounds) <= parts-1, so the codegen'd expression
        # stays small.
        bucket: Column = F.lit(0)
        for b in bounds:
            bucket = bucket + F.when(
                F.col(value_col) > b, F.lit(1)
            ).otherwise(F.lit(0))
    else:  # degenerate domain: every row in one bucket
        bucket = F.lit(0)

    wloc = Window.partitionBy("__b").orderBy(value_col, tie_col)
    local = df.withColumn("__b", bucket).withColumn(
        "__lr", F.row_number().over(wloc)
    )

    cnt_rows = local.groupBy("__b").agg(F.count(F.lit(1)).alias("c")).collect()
    cnt = {int(r["__b"]): int(r["c"]) for r in cnt_rows}
    n = sum(cnt.values())
    offsets, acc = {}, 0
    for b in sorted(cnt):
        offsets[b] = acc
        acc += cnt[b]
    off_expr: Column = F.lit(0)
    for b, o in offsets.items():
        off_expr = F.when(F.col("__b") == b, F.lit(o)).otherwise(off_expr)

    s, r = n // n_tiles, n % n_tiles
    pivot = r * (s + 1)
    rank = off_expr + F.col("__lr")
    tile = (
        F.when(rank <= pivot, F.ceil(rank / F.lit(s + 1)))
        .otherwise(F.lit(r) + F.ceil((rank - pivot) / F.lit(max(s, 1))))
        .cast("int")
    )
    return local.withColumn(out_col, tile).drop("__b", "__lr")
