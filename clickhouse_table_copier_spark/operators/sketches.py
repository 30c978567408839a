"""Mergeable frequency sketches — the two-pass heavy-hitters pattern for
100 TB term statistics.

Pass 1 runs a Misra-Gries summary per partition: a bounded dict of at
most ``k`` counters maintained across that partition's Arrow batches
(``mapInPandas`` — the documented stateful-sketch on-ramp; each batch is
pre-aggregated with a vectorized ``value_counts`` before touching the
dict, so the Python work is per-distinct-value, not per-row). Summaries
merge by pointwise addition followed by subtracting the (k+1)-th largest
counter from all and dropping non-positives (the mergeable-summaries
rule, Agarwal et al., PODS 2012); the total undercount is bounded by
n/(k+1), so every value with true frequency > n/(k+1) survives with a
positive merged counter.

Pass 2 exactly recounts ONLY the surviving candidates (a semi-join — the
candidate set is ≤ k·partitions rows, broadcastable), so the final top-N
is exact whenever the true top-N frequencies exceed n/(k+1). At 100 TB
this replaces a full-vocabulary shuffle with a sketch whose size is
independent of the vocabulary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_MG_SCHEMA = StructType(
    [StructField("value", StringType()), StructField("lb", LongType())]
)


def _mg_merge(counters: dict[str, int], other: dict[str, int], k: int) -> dict[str, int]:
    """Merge two Misra-Gries summaries keeping ≤ k counters: pointwise
    add, then subtract the (k+1)-th largest count from every counter and
    drop the non-positive ones."""
    for v, c in other.items():
        counters[v] = counters.get(v, 0) + int(c)
    if len(counters) > k:
        kth = sorted(counters.values(), reverse=True)[k]
        counters = {v: c - kth for v, c in counters.items() if c - kth > 0}
    return counters


def misra_gries_candidates(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """(value, lb) per partition: the ≤ k surviving counters with their
    lower-bound counts. Sum ``lb`` across partitions for the merged
    summary (pointwise addition is itself a valid merge — each partial
    is already a lower bound)."""

    is_array = dict(df.dtypes)[col].startswith("array")

    # The merge rule is inlined (not a call to _mg_merge): a closure that
    # references a module-level function pickles it BY REFERENCE, so every
    # executor worker would need this package importable — untrue when the
    # library is loaded via a driver-side sys.path insert (the external
    # driver contract does exactly that). Inline, cloudpickle ships the
    # whole closure by value and the worker needs only pandas.
    #
    # Array inputs take the fast path: one Arrow row per DOCUMENT (not per
    # token), flattened and counted with numpy inside the worker — the r03
    # bench showed the per-token Arrow transfer dominating this sketch.
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        counters: dict[str, int] = {}
        for pdf in batches:
            if is_array:
                arrs = [a for a in pdf[col] if a is not None and len(a)]
                if not arrs:
                    continue
                vals, cnts = _np.unique(_np.concatenate(arrs), return_counts=True)
                pairs = zip(vals.tolist(), cnts.tolist())
            else:
                pairs = pdf[col].value_counts().items()
            for v, c in pairs:
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                kth = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - kth for v, c in counters.items() if c - kth > 0}
        if counters:
            yield _pd.DataFrame(
                {"value": list(counters.keys()), "lb": list(counters.values())}
            )

    return df.select(F.col(col).alias(col)).mapInPandas(summarize, _MG_SCHEMA)


def heavy_hitters_exact_topk(
    df: DataFrame, col: str, k_counters: int = 64, topn: int = 10
) -> DataFrame:
    """Two-pass exact heavy hitters: MG candidates → semi-join exact
    recount → top-N (count desc, value asc). Exact whenever the true
    top-N frequencies exceed n/(k_counters+1) — which pass 1 guarantees
    the candidate set covers.

    ``col`` may be a scalar column (one value per row) or an
    ``array<...>`` column (one collection per row — e.g. a document's
    token array); with arrays, both passes avoid a per-token row
    explosion before the sketch, and the recount explodes JVM-side only
    into a broadcast semi-join."""
    cand = (
        misra_gries_candidates(df, col, k_counters)
        .groupBy("value")
        .agg(F.sum("lb").alias("lb"))
        .where(F.col("lb") > 0)
        .select(F.col("value").alias(col))
    )
    if dict(df.dtypes)[col].startswith("array"):
        values = df.select(F.explode(col).alias(col))
    else:
        values = df.select(col)
    exact = (
        values.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    return exact.orderBy(F.desc("freq"), F.asc(col)).limit(topn)
