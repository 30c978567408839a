"""Partitioning-invariance sweep: the repo's cross-engine exactness
story rests on order-independent arithmetic (integer/decimal sums,
order-statistic medians, quantized Arrow partials).  The direct test of
that claim: re-running a query under a DIFFERENT shuffle-partition
count and input partitioning must produce bit-identical rows.

The sweep picks one query per risky shape:

- ``embedding_covariance`` — Arrow-batch Gram partials: batch
  BOUNDARIES move with partitioning; the integer grid makes the merged
  sums invariant (the whole point of operators/linalg).
- ``hard_negative_mining`` — executor-side numpy GEMM over batches.
- ``hellinger_source_drift`` — fixed-point decimal term sums.
- ``theilsen_daily_trend`` — collect_list order varies; sort_array +
  order-statistic selection must absorb it.
- ``wasserstein_value_drift`` — windowed cumulative integer
  cross-products.
- ``bootstrap_mean_ci`` — hash-derived uniforms + map-side explode.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# Driver-gate lane split (r17): SLOW lane (see pytest.ini) so the
# default gate completes inside the driver's verify budget; run with
#   python -m pytest tests/ -m slow -q
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"

SWEEP = [
    "embedding_covariance",
    "hard_negative_mining",
    "hellinger_source_drift",
    "theilsen_daily_trend",
    "wasserstein_value_drift",
    "bootstrap_mean_ci",
]


def _rows(spark, name):
    df = entry.queries()[name](spark, SF)
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


@pytest.mark.parametrize("name", SWEEP)
def test_result_is_partitioning_invariant(spark, name):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    saved_batch = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
    )
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        base = _rows(spark, name)
        # different shuffle width AND different Arrow batch boundaries
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "13")
        alt = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", saved_batch
        )
    assert base == alt, f"{name} result depends on partitioning"
