"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``clickhouse_table_copier_spark``; this file is the
thin contract adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouse_table_copier_spark import queries as _registry  # noqa: E402

# importing these modules registers their queries into the registry
import clickhouse_table_copier_spark.queries_scalars  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_analytics  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_pipeline  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_similarity  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_window  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_extras  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_streaming  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round3  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round4  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round5  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round6  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round6b  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round6c  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round6d  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round6e  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round6f  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round6g  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round6h  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round7_prep  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round7b  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round7c  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round7d  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round7e  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round7f  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round7g  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round7h  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round7i  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round7j  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round8_prep  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round8  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round8b  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round8c  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round8d  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round8e  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round8f  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round8g  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round8h  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round8i  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round8j  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round8k  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round8l  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round9  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round9b  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round12_prep  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round13_prep  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round14_prep  # noqa: E402,F401
import clickhouse_table_copier_spark.queries_round15_prep  # noqa: E402,F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full partition-diff verdict report (J2+C5) on
    sf0.001 — the reference's --info mode as one DataFrame."""
    return _registry.q_partition_diff(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (same column names)."""
    return _registry.oracle_sql()
