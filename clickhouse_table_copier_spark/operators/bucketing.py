"""Bucketed table layout: co-located joins with NO exchange.

The missing piece SCALE.md listed as a known non-goal until round 4:
when the same equi-join key recurs across jobs (fact⋈fact on orderkey,
every day), pre-shuffling BOTH tables into the same bucket layout pays
the shuffle once at write time and never again — each join reads
bucket i of A and bucket i of B on the same executor. This is Spark's
native bucketing (`DataFrameWriter.bucketBy` + `saveAsTable`); at
100 TB it's the difference between a daily multi-terabyte exchange and
none at all.

The operators here are thin, deliberate wrappers: the VALUE is the
verified plan property (tests assert the bucketed join's physical plan
contains no Exchange on either side, while the same join over plain
parquet shuffles both) — the thing a reviewer must know holds before
trusting the layout at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets lets the later sort-merge join skip its sort
    as well — the plan degenerates to a pure zip of co-located streams.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket column.

    With matching bucket counts and ``spark.sql.sources.bucketing.enabled``
    (default true), Catalyst plans this WITHOUT any Exchange: each task
    merges bucket i of both tables in place.
    """
    return spark.table(left_table).join(spark.table(right_table), on)
