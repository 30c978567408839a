"""Query batch 8: a STREAMING-computed result under the SQL oracle gate.

``streaming_window_counts`` runs a real Structured Streaming job
(availableNow, watermarked tumbling windows, parquet sink) inside the
query function and returns the sink's contents. The DuckDB oracle is the
equivalent BATCH aggregation — so the driver's hash comparison proves
stream/batch consistency, the property Structured Streaming's semantics
promise and most engines never test end-to-end.

Mechanics: the fixture is copied into a temp dir with one far-future
sentinel row appended; the sentinel drives the watermark past every real
window so append mode emits them all, while its own (still-open) window
is never emitted — leaving exactly the real windows to compare.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_table_copier_spark.queries import _events, register

_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@register(
    "streaming_window_counts",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1, 2
    """,
)
def q_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.streaming.incremental import (
        windowed_event_counts,
    )

    work = tempfile.mkdtemp(prefix="ctc_stream_q_")
    src = f"{work}/src"
    out = f"{work}/out"
    ck = f"{work}/ck"

    ev = _events(spark, sf_dir).select("event_id", "ts", "event_type", "value")
    ev.write.mode("overwrite").parquet(src)
    # far-future sentinel: watermark passes every real window
    spark.createDataFrame([(10**9, "sentinel", 0.0)], "event_id BIGINT, event_type STRING, value DOUBLE").select(
        "event_id",
        F.expr("TIMESTAMP_NTZ '2035-01-01 00:00:00'").alias("ts"),
        "event_type",
        "value",
    ).select("event_id", "ts", "event_type", "value").write.mode("append").parquet(src)

    q = windowed_event_counts(spark, src, _EVENT_SCHEMA, out, ck, window="1 hour")
    q.awaitTermination()

    result = (
        spark.read.parquet(out)
        .where(F.col("event_type") != "sentinel")
        .select(
            F.col("window_start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
    # materialize before the temp dir disappears
    rows = result.collect()
    out_df = spark.createDataFrame(rows, result.schema)
    shutil.rmtree(work, ignore_errors=True)
    return out_df


_EVENT_SCHEMA_UID = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


@register(
    "streaming_click_attribution",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           c.event_id AS click_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """,
)
def q_streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join under the SQL oracle gate: the
    purchases⋈clicks attribution topology runs as a real two-stream
    Structured Streaming job (symmetric hash join, watermark-bounded
    state — streaming/interval_join.py), and the DuckDB oracle is the
    equivalent BATCH interval join, so the driver's hash comparison
    proves stream/batch join consistency the same way
    streaming_window_counts proves it for windowed aggregation."""
    from clickhouse_table_copier_spark.streaming.interval_join import (
        attribution_join,
    )

    work = tempfile.mkdtemp(prefix="ctc_stream_j_")
    src = f"{work}/src"
    out = f"{work}/out"
    ck = f"{work}/ck"

    ev = _events(spark, sf_dir).select("event_id", "ts", "user_id", "event_type")
    ev.write.mode("overwrite").parquet(src)

    q = attribution_join(spark, src, _EVENT_SCHEMA_UID, out, ck, window="1 hour")
    q.awaitTermination()

    # Single-batch guard (see attribution_join's docstring): the batch
    # oracle is only equivalent if the whole source landed in ONE
    # micro-batch — a split listing could advance the watermark past
    # unread late files and silently drop cross-batch pairs. Fail loudly
    # here instead. availableNow adds a final empty commit batch; count
    # only batches that actually read rows.
    n_src = ev.count()
    data_batches = [
        p for p in q.recentProgress if p["numInputRows"] and p["numInputRows"] > 0
    ]
    if len(data_batches) != 1 or data_batches[0]["numInputRows"] not in (
        n_src,  # unified source scan
        2 * n_src,  # per-branch scans (observed on Spark 4.1)
    ):
        raise RuntimeError(
            "attribution stream split across micro-batches; batch-oracle "
            f"equivalence void: {[(p['batchId'], p['numInputRows']) for p in q.recentProgress]}"
        )

    result = spark.read.parquet(out).select(
        "user_id",
        "purchase_id",
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "click_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
    )
    rows = result.collect()
    out_df = spark.createDataFrame(rows, result.schema)
    shutil.rmtree(work, ignore_errors=True)
    return out_df
