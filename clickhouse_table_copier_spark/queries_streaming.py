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


_EVENT_SCHEMA_SESS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
    ]
)


@register(
    "streaming_sessions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             lag(CAST(ts AS TIMESTAMP)) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts) > 1800 THEN 1
                  ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows under the SQL oracle gate: the streaming
    sessionizer (streaming/incremental.py::session_window_stats —
    ``session_window`` merge state, watermark eviction, append mode) runs
    as a real availableNow job, and the DuckDB oracle is the equivalent
    BATCH gaps-and-islands sessionization. Boundary semantics verified
    empirically: session_window merges an event exactly ``gap`` after the
    previous one (merge iff diff <= gap), identical to the batch rule
    "new session iff diff > 1800 s" — so streaming and batch agree on
    every session's (start, end = last_ts + gap, count).

    The far-future sentinel (user_id = -1) pushes the watermark past every
    real session so append mode emits them all; the sentinel's own open
    session is never emitted and its user id is filtered from the result
    regardless.
    """
    from clickhouse_table_copier_spark.streaming.incremental import (
        session_window_stats,
    )

    work = tempfile.mkdtemp(prefix="ctc_stream_s_")
    src = f"{work}/src"
    out = f"{work}/out"
    ck = f"{work}/ck"

    ev = _events(spark, sf_dir).select("event_id", "ts", "user_id")
    ev.write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(10**9, -1)], "event_id BIGINT, user_id BIGINT"
    ).select(
        "event_id",
        F.expr("TIMESTAMP_NTZ '2035-01-01 00:00:00'").alias("ts"),
        "user_id",
    ).select("event_id", "ts", "user_id").write.mode("append").parquet(src)

    q = session_window_stats(spark, src, _EVENT_SCHEMA_SESS, out, ck)
    q.awaitTermination()

    result = (
        spark.read.parquet(out)
        .where(F.col("user_id") >= 0)
        .select(
            "user_id",
            F.col("session_start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )
    rows = result.collect()
    out_df = spark.createDataFrame(rows, result.schema)
    shutil.rmtree(work, ignore_errors=True)
    return out_df
