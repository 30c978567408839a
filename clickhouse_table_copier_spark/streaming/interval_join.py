"""Stream-stream interval join — click attribution in flight.

The canonical two-stream stateful operator: purchases join the clicks
that preceded them (same user, within the attribution window) while BOTH
sides are unbounded streams. Structured Streaming plans this as a
symmetric hash join keyed on the equality column (user_id) with the
time-range condition bounding how long each side's rows stay in state:
the watermarks + range let the engine evict a click once no future
purchase can reach back to it, so state is O(events in the attribution
window), never O(stream).

Reference parity: the reference has no streaming surface; this is part
of the Structured Streaming extension set (SURVEY §6). At 100 TB/day the
same topology runs unchanged off Kafka sources — availableNow over a
file source here is the testable stand-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attribution_join(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    left_type: str = "purchase",
    right_type: str = "click",
):
    """Start (availableNow) the purchases⋈clicks interval join; returns
    the StreamingQuery. Output rows: (user_id, purchase_id, purchase_ts,
    click_id, click_ts).

    SINGLE-BATCH ASSUMPTION (ADVICE r4): batch-oracle equivalence relies
    on availableNow ingesting ALL part files in ONE micro-batch, so the
    watermark only advances after every event is in state. If
    maxFilesPerTrigger were set (it is not, and must not be here) or the
    engine split the listing, time-unordered part files across batches
    could advance the watermark past not-yet-read late events and
    silently drop cross-batch pairs — nondeterministically, because file
    listing order is not a time order. queries_streaming.py's caller
    asserts the run consumed exactly one batch (numInputRows of batch 0 ==
    total source rows) so any future split fails the oracle gate loudly
    instead of dropping rows."""
    # watermarks require TIMESTAMP (not NTZ); the engine pins the session
    # to UTC (queries._events) so the cast is a deterministic relabel
    events = spark.readStream.schema(schema).parquet(src_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    purchases = (
        events.where(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", window)
    )
    clicks = (
        events.where(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", window)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"""
            p_user = c_user AND
            c_ts >= p_ts - INTERVAL {window} AND
            c_ts <= p_ts
            """
        ),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        F.col("p_ts").alias("purchase_ts"),
        "click_id",
        F.col("c_ts").alias("click_ts"),
    )
    return (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
