"""Streaming exact dedup — first-seen-wins across micro-batches.

The batch operator (``operators.dedup.exact_dedup``) answers "which rows
are duplicates" over a static corpus; an ingestion pipeline needs the
ONLINE form: emit a document the first time its content is seen, drop
every later arrival — across micro-batches and restarts (state lives in
the checkpoint).

Two state regimes:

- ``watermark_delay`` set (the 100 TB path): state is bounded —
  ``dropDuplicatesWithinWatermark`` evicts keys once the event-time
  watermark passes them, so memory is O(keys within the watermark
  horizon), not O(all keys ever). A duplicate arriving later than the
  horizon is re-admitted (the documented trade: bounded state ⇔ bounded
  lookback — the same contract every streaming dedup at scale makes).
- ``watermark_delay=None``: exact forever-dedup with O(distinct keys)
  state — fine for bounded backfills, unbounded state on infinite
  streams; callers choose explicitly.

Content identity = md5 of normalized text (the same key
``exact_dedup`` groups on), so batch and streaming agree on what "same
document" means.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_table_copier_spark.operators.dedup import normalized_text


def streaming_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    text_col: str,
    output_dir: str,
    checkpoint_dir: str,
    ts_col: str | None = None,
    watermark_delay: str | None = "1 hour",
):
    """availableNow run: append first-seen rows to ``output_dir``.

    Each invocation processes only files the checkpoint hasn't seen
    (incremental ingestion); dedup state carries across invocations via
    the same checkpoint. Returns the streaming query handle.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "64")
        .parquet(source_dir)
    )
    keyed = stream.withColumn(
        "__content_key", F.md5(normalized_text(text_col))
    )
    if watermark_delay is not None:
        if ts_col is None:
            raise ValueError("watermark_delay requires ts_col (event time)")
        keyed = keyed.withWatermark(ts_col, watermark_delay)
        deduped = keyed.dropDuplicatesWithinWatermark(["__content_key"])
    else:
        deduped = keyed.dropDuplicates(["__content_key"])
    return (
        deduped.drop("__content_key")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
