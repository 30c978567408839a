"""Round-8d query batch: session path mining and cross-source
near-duplication reporting.

- ``session_path_topk`` — the classic product-analytics "top user
  journeys" view: sessionize events (same 1800 s gap rule
  event_sessions verifies), render each session as its ordered
  event-type path string, rank the most common paths.  Path assembly is
  per-session (arrays bounded by session length, so the one
  higher-order ``transform`` runs over tiny arrays — not a corpus-scale
  HOF hot path); ordering ties break on event_id so the string is total
  and cross-engine identical.
- ``source_contamination_matrix`` — which SOURCES duplicate each other:
  the verified near-dup pair artifact (shared jaccard-pairs frame, one
  build per session/sf) joined to each side's document source, counted
  per unordered source pair.  The question a decontamination plan
  starts with ("is web-crawl leaking into the eval set?") answered as a
  |sources|² report over an already-persisted artifact.

Reference parity note: the Go reference executes no relational
computation (`database/database.go` generates metadata SQL only); both
queries are the engine's analytics superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _events, _t, register
from clickhouse_table_copier_spark.queries_pipeline import (
    _CORPUS_SQL,
    _JACCARD_PAIRS_SQL,
    _shared_jaccard_pairs,
)

_PATH_TOP_K = 10
_PATH_GAP_S = 1800


@register(
    "session_path_topk",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             lag(CAST(ts AS TIMESTAMP)) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    flagged AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts) > {_PATH_GAP_S}
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, event_id, event_type, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    ),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sessions GROUP BY 1, 2
    ),
    counted AS (
      SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      FROM paths GROUP BY 1
    )
    SELECT path, n_sessions
    FROM counted
    ORDER BY n_sessions DESC, path
    LIMIT {_PATH_TOP_K}
    """,
)
def q_session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_PATH_TOP_K} session paths: gap-sessionized events, each
    session rendered 'view>click>…' in (ts, event_id) order.  The
    ``array_sort``/``transform`` pair runs per SESSION (tiny arrays), the
    path count is an ordinary grouped agg, and the top-k is
    orderBy+limit — TakeOrderedAndProject, per-partition heaps merged on
    the driver, never a global sort (ties at the cut break on the path
    string so the selected set is engine-identical)."""
    ev = _events(spark, sf_dir).select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "*",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp(F.col("ts").cast("timestamp"))
                - F.unix_timestamp(F.lag(F.col("ts").cast("timestamp")).over(w))
                > _PATH_GAP_S
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    sessions = flagged.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.sum("new_session")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("session_id"),
    )
    paths = sessions.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    return counted.orderBy(F.desc("n_sessions"), "path").limit(_PATH_TOP_K)


@register(
    "source_contamination_matrix",
    oracle=f"""
    WITH {_JACCARD_PAIRS_SQL},
    srcs AS (SELECT doc_id, source FROM documents),
    tagged AS (
      SELECT least(sa.source, sb.source) AS source_a,
             greatest(sa.source, sb.source) AS source_b
      FROM pairs
      JOIN srcs sa ON sa.doc_id = pairs.id_a
      JOIN srcs sb ON sb.doc_id = pairs.id_b
    )
    SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
    FROM tagged GROUP BY 1, 2
    """,
)
def q_source_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pressure between sources: the SHARED verified
    jaccard-pairs artifact (built once per session/sf — the warm cost
    here is two broadcast source lookups and a ≤|sources|² grouped
    count) tagged with each side's source, unordered-normalized via
    least/greatest.  At 100 TB this is the decontamination-planning
    report: the pair artifact is the expensive object, and it is shared
    with the cluster/split/survivorship consumers."""
    pairs = _shared_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    srcs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    sa = srcs.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("src_a")
    )
    sb = srcs.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("src_b")
    )
    return (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
