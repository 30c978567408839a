"""Round-8j query batch: argMax/argMin parity, groupBitOr step
bitmasks, a feature-hashing collision audit, and an A/B sample-ratio
check.

- ``ch_arg_min_max`` — ClickHouse ``argMax(arg, val)`` / ``argMin``
  parity with a DETERMINISTIC tie rule (CH leaves ties unspecified;
  here ties break to the lowest supplier key so both engines agree):
  per nation, the supplier carried at the extreme account balances.
  One grouped pass via ``max_by``/``min_by`` over a composite ordering
  struct — the literal Spark spelling of the CH aggregate.
- ``user_step_bitmask`` — ClickHouse ``groupBitOr`` in its canonical
  role: OR per-event bit flags into a per-user "which steps did this
  user ever perform" mask, then histogram the masks.  The funnel
  Venn-diagram in two map-side-combinable aggregations; no
  distinct-count shuffle.
- ``feature_hashing_collisions`` — the hashing-trick audit an ML
  pipeline runs before committing to a feature dimension: bucket every
  distinct token through the engine-portable md5 hash (the
  ``functions/scalars.portable_row_hash`` rendering, reproducible in
  any engine) into 4096 buckets and report load/collision statistics.
  All integer-exact.
- ``ab_srm_check`` — sample-ratio mismatch: assign variants by hash
  parity (how real A/B systems bucket), then the 1-degree-of-freedom
  chi-square against the 50/50 design, which algebraically collapses
  to (na-nb)^2/n — one exact integer ratio, one division.  SRM is the
  first gate of every experiment readout.

Reference parity note: the Go reference's generated SQL targets
ClickHouse (``database/database.go``); argMax/argMin/groupBitOr are
staples of that dialect the engine executes here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _events, _t, register
from clickhouse_table_copier_spark.queries_pipeline import _SHINGLES_SQL


# ---------------------------------------------------------------------------
# ch_arg_min_max — argMax/argMin with a pinned tie rule.
# ---------------------------------------------------------------------------
@register(
    "ch_arg_min_max",
    oracle="""
    WITH ranked AS (
      SELECT n.n_name, s.s_name, s.s_acctbal,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY s.s_acctbal DESC, s.s_suppkey ASC)
               AS r_top,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY s.s_acctbal ASC, s.s_suppkey ASC)
               AS r_bot
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    )
    SELECT t.n_name,
           t.s_name AS top_supplier, t.s_acctbal AS top_bal,
           b.s_name AS bottom_supplier, b.s_acctbal AS bottom_bal
    FROM (SELECT * FROM ranked WHERE r_top = 1) t
    JOIN (SELECT * FROM ranked WHERE r_bot = 1) b ON t.n_name = b.n_name
    ORDER BY 1
    """,
)
def q_ch_arg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``argMax(s_name, s_acctbal)`` / ``argMin`` per nation,
    with ties pinned to the lowest supplier key (CH's own tie behavior
    is unspecified — a cross-engine contract needs a total order).
    ``max_by``/``min_by`` over a composite struct runs it as ONE grouped
    aggregation — no window, no self-join; the nation dimension
    broadcast-joins onto the supplier scan."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    # max_by: max acctbal, tie -> max(-suppkey) = LOWEST suppkey;
    # min_by: min acctbal, tie -> min(suppkey)  = lowest suppkey.
    top_key = F.struct(
        F.col("s_acctbal").alias("v"), (-F.col("s_suppkey")).alias("k")
    )
    bot_key = F.struct(
        F.col("s_acctbal").alias("v"), F.col("s_suppkey").alias("k")
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.max_by("s_name", top_key).alias("top_supplier"),
            F.max("s_acctbal").alias("top_bal"),
            F.min_by("s_name", bot_key).alias("bottom_supplier"),
            F.min("s_acctbal").alias("bottom_bal"),
        )
        .select(
            "n_name", "top_supplier", "top_bal", "bottom_supplier",
            "bottom_bal",
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# user_step_bitmask — groupBitOr funnel-membership masks.
# ---------------------------------------------------------------------------
_STEP_BITS = {"signup": 1, "view": 2, "click": 4, "purchase": 8}
_OTHER_BIT = 16  # any event type outside the funnel (e.g. 'error')


def _bit_case_sql() -> str:
    whens = " ".join(
        f"WHEN event_type = '{t}' THEN {b}" for t, b in _STEP_BITS.items()
    )
    return f"CASE {whens} ELSE {_OTHER_BIT} END"


@register(
    "user_step_bitmask",
    oracle=f"""
    WITH masks AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(bit_or({_bit_case_sql()}) AS INTEGER) AS mask
      FROM events GROUP BY 1, 2
    )
    SELECT mask, CAST(count(*) AS BIGINT) AS n_user_days
    FROM masks GROUP BY 1 ORDER BY 1
    """,
)
def q_user_step_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupBitOr`` in its canonical role: fold each
    user-DAY's events into a step-membership bitmask (signup=1, view=2,
    click=4, purchase=8, anything else=16), then histogram the masks —
    the daily engagement-profile Venn diagram from two map-side-
    combinable grouped aggregations.  Per (user, day) rather than per
    user because long-lived users eventually touch every step (the
    all-bits mask carries no information); the daily masks spread over
    all 31 combinations.  The flags ARE the distinct sets: no
    distinct-count shuffle, output bounded by 2^5 masks at any SF."""
    ev = _events(spark, sf_dir)
    bit = F.lit(_OTHER_BIT)
    for t, b in _STEP_BITS.items():
        bit = F.when(F.col("event_type") == t, b).otherwise(bit)
    masks = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.bit_or(bit).cast("int").alias("mask"))
    return (
        masks.groupBy("mask")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_user_days"))
        .orderBy("mask")
    )


# ---------------------------------------------------------------------------
# feature_hashing_collisions — hashing-trick bucket audit.
# ---------------------------------------------------------------------------
_FH_BUCKETS = 4096  # 2^12 feature dimension


@register(
    "feature_hashing_collisions",
    oracle=f"""
    WITH corpus AS (SELECT doc_id, text FROM documents),
    shing AS ({_SHINGLES_SQL}),
    features AS (SELECT DISTINCT sh FROM shing),
    bucketed AS (
      SELECT sh,
             CAST('0x' || substring(md5(sh), 1, 15) AS BIGINT)
               % {_FH_BUCKETS} AS bucket
      FROM features
    ),
    loads AS (
      SELECT bucket, count(*) AS load FROM bucketed GROUP BY 1
    )
    SELECT CAST(sum(load) AS BIGINT) AS n_features,
           CAST(count(*) AS BIGINT) AS buckets_used,
           CAST(max(load) AS BIGINT) AS max_load,
           CAST(sum(CASE WHEN load > 1 THEN load ELSE 0 END) AS BIGINT)
             AS colliding_features,
           CAST((sum(load) - count(*)) * 1000000 // sum(load) AS BIGINT)
             AS collision_ppm
    FROM loads
    """,
)
def q_feature_hashing_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick audit: bucket every distinct word-trigram shingle
    (the fixture's unigram vocab is a closed 31-word set, so trigrams —
    16k+ at sf0.01, corpus-growing — are the realistic feature space)
    into a 4096-dim feature vector via the engine-portable md5 hash
    (same rendering as functions/scalars.portable_row_hash) and report
    the load/collision statistics an ML pipeline checks before
    committing to the dimension.  All integers; the collision rate is
    an exact floor-division ppm.  Shape: shingle explode -> distinct ->
    hash -> bucket-grouped count — feature-space-sized state,
    bucket-bounded output."""
    from clickhouse_table_copier_spark.operators.dedup import shingle_index

    feats = (
        shingle_index(
            _t(spark, sf_dir, "documents").select("doc_id", "text"),
            "doc_id",
            "text",
        )
        .select("sh")
        .distinct()
    )
    bucketed = feats.select(
        (
            F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("bigint")
            % _FH_BUCKETS
        ).alias("bucket")
    )
    loads = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("load"))
    return loads.agg(
        F.sum("load").cast("bigint").alias("n_features"),
        F.count(F.lit(1)).cast("bigint").alias("buckets_used"),
        F.max("load").cast("bigint").alias("max_load"),
        F.sum(F.when(F.col("load") > 1, F.col("load")).otherwise(0))
        .cast("bigint")
        .alias("colliding_features"),
        F.expr(
            "CAST((sum(load) - count(*)) * 1000000 DIV sum(load) AS BIGINT)"
        ).alias("collision_ppm"),
    )


# ---------------------------------------------------------------------------
# ab_srm_check — sample-ratio mismatch for hash-bucketed variants.
# ---------------------------------------------------------------------------
_SRM_CRIT_MILLI = 3841  # chi-square 1-dof critical value at p=0.05, x1000


@register(
    "ab_srm_check",
    oracle=f"""
    WITH assign AS (
      SELECT DISTINCT user_id,
             CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 2 AS variant
      FROM events
    ),
    c AS (
      SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS nb,
             CAST(count(*) AS BIGINT) AS n
      FROM assign
    )
    SELECT na, nb, n,
           round((na - nb) * (na - nb) / CAST(n AS DOUBLE), 9) AS chi2,
           CAST(CASE WHEN (na - nb) * (na - nb) * 1000 > {_SRM_CRIT_MILLI} * n
                     THEN 1 ELSE 0 END AS INTEGER) AS srm_flag
    FROM c
    """,
)
def q_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch — the first gate of any experiment readout:
    users are hash-assigned to two variants (md5 parity, the portable
    deterministic bucketing real A/B systems use), and the 1-dof
    chi-square against the 50/50 design collapses algebraically to
    (na-nb)^2/n.  The significance flag is decided in EXACT integer
    arithmetic ((na-nb)^2*1000 vs 3841*n) so both engines agree even at
    the boundary; chi2 itself is one division, rounded.  Two grouped
    aggregations, integer state."""
    ev = _events(spark, sf_dir).select("user_id").distinct()
    assign = ev.select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("variant")
    )
    c = assign.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("na"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("nb"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    d = F.col("na") - F.col("nb")
    return c.select(
        "na",
        "nb",
        "n",
        F.round(d * d / F.col("n").cast("double"), 9).alias("chi2"),
        F.when(d * d * 1000 > _SRM_CRIT_MILLI * F.col("n"), 1)
        .otherwise(0)
        .cast("int")
        .alias("srm_flag"),
    )
