"""Query batch: round-7i — distributed uncertainty quantification.

- ``bootstrap_mean_ci`` — 95% confidence interval for the per-type mean
  value via the POISSON BOOTSTRAP (Chamandy et al., the distributed
  bootstrap): instead of resampling n rows globally (impossible without
  a shuffle of the whole dataset per replicate), every row contributes
  Poisson(1)-many copies to each of B=64 replicas independently — one
  map-side explode, B grouped sums, zero data movement beyond the
  aggregate. Determinism: the Poisson draw inverts a hash-uniform
  against EXACT integer CDF cutoffs inlined as literals, replica means
  are decimal-sum / integer-count divisions, and the CI bounds are
  order statistics of the sorted 64 means — every step identical in
  both engines.
- ``value_decile_conversion`` — the calibration curve: exact value
  deciles (the equi-depth distributed-rank machinery) × purchase rate
  per decile. "Do higher-value events convert more" with equal-mass
  buckets, not arbitrary bin edges.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _events, register

_BOOT_B = 64
# Poisson(1) CDF cutoffs as exact integer thresholds on an 8-bit
# uniform. 8 bits quantize the Poisson probabilities by ≤ 2⁻⁸ —
# IDENTICALLY in both engines, so cross-engine exactness is unaffected
# (the draws come from the same quantized distribution everywhere; the
# CI itself is a bootstrap estimate whose Monte-Carlo error with B=64
# dwarfs a 0.4% cell-probability quantization) — and let ONE md5 digest
# feed TWELVE replicas (two 12-hex conv parses, each split into six
# 8-bit slots by integer div/mod). The r7 16-bit variant needed 11
# digests per row; this needs 6. Measured honestly: halving digests
# alone moved nothing (4.9 → 5.1 s warm at sf0.1) because the md5
# stage was 0.3 s of the 4.9 — the real cost was the whole fan-out
# running as ONE task off a single parquet split; spread() below fixed
# that (4.9 → 1.6 s). The 8-bit packing stays: fewer digests is
# strictly less work per row at any scale, and the parallelism fix
# stacks on top of it. Draws above the 7th cutoff are capped, again
# identically.
# Largest-remainder rounding of the CDF cutoffs: plain floor/cap at 8
# bits biases E[w] to 1.0117 (the cap clamps three cutoffs to 255), so
# the fractional parts are redistributed until Σ(256−c) = 256 — making
# E[w] = Σ P(u ≥ c_k) EXACTLY 1, the unbiased-resample property. A
# cutoff can land on 256 ("never fires"), which just lowers the weight
# cap identically in both engines.
_real = []
_acc = 0.0
for _k in range(7):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _real.append(_acc * (1 << 8))
_POIS_CUM = [int(_r) for _r in _real]
_deficit = (7 * (1 << 8) - (1 << 8)) - sum(_POIS_CUM)
for _i in sorted(
    range(7), key=lambda i: _real[i] - int(_real[i]), reverse=True
)[:_deficit]:
    _POIS_CUM[_i] += 1
del _real, _deficit

_BOOT_SLOTS = 12  # replicas per digest: 2 halves × six 8-bit slots
_BOOT_GROUPS = -(-_BOOT_B // _BOOT_SLOTS)  # md5 digests per row


def _weight_sql(u: str) -> str:
    """Branchless weight: number of cutoffs the uniform exceeds."""
    return "(" + " + ".join(
        f"(CASE WHEN {u} >= {c} THEN 1 ELSE 0 END)" for c in _POIS_CUM
    ) + ")"


@register(
    "bootstrap_mean_ci",
    oracle=f"""
    WITH reps AS (
      -- integer cents: value is 2-decimal by construction, so
      -- round(value*100) is the same exact integer in both engines and
      -- every downstream sum is plain int64 (the decimal formulation
      -- measured 2x slower over the 6.4M replica rows)
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
             unnest(generate_series(1, {_BOOT_B})) AS b, event_id
      FROM events
    ),
    weighted AS (
      -- one md5 feeds TWELVE replicas: digest group g = (b+11)//12,
      -- within-digest index j = (b-1)%12 selects 12-hex half j//6 and
      -- 8-bit slot j%6 of that half's integer value
      SELECT event_type, b,
             {_weight_sql(
                 "((CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '#' ||"
                 " CAST((b + 11) // 12 AS VARCHAR)),"
                 " 1 + 12 * (((b - 1) % 12) // 6), 12) AS BIGINT)"
                 " // CAST(power(256, ((b - 1) % 12) % 6) AS BIGINT)) % 256)"
             )} AS w,
             cents
      FROM reps
    ),
    rep_means AS (
      SELECT event_type, b,
             CAST(CAST(sum(w * cents) AS DOUBLE)
                  / CAST(sum(w) AS DOUBLE) / 100.0 AS DOUBLE) AS m
      FROM weighted GROUP BY 1, 2 HAVING sum(w) > 0
    ),
    sorted_means AS (
      SELECT event_type, list_sort(list(m)) AS ms, count(*) AS n_reps
      FROM rep_means GROUP BY 1
    ),
    base AS (
      SELECT event_type,
             CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) / 100.0 AS DOUBLE) AS mean_value,
             count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT base.event_type, CAST(base.n AS BIGINT) AS n,
           base.mean_value,
           CAST(s.n_reps AS BIGINT) AS n_reps,
           ms[2] AS ci_lo, ms[63] AS ci_hi
    FROM base JOIN sorted_means s ON base.event_type = s.event_type
    """,
)
def q_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import spread

    # spread() BEFORE the fan-out: the events parquet arrives as 1-2
    # input splits, and without it the whole 64× replica explode +
    # weight arithmetic chains into a single task (measured: the entire
    # 4.9 s warm sf0.1 time was one core; spreading the source rows
    # first runs the same plan in ~1.3 s on 32). At real scale file
    # counts make this a no-op.
    ev = spread(_events(spark, sf_dir)).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    def weight(u):
        w = None
        for c in _POIS_CUM:
            term = F.when(u >= c, 1).otherwise(0)
            w = term if w is None else w + term
        return w

    # FLAT two-stage explode, no higher-order functions anywhere:
    # Spark evaluates HOF lambdas on the interpreted path (measured
    # 21-26 s warm at sf0.1 for a transform/flatten formulation of the
    # same arithmetic), while these plain expressions stay inside
    # whole-stage codegen. Stage 1 explodes the digest GROUPS and
    # computes one md5 per (row, group); stage 2 unpacks each digest's
    # twelve 8-bit slots into replica weights. b = (g-1)·12 + slot + 1
    # matches the oracle's g = (b+11)//12, j = (b-1)%12.
    grouped = ev.select(
        "event_type",
        "cents",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_GROUPS))).alias("g"),
        "event_id",
    ).select(
        "event_type",
        "cents",
        "g",
        F.md5(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit("#"),
                F.col("g").cast("string"),
            )
        ).alias("dg"),
    )
    # the uniforms are exploded as a COLUMN before the 7-way CASE chain
    # reads them (inlining weight(conv(...)) duplicates the conv into
    # every CASE branch — no common-subexpression elimination there:
    # measured 22 s warm at sf0.1), and each 12-hex conv parse is split
    # into six 8-bit slots by div/mod so only TWO convs run per
    # digest (one conv per replica measured 7.7 s)
    halves = [
        F.conv(F.substring("dg", 1 + 12 * h, 12), 16, 10).cast("bigint")
        for h in range(2)
    ]
    slot_uniforms = F.array(
        *[
            (halves[j // 6] / (256 ** (j % 6))).cast("bigint") % 256
            for j in range(_BOOT_SLOTS)
        ]
    )
    reps = (
        grouped.select(
            "event_type",
            "cents",
            "g",
            F.posexplode(slot_uniforms).alias("slot", "u"),
        )
        .where((F.col("g") - 1) * _BOOT_SLOTS + F.col("slot") + 1 <= _BOOT_B)
        .select(
            "event_type",
            "cents",
            ((F.col("g") - 1) * _BOOT_SLOTS + F.col("slot") + 1).alias("b"),
            weight(F.col("u")).alias("w"),
        )
    )
    rep_means = (
        reps.groupBy("event_type", "b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("swc"),
            F.sum("w").alias("sw"),
        )
        .where(F.col("sw") > 0)
        .select(
            "event_type",
            (
                F.col("swc").cast("double")
                / F.col("sw").cast("double")
                / F.lit(100.0)
            ).alias("m"),
        )
    )
    sorted_means = rep_means.groupBy("event_type").agg(
        F.array_sort(F.collect_list("m")).alias("ms"),
        F.count(F.lit(1)).cast("bigint").alias("n_reps"),
    )
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum("cents").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(100.0)
        ).alias("mean_value"),
    )
    return base.join(sorted_means, "event_type").select(
        "event_type",
        "n",
        "mean_value",
        "n_reps",
        F.element_at("ms", 2).alias("ci_lo"),
        F.element_at("ms", 63).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Calibration curve: exact equal-mass value deciles × purchase rate.
# Reuses the equi_depth distributed-rank design (sketch partitions →
# local ranks → metadata-sized offsets → exact ntile) over event values;
# the conversion rate per decile is an integer ratio, one double
# division. Ties on equal values are made total by event_id, so decile
# membership is deterministic cross-engine.
# ---------------------------------------------------------------------------
_CAL_PARTS = 32


@register(
    "value_decile_conversion",
    oracle="""
    WITH ranked AS (
      SELECT value, event_type,
             ntile(10) OVER (ORDER BY value, event_id) AS decile
      FROM events
    )
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(value) AS DOUBLE) AS lo,
           CAST(max(value) AS DOUBLE) AS hi,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           CAST(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     AS DOUBLE) / count(*) AS DOUBLE) AS purchase_rate
    FROM ranked GROUP BY 1 ORDER BY 1
    """,
)
def q_value_decile_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    pcts = [i / _CAL_PARTS for i in range(1, _CAL_PARTS)]
    bounds_row = ev.agg(
        F.percentile_approx(
            "value", F.array(*[F.lit(p) for p in pcts]), 1000
        ).alias("bs")
    ).collect()[0]
    bounds = sorted(set(float(x) for x in (bounds_row["bs"] or [])))  # percentile_approx -> NULL on empty input
    bucket = F.aggregate(
        F.array(*[F.lit(x) for x in bounds]),
        F.lit(0),
        lambda acc, x: acc
        + F.when(F.col("value") > x, F.lit(1)).otherwise(F.lit(0)),
    )
    wloc = Window.partitionBy("bk").orderBy("value", "event_id")
    local = ev.withColumn("bk", bucket).withColumn(
        "lr", F.row_number().over(wloc)
    )
    cnt_rows = local.groupBy("bk").agg(F.count(F.lit(1)).alias("c")).collect()
    cnt = {int(r["bk"]): int(r["c"]) for r in cnt_rows}
    n = sum(cnt.values())
    offsets, acc = {}, 0
    for b in sorted(cnt):
        offsets[b] = acc
        acc += cnt[b]
    off_expr = F.lit(0)
    for b, o in offsets.items():
        off_expr = F.when(F.col("bk") == b, F.lit(o)).otherwise(off_expr)
    s, r = n // 10, n % 10
    pivot = r * (s + 1)
    rank = off_expr + F.col("lr")
    decile = (
        F.when(rank <= pivot, F.ceil(rank / F.lit(s + 1)))
        .otherwise(F.lit(r) + F.ceil((rank - pivot) / F.lit(max(s, 1))))
        .cast("int")
    )
    is_p = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    return (
        local.select("value", "event_type", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("value").cast("double").alias("lo"),
            F.max("value").cast("double").alias("hi"),
            F.sum(is_p).cast("bigint").alias("n_purchases"),
            (F.sum(is_p).cast("double") / F.count(F.lit(1))).alias(
                "purchase_rate"
            ),
        )
        .orderBy("decile")
    )
