"""Round-9 query batch: model-evaluation and feature-audit operators —
the readouts an ML pipeline runs between "the data is clean" (the dedup
/ drift / leakage suites of rounds 4–8) and "ship the model".

- ``auc_exact`` — exact ROC-AUC with tie handling (midrank U), the
  binary-classifier headline metric.  Same tie-collapsed value-domain
  mechanism as ``mannwhitney_u_cohorts`` (AUC = U/(n₁·n₀) is the
  rank-sum identity): one groupBy collapses scores to the distinct-cent
  domain, one cumulative window over that collapsed domain, exact
  integer ppm output.  No global row sort — the window runs over the
  value domain, which is bounded (≤ 5·10⁷ cent values) at any corpus
  size.
- ``pr_curve_thresholds`` — precision / recall / F1 at pinned literal
  score thresholds.  Pure integer counting: one conditional aggregate
  per threshold, map-side combinable, output in exact ppm.
- ``calibration_ece`` — reliability table + expected calibration error
  for a deterministic monotone score: per-bin mean predicted
  probability vs empirical positive rate.  Means derive from exact
  integer cent sums; the only doubles are fixed-order divisions.
- ``welch_ttest_ab`` — Welch's unequal-variance t statistic and
  Welch–Satterthwaite df for the parity-assigned A/B cohorts, from ONE
  grouped pass of exact integer sufficient statistics (n, Σx, Σx²) per
  group.
- ``psi_feature_stability`` — Population Stability Index (the
  model-monitoring staple) of the event value distribution across a
  temporal split, over pinned literal bin edges with +1 Laplace
  smoothing (PSI is undefined on empty bins).  Counts are exact
  integers; the ln ratio is one fixed-order double expression.
- ``categorical_association`` — χ², Cramér's V, and mutual information
  for categorical feature pairs (the pre-encoding redundancy audit),
  from exact integer contingency counts; one grouped pass per pair.
- ``gini_split_gain`` — decision-stump Gini gain of pinned candidate
  split thresholds on a numeric feature vs the binary label: the
  feature-usefulness scan a GBDT/feature-selection pass runs.  All
  counts integer; the gain is a fixed-order rational expression of
  them.
- ``knn_label_noise`` — the mislabeled-example audit: exact integer-GEMM
  k=5 cosine neighbors (operators/similarity.gemm_topk_int) for a
  bounded deterministic probe set, then per-label neighbor agreement;
  low agreement flags candidate label noise (Confident-Learning-style
  signal).  The probe set is capped (vec_id < 500, every 5th), so
  driver state is O(1) at any corpus size; the GEMM emits partial
  top-k per Arrow batch — the shuffle carries O(k·probes·partitions)
  rows, never the corpus.

Reference parity note: the Go reference executes no analytics
(``database/database.go`` generates metadata SQL); this batch extends
the engine's ML-pipeline surface on the shared fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.operators.ranks import _bucket_sql
from clickhouse_table_copier_spark.queries import _events, _t, register

# ---------------------------------------------------------------------------
# auc_exact — exact ROC-AUC via the midrank Mann–Whitney identity.
# ---------------------------------------------------------------------------
# "high priority" is the positive class the score (total price) is
# evaluated against — a deterministic stand-in for a model score that
# both engines derive identically from the fixture.
_POS_SQL = "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END"


@register(
    "auc_exact",
    oracle=f"""
    WITH e AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             {_POS_SQL} AS pos
      FROM orders
    ),
    g AS (
      SELECT v, CAST(sum(pos) AS BIGINT) AS p_n,
             CAST(sum(1 - pos) AS BIGINT) AS q_n
      FROM e GROUP BY 1
    ),
    c AS (
      SELECT p_n, q_n,
             sum(q_n) OVER (ORDER BY v) - q_n AS qb,
             sum(p_n) OVER () AS np, sum(q_n) OVER () AS nq
      FROM g
    )
    SELECT CAST(max(np) AS BIGINT) AS n_pos,
           CAST(max(nq) AS BIGINT) AS n_neg,
           CAST(sum(2 * p_n * qb + p_n * q_n) AS BIGINT) AS u2,
           CAST(sum(2 * p_n * qb + p_n * q_n) * 1000000
                // (2 * max(np) * max(nq)) AS BIGINT) AS auc_ppm,
           CAST(sum(2 * p_n * qb + p_n * q_n) * 1000000
                // (max(np) * max(nq)) - 1000000 AS BIGINT) AS gini_ppm
    FROM c
    """,
)
def q_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC of the price score for the high-priority class: the
    rank-sum identity AUC = U/(n₁·n₀) with midrank ties kept integer by
    doubling (u2 = 2U; per collapsed score v the contribution is
    2·p_n·(#neg below) + p_n·q_n).

    Scale shape: the cumulative "#neg below v" is DISTRIBUTED — a
    single global-ORDER window would funnel the whole collapsed domain
    through one task (WindowExec's all-to-one-partition warning, the
    exact shape operators/ranks exists to avoid).  Instead the collapsed
    values bucket by a mergeable percentile_approx sketch (bounds only
    PARTITION the domain, so sketch error cannot reach the answer);
    per-bucket negative totals roll up on the ≤parts-row bucket frame
    into exact offsets, and the within-bucket cumsum window is
    partitioned BY bucket — ≈ domain/parts rows per task.  One input
    scan, two metadata-sized shuffles, no all-to-one stage."""
    parts = 32
    e = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
        F.expr(_POS_SQL).alias("pos"),
    )
    g = e.groupBy("v").agg(
        F.sum("pos").cast("bigint").alias("p_n"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("q_n"),
    )
    pcts = ",".join(repr(i / parts) for i in range(1, parts))
    row = g.select(
        F.expr(f"percentile_approx(v, array({pcts}), 1000)").alias("bs")
    ).collect()[0]
    bounds = sorted({int(b) for b in (row["bs"] or []) if b is not None})
    # cent values stay < 2^53, so _bucket_sql's double comparison is
    # exact for these bigint bounds
    gb = g.withColumn(
        "b", F.expr(_bucket_sql("v", [float(b) for b in bounds]))
    )
    # per-bucket negative totals → exact cumulative offsets, computed on
    # the ≤parts-row bucket frame (the all-to-one window is fine THERE)
    boff = gb.groupBy("b").agg(F.sum("q_n").alias("bq")).select(
        "b",
        (
            F.sum("bq").over(
                Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
            )
            - F.col("bq")
        ).alias("q_off"),
    )
    wcum = (
        Window.partitionBy("b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = gb.join(F.broadcast(boff), "b").select(
        "p_n",
        "q_n",
        (
            F.col("q_off") + F.sum("q_n").over(wcum) - F.col("q_n")
        ).alias("qb"),
    )
    return c.agg(
        F.sum("p_n").cast("bigint").alias("n_pos"),
        F.sum("q_n").cast("bigint").alias("n_neg"),
        F.sum(2 * F.col("p_n") * F.col("qb") + F.col("p_n") * F.col("q_n"))
        .cast("bigint")
        .alias("u2"),
        F.expr(
            "CAST(sum(2 * p_n * qb + p_n * q_n) * 1000000"
            " div (2 * sum(p_n) * sum(q_n)) AS BIGINT)"
        ).alias("auc_ppm"),
        F.expr(
            "CAST(sum(2 * p_n * qb + p_n * q_n) * 1000000"
            " div (sum(p_n) * sum(q_n)) - 1000000 AS BIGINT)"
        ).alias("gini_ppm"),
    )


# ---------------------------------------------------------------------------
# pr_curve_thresholds — precision/recall/F1 at pinned literal thresholds.
# ---------------------------------------------------------------------------
_PR_THRESHOLDS = [50_000 * i for i in range(1, 10)]  # price cut-offs


@register(
    "pr_curve_thresholds",
    oracle=f"""
    WITH e AS (
      SELECT o_totalprice AS score, {_POS_SQL} AS pos FROM orders
    ),
    t AS (SELECT unnest([{", ".join(str(t) for t in _PR_THRESHOLDS)}]) AS thr),
    agg AS (
      SELECT t.thr,
             CAST(sum(CASE WHEN e.score >= t.thr THEN e.pos ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN e.score >= t.thr THEN 1 - e.pos ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(e.pos) AS BIGINT) AS npos
      FROM e, t GROUP BY 1
    )
    SELECT CAST(thr AS BIGINT) AS thr, tp, fp,
           CAST(tp * 1000000 // greatest(tp + fp, 1) AS BIGINT) AS precision_ppm,
           CAST(tp * 1000000 // greatest(npos, 1) AS BIGINT) AS recall_ppm,
           CAST(2 * tp * 1000000 // greatest(tp + fp + npos, 1) AS BIGINT) AS f1_ppm
    FROM agg ORDER BY thr
    """,
)
def q_pr_curve_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 of "predict positive when score ≥ t" at nine
    pinned thresholds — the operating-point table behind a PR curve.
    ONE conditional aggregate computes every threshold's counts in a
    single input pass (flat IF-sums, map-side combinable — no
    per-threshold scan, no explode/shuffle of data rows); F1 in exact
    ppm uses the identity F1 = 2tp/(2tp+fp+fn) = 2tp/(tp+fp+npos)."""
    e = _t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("score"), F.expr(_POS_SQL).alias("pos")
    )
    aggs = []
    for t in _PR_THRESHOLDS:
        aggs.append(
            F.sum(F.when(F.col("score") >= t, F.col("pos")).otherwise(0))
            .cast("bigint")
            .alias(f"tp_{t}")
        )
        aggs.append(
            F.sum(F.when(F.col("score") >= t, 1 - F.col("pos")).otherwise(0))
            .cast("bigint")
            .alias(f"fp_{t}")
        )
    one = e.agg(
        *aggs,
        F.sum("pos").cast("bigint").alias("npos"),
        F.count(F.lit(1)).alias("n_total"),
    ).where(F.col("n_total") > 0)
    # empty input yields zero rows (the oracle's cross join with an
    # empty side produces no groups), matching the empty→empty
    # convention used by the percentile-bounds queries.
    # unpivot the single wide row into the 9-row curve (metadata-sized)
    rows = ", ".join(
        f"struct({t}L AS thr, tp_{t} AS tp, fp_{t} AS fp, npos AS npos)"
        for t in _PR_THRESHOLDS
    )
    return one.selectExpr(
        f"inline(array({rows}))"
    ).toDF("thr", "tp", "fp", "npos").select(
        "thr",
        "tp",
        "fp",
        F.expr("CAST(tp * 1000000 div greatest(tp + fp, 1) AS BIGINT)").alias(
            "precision_ppm"
        ),
        F.expr("CAST(tp * 1000000 div greatest(npos, 1) AS BIGINT)").alias(
            "recall_ppm"
        ),
        F.expr(
            "CAST(2 * tp * 1000000 div greatest(tp + fp + npos, 1) AS BIGINT)"
        ).alias("f1_ppm"),
    ).orderBy("thr")


# ---------------------------------------------------------------------------
# calibration_ece — reliability table + expected calibration error.
# ---------------------------------------------------------------------------
# The deterministic "model": predicted probability = price / 500k,
# clamped to [0, 1] — a monotone linear score both engines compute
# identically (no transcendentals anywhere near the comparison).
_ECE_DEN = 500_000


@register(
    "calibration_ece",
    oracle=f"""
    WITH e AS (
      SELECT least(CAST(9 AS BIGINT),
                   CAST(floor(o_totalprice * 10 / {_ECE_DEN}) AS BIGINT)) AS bin,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             {_POS_SQL} AS pos
      FROM orders
    ),
    b AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS sc,
             CAST(sum(pos) AS BIGINT) AS np
      FROM e GROUP BY 1
    ),
    r AS (
      SELECT bin, n, np,
             least(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) / {_ECE_DEN * 100},
                   CAST(1 AS DOUBLE)) AS mean_score,
             CAST(np AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate
      FROM b
    )
    SELECT bin, n, np,
           round(mean_score, 9) AS mean_score,
           round(pos_rate, 9) AS pos_rate,
           round(abs(mean_score - pos_rate), 9) AS abs_gap,
           round(sum(CAST(n AS DOUBLE) * abs(mean_score - pos_rate))
                   OVER () / sum(CAST(n AS DOUBLE)) OVER (), 9) AS ece
    FROM r ORDER BY bin
    """,
)
def q_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table for the linear price score: per decile-of-score
    bin, mean predicted probability vs empirical positive rate, plus the
    N-weighted expected calibration error repeated on every row (one
    window over the 10-row bin frame).  Means come from exact integer
    cent sums — the only doubles are fixed-order divisions, so both
    engines round the same values."""
    e = _t(spark, sf_dir, "orders").select(
        F.least(
            F.lit(9).cast("bigint"),
            F.floor(F.col("o_totalprice") * 10 / _ECE_DEN).cast("bigint"),
        ).alias("bin"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.expr(_POS_SQL).alias("pos"),
    )
    b = e.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sc"),
        F.sum("pos").cast("bigint").alias("np"),
    )
    mean_score = F.least(
        F.col("sc").cast("double")
        / F.col("n").cast("double")
        / F.lit(_ECE_DEN * 100),
        F.lit(1.0),
    )
    pos_rate = F.col("np").cast("double") / F.col("n").cast("double")
    r = b.select(
        "bin",
        "n",
        "np",
        mean_score.alias("mean_score"),
        pos_rate.alias("pos_rate"),
    )
    wall = Window.partitionBy()
    gap = F.abs(F.col("mean_score") - F.col("pos_rate"))
    return r.select(
        "bin",
        "n",
        "np",
        F.round("mean_score", 9).alias("mean_score"),
        F.round("pos_rate", 9).alias("pos_rate"),
        F.round(gap, 9).alias("abs_gap"),
        F.round(
            F.sum(F.col("n").cast("double") * gap).over(wall)
            / F.sum(F.col("n").cast("double")).over(wall),
            9,
        ).alias("ece"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# welch_ttest_ab — Welch's t from exact integer sufficient statistics.
# ---------------------------------------------------------------------------
@register(
    "welch_ttest_ab",
    oracle="""
    WITH e AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS grp,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS HUGEINT) AS sx,
             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sxx
      FROM e GROUP BY 1
    ),
    w AS (
      SELECT
        max(CASE WHEN grp = 1 THEN n END) AS n1,
        max(CASE WHEN grp = 0 THEN n END) AS n0,
        CAST(max(CASE WHEN grp = 1 THEN sx END) AS DOUBLE)
          / CAST(max(CASE WHEN grp = 1 THEN n END) AS DOUBLE) AS m1,
        CAST(max(CASE WHEN grp = 0 THEN sx END) AS DOUBLE)
          / CAST(max(CASE WHEN grp = 0 THEN n END) AS DOUBLE) AS m0,
        CAST(max(CASE WHEN grp = 1 THEN n END) * max(CASE WHEN grp = 1 THEN sxx END)
             - max(CASE WHEN grp = 1 THEN sx END) * max(CASE WHEN grp = 1 THEN sx END)
             AS DOUBLE)
          / CAST(max(CASE WHEN grp = 1 THEN n END) AS DOUBLE)
          / CAST(max(CASE WHEN grp = 1 THEN n END) - 1 AS DOUBLE)
          / CAST(max(CASE WHEN grp = 1 THEN n END) AS DOUBLE) AS vn1,
        CAST(max(CASE WHEN grp = 0 THEN n END) * max(CASE WHEN grp = 0 THEN sxx END)
             - max(CASE WHEN grp = 0 THEN sx END) * max(CASE WHEN grp = 0 THEN sx END)
             AS DOUBLE)
          / CAST(max(CASE WHEN grp = 0 THEN n END) AS DOUBLE)
          / CAST(max(CASE WHEN grp = 0 THEN n END) - 1 AS DOUBLE)
          / CAST(max(CASE WHEN grp = 0 THEN n END) AS DOUBLE) AS vn0
      FROM s
    )
    SELECT CAST(n1 AS BIGINT) AS n_treat, CAST(n0 AS BIGINT) AS n_control,
           round((m1 - m0) / 100, 9) AS mean_diff,
           round((m1 - m0) / sqrt(vn1 + vn0), 9) AS t_stat,
           round((vn1 + vn0) * (vn1 + vn0)
                 / (vn1 * vn1 / (CAST(n1 AS DOUBLE) - 1)
                    + vn0 * vn0 / (CAST(n0 AS DOUBLE) - 1)), 9) AS df_welch
    FROM w
    """,
)
def q_welch_ttest_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t on purchase values between the
    parity-assigned cohorts: one grouped pass collects exact integer
    (n, Σx, Σx²) per group; t = (m₁−m₀)/√(s₁²/n₁+s₀²/n₀) and the
    Welch–Satterthwaite df are fixed-order double expressions of those
    integers — same determinism discipline as brand_price_ols.  The
    cents → units rescale happens once, in the final mean_diff."""
    e = _events(spark, sf_dir).where(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).cast("int").alias("grp"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    cd = F.col("c").cast("decimal(18,0)")
    s = e.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("decimal(38,0)").alias("sx"),
        F.sum(cd * cd).cast("decimal(38,0)").alias("sxx"),
    )

    def pick(col: str, g: int):
        return F.max(F.when(F.col("grp") == g, F.col(col)))

    w = s.agg(
        pick("n", 1).alias("n1"),
        pick("n", 0).alias("n0"),
        (pick("sx", 1).cast("double") / pick("n", 1).cast("double")).alias("m1"),
        (pick("sx", 0).cast("double") / pick("n", 0).cast("double")).alias("m0"),
        (
            (pick("n", 1) * pick("sxx", 1) - pick("sx", 1) * pick("sx", 1)).cast("double")
            / pick("n", 1).cast("double")
            / (pick("n", 1) - 1).cast("double")
            / pick("n", 1).cast("double")
        ).alias("vn1"),
        (
            (pick("n", 0) * pick("sxx", 0) - pick("sx", 0) * pick("sx", 0)).cast("double")
            / pick("n", 0).cast("double")
            / (pick("n", 0) - 1).cast("double")
            / pick("n", 0).cast("double")
        ).alias("vn0"),
    )
    vsum = F.col("vn1") + F.col("vn0")
    return w.select(
        F.col("n1").cast("bigint").alias("n_treat"),
        F.col("n0").cast("bigint").alias("n_control"),
        F.round((F.col("m1") - F.col("m0")) / 100, 9).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m0")) / F.sqrt(vsum), 9).alias("t_stat"),
        F.round(
            vsum
            * vsum
            / (
                F.col("vn1") * F.col("vn1") / (F.col("n1").cast("double") - 1)
                + F.col("vn0") * F.col("vn0") / (F.col("n0").cast("double") - 1)
            ),
            9,
        ).alias("df_welch"),
    )


# ---------------------------------------------------------------------------
# psi_feature_stability — Population Stability Index across a time split.
# ---------------------------------------------------------------------------
_PSI_SPLIT = "2024-01-16 00:00:00"
_PSI_EDGES = [50 * i for i in range(1, 10)]  # pinned literal bin edges


def _psi_bin_sql(col: str) -> str:
    return "(" + " + ".join(
        f"CASE WHEN {col} >= {e} THEN 1 ELSE 0 END" for e in _PSI_EDGES
    ) + ")"


@register(
    "psi_feature_stability",
    oracle=f"""
    WITH e AS (
      SELECT {_psi_bin_sql("value")} AS bin,
             CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS ref
      FROM events
    ),
    b AS (
      SELECT bin, CAST(sum(ref) AS BIGINT) AS n_ref,
             CAST(sum(1 - ref) AS BIGINT) AS n_cur
      FROM e GROUP BY 1
    ),
    t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc, count(*) AS nb FROM b),
    p AS (
      SELECT bin, n_ref, n_cur,
             CAST(n_ref + 1 AS DOUBLE) / CAST(tr + nb AS DOUBLE) AS p_ref,
             CAST(n_cur + 1 AS DOUBLE) / CAST(tc + nb AS DOUBLE) AS p_cur
      FROM b, t
    )
    SELECT CAST(bin AS INTEGER) AS bin, n_ref, n_cur,
           round((p_cur - p_ref) * ln(p_cur / p_ref), 9) AS psi_term,
           round(sum((p_cur - p_ref) * ln(p_cur / p_ref)) OVER (), 9) AS psi
    FROM p ORDER BY bin
    """,
)
def q_psi_feature_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of the event-value distribution between the reference window
    (before the split) and the current window: Σ (p_cur − p_ref)·
    ln(p_cur/p_ref) over pinned literal bin edges, +1 Laplace smoothing
    so empty bins stay defined.  Counts are exact integers from ONE
    grouped pass (the bin expression is a flat IF-sum, no HOF lambda);
    the ln applies to one fixed-order ratio of those integers, rounded
    at 9dp — same transcendental discipline as hellinger_source_drift's
    sqrt.  Standard monitoring read: PSI < 0.1 stable, > 0.25 shifted."""
    ev = _events(spark, sf_dir)
    split = F.lit(_PSI_SPLIT).cast("timestamp_ntz")
    e = ev.select(
        F.expr(_psi_bin_sql("value")).alias("bin"),
        F.when(F.col("ts") < split, 1).otherwise(0).alias("ref"),
    )
    b = e.groupBy("bin").agg(
        F.sum("ref").cast("bigint").alias("n_ref"),
        F.sum(1 - F.col("ref")).cast("bigint").alias("n_cur"),
    )
    wall = Window.partitionBy()
    # bin-count / totals via windows over the ≤10-row bin frame: no
    # second action, no driver round-trip
    b2 = b.select(
        "bin",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(wall).alias("tr"),
        F.sum("n_cur").over(wall).alias("tc"),
        F.count(F.lit(1)).over(wall).alias("nb"),
    )
    p_ref = (F.col("n_ref") + 1).cast("double") / (
        F.col("tr") + F.col("nb")
    ).cast("double")
    p_cur = (F.col("n_cur") + 1).cast("double") / (
        F.col("tc") + F.col("nb")
    ).cast("double")
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    p = b2.select(
        F.col("bin").cast("int").alias("bin"),
        "n_ref",
        "n_cur",
        term.alias("term"),
    )
    return p.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round("term", 9).alias("psi_term"),
        F.round(F.sum("term").over(wall), 9).alias("psi"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# categorical_association — χ² / Cramér's V / mutual information per pair.
# ---------------------------------------------------------------------------
_ASSOC_PAIRS = [
    ("lineitem", "l_returnflag", "l_linestatus"),
    ("orders", "o_orderstatus", "o_orderpriority"),
]


def _assoc_sql(table: str, a: str, b: str) -> str:
    # mirrors the Spark plan shape exactly (cell counts, then window
    # marginals over the cell frame) so both engines sum the SAME
    # per-cell doubles
    return f"""
    SELECT '{table}.{a}|{b}' AS feature_pair,
           CAST(count(DISTINCT ka) AS BIGINT) AS card_a,
           CAST(count(DISTINCT kb) AS BIGINT) AS card_b,
           CAST(max(nn) AS BIGINT) AS n,
           -- zero cells are absent from the cell frame but contribute
           -- e_ij each to chi-square; their total is n - sum(present e)
           round(sum((CAST(nij AS DOUBLE)
                      - CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)
                        / CAST(nn AS DOUBLE))
                     * (CAST(nij AS DOUBLE)
                        - CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)
                          / CAST(nn AS DOUBLE))
                     / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)
                        / CAST(nn AS DOUBLE)))
                 + (CAST(max(nn) AS DOUBLE)
                    - sum(CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)
                          / CAST(nn AS DOUBLE))), 9) AS chi2,
           round(sqrt((sum((CAST(nij AS DOUBLE)
                           - CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)
                             / CAST(nn AS DOUBLE))
                          * (CAST(nij AS DOUBLE)
                             - CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)
                               / CAST(nn AS DOUBLE))
                          / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)
                             / CAST(nn AS DOUBLE)))
                       + (CAST(max(nn) AS DOUBLE)
                          - sum(CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)
                                / CAST(nn AS DOUBLE))))
                      / (CAST(max(nn) AS DOUBLE)
                         * CAST(least(count(DISTINCT ka),
                                      count(DISTINCT kb)) - 1 AS DOUBLE))),
                 9) AS cramers_v,
           round(sum(CAST(nij AS DOUBLE) / CAST(nn AS DOUBLE)
                     * ln(CAST(nn AS DOUBLE) * CAST(nij AS DOUBLE)
                          / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)))), 9)
             AS mi_nats
    FROM (
      SELECT ka, kb, nij,
             sum(nij) OVER (PARTITION BY ka) AS ni,
             sum(nij) OVER (PARTITION BY kb) AS nj,
             sum(nij) OVER () AS nn
      FROM (SELECT {a} AS ka, {b} AS kb, CAST(count(*) AS BIGINT) AS nij
            FROM {table} GROUP BY 1, 2)
    )
    """


@register(
    "categorical_association",
    oracle=" UNION ALL ".join(
        _assoc_sql(t, a, b) for t, a, b in _ASSOC_PAIRS
    )
    + " ORDER BY feature_pair",
)
def q_categorical_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise categorical-association audit (the pre-encoding
    redundancy check): χ², Cramér's V, and mutual information for pinned
    feature pairs, each from ONE contingency groupBy (cells ≤ card_a ×
    card_b — metadata-sized) with marginals via windows over the cell
    frame, no second input scan.  All counts exact integers; χ²/MI are
    fixed-order double expressions of them, rounded at 9dp."""
    outs = []
    for table, a, b in _ASSOC_PAIRS:
        t = _t(spark, sf_dir, table)
        cells = t.groupBy(
            F.col(a).alias("ka"), F.col(b).alias("kb")
        ).agg(F.count(F.lit(1)).cast("bigint").alias("nij"))
        wa = Window.partitionBy("ka")
        wb = Window.partitionBy("kb")
        wall = Window.partitionBy()
        m = cells.select(
            "ka",
            "kb",
            "nij",
            F.sum("nij").over(wa).alias("ni"),
            F.sum("nij").over(wb).alias("nj"),
            F.sum("nij").over(wall).alias("nn"),
        )
        nijd = F.col("nij").cast("double")
        nid = F.col("ni").cast("double")
        njd = F.col("nj").cast("double")
        nnd = F.col("nn").cast("double")
        exp = nid * njd / nnd
        # zero cells are absent from the cell frame but contribute e_ij
        # each to chi-square; their total is n - sum(present e). (MI's
        # zero cells contribute 0 — no correction needed there.)
        chi2 = F.sum((nijd - exp) * (nijd - exp) / exp) + (
            F.max("nn").cast("double") - F.sum(exp)
        )
        mi = F.sum(nijd / nnd * F.log(nnd * nijd / (nid * njd)))
        agg = m.agg(
            F.countDistinct("ka").cast("bigint").alias("card_a"),
            F.countDistinct("kb").cast("bigint").alias("card_b"),
            F.max("nn").cast("bigint").alias("n"),
            chi2.alias("chi2_raw"),
            mi.alias("mi_raw"),
        )
        outs.append(
            agg.select(
                F.lit(f"{table}.{a}|{b}").alias("feature_pair"),
                "card_a",
                "card_b",
                "n",
                F.round("chi2_raw", 9).alias("chi2"),
                F.round(
                    F.sqrt(
                        F.col("chi2_raw")
                        / (
                            F.col("n").cast("double")
                            * (
                                F.least(F.col("card_a"), F.col("card_b")) - 1
                            ).cast("double")
                        )
                    ),
                    9,
                ).alias("cramers_v"),
                F.round("mi_raw", 9).alias("mi_nats"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("feature_pair")


# ---------------------------------------------------------------------------
# gini_split_gain — decision-stump usefulness scan of a numeric feature.
# ---------------------------------------------------------------------------
@register(
    "gini_split_gain",
    oracle=f"""
    WITH e AS (
      SELECT o_totalprice AS score, {_POS_SQL} AS pos FROM orders
    ),
    t AS (SELECT unnest([{", ".join(str(t) for t in _PR_THRESHOLDS)}]) AS thr),
    agg AS (
      SELECT t.thr,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(e.pos) AS BIGINT) AS np,
             CAST(sum(CASE WHEN e.score < t.thr THEN 1 ELSE 0 END) AS BIGINT) AS nl,
             CAST(sum(CASE WHEN e.score < t.thr THEN e.pos ELSE 0 END) AS BIGINT) AS pl
      FROM e, t GROUP BY 1
    )
    SELECT CAST(thr AS BIGINT) AS thr, nl, CAST(n - nl AS BIGINT) AS nr,
           CASE WHEN nl = 0 OR nl = n THEN CAST(0 AS DOUBLE) ELSE
           round(
             (1 - (CAST(np AS DOUBLE) * np + CAST(n - np AS DOUBLE) * (n - np))
                    / (CAST(n AS DOUBLE) * n))
             - CAST(nl AS DOUBLE) / n
               * (1 - (CAST(pl AS DOUBLE) * pl
                       + CAST(nl - pl AS DOUBLE) * (nl - pl))
                      / (CAST(nl AS DOUBLE) * nl))
             - CAST(n - nl AS DOUBLE) / n
               * (1 - (CAST(np - pl AS DOUBLE) * (np - pl)
                       + CAST((n - nl) - (np - pl) AS DOUBLE)
                         * ((n - nl) - (np - pl)))
                      / (CAST(n - nl AS DOUBLE) * (n - nl))), 9)
           END AS gini_gain
    FROM agg ORDER BY thr
    """,
)
def q_gini_split_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini gain of "split at t" for each pinned candidate threshold of
    the price feature against the high-priority label — the single-scan
    feature-usefulness ladder a stump/GBDT pass evaluates.  ONE
    conditional aggregate collects (n_left, pos_left) for every
    threshold in a single input pass; the gain is a fixed-order rational
    expression of exact integers (Gini needs no transcendentals — the
    reason it beats entropy gain for cross-engine exactness)."""
    e = _t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("score"), F.expr(_POS_SQL).alias("pos")
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("np"),
    ]
    for t in _PR_THRESHOLDS:
        aggs.append(
            F.sum(F.when(F.col("score") < t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"nl_{t}")
        )
        aggs.append(
            F.sum(F.when(F.col("score") < t, F.col("pos")).otherwise(0))
            .cast("bigint")
            .alias(f"pl_{t}")
        )
    # empty input yields zero rows, matching the oracle's empty cross
    # join (same convention as pr_curve_thresholds)
    one = e.agg(*aggs).where(F.col("n") > 0)
    rows = ", ".join(
        f"struct({t}L AS thr, nl_{t} AS nl, pl_{t} AS pl, n AS n, np AS np)"
        for t in _PR_THRESHOLDS
    )
    base = one.selectExpr(f"inline(array({rows}))").toDF(
        "thr", "nl", "pl", "n", "np"
    )
    nd = F.col("n").cast("double")
    npd = F.col("np").cast("double")
    nld = F.col("nl").cast("double")
    pld = F.col("pl").cast("double")
    nrd = (F.col("n") - F.col("nl")).cast("double")
    prd = (F.col("np") - F.col("pl")).cast("double")
    g_parent = 1 - (npd * npd + (nd - npd) * (nd - npd)) / (nd * nd)
    g_left = 1 - (pld * pld + (nld - pld) * (nld - pld)) / (nld * nld)
    g_right = 1 - (prd * prd + (nrd - prd) * (nrd - prd)) / (nrd * nrd)
    # degenerate split (everything on one side) separates nothing: gain
    # 0 by definition — and the guard keeps ANSI mode from raising on
    # the empty side's division (a threshold beyond the data range is a
    # legitimate candidate, not an error)
    gain = F.when(
        (F.col("nl") == 0) | (F.col("nl") == F.col("n")), F.lit(0.0)
    ).otherwise(F.round(g_parent - nld / nd * g_left - nrd / nd * g_right, 9))
    return base.select(
        "thr",
        "nl",
        (F.col("n") - F.col("nl")).cast("bigint").alias("nr"),
        gain.alias("gini_gain"),
    ).orderBy("thr")


# ---------------------------------------------------------------------------
# knn_label_noise — neighbor-agreement label audit via exact integer GEMM.
# ---------------------------------------------------------------------------
_KNN_K = 5
_KNN_PROBE_CAP = 500  # probes: vec_id < cap and vec_id % 5 == 0 (bounded)


def _knn_oracle() -> str:
    from clickhouse_table_copier_spark.operators.similarity import GEMM_SCALE

    term = (
        f"CAST(floor(CAST(c.embedding[i] AS DOUBLE) * {GEMM_SCALE} + 0.5) AS BIGINT)"
        f" * CAST(floor(CAST(q.embedding[i] AS DOUBLE) * {GEMM_SCALE} + 0.5) AS BIGINT)"
    )
    return f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding, label AS q_label FROM embeddings
      WHERE vec_id < {_KNN_PROBE_CAP} AND vec_id % 5 = 0
    ),
    scored AS (
      SELECT q.q_id, q.q_label, c.vec_id, c.label,
             CAST(list_sum([{term} FOR i IN range(1, 65)]) AS BIGINT) AS score
      FROM q, embeddings c WHERE c.vec_id <> q.q_id
    ),
    nn AS (
      SELECT q_id, q_label, label FROM (
        SELECT q_id, q_label, label,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY score DESC, vec_id ASC) AS rn
        FROM scored
      ) WHERE rn <= {_KNN_K}
    ),
    per_probe AS (
      SELECT q_id, q_label,
             CAST(sum(CASE WHEN label = q_label THEN 1 ELSE 0 END) AS BIGINT)
               AS agree
      FROM nn GROUP BY 1, 2
    )
    SELECT CAST(q_label AS INTEGER) AS label,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(agree) * 1000000 // (count(*) * {_KNN_K}) AS BIGINT)
             AS agreement_ppm,
           CAST(sum(CASE WHEN agree <= 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged
    FROM per_probe GROUP BY 1 ORDER BY 1
    """


@register("knn_label_noise", oracle=_knn_oracle())
def q_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit (Confident-Learning-style signal): for each
    probe vector, the fraction of its k=5 exact nearest neighbors (by
    quantized integer dot — ``gemm_topk_int``, self excluded via k+1)
    sharing its label; per label, mean agreement in exact ppm and the
    count of probes with ≤1 agreeing neighbor (candidate mislabels).
    The probe set is deterministic and CAPPED (every 5th vec_id under
    {cap}), so driver state is O(1) at any corpus size; the GEMM ships
    partial top-k per Arrow batch — the shuffle carries
    O(k·probes·partitions) rows, never the corpus."""
    from clickhouse_table_copier_spark.operators.dedup import spread
    from clickhouse_table_copier_spark.operators.similarity import gemm_topk_int

    emb = spread(_t(spark, sf_dir, "embeddings"))
    qrows = (
        emb.where(
            (F.col("vec_id") < _KNN_PROBE_CAP) & (F.col("vec_id") % 5 == 0)
        )
        .orderBy("vec_id")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    qvecs = [[float(x) for x in r["embedding"]] for r in qrows]
    qids = [int(r["vec_id"]) for r in qrows]
    qlabels = {int(r["vec_id"]): int(r["label"]) for r in qrows}

    # k+1 then drop self: if self is in the top-(k+1) dropping it leaves
    # the true top-k; if it is not, the top-k of the rest is already
    # self-free — correct either way, no per-query corpus filter needed
    topk1 = gemm_topk_int(emb, qvecs, qids, k=_KNN_K + 1)
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    nn = (
        topk1.where(F.col("vec_id") != F.col("q_id"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _KNN_K)
    )
    labels = emb.select("vec_id", "label")
    qlab = spark.createDataFrame(
        [(k, v) for k, v in sorted(qlabels.items())], "q_id long, q_label int"
    )
    # nn is the tiny side (≤ k·probes rows) — broadcast IT against the
    # corpus-sized label table, never the reverse
    per_probe = (
        F.broadcast(nn).join(labels, "vec_id")
        .join(F.broadcast(qlab), "q_id")
        .groupBy("q_id", "q_label")
        .agg(
            F.sum(
                F.when(F.col("label") == F.col("q_label"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("agree")
        )
    )
    return (
        per_probe.groupBy(F.col("q_label").cast("int").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probes"),
            F.expr(
                f"CAST(sum(agree) * 1000000 div (count(*) * {_KNN_K}) AS BIGINT)"
            ).alias("agreement_ppm"),
            F.sum(F.when(F.col("agree") <= 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged"),
        )
        .orderBy("label")
    )
