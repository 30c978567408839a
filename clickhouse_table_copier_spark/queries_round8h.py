"""Round-8h query batch: CH ``-If`` combinators, ``deltaSum``, and three
robust/agreement statistics (Theil–Sen trend, Hellinger drift, Cohen's
kappa).

Dialect parity (the Go reference's generated SQL targets ClickHouse —
``database/database.go:322-551`` — so its users speak this dialect):

- ``ch_if_combinators`` — the ``-If`` aggregate-combinator family
  (``countIf/sumIf/avgIf/minIf/maxIf/uniqExactIf``), re-expressed as
  conditional aggregates Catalyst fuses into ONE grouped pass (ANSI
  ``FILTER`` clauses on the oracle side).  No extra scan per condition.
- ``ch_delta_sum`` — ClickHouse ``deltaSum``: the sum of POSITIVE
  increments of an ordered series.  Run over the daily-revenue
  aggregate, whose cardinality is the CALENDAR, not the data, so the
  ordered window is bounded at any SF.

Training-data / eval statistics:

- ``theilsen_daily_trend`` — Theil–Sen robust slope (median of pairwise
  slopes).  The pair fan-out is quadratic, so it runs on the bounded
  daily aggregate (365 points -> 66k pairs), never on raw rows; the
  median is the LOWER median (an order statistic, selected not
  averaged) so both engines pick the identical element and no
  interpolation arithmetic can drift.
- ``hellinger_source_drift`` — Hellinger distance between two sources'
  unigram distributions.  Chosen over KL/PSI because it needs only
  ``/`` and ``sqrt`` — both exactly specified by IEEE-754, so the
  per-term values are bit-identical cross-engine (log is only
  faithfully rounded and is banned from hashed outputs here; the
  repo-wide precedent is queries_round7b's log-free PMI ranking).
- ``cohens_kappa_quality`` — inter-rater agreement between two
  deterministic quality raters (char-length vs token-count), the
  standard check before trusting a heuristic labeler.  The kappa is a
  2x2-contingency formula over exact integer counts.

Cross-engine determinism: every hashed double here is produced by a
correctly-rounded IEEE op chain written identically in both dialects
(integer-exact inputs -> ``/`` -> ``sqrt`` -> ``*``/``-``), with decimal
used wherever a SUM's accumulation order could otherwise matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register
from clickhouse_table_copier_spark.queries_round6 import _TOKS_SQL, _norm_tokens

_DEC = "decimal(18,2)"


# ---------------------------------------------------------------------------
# ch_if_combinators — countIf / sumIf / avgIf / minIf / maxIf /
# uniqExactIf in ONE grouped pass.
# ---------------------------------------------------------------------------
@register(
    "ch_if_combinators",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT)
             AS cnt_f,
           CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                  FILTER (WHERE l_quantity < 10), 0) AS DOUBLE)
             AS sum_small,
           round(CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                        FILTER (WHERE l_quantity < 10), 0) AS DOUBLE)
                 / NULLIF(count(*) FILTER (WHERE l_quantity < 10), 0), 6)
             AS avg_small,
           min(l_extendedprice) FILTER (WHERE l_discount > 0.05)
             AS min_disc,
           max(l_extendedprice) FILTER (WHERE l_discount > 0.05)
             AS max_disc,
           CAST(count(DISTINCT l_partkey) FILTER (WHERE l_tax = 0)
                AS BIGINT) AS uniq_taxfree
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def q_ch_if_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``-If`` combinator parity: six differently-conditioned
    aggregates of one table, fused into a single map-side-combinable
    grouped aggregation (the CH idiom's whole point — one scan, not six).
    ``avgIf`` divides the decimal-exact conditional sum by the
    conditional count so accumulation order can't drift; empty-condition
    groups yield NULL exactly as CH's ``minIf``/``avgIf`` do."""
    li = _t(spark, sf_dir, "lineitem")
    small = F.col("l_quantity") < 10
    disc = F.col("l_discount") > 0.05
    sum_small_dec = F.sum(
        F.when(small, F.col("l_extendedprice").cast(_DEC))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("cnt_f"),
            F.coalesce(sum_small_dec, F.lit(0))
            .cast("double")
            .alias("sum_small"),
            F.round(
                F.coalesce(sum_small_dec, F.lit(0)).cast("double")
                / F.nullif(F.count(F.when(small, 1)), F.lit(0)),
                6,
            ).alias("avg_small"),
            F.min(F.when(disc, F.col("l_extendedprice"))).alias("min_disc"),
            F.max(F.when(disc, F.col("l_extendedprice"))).alias("max_disc"),
            F.countDistinct(F.when(F.col("l_tax") == 0, F.col("l_partkey")))
            .cast("bigint")
            .alias("uniq_taxfree"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# ch_delta_sum — sum of positive increments of the daily revenue series.
# ---------------------------------------------------------------------------
@register(
    "ch_delta_sum",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem GROUP BY 1
    ),
    d AS (
      SELECT rev - lag(rev) OVER (ORDER BY day) AS delta FROM daily
    )
    SELECT CAST(coalesce(sum(delta) FILTER (WHERE delta > 0), 0)
                AS DOUBLE) AS delta_sum,
           CAST(count(*) FILTER (WHERE delta > 0) AS BIGINT)
             AS delta_count,
           CAST(count(*) + 1 AS BIGINT) AS n_days
    FROM d WHERE delta IS NOT NULL
    """,
)
def q_ch_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSum`` over daily revenue: total of the positive
    day-over-day increments.  The ordered window runs on the
    ``groupBy(day)`` aggregate — one row per CALENDAR day at any SF
    (same boundedness argument as ``daily_autocorr``) — and every value
    stays decimal-exact until the final cast."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_shipdate").cast("date").alias("day")
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount").cast(_DEC))
        ).alias("rev")
    )
    from pyspark.sql import Window

    d = daily.select(
        (F.col("rev") - F.lag("rev").over(Window.orderBy("day"))).alias(
            "delta"
        )
    ).where(F.col("delta").isNotNull())
    return d.agg(
        F.coalesce(F.sum(F.when(F.col("delta") > 0, F.col("delta"))), F.lit(0))
        .cast("double")
        .alias("delta_sum"),
        F.count(F.when(F.col("delta") > 0, 1)).cast("bigint").alias(
            "delta_count"
        ),
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n_days"),
    )


# ---------------------------------------------------------------------------
# theilsen_daily_trend — robust slope over the 1998 daily-revenue series.
# ---------------------------------------------------------------------------
_TS_YEAR = 1998
_TS_EPOCH = f"{_TS_YEAR}-01-01"

# lower median: index (m-1)//2 of the sorted array, 1-based (m+1)//2 —
# an ORDER STATISTIC both engines select identically; no interpolation.
_TS_SLOPE_EXPR = """
CASE WHEN size(pts) >= 2 THEN
  element_at(
    array_sort(flatten(transform(
      sequence(0, size(pts) - 2),
      i -> transform(
        sequence(i + 1, size(pts) - 1),
        j -> (pts[j].y - pts[i].y) / CAST(pts[j].x - pts[i].x AS DOUBLE))
    ))),
    CAST(((size(pts) * (size(pts) - 1)) DIV 2 + 1) DIV 2 AS INT)
  )
END
"""


@register(
    "theilsen_daily_trend",
    oracle=f"""
    WITH daily AS (
      SELECT datediff('day', DATE '{_TS_EPOCH}', CAST(l_shipdate AS DATE))
               AS x,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS y
      FROM lineitem WHERE year(l_shipdate) = {_TS_YEAR} GROUP BY 1
    ),
    slopes AS (
      SELECT (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS s
      FROM daily a JOIN daily b ON b.x > a.x
    ),
    ranked AS (
      SELECT s, row_number() OVER (ORDER BY s) AS rn,
             count(*) OVER () AS m
      FROM slopes
    ),
    sl AS (SELECT s AS slope, m AS n_pairs FROM ranked
           WHERE rn = (m + 1) // 2),
    resid AS (
      SELECT d.y - (SELECT slope FROM sl) * d.x AS r FROM daily d
    ),
    rr AS (
      SELECT r, row_number() OVER (ORDER BY r) AS rn,
             count(*) OVER () AS m
      FROM resid
    )
    SELECT sl.slope AS slope,
           (SELECT r FROM rr WHERE rn = (m + 1) // 2) AS intercept,
           CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(sl.n_pairs AS BIGINT) AS n_pairs
    FROM sl
    """,
)
def q_theilsen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator (median of pairwise slopes — robust to the
    outlier days OLS would chase) of the {year} daily-revenue trend.
    The quadratic pair fan-out runs on the ``groupBy(day)`` aggregate —
    calendar-bounded (<=365 points, ~66k pairs), computed as a
    sort+select inside ONE collected row, never a self-join on raw
    rows — so the shape is two shuffles (daily agg, single-row gather)
    at any SF.  Slope and intercept are LOWER medians: order statistics
    over bit-identical IEEE division results, immune to interpolation
    drift; the oracle selects the same element by row_number."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate") == _TS_YEAR
    )
    daily = li.groupBy(
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit(_TS_EPOCH).cast("date")
        ).alias("x")
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount").cast(_DEC))
        )
        .cast("double")
        .alias("y")
    )
    one = daily.agg(
        F.sort_array(F.collect_list(F.struct("x", "y"))).alias("pts")
    ).where(
        # <2 points -> no pairwise slopes: return ZERO rows exactly as
        # the oracle's order-statistic select does on an empty slope set
        F.expr("size(pts) >= 2")
    )
    with_slope = one.select(
        "pts",
        F.expr(_TS_SLOPE_EXPR).alias("slope"),
        F.expr(
            "CAST((size(pts) * (size(pts) - 1)) DIV 2 AS BIGINT)"
        ).alias("n_pairs"),
    )
    return with_slope.select(
        "slope",
        F.expr(
            "element_at(array_sort(transform(pts, p -> p.y - slope * p.x)),"
            " CAST((size(pts) + 1) DIV 2 AS INT))"
        ).alias("intercept"),
        F.expr("CAST(size(pts) AS BIGINT)").alias("n_days"),
        "n_pairs",
    )


# ---------------------------------------------------------------------------
# hellinger_source_drift — sqrt-space distance between two sources'
# unigram distributions (log-free by design).
# ---------------------------------------------------------------------------
_HG_A, _HG_B = "src0", "src1"


@register(
    "hellinger_source_drift",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_SQL.format(c="text")}) AS tok
      FROM documents WHERE source IN ('{_HG_A}', '{_HG_B}')
    ),
    cnts AS (
      SELECT source, tok, count(*) AS cnt FROM toks GROUP BY 1, 2
    ),
    p AS (
      SELECT source, tok, cnt,
             CAST(cnt AS DOUBLE) /
               CAST(sum(cnt) OVER (PARTITION BY source) AS DOUBLE) AS p
      FROM cnts
    ),
    piv AS (
      SELECT tok,
             coalesce(sum(p) FILTER (WHERE source = '{_HG_A}'), 0) AS pa,
             coalesce(sum(p) FILTER (WHERE source = '{_HG_B}'), 0) AS pb,
             coalesce(sum(cnt) FILTER (WHERE source = '{_HG_A}'), 0) AS ca,
             coalesce(sum(cnt) FILTER (WHERE source = '{_HG_B}'), 0) AS cb
      FROM p GROUP BY 1
    )
    SELECT round(sqrt(CAST(sum(CAST(round(
               (sqrt(pa) - sqrt(pb)) * (sqrt(pa) - sqrt(pb)), 14)
               AS DECIMAL(20,14))) AS DOUBLE) / 2), 9) AS hellinger,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(ca) AS BIGINT) AS tot_a,
           CAST(sum(cb) AS BIGINT) AS tot_b
    FROM piv
    """,
)
def q_hellinger_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger distance H = sqrt(sum((sqrt(p)-sqrt(q))^2)/2) between
    the unigram distributions of two document sources — the drift
    metric for 'did this source's vocabulary shift?'.  Log-free on
    purpose: ``/`` and ``sqrt`` are exactly specified by IEEE-754, so
    each term is bit-identical cross-engine; terms are fixed-point
    rounded and decimal-summed so accumulation order can't drift.
    Shape: token explode -> (source,tok) agg -> source-partitioned
    window for totals -> tok-grouped pivot — all key-partitioned, no
    global sort, vocabulary-sized state."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").where(
        F.col("source").isin(_HG_A, _HG_B)
    )
    toks = docs.select(
        "source", F.explode(_norm_tokens("text")).alias("tok")
    )
    cnts = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    p = cnts.withColumn(
        "p",
        F.col("cnt").cast("double")
        / F.sum("cnt").over(Window.partitionBy("source")).cast("double"),
    )
    piv = p.groupBy("tok").agg(
        F.coalesce(
            F.sum(F.when(F.col("source") == _HG_A, F.col("p"))), F.lit(0.0)
        ).alias("pa"),
        F.coalesce(
            F.sum(F.when(F.col("source") == _HG_B, F.col("p"))), F.lit(0.0)
        ).alias("pb"),
        F.coalesce(
            F.sum(F.when(F.col("source") == _HG_A, F.col("cnt"))), F.lit(0)
        ).alias("ca"),
        F.coalesce(
            F.sum(F.when(F.col("source") == _HG_B, F.col("cnt"))), F.lit(0)
        ).alias("cb"),
    )
    term = (F.sqrt("pa") - F.sqrt("pb")) * (F.sqrt("pa") - F.sqrt("pb"))
    return piv.agg(
        F.round(
            F.sqrt(
                F.sum(F.round(term, 14).cast("decimal(20,14)")).cast("double")
                / 2
            ),
            9,
        ).alias("hellinger"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("ca").cast("bigint").alias("tot_a"),
        F.sum("cb").cast("bigint").alias("tot_b"),
    )


# ---------------------------------------------------------------------------
# cohens_kappa_quality — agreement between two deterministic raters.
# ---------------------------------------------------------------------------
_KAPPA_CHARS = 300  # rater A: document length in chars
_KAPPA_TOKS = 50  # rater B: normalized token count


@register(
    "cohens_kappa_quality",
    oracle=f"""
    WITH r AS (
      SELECT CASE WHEN n_chars >= {_KAPPA_CHARS} THEN 1 ELSE 0 END AS ra,
             CASE WHEN len({_TOKS_SQL.format(c="text")}) >= {_KAPPA_TOKS}
                  THEN 1 ELSE 0 END AS rb
      FROM documents
    ),
    c AS (
      SELECT CAST(sum(ra * rb) AS BIGINT) AS a,
             CAST(sum(ra * (1 - rb)) AS BIGINT) AS b,
             CAST(sum((1 - ra) * rb) AS BIGINT) AS c,
             CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM r
    )
    SELECT a, b, c, d, n,
           round((a + d) / CAST(n AS DOUBLE), 9) AS po,
           round(((a + b) / CAST(n AS DOUBLE)) *
                 ((a + c) / CAST(n AS DOUBLE)) +
                 (1 - (a + b) / CAST(n AS DOUBLE)) *
                 (1 - (a + c) / CAST(n AS DOUBLE)), 9) AS pe,
           round(((a + d) / CAST(n AS DOUBLE) -
                  (((a + b) / CAST(n AS DOUBLE)) *
                   ((a + c) / CAST(n AS DOUBLE)) +
                   (1 - (a + b) / CAST(n AS DOUBLE)) *
                   (1 - (a + c) / CAST(n AS DOUBLE)))) /
                 NULLIF(1 - (((a + b) / CAST(n AS DOUBLE)) *
                             ((a + c) / CAST(n AS DOUBLE)) +
                             (1 - (a + b) / CAST(n AS DOUBLE)) *
                             (1 - (a + c) / CAST(n AS DOUBLE))), 0), 9)
             AS kappa
    FROM c
    """,
)
def q_cohens_kappa_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document-quality raters
    (char-length >= {chars} vs normalized-token-count >= {toks}) — the
    standard 'do my heuristic labelers even agree beyond chance?' audit
    before trusting either as a training filter.  One map-side
    contingency aggregation (four exact integer cells); the kappa
    formula is spelled out identically in both dialects over those
    integers, so the only float ops are correctly-rounded divisions of
    identical operands."""
    docs = _t(spark, sf_dir, "documents")
    r = docs.select(
        F.when(F.col("n_chars") >= _KAPPA_CHARS, 1).otherwise(0).alias("ra"),
        F.when(
            F.size(_norm_tokens("text")) >= _KAPPA_TOKS, 1
        ).otherwise(0).alias("rb"),
    )
    c = r.agg(
        F.sum(F.col("ra") * F.col("rb")).cast("bigint").alias("a"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("bigint").alias("c"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb")))
        .cast("bigint")
        .alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("a") + F.col("d")) / nd
    pa = (F.col("a") + F.col("b")) / nd
    pb = (F.col("a") + F.col("c")) / nd
    pe = pa * pb + (1 - pa) * (1 - pb)
    return c.select(
        "a",
        "b",
        "c",
        "d",
        "n",
        F.round(po, 9).alias("po"),
        F.round(pe, 9).alias("pe"),
        F.round(
            (po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0)), 9
        ).alias("kappa"),
    )
