"""Round-8i query batch: hybrid retrieval fusion, binned Wasserstein
drift, zone-map prune estimation, and a seasonal-forecast error ratio.

- ``ann_rank_fusion`` — Reciprocal Rank Fusion (Cormack/Clarke/Buettcher,
  SIGIR'09) of the two retrieval signals the repo already serves: BM25
  lexical top-k over ``documents`` and exact-cosine dense top-k over the
  aligned ``embeddings`` (vec_id == doc_id).  RRF(d) = sum over lists of
  1/(60 + rank_d) — THE standard hybrid-retrieval combiner, and the
  integer ranks make it exactly reproducible where score-interpolation
  fusion would not be.  Both input lists are TakeOrdered top-k frames,
  so every downstream op is k-bounded.
- ``wasserstein_value_drift`` — 1-D earth-mover distance between two
  order-value cohorts on a FIXED 50-bin grid.  Completes the repo's
  drift-metric family (TVD = max vertical gap family, KS = sup CDF gap,
  Hellinger = sqrt-space, W1 = area between CDFs — each answers a
  different 'how did the distribution move?').  Exactness trick: the
  per-bin term |cumA*totB - cumB*totA| is INTEGER, so the whole sum is
  exact and ONE final division produces the distance.
- ``zone_map_prune_estimate`` — how many year-month partitions (and
  rows) a predicate can skip using only zone maps (per-partition
  min/max), contrasting a partition-ALIGNED zone column (ship date —
  skips almost everything) with an UNALIGNED one (quantity — skips
  nothing): the data-skipping planner's core estimate, one grouped
  pass.
- ``mase_seasonal_baseline`` — MASE-style ratio MAE(naive-7) /
  MAE(naive-1) on the daily-revenue series: is there exploitable weekly
  structure?  (< 1 means the seasonal-naive forecast beats carry-
  forward.)  All numerators/denominators decimal-exact; one division.

Reference parity note: the Go reference's surface is metadata SQL
(``database/database.go``); these queries extend the engine's executed
analytics layer the reference's ClickHouse backend would provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register
from clickhouse_table_copier_spark.queries_round3 import q_bm25_rank, _BM25_TERMS
from clickhouse_table_copier_spark.queries_similarity import (
    _dot_chain_sql,
    _norm_chain_sql,
)

_DEC = "decimal(18,2)"

# ---------------------------------------------------------------------------
# ann_rank_fusion — RRF of BM25 top-k and dense-cosine top-k.
# ---------------------------------------------------------------------------
_RRF_K = 60  # the SIGIR'09 constant
_FUSE_DEPTH = 20  # per-list depth
_FUSE_OUT = 10


def _bm25_oracle_cte() -> str:
    """The bm25_rank oracle body as a CTE chain (same constants —
    queries_round3._BM25_TERMS — so the lexical list is identical)."""
    from clickhouse_table_copier_spark.queries_round3 import (
        _BM25_NORM,
        _bm25_comp_sql,
    )

    tf_cols = ", ".join(
        f"CAST(len(list_filter(toks, t -> t = '{t}')) AS INTEGER) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) OVER () AS DOUBLE)"
        f" AS df_{t}"
        for t in _BM25_TERMS
    )
    score = " + ".join(_bm25_comp_sql(t) for t in _BM25_TERMS)
    any_tf = " + ".join(f"tf_{t}" for t in _BM25_TERMS)
    return f"""
    tok AS (
      SELECT doc_id,
             list_filter(string_split({_BM25_NORM}, ' '), t -> t <> '') AS toks
      FROM documents
    ),
    base AS (
      SELECT doc_id, CAST(len(toks) AS INTEGER) AS dl, {tf_cols} FROM tok
    ),
    g AS (
      SELECT *,
             CAST(count(*) OVER () AS DOUBLE) AS n_docs,
             CAST(sum(dl) OVER () AS DOUBLE)
               / CAST(count(*) OVER () AS DOUBLE) AS avgdl,
             {df_cols}
      FROM base
    ),
    lex AS (
      SELECT doc_id, round({score}, 6) AS bm25 FROM g WHERE {any_tf} > 0
    ),
    lex_ranked AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)
                  AS INTEGER) AS r
      FROM lex ORDER BY bm25 DESC, doc_id ASC LIMIT {_FUSE_DEPTH}
    )"""


@register(
    "ann_rank_fusion",
    oracle=f"""
    WITH {_bm25_oracle_cte()},
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    dense AS (
      SELECT b.vec_id AS doc_id,
             round(({_dot_chain_sql("b.embedding", "q.qv")})
                   / ({_norm_chain_sql("b.embedding")}
                      * {_norm_chain_sql("q.qv")}), 6) AS sim
      FROM embeddings b, q WHERE b.vec_id <> 0
    ),
    dense_ranked AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY sim DESC, doc_id ASC)
                  AS INTEGER) AS r
      FROM dense ORDER BY sim DESC, doc_id ASC LIMIT {_FUSE_DEPTH}
    ),
    fused AS (
      SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
             l.r AS r_lex, d.r AS r_dense,
             round(coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + l.r), 0)
                   + coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + d.r), 0), 9)
               AS rrf
      FROM lex_ranked l FULL OUTER JOIN dense_ranked d
        ON l.doc_id = d.doc_id
    )
    SELECT doc_id, r_lex, r_dense, rrf FROM fused
    ORDER BY rrf DESC, doc_id ASC LIMIT {_FUSE_OUT}
    """,
)
def q_ann_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: RRF-fuse the BM25 lexical top-{depth} with the
    dense cosine top-{depth} (embeddings row i is document i's vector).
    Every rank is an integer from a (rounded score DESC, doc_id ASC)
    total order, so 1/(60+rank) sums are bit-identical cross-engine.
    Scale shape: both lists arrive via TakeOrderedAndProject (per-
    partition heaps, no global sort); the ranking windows and the
    full-outer join then run on <= {depth}-row frames."""
    from clickhouse_table_copier_spark.operators.dedup import spread
    from clickhouse_table_copier_spark.operators.similarity import cosine

    # lexical list: the registered BM25 scorer, cut to the fusion depth
    lex = (
        q_bm25_rank(spark, sf_dir)
        .select("doc_id", "bm25")
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_FUSE_DEPTH)
    )
    lex_ranked = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("r_lex"),
    )
    emb = spread(_t(spark, sf_dir, "embeddings"))
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]
    qcol = F.array(*[F.lit(x) for x in qvec])
    dense = (
        emb.where(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), qcol), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(_FUSE_DEPTH)
    )
    dense_ranked = dense.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("sim"), F.asc("doc_id")))
        .alias("r_dense"),
    )
    one = F.lit(1).cast("double")
    fused = (
        lex_ranked.join(dense_ranked, "doc_id", "full_outer")
        .select(
            "doc_id",
            "r_lex",
            "r_dense",
            F.round(
                F.coalesce(one / (_RRF_K + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(one / (_RRF_K + F.col("r_dense")), F.lit(0.0)),
                9,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(_FUSE_OUT)


# ---------------------------------------------------------------------------
# wasserstein_value_drift — binned 1-D EMD between two order cohorts.
# ---------------------------------------------------------------------------
_W1_YEAR_A, _W1_YEAR_B = 1996, 1999
_W1_BINS = 50
_W1_WIDTH = 12_000.0  # fixed grid: [0, 600k) covers o_totalprice


@register(
    "wasserstein_value_drift",
    oracle=f"""
    WITH binned AS (
      SELECT least(CAST(floor(o_totalprice / {_W1_WIDTH}) AS BIGINT),
                   {_W1_BINS - 1}) AS bin,
             CAST(sum(CASE WHEN year(o_orderdate) = {_W1_YEAR_A}
                           THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN year(o_orderdate) = {_W1_YEAR_B}
                           THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM orders
      WHERE year(o_orderdate) IN ({_W1_YEAR_A}, {_W1_YEAR_B})
      GROUP BY 1
    ),
    cum AS (
      SELECT bin,
             coalesce(lead(bin) OVER (ORDER BY bin), bin + 1) - bin AS gap,
             sum(na) OVER (ORDER BY bin) AS ca,
             sum(nb) OVER (ORDER BY bin) AS cb,
             sum(na) OVER () AS ta, sum(nb) OVER () AS tb
      FROM binned
    )
    SELECT round({_W1_WIDTH} *
             CAST(sum(abs(ca * tb - cb * ta) * gap) AS DOUBLE)
             / NULLIF(CAST(max(ta) * max(tb) AS DOUBLE), 0), 9) AS w1,
           CAST(max(ta) AS BIGINT) AS n_a,
           CAST(max(tb) AS BIGINT) AS n_b,
           CAST(count(*) AS BIGINT) AS n_bins_used
    FROM cum
    """,
)
def q_wasserstein_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth-mover) distance between the {ya} and {yb}
    order-value distributions on a fixed {bins}-bin grid: W1 = width *
    sum_bins |CDF_a - CDF_b|.  The per-bin term is computed as the
    INTEGER |cumA*totB - cumB*totA|, so the sum is exact and the only
    float op is one final division — no accumulation-order drift is
    possible.  Shape: one grouped pass bins both cohorts, then the
    cumulative window runs over <= {bins} rows (grid-bounded at any
    SF)."""
    orders = _t(spark, sf_dir, "orders").where(
        F.year("o_orderdate").isin(_W1_YEAR_A, _W1_YEAR_B)
    )
    binned = orders.groupBy(
        F.least(
            F.floor(F.col("o_totalprice") / _W1_WIDTH).cast("bigint"),
            F.lit(_W1_BINS - 1),
        ).alias("bin")
    ).agg(
        F.sum(
            F.when(F.year("o_orderdate") == _W1_YEAR_A, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("na"),
        F.sum(
            F.when(F.year("o_orderdate") == _W1_YEAR_B, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("nb"),
    )
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    # int128-headroom: cum*total products overflow int64 once cohorts
    # pass ~3e9 rows, so the cross products run in decimal (DuckDB's
    # window sums are HUGEINT already)
    dec = "decimal(19,0)"
    # CDFs are CONSTANT across empty grid bins, so each occupied bin's
    # |CDF gap| is weighted by the distance to the next occupied bin
    # (the last bin's gap is irrelevant: its cum diff is 0 by totals)
    w_lead = Window.orderBy("bin")
    cum = binned.select(
        "bin",
        (
            F.coalesce(F.lead("bin").over(w_lead), F.col("bin") + 1)
            - F.col("bin")
        ).alias("gap"),
        F.sum("na").over(w_cum).cast(dec).alias("ca"),
        F.sum("nb").over(w_cum).cast(dec).alias("cb"),
        F.sum("na").over(w_all).cast(dec).alias("ta"),
        F.sum("nb").over(w_all).cast(dec).alias("tb"),
    )
    return cum.agg(
        F.round(
            F.lit(_W1_WIDTH)
            * F.sum(
                F.abs(F.col("ca") * F.col("tb") - F.col("cb") * F.col("ta"))
                * F.col("gap")
            ).cast("double")
            / F.nullif((F.max("ta") * F.max("tb")).cast("double"), F.lit(0.0)),
            9,
        ).alias("w1"),
        F.max("ta").cast("bigint").alias("n_a"),
        F.max("tb").cast("bigint").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins_used"),
    )


# ---------------------------------------------------------------------------
# zone_map_prune_estimate — data-skipping potential: aligned vs
# unaligned zone columns on the same partitioning.
# ---------------------------------------------------------------------------
_ZM_D_LO, _ZM_D_HI = "1997-03-01", "1997-05-31"  # aligned: shipdate range
_ZM_Q_LO, _ZM_Q_HI = 45.0, 50.0  # unaligned: l_quantity BETWEEN


@register(
    "zone_map_prune_estimate",
    oracle=f"""
    WITH zones AS (
      SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INTEGER)
               AS yyyymm,
             min(CAST(l_shipdate AS DATE)) AS dmin,
             max(CAST(l_shipdate AS DATE)) AS dmax,
             min(l_quantity) AS qmin, max(l_quantity) AS qmax,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_partitions,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN dmax < DATE '{_ZM_D_LO}'
                           OR dmin > DATE '{_ZM_D_HI}'
                         THEN 1 ELSE 0 END) AS BIGINT) AS date_skippable,
           CAST(sum(CASE WHEN dmax < DATE '{_ZM_D_LO}'
                           OR dmin > DATE '{_ZM_D_HI}'
                         THEN n_rows ELSE 0 END) AS BIGINT)
             AS date_rows_skipped,
           CAST(sum(CASE WHEN qmax < {_ZM_Q_LO} OR qmin > {_ZM_Q_HI}
                         THEN 1 ELSE 0 END) AS BIGINT) AS qty_skippable,
           CAST(sum(CASE WHEN qmax < {_ZM_Q_LO} OR qmin > {_ZM_Q_HI}
                         THEN n_rows ELSE 0 END) AS BIGINT)
             AS qty_rows_skipped
    FROM zones
    """,
)
def q_zone_map_prune_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping audit over year-month partitions: per-partition
    zone maps (min/max) for the partition-ALIGNED column (l_shipdate —
    a 3-month date predicate skips every other partition) and for an
    UNALIGNED column (l_quantity — its zones span the full domain in
    every partition, so the same machinery skips nothing).  The
    contrast is the planner arithmetic behind parquet row-group
    skipping / CH minmax skip indexes, and the motivation for the
    repo's zorder_layout operator.  ONE grouped pass builds all zones;
    the report is partition-count-bounded (~84 zone rows in, 1 out)."""
    li = _t(spark, sf_dir, "lineitem")
    zones = li.groupBy(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
        .cast("int")
        .alias("yyyymm")
    ).agg(
        F.min(F.col("l_shipdate").cast("date")).alias("dmin"),
        F.max(F.col("l_shipdate").cast("date")).alias("dmax"),
        F.min("l_quantity").alias("qmin"),
        F.max("l_quantity").alias("qmax"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    d_skip = (F.col("dmax") < F.lit(_ZM_D_LO).cast("date")) | (
        F.col("dmin") > F.lit(_ZM_D_HI).cast("date")
    )
    q_skip = (F.col("qmax") < _ZM_Q_LO) | (F.col("qmin") > _ZM_Q_HI)
    return zones.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum(F.when(d_skip, 1).otherwise(0)).cast("bigint").alias(
            "date_skippable"
        ),
        F.sum(F.when(d_skip, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("date_rows_skipped"),
        F.sum(F.when(q_skip, 1).otherwise(0)).cast("bigint").alias(
            "qty_skippable"
        ),
        F.sum(F.when(q_skip, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("qty_rows_skipped"),
    )


# ---------------------------------------------------------------------------
# mase_seasonal_baseline — MAE(naive-7) / MAE(naive-1) on daily revenue.
# ---------------------------------------------------------------------------
@register(
    "mase_seasonal_baseline",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem GROUP BY 1
    ),
    lagged AS (
      SELECT day, rev,
             lag(rev, 7) OVER (ORDER BY day) AS rev_w,
             lag(rev, 1) OVER (ORDER BY day) AS rev_d
      FROM daily
    ),
    e AS (
      SELECT abs(rev - rev_w) AS e7, abs(rev - rev_d) AS e1
      FROM lagged WHERE rev_w IS NOT NULL AND rev_d IS NOT NULL
    )
    SELECT round(CAST(sum(e7) AS DOUBLE) / NULLIF(CAST(sum(e1) AS DOUBLE), 0),
                 9) AS mase,
           CAST(sum(e7) AS DOUBLE) AS sum_abs_err_weekly,
           CAST(sum(e1) AS DOUBLE) AS sum_abs_err_daily,
           CAST(count(*) AS BIGINT) AS n_days
    FROM e
    """,
)
def q_mase_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-structure test: the ratio of the seasonal-naive (t-7)
    forecast's total absolute error to the carry-forward (t-1) baseline
    on daily revenue — MASE < 1 means weekly seasonality is exploitable.
    Both error sums stay decimal-exact (revenue is DECIMAL(18,2) end to
    end); the single division is the only float op.  The lag window
    runs over the calendar-bounded groupBy(day) aggregate (same
    justification as daily_autocorr / ch_delta_sum)."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_shipdate").cast("date").alias("day")
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount").cast(_DEC))
        ).alias("rev")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "rev",
        F.lag("rev", 7).over(w).alias("rev_w"),
        F.lag("rev", 1).over(w).alias("rev_d"),
    ).where(F.col("rev_w").isNotNull() & F.col("rev_d").isNotNull())
    e = lagged.select(
        F.abs(F.col("rev") - F.col("rev_w")).alias("e7"),
        F.abs(F.col("rev") - F.col("rev_d")).alias("e1"),
    )
    return e.agg(
        F.round(
            F.sum("e7").cast("double")
            / F.nullif(F.sum("e1").cast("double"), F.lit(0.0)),
            9,
        ).alias("mase"),
        F.sum("e7").cast("double").alias("sum_abs_err_weekly"),
        F.sum("e1").cast("double").alias("sum_abs_err_daily"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
