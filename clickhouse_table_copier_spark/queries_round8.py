"""Round-8 query batch: analytics-superset operators over the fixture
tables, each with a full DuckDB value oracle.

Reference parity note: the Go reference executes no relational
computation itself — `database/database.go` only *generates* metadata
SQL (counts, fingerprints, partition lists) for ClickHouse to run.
Everything here is the engine's analytics superset, built on the same
cross-engine determinism rules as the rest of the registry (integer /
decimal sufficient statistics, one final double op in a fixed order).

The batch:

- ``intra_doc_repeats_planted`` — VERDICT r7 "What's wrong #2": the
  ``intra_doc_repeats`` driver row was a 0-row match at sf0.01 (no
  fixture document repeats a 5-word span), so the hash match proved
  only that both engines find nothing.  This variant unions the corpus
  with two PLANTED literal documents — one containing a 6-word phrase
  twice, one with all-distinct words — so the same pipeline provably
  fires on a known repeat (spark_rows ≥ 1) while still sweeping the
  real corpus for false positives.
- ``rfm_segments`` — RFM customer segmentation: recency / frequency /
  monetary quintiles via the factored exact distributed ntile
  (``operators/ranks.exact_global_ntile``), rolled up to segment
  counts.  The classic marketing-analytics shape, and the first reuse
  of the r4 equi-depth design as a library operator.
- ``brand_price_ols`` — per-brand OLS of line price on quantity from
  exact integer sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy² as
  decimals; slope/intercept/R² are single double ops at the end) —
  closed-form regression without any per-row double accumulation.
- ``cuped_adjusted_lift`` — CUPED variance reduction for an A/B
  readout (Deng et al., WSDM 2013): θ = cov(X,Y)/var(X) from the same
  exact-sufficient-statistics trick, pre-period value as covariate,
  deterministic user_id-parity assignment; ONE global aggregate row,
  no join.
- ``supplier_part_cosine`` — supplier similarity as sparse cosine over
  (part, quantity) vectors via an inverted index on the part key
  (never all-pairs), exact integer dot products, top-3 per supplier.
- ``doc_containment`` — asymmetric near-dup containment
  |A∩B| / min(|A|,|B|) over the shared shingle index (catches
  small-doc-inside-big-doc pairs that symmetric Jaccard misses).
- ``nation_seat_apportionment`` — largest-remainder (Hare quota)
  apportionment of 100 "seats" across nations by exact integer
  revenue cents; the window runs over a ≤nation-cardinality aggregate
  (bounded-global-window exemption, like ``compaction_plan``).
- ``user_active_coverage`` — per-user union-of-intervals coverage via
  the gaps-and-islands sweep (running max of interval ends), all in
  integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register
from clickhouse_table_copier_spark.queries_pipeline import (
    _CORPUS_SQL,
    _SHINGLES_SQL,
    _shared_shingle_index,
)
from clickhouse_table_copier_spark.queries_round5 import (
    _NORM_SQL,
    SPAN_K,
    SPAN_MIN_RUN,
)

# ---------------------------------------------------------------------------
# intra_doc_repeats_planted
# ---------------------------------------------------------------------------

# 6-word phrase repeated twice: grams (k=4) at pos i and i+6 collide for
# i = 1..3 → one diagonal run of length 3 ≥ SPAN_MIN_RUN → the query
# must report doc -1 with longest_repeat_words = 3 + k - 1 = 6.
_PLANTED_REPEAT = (
    "alpha bravo charlie delta echo foxtrot "
    "alpha bravo charlie delta echo foxtrot"
)
# All-distinct words: zero gram collisions → must NOT be reported.
_PLANTED_CLEAN = "golf hotel india juliett kilo lima mike november"


@register(
    "intra_doc_repeats_planted",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT CAST(-1 AS BIGINT), '{_PLANTED_REPEAT}'
      UNION ALL SELECT CAST(-2 AS BIGINT), '{_PLANTED_CLEAN}'
    ),
    norm AS (
      SELECT doc_id, string_split({_NORM_SQL.format(c="text")}, ' ') AS w
      FROM corpus
    ),
    pos_t AS (
      SELECT doc_id, w,
             unnest(generate_series(1, greatest(len(w) - {SPAN_K} + 1, 0))) AS pos
      FROM norm WHERE len(w) >= {SPAN_K}
    ),
    grams AS (
      SELECT doc_id, pos,
             CAST('0x' || substring(
               md5(array_to_string(w[pos:pos+{SPAN_K}-1], ' ')), 1, 15)
               AS BIGINT) AS h
      FROM pos_t
    ),
    m AS (
      SELECT a.doc_id, a.pos AS pa, b.pos - a.pos AS diag
      FROM grams a JOIN grams b
        ON a.doc_id = b.doc_id AND a.h = b.h AND b.pos > a.pos
    ),
    runs AS (
      SELECT doc_id, diag, pa,
             pa - row_number() OVER (PARTITION BY doc_id, diag ORDER BY pa)
               AS grp
      FROM m
    ),
    spans AS (
      SELECT doc_id, count(*) AS run_len
      FROM runs GROUP BY doc_id, diag, grp
      HAVING count(*) >= {SPAN_MIN_RUN}
    )
    SELECT doc_id,
           CAST(max(run_len) + {SPAN_K} - 1 AS BIGINT) AS longest_repeat_words,
           CAST(count(*) AS BIGINT) AS n_repeat_spans
    FROM spans GROUP BY 1
    """,
)
def q_intra_doc_repeats_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same diagonal-runs pipeline as ``intra_doc_repeats``
    (queries_round5), over the corpus ∪ two planted docs.  Fresh
    ``span_grams`` (the shared artifact is corpus-only); planted side is
    a 2-row literal frame, so the union costs nothing at any scale."""
    from clickhouse_table_copier_spark.operators.dedup import span_grams

    planted = spark.createDataFrame(
        [(-1, _PLANTED_REPEAT), (-2, _PLANTED_CLEAN)],
        "doc_id long, text string",
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    grams = span_grams(docs.unionByName(planted), "doc_id", "text", k=SPAN_K)
    a, b = grams.alias("a"), grams.alias("b")
    m = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("a.h") == F.col("b.h"))
        & (F.col("b.pos") > F.col("a.pos")),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.pos").alias("pa"),
        (F.col("b.pos") - F.col("a.pos")).alias("diag"),
    )
    wrun = Window.partitionBy("doc_id", "diag").orderBy("pa")
    spans = (
        m.withColumn("grp", F.col("pa") - F.row_number().over(wrun))
        .groupBy("doc_id", "diag", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .where(F.col("run_len") >= SPAN_MIN_RUN)
    )
    return spans.groupBy("doc_id").agg(
        (F.max("run_len") + SPAN_K - 1)
        .cast("bigint")
        .alias("longest_repeat_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_repeat_spans"),
    )


# ---------------------------------------------------------------------------
# rfm_segments
# ---------------------------------------------------------------------------
@register(
    "rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS custkey,
             epoch_us(max(o_orderdate)) AS rec,
             count(*) AS freq,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS mon
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT CAST(ntile(5) OVER (ORDER BY rec,  custkey) AS INT) AS r_tile,
             CAST(ntile(5) OVER (ORDER BY freq, custkey) AS INT) AS f_tile,
             CAST(ntile(5) OVER (ORDER BY mon,  custkey) AS INT) AS m_tile,
             mon
      FROM base
    )
    SELECT r_tile, f_tile, m_tile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(CAST(sum(mon) AS BIGINT) AS DOUBLE) / 100.0
             AS total_monetary
    FROM t GROUP BY 1, 2, 3
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (last-order epoch µs),
    frequency (order count), monetary (exact cents), each assigned an
    EXACT global quintile by
    :func:`operators.ranks.exact_global_ntile_multi` — sketch-partitioned
    local ranks + metadata-sized offsets, never an `ntile() OVER ()`
    single-task global sort.  The three dimensions rank in ONE mechanism
    invocation: 2 driver actions total (fused bounds, packed count
    arrays) over the persisted per-customer frame, instead of 6 actions
    each re-running the upstream chain (measured 4.1 → 1.5 s warm at
    sf0.1; the full ladder is in the ranks.py module docstring).
    The output is the ≤125-row segment rollup, so the three ranking
    passes are the only SF-linear stages and each is fully distributed."""
    from clickhouse_table_copier_spark.operators.ranks import (
        exact_global_ntile_multi,
    )

    base = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.unix_micros(F.max("o_orderdate").cast("timestamp")).alias("rec"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("mon"),
        )
    )
    t = exact_global_ntile_multi(
        base,
        [
            ("rec", "custkey", 5, "r_tile"),
            ("freq", "custkey", 5, "f_tile"),
            ("mon", "custkey", 5, "m_tile"),
        ],
    )
    return t.groupBy("r_tile", "f_tile", "m_tile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        (F.sum("mon").cast("bigint").cast("double") / F.lit(100.0)).alias(
            "total_monetary"
        ),
    )


# ---------------------------------------------------------------------------
# brand_price_ols
# ---------------------------------------------------------------------------


def _exact_dbl_sql(expr: str) -> str:
    """Engine-neutral big-integer → double: DuckDB's HUGEINT→DOUBLE cast
    is NOT correctly rounded past 2⁵³ (measured: 66-bit values differ
    from Java/Python conversion by 1 ulp), so both engines convert via
    an exact hi/lo 2³² split — hi and lo each cast exactly (hi < 2⁵³
    for |v| < 2⁸⁵, the ×2³² shift is exponent-only), and the single add
    rounds once, correctly, identically everywhere."""
    a = f"abs({expr})"
    return (
        f"((CASE WHEN ({expr}) < 0 THEN -1.0 ELSE 1.0 END) * "
        f"(CAST(({a}) // 4294967296 AS DOUBLE) * 4294967296.0 "
        f"+ CAST(({a}) % 4294967296 AS DOUBLE)))"
    )


def _exact_dbl_col(name: str) -> Column:
    """Spark twin of :func:`_exact_dbl_sql` over a decimal(38,0) column
    (``div`` = integral division; both parts cast exactly)."""
    return F.expr(
        f"(CASE WHEN {name} < 0 THEN -1.0D ELSE 1.0D END) * "
        f"(CAST(abs({name}) div 4294967296 AS DOUBLE) * 4294967296.0D "
        f"+ CAST(abs({name}) % 4294967296 AS DOUBLE))"
    )


@register(
    "brand_price_ols",
    oracle=f"""
    WITH pts AS (
      SELECT p.p_brand,
             CAST(l.l_quantity AS BIGINT) AS x,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    s AS (
      SELECT p_brand,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM pts GROUP BY 1
    ),
    m AS (
      SELECT p_brand, n, sx, sy,
             n * sxy - sx * sy AS num,
             n * sxx - sx * sx AS den,
             n * syy - sy * sy AS den_y
      FROM s
    )
    SELECT p_brand,
           CAST(n AS BIGINT) AS n_lines,
           {_exact_dbl_sql("num")} / {_exact_dbl_sql("den")} AS slope_cents,
           ({_exact_dbl_sql("sy")}
              - ({_exact_dbl_sql("num")} / {_exact_dbl_sql("den")})
                * {_exact_dbl_sql("sx")})
             / CAST(n AS DOUBLE) AS intercept_cents,
           ({_exact_dbl_sql("num")} * {_exact_dbl_sql("num")})
             / ({_exact_dbl_sql("den")} * {_exact_dbl_sql("den_y")}) AS r2
    FROM m
    """,
)
def q_brand_price_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form per-brand OLS of price-cents on quantity.  The
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are EXACT — bigint
    products summed into decimal(38,0), order-insensitive — and
    slope/intercept/R² are a fixed sequence of double ops on those
    exact integers, so both engines produce bit-identical doubles.
    One grouped aggregate with map-side partials; the part dim
    broadcasts.  This is how regression runs at 100 TB: no per-row
    double accumulation (regr_slope's running-mean form is
    order-dependent), just mergeable integer partials."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    dec = "decimal(38,0)"
    # products in decimal(18,0)² → decimal(37,0): exact and overflow-safe
    # where Σ(bigint·bigint) would wrap past 2⁶³ at corpus scale
    xd = F.col("x").cast("decimal(18,0)")
    yd = F.col("y").cast("decimal(18,0)")
    s = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast(dec).alias("n"),
            F.sum("x").cast(dec).alias("sx"),
            F.sum("y").cast(dec).alias("sy"),
            F.sum(xd * yd).cast(dec).alias("sxy"),
            F.sum(xd * xd).cast(dec).alias("sxx"),
            F.sum(yd * yd).cast(dec).alias("syy"),
        )
    )
    m = s.select(
        "p_brand",
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("den_y"),
    )
    num = _exact_dbl_col("num")
    den = _exact_dbl_col("den")
    den_y = _exact_dbl_col("den_y")
    slope = num / den
    return m.select(
        "p_brand",
        F.col("n").cast("bigint").alias("n_lines"),
        slope.alias("slope_cents"),
        (
            (_exact_dbl_col("sy") - slope * _exact_dbl_col("sx"))
            / F.col("n").cast("double")
        ).alias("intercept_cents"),
        ((num * num) / (den * den_y)).alias("r2"),
    )


# ---------------------------------------------------------------------------
# cuped_adjusted_lift
# ---------------------------------------------------------------------------

# Experiment split date: the fixture's event window is 2024-01-01..30;
# the first half is the pre-period covariate window.
_CUPED_SPLIT = "2024-01-16"


@register(
    "cuped_adjusted_lift",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS treat,
             CAST(sum(CASE WHEN ts <  TIMESTAMP '{_CUPED_SPLIT}'
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS HUGEINT)
               AS n_t,
             CAST(sum(CASE WHEN treat = 1 THEN x ELSE 0 END) AS HUGEINT)
               AS sx_t,
             CAST(sum(CASE WHEN treat = 1 THEN y ELSE 0 END) AS HUGEINT)
               AS sy_t,
             CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS HUGEINT)
               AS n_c,
             CAST(sum(CASE WHEN treat = 0 THEN x ELSE 0 END) AS HUGEINT)
               AS sx_c,
             CAST(sum(CASE WHEN treat = 0 THEN y ELSE 0 END) AS HUGEINT)
               AS sy_c
      FROM per_user
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
           (CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
              - CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE)) AS raw_lift_cents,
           ((CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
               - (CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE))
                 * (CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                    - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
            - (CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE)
               - (CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE))
                 * (CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE)
                    - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))
             AS cuped_lift_cents
    FROM s
    """,
)
def q_cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B lift (Deng, Xu, Kohavi, Walker — WSDM 2013):
    θ = cov(X,Y)/var(X) with the pre-period per-user value sum as the
    covariate X; adjusted group means need only GROUP-LEVEL sums
    (mean Yg − θ(mean Xg − mean X)), so the whole readout is ONE
    two-stage aggregate — per-user conditional sums, then a single
    global row of exact decimal partials — with every double op applied
    to exact integers in a fixed order.  Assignment is user_id parity:
    deterministic and engine-neutral.  No join, no window; at 100 TB
    this is two map-side-combined shuffles of constant-width rows."""
    us = _t(spark, sf_dir, "events").select(
        "user_id",
        (F.col("user_id") % 2).cast("int").alias("treat"),
        F.when(
            F.col("ts") < F.lit(_CUPED_SPLIT).cast("timestamp_ntz"),
            F.round(F.col("value") * 100).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("pre_c"),
        F.when(
            F.col("ts") >= F.lit(_CUPED_SPLIT).cast("timestamp_ntz"),
            F.round(F.col("value") * 100).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("post_c"),
    )
    per_user = us.groupBy("user_id", "treat").agg(
        F.sum("pre_c").cast("bigint").alias("x"),
        F.sum("post_c").cast("bigint").alias("y"),
    )
    dec = "decimal(38,0)"
    t1 = F.col("treat") == 1
    xd = F.col("x").cast("decimal(18,0)")
    yd = F.col("y").cast("decimal(18,0)")
    s = per_user.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(xd * yd).cast(dec).alias("sxy"),
        F.sum(xd * xd).cast(dec).alias("sxx"),
        F.sum(F.when(t1, 1).otherwise(0)).cast(dec).alias("n_t"),
        F.sum(F.when(t1, F.col("x")).otherwise(0)).cast(dec).alias("sx_t"),
        F.sum(F.when(t1, F.col("y")).otherwise(0)).cast(dec).alias("sy_t"),
        F.sum(F.when(~t1, 1).otherwise(0)).cast(dec).alias("n_c"),
        F.sum(F.when(~t1, F.col("x")).otherwise(0)).cast(dec).alias("sx_c"),
        F.sum(F.when(~t1, F.col("y")).otherwise(0)).cast(dec).alias("sy_c"),
    )
    theta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    mean_x = F.col("sx").cast("double") / F.col("n").cast("double")
    my_t = F.col("sy_t").cast("double") / F.col("n_t").cast("double")
    my_c = F.col("sy_c").cast("double") / F.col("n_c").cast("double")
    mx_t = F.col("sx_t").cast("double") / F.col("n_t").cast("double")
    mx_c = F.col("sx_c").cast("double") / F.col("n_c").cast("double")
    return s.select(
        F.col("n").cast("bigint").alias("n_users"),
        theta.alias("theta"),
        (my_t - my_c).alias("raw_lift_cents"),
        (
            (my_t - theta * (mx_t - mean_x)) - (my_c - theta * (mx_c - mean_x))
        ).alias("cuped_lift_cents"),
    )


# ---------------------------------------------------------------------------
# supplier_part_cosine
# ---------------------------------------------------------------------------

_COSINE_TOP_K = 3


@register(
    "supplier_part_cosine",
    oracle=f"""
    WITH sp AS (
      SELECT l_suppkey AS s, l_partkey AS p,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    norms AS (
      SELECT s, CAST(sum(CAST(q AS HUGEINT) * q) AS BIGINT) AS nn
      FROM sp GROUP BY 1
    ),
    dots AS (
      SELECT a.s AS id_a, b.s AS id_b,
             CAST(sum(CAST(a.q AS HUGEINT) * b.q) AS BIGINT) AS dot
      FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2
    ),
    cos AS (
      SELECT id_a, id_b, dot,
             CAST(dot AS DOUBLE)
               / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))
               AS cosine
      FROM dots
      JOIN norms na ON na.s = id_a
      JOIN norms nb ON nb.s = id_b
    )
    SELECT id_a, id_b, dot, cosine,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rnk
      FROM cos
    )
    WHERE rnk <= {_COSINE_TOP_K}
    """,
)
def q_supplier_part_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse item-item cosine: suppliers as (part → total quantity)
    vectors, dot products via an inverted index on the part key (pairs
    are generated ONLY for suppliers sharing a part — Σ df² over parts,
    never the all-pairs cross), exact integer dot/norms, cosine as one
    fixed-order double expression, top-3 per supplier through a window
    PARTITIONED by supplier.  The 100-TB lever is the same max_df cap
    the n-gram index uses: drop ubiquitous parts from the JOIN side
    (they carry no discriminative signal but dominate the quadratic
    term) — not needed at fixture df ≈ 30.  The vector frame feeds three
    consumers (both join sides + norms), so it is a SHARED session
    artifact (one lineitem scan+groupBy per session, measured
    5.5 → 3.6 s warm at sf0.1 when first cached), and since round 9 it
    goes through ``_cache_get``'s measured-size compaction: ~80k rows in
    32 partitions made every cached read pay 32 tasks of scheduling —
    the r7 triangle-count diagnosis — and compaction also lets AQE
    broadcast the self-join sides instead of exchanging both."""
    from clickhouse_table_copier_spark.queries_pipeline import (
        _shared_supplier_part_vectors,
    )

    sp = _shared_supplier_part_vectors(spark, sf_dir)
    qd = "decimal(18,0)"
    norms = sp.groupBy("s").agg(
        F.sum(F.col("q").cast(qd) * F.col("q").cast(qd))
        .cast("bigint")
        .alias("nn")
    )
    a, b = sp.alias("a"), sp.alias("b")
    dots = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("id_a"), F.col("b.s").alias("id_b"))
        .agg(
            F.sum(F.col("a.q").cast(qd) * F.col("b.q").cast(qd))
            .cast("bigint")
            .alias("dot")
        )
    )
    na = norms.select(F.col("s").alias("id_a"), F.col("nn").alias("na"))
    nb = norms.select(F.col("s").alias("id_b"), F.col("nn").alias("nb"))
    cos = (
        dots.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .select(
            "id_a",
            "id_b",
            "dot",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), "id_b")
    return (
        cos.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= _COSINE_TOP_K)
        .select("id_a", "id_b", "dot", "cosine", "rnk")
    )


# ---------------------------------------------------------------------------
# doc_containment
# ---------------------------------------------------------------------------

_CONTAINMENT_MIN = 0.8


@register(
    "doc_containment",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    shing AS ({_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, count(*) AS sz FROM shing GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter_cnt
      FROM shing a JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, inter_cnt,
           CAST(inter_cnt AS DOUBLE) / least(sa.sz, sb.sz) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(inter_cnt AS DOUBLE) / least(sa.sz, sb.sz) >= {_CONTAINMENT_MIN}
    """,
)
def q_doc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection: containment
    |A∩B| / min(|A|,|B|) over the SHARED shingle index (one build per
    session, same artifact the Jaccard/cluster/split queries consume).
    Catches a small doc pasted inside a large one, which symmetric
    Jaccard scores near |A|/|B| and misses; the corpus's "+ extra
    token" variants are exactly this shape.  Integer intersection
    counts until one final double division."""
    ex = _shared_shingle_index(spark, sf_dir)
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter_cnt"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    containment = F.col("inter_cnt").cast("double") / F.least(
        F.col("sz_a"), F.col("sz_b")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(containment >= _CONTAINMENT_MIN)
        .select("id_a", "id_b", "inter_cnt", containment.alias("containment"))
    )


# ---------------------------------------------------------------------------
# nation_seat_apportionment
# ---------------------------------------------------------------------------

_SEATS = 100


@register(
    "nation_seat_apportionment",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ),
    q AS (
      SELECT n_name, rev_c,
             CAST((CAST(rev_c AS HUGEINT) * {_SEATS})
                  // CAST(sum(rev_c) OVER () AS HUGEINT) AS BIGINT)
               AS floor_seats,
             CAST((CAST(rev_c AS HUGEINT) * {_SEATS})
                  % CAST(sum(rev_c) OVER () AS HUGEINT) AS BIGINT)
               AS rem
      FROM rev
    ),
    r AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, n_name) AS rnk,
             {_SEATS} - sum(floor_seats) OVER () AS leftover
      FROM q
    )
    SELECT n_name, rev_c, floor_seats,
           CAST(floor_seats + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS seats
    FROM r
    """,
)
def q_nation_seat_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hare quota) apportionment of {_SEATS} seats
    across nations by exact revenue cents.  Exact integer arithmetic
    throughout: floor seats = rev·S div total, remainders ranked with a
    deterministic (rem DESC, name) tie-break.  The total and the floor
    sum are metadata-sized scalar collects (one row each — the
    basket_type_lift pattern); the ranking window runs over the
    ≤nation-cardinality aggregate, exempted as a bounded global window
    exactly like compaction_plan."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("bigint").alias("oc")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("oc").cast("bigint").alias("rev_c"))
    )
    total = rev.agg(F.sum("rev_c").cast("bigint").alias("t")).collect()[0]["t"]
    q = rev.select(
        "n_name",
        "rev_c",
        F.expr(f"CAST(rev_c * {_SEATS} DIV {total} AS BIGINT)").alias(
            "floor_seats"
        ),
        F.expr(f"CAST(rev_c * {_SEATS} % {total} AS BIGINT)").alias("rem"),
    )
    floor_sum = q.agg(F.sum("floor_seats").alias("fs")).collect()[0]["fs"]
    leftover = _SEATS - int(floor_sum)
    w = Window.orderBy(F.desc("rem"), "n_name")
    return (
        q.withColumn("rnk", F.row_number().over(w))
        .select(
            "n_name",
            "rev_c",
            "floor_seats",
            (
                F.col("floor_seats")
                + F.when(F.col("rnk") <= leftover, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("seats"),
        )
    )


# ---------------------------------------------------------------------------
# user_active_coverage
# ---------------------------------------------------------------------------
@register(
    "user_active_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s_us,
             epoch_us(ts) + CAST(round(value * 1000) AS BIGINT) * 1000 AS e_us
      FROM events
    ),
    marked AS (
      SELECT user_id, s_us, e_us,
             CASE WHEN s_us > max(e_us) OVER (
                    PARTITION BY user_id ORDER BY s_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR max(e_us) OVER (
                    PARTITION BY user_id ORDER BY s_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS new_island,
             event_id
      FROM iv
    ),
    islands AS (
      SELECT user_id, s_us, e_us,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s_us, event_id) AS island
      FROM marked
    ),
    spans AS (
      SELECT user_id, island,
             min(s_us) AS i_start, max(e_us) AS i_end
      FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(i_end - i_start) AS BIGINT) AS covered_us
    FROM spans GROUP BY 1
    """,
)
def q_user_active_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals coverage per user (each event spans
    [ts, ts + value seconds], in integer microseconds): the
    gaps-and-islands sweep — a running max of interval ends over the
    (start, event_id) order detects island starts, a running sum
    numbers islands, and per-island min/max give exact covered time.
    Both windows are PARTITIONED by user_id, so at 100 TB each user's
    sweep is one local sorted pass after the partition shuffle; no
    global sort, no self-join."""
    ev = _t(spark, sf_dir, "events")
    s_us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "user_id",
        "event_id",
        s_us.alias("s_us"),
        (s_us + F.round(F.col("value") * 1000).cast("bigint") * 1000).alias(
            "e_us"
        ),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("e_us").over(w_prev)
    marked = iv.select(
        "user_id",
        "s_us",
        "e_us",
        "event_id",
        F.when(
            prev_max.isNull() | (F.col("s_us") > prev_max), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_run = Window.partitionBy("user_id").orderBy("s_us", "event_id")
    islands = marked.withColumn("island", F.sum("new_island").over(w_run))
    spans = islands.groupBy("user_id", "island").agg(
        F.min("s_us").alias("i_start"), F.max("e_us").alias("i_end")
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum(F.col("i_end") - F.col("i_start")).cast("bigint").alias(
            "covered_us"
        ),
    )
