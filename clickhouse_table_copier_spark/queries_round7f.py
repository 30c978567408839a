"""Query batch: round-7f — MinHash set-overlap estimation over
arbitrary ID sets, gated by the exact answer.

``audience_overlap_minhash`` estimates the pairwise Jaccard overlap of
event-type AUDIENCES (user-id sets) from k=128 MinHash minima and gates
the estimate against the exact overlap — the sketch that answers
"how much do these two segments overlap" without ever materializing
either set, completing the repo's sketch family (HLL → distinct count,
CMS → frequencies, Misra-Gries → heavy hitters, GK → quantiles,
MinHash → set similarity). Distinct from the text-dedup MinHash: there
the sets are shingles of ONE document; here they are corpus-wide ID
sets whose per-permutation minima are MERGEABLE partial aggregates —
the form that ships one 128-integer sketch per segment out of a 100 TB
scan and estimates any pairwise overlap afterwards.

Output is SPARSE, as similarity joins are: a segment pair with zero
shared members produces no row (implicitly 0) rather than forcing a
segment-pair cross join to emit zeros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register

_MH_K = 128
_MH_TOL = 0.2  # Chernoff-ish: k=128 keeps |est − J| ≤ 0.2 w.h.p.

# Permuted hash: md5 over "<perm>|<user_id>" (first 12 hex → bigint),
# the package's established cross-engine uniform hash. The per-(set,
# perm) MINIMUM is a mergeable partial — at scale each executor emits
# 128 minima per segment and the merge is elementwise min.
_PERM_HASH_SQL = (
    "CAST('0x' || substring(md5(CAST(p AS VARCHAR) || '|' ||"
    " CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT)"
)


@register(
    "audience_overlap_minhash",
    oracle=f"""
    WITH aud AS (
      SELECT DISTINCT event_type, user_id FROM events WHERE value > 150
    ),
    perms AS (
      SELECT event_type, user_id, unnest(generate_series(1, {_MH_K})) AS p
      FROM aud
    ),
    minima AS (
      SELECT event_type, p, min({_PERM_HASH_SQL}) AS h
      FROM perms GROUP BY 1, 2
    ),
    agree AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree
      FROM minima a JOIN minima b
        ON a.p = b.p AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    sizes AS (SELECT event_type, count(*) AS sz FROM aud GROUP BY 1),
    inter AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b,
             count(*) AS inter_cnt
      FROM aud x JOIN aud y
        ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b,
           CAST(CAST(i.inter_cnt AS DOUBLE) /
                CAST(sa.sz + sb.sz - i.inter_cnt AS DOUBLE) AS DOUBLE)
             AS exact_jaccard,
           CAST(CAST(g.n_agree AS DOUBLE) / {_MH_K} AS DOUBLE)
             AS est_jaccard,
           abs(CAST(i.inter_cnt AS DOUBLE) /
               CAST(sa.sz + sb.sz - i.inter_cnt AS DOUBLE)
               - CAST(g.n_agree AS DOUBLE) / {_MH_K}) <= {_MH_TOL}
             AS within_tolerance
    FROM inter i
    JOIN agree g ON g.type_a = i.type_a AND g.type_b = i.type_b
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """,
)
def q_audience_overlap_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # audience = users with a >150-value event of the type: on this
    # fixture every user triggers every type at least once, so the raw
    # audiences are identical (all overlaps 1.0 — a degenerate demo);
    # the value cutoff yields varied 0.25-0.40 overlaps the estimate
    # actually has to earn
    aud = (
        ev.where(F.col("value") > 150)
        .select("event_type", "user_id")
        .distinct()
    )
    perms = aud.select(
        "event_type",
        "user_id",
        F.explode(F.sequence(F.lit(1), F.lit(_MH_K))).alias("p"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("p").cast("string"),
                    F.lit("|"),
                    F.col("user_id").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    minima = (
        perms.select("event_type", "p", h.alias("hh"))
        .groupBy("event_type", "p")
        .agg(F.min("hh").alias("h"))
    )
    a, b = minima.alias("a"), minima.alias("b")
    agree = (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.sum(
                F.when(F.col("a.h") == F.col("b.h"), 1).otherwise(0)
            ).cast("bigint").alias("n_agree")
        )
    )
    sizes = aud.groupBy("event_type").agg(F.count(F.lit(1)).alias("sz"))
    x, y = aud.alias("x"), aud.alias("y")
    inter = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter_cnt"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("sz").alias("sz_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("sz").alias("sz_b")
    )
    exact = F.col("inter_cnt").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter_cnt")
    ).cast("double")
    est = F.col("n_agree").cast("double") / F.lit(float(_MH_K))
    return (
        inter.join(agree, ["type_a", "type_b"])
        .join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            exact.alias("exact_jaccard"),
            est.alias("est_jaccard"),
            (F.abs(exact - est) <= _MH_TOL).alias("within_tolerance"),
        )
    )
