"""Round-8 operator semantics: exact distributed ntile, the planted
intra-doc-repeat gate, apportionment invariants, interval-union bounds,
OLS cross-check, CUPED shape, cosine top-k, containment.

Full DuckDB value parity for every registered round-8 query is covered
by tests/test_oracle_queries.py (the registry-wide hash check); these
tests pin the properties a value hash can't express — e.g. that the
planted repeat is actually FOUND (the r7 verdict's vacuous-match fix),
or that seats sum to exactly the house size.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


# ---------------------------------------------------------------------------
# operators/ranks.exact_global_ntile
# ---------------------------------------------------------------------------
def _duck_ntile(rows, k):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT, tie BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    return {
        (r[0], r[1]): r[2]
        for r in con.execute(
            f"SELECT v, tie, ntile({k}) OVER (ORDER BY v, tie) FROM t"
        ).fetchall()
    }


@pytest.mark.parametrize(
    "rows,k",
    [
        # heavy ties across tile boundaries
        ([(i % 5, i) for i in range(103)], 10),
        # strictly increasing, n not divisible by k
        ([(i * 7, i) for i in range(57)], 4),
        # n < k: every row its own tile, exact ntile still defined
        ([(i, i) for i in range(3)], 10),
        # degenerate single-value domain (no sketch boundaries at all)
        ([(42, i) for i in range(20)], 3),
    ],
)
def test_exact_global_ntile_matches_duckdb(spark, rows, k):
    from clickhouse_table_copier_spark.operators.ranks import exact_global_ntile

    df = spark.createDataFrame(rows, "v long, tie long")
    got = {
        (r["v"], r["tie"]): r["nt"]
        for r in exact_global_ntile(df, "v", "tie", k, "nt").collect()
    }
    assert got == _duck_ntile(rows, k)


def test_exact_global_ntile_no_single_task_sort(spark):
    """The whole point of the operator: no Window over an unpartitioned
    global Sort in the physical plan."""
    import re

    from clickhouse_table_copier_spark.operators.ranks import exact_global_ntile

    df = spark.range(1000).select(
        (F.col("id") % 37).alias("v"), F.col("id").alias("tie")
    )
    plan = (
        exact_global_ntile(df, "v", "tie", 10, "nt")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not re.search(
        r"Window .*\n.*Sort .*\n.*Exchange SinglePartition", plan
    )


# ---------------------------------------------------------------------------
# intra_doc_repeats_planted — the r7 "vacuous 0-row match" fix
# ---------------------------------------------------------------------------
def test_planted_repeat_is_found(spark):
    """doc -1 (6-word phrase repeated twice) MUST be reported with
    longest_repeat_words = 6 and one span; doc -2 (all-distinct words)
    must NOT appear. Guarantees the driver row hashes a non-empty set."""
    from clickhouse_table_copier_spark.queries_round8 import (
        q_intra_doc_repeats_planted,
    )

    rows = {
        r["doc_id"]: r
        for r in q_intra_doc_repeats_planted(spark, SF_ORACLE).collect()
    }
    assert -1 in rows, "planted repeat doc not detected"
    assert rows[-1]["longest_repeat_words"] == 6
    assert rows[-1]["n_repeat_spans"] == 1
    assert -2 not in rows, "false positive on all-distinct planted doc"


# ---------------------------------------------------------------------------
# nation_seat_apportionment — largest-remainder invariants
# ---------------------------------------------------------------------------
def test_apportionment_sums_to_house_size(spark):
    from clickhouse_table_copier_spark.queries_round8 import (
        _SEATS,
        q_nation_seat_apportionment,
    )

    rows = q_nation_seat_apportionment(spark, SF_ORACLE).collect()
    assert sum(r["seats"] for r in rows) == _SEATS
    for r in rows:
        assert r["seats"] - r["floor_seats"] in (0, 1)
    # quota property: every nation's seats within 1 of its exact quota
    total = sum(r["rev_c"] for r in rows)
    for r in rows:
        quota = r["rev_c"] * _SEATS / total
        assert quota - 1 < r["seats"] < quota + 1


# ---------------------------------------------------------------------------
# user_active_coverage — interval-union bounds
# ---------------------------------------------------------------------------
def test_coverage_bounded_by_span_and_max_duration(spark):
    from clickhouse_table_copier_spark.queries import _t
    from clickhouse_table_copier_spark.queries_round8 import (
        q_user_active_coverage,
    )

    cov = {
        r["user_id"]: r
        for r in q_user_active_coverage(spark, SF_ORACLE).collect()
    }
    s_us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = {
        r["user_id"]: r
        for r in _t(spark, SF_ORACLE, "events")
        .select(
            "user_id",
            s_us.alias("s"),
            (s_us + F.round(F.col("value") * 1000).cast("bigint") * 1000).alias(
                "e"
            ),
            (F.round(F.col("value") * 1000).cast("bigint") * 1000).alias("d"),
        )
        .groupBy("user_id")
        .agg(
            F.min("s").alias("lo"),
            F.max("e").alias("hi"),
            F.max("d").alias("dmax"),
            F.sum("d").alias("dsum"),
        )
        .collect()
    }
    assert set(cov) == set(bounds)
    for u, r in cov.items():
        b = bounds[u]
        # union is at most the hull, at most the duration sum,
        # at least the longest single interval
        assert r["covered_us"] <= b["hi"] - b["lo"]
        assert r["covered_us"] <= b["dsum"]
        assert r["covered_us"] >= b["dmax"]
        assert r["n_islands"] >= 1


# ---------------------------------------------------------------------------
# brand_price_ols — independent numeric cross-check
# ---------------------------------------------------------------------------
def test_ols_matches_numpy(spark):
    import numpy as np

    from clickhouse_table_copier_spark.queries import _t
    from clickhouse_table_copier_spark.queries_round8 import q_brand_price_ols

    got = {
        r["p_brand"]: r for r in q_brand_price_ols(spark, SF_ORACLE).collect()
    }
    pdf = (
        _t(spark, SF_ORACLE, "lineitem")
        .join(
            _t(spark, SF_ORACLE, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_brand",
            F.col("l_quantity").cast("double").alias("x"),
            F.round(F.col("l_extendedprice") * 100).alias("y"),
        )
        .toPandas()
    )
    for brand, g in pdf.groupby("p_brand"):
        slope, intercept = np.polyfit(g["x"], g["y"], 1)
        r = got[brand]
        assert r["n_lines"] == len(g)
        assert abs(r["slope_cents"] - slope) <= 1e-6 * max(1.0, abs(slope))
        assert abs(r["intercept_cents"] - intercept) <= 1e-6 * abs(intercept)
        assert 0.0 <= r["r2"] <= 1.0


# ---------------------------------------------------------------------------
# cuped_adjusted_lift — shape + independent raw-lift check
# ---------------------------------------------------------------------------
def test_cuped_single_row_and_raw_lift(spark):
    from clickhouse_table_copier_spark.queries import _t
    from clickhouse_table_copier_spark.queries_round8 import (
        _CUPED_SPLIT,
        q_cuped_adjusted_lift,
    )

    rows = q_cuped_adjusted_lift(spark, SF_ORACLE).collect()
    assert len(rows) == 1
    r = rows[0]
    per_user = (
        _t(spark, SF_ORACLE, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("ts") >= F.lit(_CUPED_SPLIT).cast("timestamp_ntz"),
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(0)
            ).alias("y")
        )
        .collect()
    )
    t = [float(x["y"]) for x in per_user if x["user_id"] % 2 == 1]
    c = [float(x["y"]) for x in per_user if x["user_id"] % 2 == 0]
    raw = sum(t) / len(t) - sum(c) / len(c)
    assert r["n_users"] == len(per_user)
    assert abs(r["raw_lift_cents"] - raw) < 1e-6 * max(1.0, abs(raw))
    # theta is a real covariance ratio, not degenerate
    assert r["theta"] == r["theta"]  # not NaN
    assert r["cuped_lift_cents"] == r["cuped_lift_cents"]


# ---------------------------------------------------------------------------
# supplier_part_cosine / doc_containment — output invariants
# ---------------------------------------------------------------------------
def test_cosine_topk_invariants(spark):
    from clickhouse_table_copier_spark.queries_round8 import (
        _COSINE_TOP_K,
        q_supplier_part_cosine,
    )

    rows = q_supplier_part_cosine(spark, SF_ORACLE).collect()
    assert rows
    per_a: dict = {}
    for r in rows:
        assert 0.0 < r["cosine"] <= 1.0
        assert 1 <= r["rnk"] <= _COSINE_TOP_K
        assert r["id_a"] < r["id_b"]
        per_a.setdefault(r["id_a"], []).append(r)
    for rs in per_a.values():
        assert len(rs) <= _COSINE_TOP_K
        assert sorted(r["rnk"] for r in rs) == list(range(1, len(rs) + 1))


def test_containment_catches_extra_token_variants(spark):
    """The corpus's doc_id+200000 'extra token appended' variants are
    the small-in-big shape containment exists for: each must pair with
    its original at containment ≈ 1 even though symmetric Jaccard
    may sit below the 0.5 dedup threshold."""
    from clickhouse_table_copier_spark.queries_round8 import (
        _CONTAINMENT_MIN,
        q_doc_containment,
    )

    rows = q_doc_containment(spark, SF_ORACLE).collect()
    assert rows
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    for r in rows:
        assert _CONTAINMENT_MIN <= r["containment"] <= 1.0
    variant_pairs = [p for p in pairs if p[1] == p[0] + 200000]
    assert variant_pairs, "no original↔variant containment pair found"


# ---------------------------------------------------------------------------
# rfm_segments — partition of the customer base
# ---------------------------------------------------------------------------
def test_rfm_partitions_customers(spark):
    from clickhouse_table_copier_spark.queries import _t
    from clickhouse_table_copier_spark.queries_round8 import q_rfm_segments

    rows = q_rfm_segments(spark, SF_ORACLE).collect()
    n_cust = (
        _t(spark, SF_ORACLE, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        for c in ("r_tile", "f_tile", "m_tile"):
            assert 1 <= r[c] <= 5
