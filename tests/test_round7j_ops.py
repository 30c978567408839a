"""Round-7j invariants: Kaplan–Meier mechanics and dedup-graph shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_survival_curve_km_mechanics(spark):
    """S is non-increasing, at-risk drops by exactly the event count,
    and each S(d) equals the ordered product of hazards recomputed
    driver-side."""
    from clickhouse_table_copier_spark.queries_round7j import q_survival_curve

    rows = sorted(
        q_survival_curve(spark, SF_ORACLE).collect(), key=lambda r: r["day"]
    )
    assert [r["day"] for r in rows] == list(range(7))
    surv = 1.0
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_at_risk"] == prev["n_at_risk"] - prev["n_events"]
        assert cur["survival"] <= prev["survival"]
    for r in rows:
        surv = surv * (1.0 - r["n_events"] / r["n_at_risk"])
        assert r["survival"] == surv


def test_survival_planted_immediate_conversion(spark, tmp_path):
    """Every user signs up then purchases within day 0 → S(0) = 0 and
    all later days carry zero at-risk-safe output (n_at_risk 0 never
    divides: no later events exist)."""
    from clickhouse_table_copier_spark.queries_round7j import q_survival_curve

    rows = []
    for u in range(10):
        rows.append((u * 2, "2024-01-01 00:00:00", u, "signup", 1.0, "{}"))
        rows.append((u * 2 + 1, "2024-01-01 01:00:00", u, "purchase", 1.0, "{}"))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).write.parquet(f"{sf}/events.parquet")
    got = sorted(q_survival_curve(spark, sf).collect(), key=lambda r: r["day"])
    assert got[0]["n_at_risk"] == 10 and got[0]["n_events"] == 10
    assert got[0]["survival"] == 0.0
    assert all(r["survival"] == 0.0 for r in got[1:])


def test_cluster_size_distribution_shape(spark):
    """Sizes ≥ 2 (graph components only), doc shares partition the
    clustered population, and Σ size·n_clusters equals the clustered
    doc count from the clusters query itself."""
    from clickhouse_table_copier_spark.queries_pipeline import (
        q_dedup_clusters_jaccard,
    )
    from clickhouse_table_copier_spark.queries_round7j import (
        q_cluster_size_distribution,
    )

    rows = q_cluster_size_distribution(spark, SF_ORACLE).collect()
    assert all(r["cluster_size"] >= 2 for r in rows)
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-9
    n_docs = q_dedup_clusters_jaccard(spark, SF_ORACLE).count()
    assert sum(r["cluster_size"] * r["n_clusters"] for r in rows) == n_docs
