"""Planted-data semantics for the round-9 model-eval / feature-audit
batch: each test writes a tiny parquet fixture with a KNOWN answer and
points the registered query at it (the queries read ``{sf_dir}/
{table}.parquet``, so a tmp dir with the right table names is a full
fixture).  The DuckDB hash gate (test_oracle_queries) checks
cross-engine agreement; these tests check the MATH is the intended one.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clickhouse_table_copier_spark import queries_round9 as r9

# Driver-gate lane split (r17): SLOW lane (see pytest.ini) so the
# default gate completes inside the driver's verify budget; run with
#   python -m pytest tests/ -m slow -q
pytestmark = pytest.mark.slow


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")


def _orders(spark, tmp_path, rows):
    _write(
        spark,
        tmp_path,
        "orders",
        rows,
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    )
    return str(tmp_path)


def test_auc_perfect_ranking(spark, tmp_path):
    """Every positive scored above every negative → AUC = 1 exactly."""
    rows = [(i, 1000.0 + i, "1-URGENT") for i in range(10)] + [
        (100 + i, 10.0 + i, "5-LOW") for i in range(10)
    ]
    sf = _orders(spark, tmp_path, rows)
    out = r9.q_auc_exact(spark, sf).collect()[0]
    assert out["n_pos"] == 10 and out["n_neg"] == 10
    assert out["auc_ppm"] == 1_000_000
    assert out["gini_ppm"] == 1_000_000


def test_auc_ties_midrank(spark, tmp_path):
    """All scores equal → AUC = 0.5 exactly (pure midrank ties)."""
    rows = [(i, 42.0, "1-URGENT") for i in range(5)] + [
        (100 + i, 42.0, "5-LOW") for i in range(5)
    ]
    sf = _orders(spark, tmp_path, rows)
    out = r9.q_auc_exact(spark, sf).collect()[0]
    assert out["auc_ppm"] == 500_000
    assert out["gini_ppm"] == 0


def test_gini_split_gain_perfect_threshold(spark, tmp_path):
    """Positives all ≥ 250k, negatives all < 250k → the 250k stump is
    pure: gain = parent Gini = 0.5 for a balanced label."""
    rows = [(i, 300_000.0 + i, "2-HIGH") for i in range(8)] + [
        (100 + i, 1_000.0 + i, "3-MEDIUM") for i in range(8)
    ]
    sf = _orders(spark, tmp_path, rows)
    got = {r["thr"]: r["gini_gain"] for r in r9.q_gini_split_gain(spark, sf).collect()}
    assert got[250_000] == 0.5
    # a threshold below every row splits nothing: zero gain... but the
    # left side is empty there (NaN guard is the fixture's job at real
    # scale); check an impure-but-valid split instead
    assert 0.0 <= got[350_000] < 0.5


def test_pr_curve_perfect_threshold(spark, tmp_path):
    rows = [(i, 300_000.0, "1-URGENT") for i in range(6)] + [
        (100 + i, 100_000.0, "4-NOT SPECIFIED") for i in range(6)
    ]
    sf = _orders(spark, tmp_path, rows)
    got = {r["thr"]: r for r in r9.q_pr_curve_thresholds(spark, sf).collect()}
    # at t=200k: exactly the positives predicted → P = R = F1 = 1
    assert got[200_000]["precision_ppm"] == 1_000_000
    assert got[200_000]["recall_ppm"] == 1_000_000
    assert got[200_000]["f1_ppm"] == 1_000_000
    # at t=50k: everything predicted positive → precision 0.5, recall 1
    assert got[50_000]["precision_ppm"] == 500_000
    assert got[50_000]["recall_ppm"] == 1_000_000


def test_calibration_perfectly_calibrated_bin(spark, tmp_path):
    """Orders at price 50k (score 0.1) with exactly 10% positives land
    in bin 1 with mean_score == pos_rate → abs_gap 0 → that bin
    contributes nothing to ECE."""
    rows = [(0, 50_000.0, "1-URGENT")] + [
        (i, 50_000.0, "5-LOW") for i in range(1, 10)
    ]
    sf = _orders(spark, tmp_path, rows)
    out = r9.q_calibration_ece(spark, sf).collect()
    assert len(out) == 1 and out[0]["bin"] == 1
    assert out[0]["mean_score"] == 0.1 and out[0]["pos_rate"] == 0.1
    assert out[0]["abs_gap"] == 0.0 and out[0]["ece"] == 0.0


def test_welch_known_values(spark, tmp_path):
    """Hand-computed Welch on two tiny samples: treat {1,2,3},
    control {2,4,6,8} (values in units; user parity sets the group)."""
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows.append((2 * i + 1, "2024-01-05 00:00:00", 2 * i + 1, "purchase", v))
    for i, v in enumerate([2.0, 4.0, 6.0, 8.0]):
        rows.append((100 + 2 * i, "2024-01-05 00:00:00", 100 + 2 * i, "purchase", v))
    spark.createDataFrame(
        [
            (eid, "2024-01-05 00:00:00", uid, et, val)
            for eid, _, uid, et, val in rows
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = r9.q_welch_ttest_ab(spark, str(tmp_path)).collect()[0]
    assert out["n_treat"] == 3 and out["n_control"] == 4
    # treat mean 2, var 1, vn1 = 1/3; control mean 5, var 20/3, vn0 = 5/3
    # t = (2-5)/sqrt(2) = -2.121320344; df = 4/(1/18 + 25/27) = 216/53
    assert abs(out["mean_diff"] - (-3.0)) < 1e-9
    assert abs(out["t_stat"] - (-2.121320344)) < 1e-8
    assert abs(out["df_welch"] - 216 / 53) < 1e-8


def test_psi_identical_distributions_near_zero(spark, tmp_path):
    """The same value histogram on both sides of the split → PSI ≈ 0
    (exactly 0 up to smoothing, which cancels when counts match)."""
    rows = []
    eid = 0
    for day, ref in (("2024-01-10", True), ("2024-01-20", False)):
        for v in [10.0, 60.0, 110.0, 160.0, 210.0] * 4:
            rows.append((eid, f"{day} 00:00:00", eid, "view", v))
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = r9.q_psi_feature_stability(spark, str(tmp_path)).collect()
    assert all(r["psi_term"] == 0.0 for r in out)
    assert all(r["psi"] == 0.0 for r in out)
    assert {r["bin"] for r in out} == {0, 1, 2, 3, 4}


def test_categorical_association_independent_and_identical(spark, tmp_path):
    """A balanced independent pair → χ² = 0, V = 0, MI = 0; the orders
    pair where status fully determines priority → V = 1."""
    li = []
    for rf in ("A", "R"):
        for ls in ("F", "O"):
            for i in range(5):
                li.append((len(li), rf, ls))
    _write(spark, tmp_path, "lineitem", li, "l_orderkey long, l_returnflag string, l_linestatus string")
    od = [(i, "O", "1-URGENT") for i in range(6)] + [
        (10 + i, "F", "5-LOW") for i in range(6)
    ]
    _write(spark, tmp_path, "orders", od, "o_orderkey long, o_orderstatus string, o_orderpriority string")
    out = {r["feature_pair"]: r for r in r9.q_categorical_association(spark, str(tmp_path)).collect()}
    ind = out["lineitem.l_returnflag|l_linestatus"]
    assert ind["chi2"] == 0.0 and ind["cramers_v"] == 0.0 and ind["mi_nats"] == 0.0
    det = out["orders.o_orderstatus|o_orderpriority"]
    assert det["cramers_v"] == 1.0
    # MI of a deterministic balanced binary pair = ln 2
    assert abs(det["mi_nats"] - 0.693147181) < 1e-8


def test_knn_label_noise_planted_clusters(spark, tmp_path):
    """Two tight, well-separated clusters with consistent labels →
    agreement 1.0, nothing flagged; one vector mislabeled into the
    other cluster's label → its probe flags (0/5 neighbors agree)."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(20):  # cluster A near +e0, label 0 (even ids probe)
        v = np.zeros(64)
        v[0] = 0.9
        v += rng.normal(0, 0.01, 64)
        rows.append((i, [float(x) for x in v], 0))
    for i in range(20, 40):  # cluster B near +e1, label 1
        v = np.zeros(64)
        v[1] = 0.9
        v += rng.normal(0, 0.01, 64)
        rows.append((i, [float(x) for x in v], 1))
    # vec 40: sits in cluster A but labeled 9 (planted noise, probe id)
    v = np.zeros(64)
    v[0] = 0.9
    rows.append((40, [float(x) for x in v], 9))
    _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<double>, label int",
    )
    out = {r["label"]: r for r in r9.q_knn_label_noise(spark, str(tmp_path)).collect()}
    assert out[0]["agreement_ppm"] == 1_000_000 and out[0]["n_flagged"] == 0
    assert out[1]["agreement_ppm"] == 1_000_000 and out[1]["n_flagged"] == 0
    assert out[9]["agreement_ppm"] == 0 and out[9]["n_flagged"] == 1
