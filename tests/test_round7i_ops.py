"""Round-7i properties: Poisson-bootstrap CI behavior and calibration
deciles, beyond the DuckDB value parity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_bootstrap_ci_brackets_mean_and_shrinks_with_n(spark):
    """The CI must bracket the point estimate with width on the
    σ/√n scale (uniform [0,250]ish values, n≈2000 ⇒ width well under
    20), and all 64 replicas must have survived the sw>0 filter."""
    from clickhouse_table_copier_spark.queries_round7i import (
        q_bootstrap_mean_ci,
    )

    rows = q_bootstrap_mean_ci(spark, SF_ORACLE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_reps"] == 64
        assert r["ci_lo"] < r["mean_value"] < r["ci_hi"]
        width = r["ci_hi"] - r["ci_lo"]
        sigma_over_sqrt_n = 75.0 / math.sqrt(r["n"])
        assert width < 8 * sigma_over_sqrt_n  # sane scale, not degenerate
        assert width > 0.5 * sigma_over_sqrt_n


def test_bootstrap_weights_mean_one(spark):
    """The inlined Poisson cutoffs give E[w] ≈ 1 (the property that
    makes each replica an unbiased resample): the empirical mean weight
    over all (row, replica) draws sits within 1%."""
    from clickhouse_table_copier_spark.queries_round7i import (
        _BOOT_B,
        _POIS_CUM,
    )
    from clickhouse_table_copier_spark.queries import _events

    import hashlib

    # (a) the DESIGN expectation is exact arithmetic on the cutoffs:
    # largest-remainder rounding makes E[w] = Σ_k P(u ≥ c_k) EXACTLY 1
    design_e = sum((256 - c) / 256 for c in _POIS_CUM)
    assert design_e == 1.0
    # (b) the realized md5 draws over the full sf0.01 fixture (640k
    # draws — a fixed deterministic set, so tolerance covers its
    # one-time sampling deviation, ~8 standard errors)
    ids = [
        r["event_id"]
        for r in _events(spark, SF_ORACLE).select("event_id").collect()
    ]
    total = 0
    for eid in ids:
        for b in range(1, _BOOT_B + 1):
            g, j = (b + 11) // 12, (b - 1) % 12
            d = hashlib.md5(f"{eid}#{g}".encode()).hexdigest()
            half = int(d[12 * (j // 6) : 12 * (j // 6) + 12], 16)
            u = (half // (256 ** (j % 6))) % 256
            total += sum(1 for c in _POIS_CUM if u >= c)
    mean_w = total / (len(ids) * _BOOT_B)
    assert abs(mean_w - 1.0) < 0.01


def test_calibration_deciles_shape(spark):
    """Equal-mass deciles (sizes differ ≤1), rates in [0,1], decile
    value ranges non-overlapping and increasing."""
    from clickhouse_table_copier_spark.queries_round7i import (
        q_value_decile_conversion,
    )

    rows = sorted(
        q_value_decile_conversion(spark, SF_ORACLE).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n_events"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert 0.0 <= r["purchase_rate"] <= 1.0
        assert r["lo"] <= r["hi"]
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]
