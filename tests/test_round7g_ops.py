"""Round-7g invariants on top of DuckDB parity: Wilson interval
bracketing and share partition-of-unity."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_funnel_ci_brackets_rate(spark):
    from clickhouse_table_copier_spark.queries_round7g import (
        q_funnel_conversion_ci,
    )

    rows = q_funnel_conversion_ci(spark, SF_ORACLE).collect()
    assert [r["step"] for r in sorted(rows, key=lambda r: r["step"])] == [1, 2]
    for r in rows:
        assert 0 < r["n_next"] <= r["n_at"]
        assert 0.0 <= r["wilson_lo"] < r["rate"] < r["wilson_hi"] <= 1.0


def test_hierarchical_shares_partition_unity(spark):
    from clickhouse_table_copier_spark.queries_round7g import (
        q_hierarchical_share_rollup,
    )

    rows = q_hierarchical_share_rollup(spark, SF_ORACLE).collect()
    by_region: dict = {}
    for r in rows:
        by_region.setdefault(r["region"], []).append(r)
    # nation shares sum to 1 within each region
    for region, rs in by_region.items():
        assert abs(sum(r["share_of_region"] for r in rs) - 1.0) < 1e-9
    # each region's share-of-total is constant across its nations and
    # the distinct region shares sum to 1
    region_share = {}
    for region, rs in by_region.items():
        vals = {r["region_share_of_total"] for r in rs}
        assert len(vals) == 1
        region_share[region] = vals.pop()
    assert abs(sum(region_share.values()) - 1.0) < 1e-9
