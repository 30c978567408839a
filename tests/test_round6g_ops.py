"""Round-trip property: the generated changelog, applied back through
the round-5 CDC MERGE operator, must reconstruct snapshot B exactly —
tying changelog GENERATION (snapshot_changelog) to changelog
APPLICATION (apply_changelog) as mutual inverses."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_changelog_applied_reconstructs_snapshot_b(spark):
    from clickhouse_table_copier_spark.operators.cdc import apply_changelog
    from clickhouse_table_copier_spark.queries import _t
    from clickhouse_table_copier_spark.queries_round6g import (
        _snapshot_b,
        q_snapshot_changelog,
    )

    a = _t(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = _snapshot_b(spark, SF_SMOKE)
    chg = q_snapshot_changelog(spark, SF_SMOKE)
    # widen to apply_changelog's contract: I becomes an upsert, payload
    # columns come from snapshot B (absent for deletes), constant seq
    full = (
        chg.select(
            "o_orderkey",
            F.when(F.col("op") == "I", F.lit("U"))
            .otherwise(F.col("op"))
            .alias("op"),
        )
        .join(b.select("o_orderkey", "o_orderstatus", "o_totalprice"),
              "o_orderkey", "left")
        .withColumn("seq", F.lit(1))
    )
    post = apply_changelog(a, full, key="o_orderkey")
    got = sorted(
        (r["o_orderkey"], r["o_orderstatus"], r["o_totalprice"])
        for r in post.collect()
    )
    want = sorted(
        (r["o_orderkey"], r["o_orderstatus"], r["o_totalprice"])
        for r in b.collect()
    )
    assert got == want
