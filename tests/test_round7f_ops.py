"""Round-7f: MinHash audience-overlap estimator — endpoint sanity on
constructed sets (identical → 1.0, disjoint → ~0) on top of the DuckDB
value parity covered by tests/test_oracle_queries.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_minhash_endpoints_identical_and_disjoint(spark, tmp_path):
    from clickhouse_table_copier_spark.queries_round7f import (
        q_audience_overlap_minhash,
    )

    rows = []
    eid = 0
    # types 'a' and 'b': identical 40-user audiences; 'c': disjoint
    for u in range(40):
        for t in ("a", "b"):
            rows.append((eid, "2024-01-01 00:00:00", u, t, 200.0, "{}"))
            eid += 1
    for u in range(100, 140):
        rows.append((eid, "2024-01-01 00:00:00", u, "c", 200.0, "{}"))
        eid += 1
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        (r["type_a"], r["type_b"]): r
        for r in q_audience_overlap_minhash(spark, sf).collect()
    }
    ab = got[("a", "b")]
    assert ab["exact_jaccard"] == 1.0 and ab["est_jaccard"] == 1.0
    # zero-overlap pairs are ABSENT by design (sparse similarity-join
    # output: the exact intersection inner-join emits nothing) — they
    # are implicitly 0, not rows
    assert ("a", "c") not in got and ("b", "c") not in got


def test_minhash_fixture_within_tolerance(spark):
    from clickhouse_table_copier_spark.queries_round7f import (
        q_audience_overlap_minhash,
    )

    rows = q_audience_overlap_minhash(spark, SF_ORACLE).collect()
    assert len(rows) == 10  # C(5 types, 2)
    assert all(r["within_tolerance"] for r in rows)
    # non-degenerate: the cutoff audiences genuinely differ
    assert all(r["exact_jaccard"] < 1.0 for r in rows)
