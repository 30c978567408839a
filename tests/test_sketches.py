"""Misra-Gries two-pass heavy hitters (operators/sketches.py): the merge
rule's guarantee proven on CONSTRUCTED skew where the sketch actually
drops values (the fixture vocabulary is smaller than k, so the oracle
query alone can't exercise the lossy path)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _skew_df(spark, n_rows: int = 20000, n_tail: int = 1000):
    """Deterministic skew: 5 heavy values carry 75% of rows (15% each —
    above the n/(k+1) guarantee line for k=8), the remaining 25% spread
    over ~n_tail distinct tail values (far beyond the sketch capacity).
    Hash-repartitioned so no partition sees a sorted stream."""
    heavy = F.concat(F.lit("h"), (F.col("id") % 5).cast("string"))
    tail = F.concat(F.lit("t"), (F.col("id") % n_tail).cast("string"))
    return (
        spark.range(n_rows)
        .select(F.when(F.col("id") % 4 != 0, heavy).otherwise(tail).alias("value"))
        .repartition(8, F.xxhash64("value"))
    )


def test_mg_merge_rule_bounds_and_drops():
    from clickhouse_table_copier_spark.operators.sketches import _mg_merge

    c = _mg_merge({}, {"a": 10, "b": 5, "c": 3, "d": 1}, k=2)
    # (k+1)-th largest = 3 subtracted from all, non-positives dropped
    assert c == {"a": 7, "b": 2}
    # merging preserves the lower-bound property: counts never exceed truth
    c2 = _mg_merge(dict(c), {"a": 4, "e": 9}, k=2)
    assert set(c2) <= {"a", "b", "e"}
    assert all(v > 0 for v in c2.values())


def test_heavy_hitters_exact_on_skew_with_lossy_sketch(spark):
    """k_counters=8 over ~1005 distinct values — partitions MUST drop
    tail values — yet the two-pass result equals the exact top-5 because
    the head frequencies exceed n/(k+1)."""
    from clickhouse_table_copier_spark.operators.sketches import (
        heavy_hitters_exact_topk,
        misra_gries_candidates,
    )

    df = _skew_df(spark)
    exact = {
        (r["value"], r["cnt"])
        for r in df.groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("value"))
        .limit(5)
        .collect()
    }
    got = {
        (r["value"], r["freq"])
        for r in heavy_hitters_exact_topk(df, "value", k_counters=8, topn=5).collect()
    }
    assert got == exact
    # and the sketch was genuinely lossy: fewer candidates than values
    n_cand = (
        misra_gries_candidates(df, "value", 8)
        .groupBy("value")
        .agg(F.sum("lb").alias("lb"))
        .where(F.col("lb") > 0)
        .count()
    )
    n_distinct = df.distinct().count()
    assert n_cand < n_distinct


def test_candidate_superset_guarantee(spark):
    """Every value with true frequency > n/(k+1) must survive pass 1 —
    the Misra-Gries covering guarantee the exactness of pass 2 rests on."""
    from clickhouse_table_copier_spark.operators.sketches import misra_gries_candidates

    df = _skew_df(spark)
    n = df.count()
    k = 8
    heavy = {
        r["value"]
        for r in df.groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > n / (k + 1))
        .collect()
    }
    cand = {
        r["value"]
        for r in misra_gries_candidates(df, "value", k)
        .groupBy("value")
        .agg(F.sum("lb").alias("lb"))
        .where(F.col("lb") > 0)
        .collect()
    }
    assert heavy <= cand, heavy - cand


def test_mg_merge_property_vs_exact_counts():
    """Hypothesis: for ANY multiset split into ANY partitioning, the
    merged MG summary (a) never overcounts any value, and (b) undercounts
    by at most n/(k+1) in total per value — the bound the two-pass
    exactness argument rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from clickhouse_table_copier_spark.operators.sketches import _mg_merge

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=300),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=10),
    )
    def run(values, k, n_chunks):
        from collections import Counter

        exact = Counter(values)
        n = len(values)
        # deterministic chunking driven by hypothesis' n_chunks
        size = max(1, n // n_chunks)
        merged: dict = {}
        for i in range(0, n, size):
            chunk = Counter(values[i : i + size])
            merged = _mg_merge(merged, dict(chunk), k)
        for v, lb in merged.items():
            assert lb <= exact[v], "MG overcounted"
        for v, c in exact.items():
            assert merged.get(v, 0) >= c - n / (k + 1) - 1e-9, (
                f"undercount bound violated for {v}"
            )

    run()
