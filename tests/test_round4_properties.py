"""Property/invariant tests for the round-4 operators.

The oracle gate already pins these queries' values on the fixtures; the
tests here pin the ALGORITHMIC claims on inputs the fixtures can't
exercise — arbitrary-entropy strings for the fuzzy join, bit-level
roundtrips for the z-order curve, mass conservation for PageRank,
packing bounds for the compaction planner, and partitioning invariance
for the deterministic sample.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein (classic DP), used as the ground truth."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_join_equals_brute_force_on_mixed_entropy_strings(spark):
    """The deletion-neighborhood join must return EXACTLY the brute-force
    lev<=d pairs on strings the fixtures don't cover: random entropy,
    heavy character repeats (the skeleton-dedup stress case), shared
    prefixes, different lengths, and near-empty strings."""
    rng = random.Random(41)
    strings = (
        ["".join(rng.choice("abc") for _ in range(rng.randint(0, 9))) for _ in range(12)]
        + ["aaaaaab", "aaaaaaa", "aaabaaa", "zzzzzzzz"]
        + ["prefix-" + rng.choice("xy") * rng.randint(1, 3) for _ in range(6)]
        + ["", "a", "ab"]
    )
    rows = [(i, s) for i, s in enumerate(strings)]
    expected = sorted(
        (i, j, _lev(a, b))
        for (i, a) in rows
        for (j, b) in rows
        if i < j and _lev(a, b) <= 2
    )

    from clickhouse_table_copier_spark.operators.fuzzy import edit_distance_self_join

    df = spark.createDataFrame(rows, "k BIGINT, s STRING")
    got = sorted(
        (r["key_a"], r["key_b"], r["edit_dist"])
        for r in edit_distance_self_join(df, "k", "s", max_dist=2).collect()
    )
    assert got == expected


def test_zvalue_interleave_roundtrips():
    """The Morton z-value must de-interleave back to (gx, gy) for the
    full 8-bit x 8-bit grid (spot-checked lattice + random points) —
    executed through DuckDB since the expression is shared SQL text."""
    from clickhouse_table_copier_spark.queries_round4 import _zvalue_sql

    rng = random.Random(7)
    pts = [(x, y) for x in (0, 1, 127, 128, 255) for y in (0, 1, 127, 128, 255)]
    pts += [(rng.randint(0, 255), rng.randint(0, 255)) for _ in range(50)]
    con = duckdb.connect()
    con.execute("CREATE TABLE g(gx BIGINT, gy BIGINT)")
    con.executemany("INSERT INTO g VALUES (?, ?)", pts)
    for gx, gy, z in con.execute(
        f"SELECT gx, gy, {_zvalue_sql('gx', 'gy')} FROM g"
    ).fetchall():
        dx = sum(((z >> (2 * i)) & 1) << i for i in range(8))
        dy = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (dx, dy) == (gx, gy), (gx, gy, z)


def test_pagerank_mass_is_conserved_up_to_dangling_leak(spark):
    """Damped PageRank over a row-stochastic transition keeps total mass
    in (0, 1]: exactly 1 when every node has out-edges, strictly below
    only by the dangling-node leak; every node keeps >= the base mass."""
    import __spark_entry__ as entry

    rows = entry.queries()["pagerank_nations"](spark, SF_ORACLE).collect()
    assert len(rows) == 25
    total = sum(r["pagerank"] for r in rows)
    assert 0.15 - 1e-12 <= total <= 1.0 + 1e-9
    base = 0.15 / 25
    assert all(r["pagerank"] >= base - 1e-12 for r in rows)


def test_compaction_bins_respect_target_bound(spark):
    """Greedy sequential packing: every bin's rows stay under
    target + (its largest member) — the classic next-fit bound — and the
    bins partition the months contiguously."""
    import __spark_entry__ as entry
    from clickhouse_table_copier_spark.queries_round4 import _COMPACT_TARGET

    rows = sorted(
        entry.queries()["compaction_plan"](spark, SF_ORACLE).collect(),
        key=lambda r: r["bin"],
    )
    assert rows, "no bins planned"
    # bin ids strictly increase from 0 (they may SKIP indices: a single
    # partition larger than the target advances the cumsum by more than
    # one target's worth) with non-overlapping, increasing month ranges
    bins = [r["bin"] for r in rows]
    assert bins[0] == 0 and bins == sorted(set(bins))
    for a, b in zip(rows, rows[1:]):
        assert a["last_month"] < b["first_month"]
    months_seen = [
        m for r in rows for m in range(r["first_month"], r["last_month"] + 1)
    ]
    assert sorted(set(months_seen)) == list(range(1, 13))
    assert all(r["bin_rows"] > 0 for r in rows)
    # greedy bound: a bin closes once its exclusive cumsum crosses the
    # target, so only its LAST member can spill past it — every bin's
    # rows stay under target + its largest member's rows
    import clickhouse_table_copier_spark.queries as q
    from pyspark.sql import functions as _F

    per_month = {
        r["m"]: r["n"]
        for r in q._t(spark, SF_ORACLE, "lineitem")
        .groupBy(_F.month("l_shipdate").alias("m"))
        .agg(_F.count(_F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        largest = max(
            per_month[m] for m in range(r["first_month"], r["last_month"] + 1)
        )
        assert r["bin_rows"] < _COMPACT_TARGET + largest
    # all lineitem rows are packed exactly once
    assert sum(r["bin_rows"] for r in rows) == sum(per_month.values())


def test_reservoir_sample_is_partitioning_invariant(spark):
    """The hash-ranked sample must select the SAME rows regardless of how
    the input is partitioned — the reproducibility property that
    distinguishes it from rand()-based sampling."""
    import __spark_entry__ as entry
    from clickhouse_table_copier_spark.queries import _t
    from clickhouse_table_copier_spark.queries_round4 import _RESERVOIR_K

    base = entry.queries()["reservoir_sample"](spark, SF_ORACLE).collect()
    docs = _t(spark, SF_ORACLE, "documents").repartition(17, "doc_id")
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    reparted = (
        docs.select("lang", "doc_id", F.row_number().over(w).cast("int").alias("rk"))
        .where(F.col("rk") <= _RESERVOIR_K)
        .select("lang", "rk", "doc_id")
        .orderBy("lang", "rk")
        .collect()
    )
    assert [tuple(r) for r in base] == [tuple(r) for r in reparted]


def test_events_loader_handles_both_parquet_ts_generations(spark, tmp_path):
    """The driver has shipped events.ts as TIMESTAMP(NANOS) (Spark reads
    it as a long under nanosAsLong) and as native TIMESTAMP(MICROS); the
    loader must normalize BOTH to the same µs TIMESTAMP_NTZ values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickhouse_table_copier_spark.queries import _events

    ts_us = [1_700_000_000_123_456, 1_700_000_999_654_321]
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["click", "view"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"]),
    }
    for sub, ts_arr in [
        ("us", pa.array(ts_us, pa.timestamp("us"))),
        ("ns", pa.array([t * 1000 for t in ts_us], pa.timestamp("ns"))),
    ]:
        d = tmp_path / sub
        d.mkdir()
        pq.write_table(
            pa.table({**cols, "ts": ts_arr}), str(d / "events.parquet")
        )

    got_us = _events(spark, str(tmp_path / "us")).orderBy("event_id").collect()
    got_ns = _events(spark, str(tmp_path / "ns")).orderBy("event_id").collect()
    assert [r["ts"] for r in got_us] == [r["ts"] for r in got_ns]
    assert dict(_events(spark, str(tmp_path / "ns")).dtypes)["ts"] == "timestamp_ntz"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """The whole point of the bucketed layout: the recurring fact⋈fact
    join must plan WITHOUT any Exchange (both sides pre-shuffled at
    write time), while the identical join over plain parquet shuffles.
    Values must match the plain join exactly."""
    from clickhouse_table_copier_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )
    from clickhouse_table_copier_spark.queries import _t

    spark.sql("CREATE DATABASE IF NOT EXISTS bkt_test")
    spark.sql("USE bkt_test")
    # disable auto-broadcast: at fixture scale the planner would broadcast
    # the small side and skip the bucketed path entirely (at the layout's
    # target scale both sides are far beyond any broadcast threshold)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = _t(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_quantity")
        orders = _t(spark, SF_ORACLE, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
        )
        write_bucketed(li, "bkt_test.li_b", "l_orderkey", n_buckets=8)
        write_bucketed(orders, "bkt_test.ord_b", "l_orderkey", n_buckets=8)

        joined = bucketed_join(spark, "bkt_test.li_b", "bkt_test.ord_b", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan[:600]}"
        )
        assert "SortMergeJoin" in plan

        plain = li.join(orders, "l_orderkey")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        # the same join over plain parquet DOES shuffle both sides
        assert "Exchange hashpartitioning" in plain_plan

        got = joined.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        ).collect()[0]
        want = plain.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        ).collect()[0]
        assert (got["n"], got["q"]) == (want["n"], want["q"])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP DATABASE IF EXISTS bkt_test CASCADE")
        spark.sql("USE default")
