"""Property tests for the round-6c batch: bucketed-join layout,
triangle counting, and cross-run streaming dedup."""

from __future__ import annotations

import pytest

from itertools import combinations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

# Driver-gate lane split (r17): SLOW lane (see pytest.ini) so the
# default gate completes inside the driver's verify budget; run with
#   python -m pytest tests/ -m slow -q
pytestmark = pytest.mark.slow


def test_bucketed_join_plans_zero_exchanges(spark):
    """The whole point of the bucketed layout: with broadcast disabled
    (forcing the strategy a fact-fact join gets at scale), the join over
    the two bucketed tables must plan with NO shuffle exchange anywhere —
    the buckets are read pairwise."""
    from clickhouse_table_copier_spark.queries_round6c import (
        bucketed_join_frame,
        drop_bucketed_tables,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join_frame(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # exactly ONE exchange in the whole plan — the final 3-row
        # aggregation's; neither join input may shuffle
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 1, plan
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        drop_bucketed_tables(spark)


def test_bucketed_join_matches_plain_join(spark):
    from clickhouse_table_copier_spark.queries_round6c import (
        bucketed_join_frame,
        drop_bucketed_tables,
    )
    from clickhouse_table_copier_spark.queries import _t

    try:
        got = {
            r["o_orderstatus"]: (r["line_cnt"], round(r["revenue"], 2))
            for r in bucketed_join_frame(spark, SF_SMOKE).collect()
        }
    finally:
        drop_bucketed_tables(spark)
    li = _t(spark, SF_SMOKE, "lineitem")
    orders = _t(spark, SF_SMOKE, "orders")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    want = {
        r["o_orderstatus"]: (r["line_cnt"], round(r["revenue"], 2))
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_triangle_count_matches_bruteforce(spark):
    """Enumerate triangles by brute force over the collected edge list
    (test-only collect; the pair graph at sf0.001 is tiny) and compare
    per-node counts with the distributed two-join enumeration."""
    from clickhouse_table_copier_spark.queries_pipeline import _shared_jaccard_pairs
    from clickhouse_table_copier_spark.queries_round6c import (
        q_similarity_triangle_count,
    )

    edges = {
        (r["id_a"], r["id_b"])
        for r in _shared_jaccard_pairs(spark, SF_SMOKE).select("id_a", "id_b").collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict[int, int] = {}
    nodes = sorted(adj)
    for a, b, c in combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    got = {
        r["doc_id"]: r["n_triangles"]
        for r in q_similarity_triangle_count(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_triangle_orientations_agree_and_hub_graph_exact(spark):
    """id- and degree-oriented enumerations must produce identical
    per-node counts — on the fixture graph AND on a planted hub graph
    (a wheel: hub h connected to a cycle of 12 rim nodes → every rim
    node is in exactly 2 triangles with the hub, the hub in 12)."""
    from clickhouse_table_copier_spark.operators.graph import triangles_per_node
    from clickhouse_table_copier_spark.queries_pipeline import _shared_jaccard_pairs

    pairs = _shared_jaccard_pairs(spark, SF_SMOKE).select("id_a", "id_b")
    by_id = {
        r["doc_id"]: r["n_triangles"]
        for r in triangles_per_node(pairs, orient="id").collect()
    }
    by_deg = {
        r["doc_id"]: r["n_triangles"]
        for r in triangles_per_node(pairs, orient="degree").collect()
    }
    assert by_id == by_deg

    hub, rim = 0, list(range(1, 13))
    edges = [(min(hub, r), max(hub, r)) for r in rim] + [
        (min(a, b), max(a, b))
        for a, b in zip(rim, rim[1:] + rim[:1])
    ]
    wheel = spark.createDataFrame(sorted(set(edges)), "id_a BIGINT, id_b BIGINT")
    got = {
        r["doc_id"]: r["n_triangles"]
        for r in triangles_per_node(wheel, orient="degree").collect()
    }
    want = {hub: 12, **{r: 2 for r in rim}}
    assert got == want
    got_id = {
        r["doc_id"]: r["n_triangles"]
        for r in triangles_per_node(wheel, orient="id").collect()
    }
    assert got_id == want


def test_streaming_dedup_drops_cross_run_duplicates(spark, tmp_path):
    """Every exact copy is ingested in run 2 while its original was seen
    in run 1 — survivors of run 2 must be exactly the modified near-dups,
    proving dedup state carries across availableNow invocations."""
    from clickhouse_table_copier_spark.queries_pipeline import _corpus
    from clickhouse_table_copier_spark.queries_round6c import _DOC_SCHEMA
    from clickhouse_table_copier_spark.streaming.dedup import streaming_exact_dedup

    corpus = _corpus(spark, SF_SMOKE)
    src, out, ck = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    corpus.where(F.col("doc_id") < 100000).write.parquet(src)
    streaming_exact_dedup(
        spark, src, _DOC_SCHEMA, "text", out, ck, watermark_delay=None
    ).awaitTermination()
    n_run1 = spark.read.parquet(out).count()
    corpus.where(F.col("doc_id") >= 100000).write.mode("append").parquet(src)
    streaming_exact_dedup(
        spark, src, _DOC_SCHEMA, "text", out, ck, watermark_delay=None
    ).awaitTermination()
    survivors = spark.read.parquet(out)
    n_originals = corpus.where(F.col("doc_id") < 100000).count()
    n_neardups = corpus.where(F.col("doc_id") >= 200000).count()
    assert n_run1 == n_originals  # originals are all-distinct in the fixture
    assert survivors.count() == n_originals + n_neardups
    # run 2's survivors are exactly the modified texts, never the copies
    run2_ids = {
        r["doc_id"]
        for r in survivors.where(F.col("doc_id") >= 100000).collect()
    }
    assert run2_ids == {
        r["doc_id"] for r in corpus.where(F.col("doc_id") >= 200000).collect()
    }
