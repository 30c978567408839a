"""DuckDB parity for the round-7 prep batch (Q12/Q14/Q20 shapes) —
the exact compare() harness the registered-queries gate uses, applied
to queries that are implemented now but registered next round (the
round-6 driver window is full; see queries_round7_prep docstring)."""

from __future__ import annotations

import pytest

from clickhouse_table_copier_spark.queries_round7_prep import (
    PREP_ORACLES,
    PREP_QUERIES,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, run_oracle

# Driver-gate lane split (r17): SLOW lane (see pytest.ini) so the
# default gate completes inside the driver's verify budget; run with
#   python -m pytest tests/ -m slow -q
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", sorted(PREP_QUERIES))
def test_prep_query_matches_oracle(spark, name):
    df = PREP_QUERIES[name](spark, SF_ORACLE)
    oracle = run_oracle(PREP_ORACLES[name], SF_ORACLE)
    compare(df, oracle, name)


def test_prep_queries_registered_in_round7():
    """Round-7 rotation happened: every prep query is in the main
    registry with the same function and oracle, and the prep dicts stay
    in lockstep."""
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(PREP_QUERIES) <= set(qs)
    for name, fn in PREP_QUERIES.items():
        assert qs[name] is fn
        assert oracles[name] == PREP_ORACLES[name]
    assert set(PREP_QUERIES) == set(PREP_ORACLES)


def test_prep_plans_obey_repo_guards(spark):
    """The repo-wide no-cartesian / no-global-window-sort invariants
    apply to the prep batch before it ever reaches the registry."""
    import re

    gw = re.compile(r"Window .*\n.*Sort .*\n.*Exchange SinglePartition")
    for name, fn in PREP_QUERIES.items():
        plan = (
            fn(spark, SF_ORACLE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert not gw.search(plan), name


def test_mg_candidates_superset_of_true_heavies(spark, tmp_path):
    """The Misra-Gries guarantee the gated query RELIES on, checked
    directly: after both availableNow runs, every token with true
    frequency > n/k sits in the surviving candidate summary."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from clickhouse_table_copier_spark.operators.dedup import normalized_text
    from clickhouse_table_copier_spark.queries import _t
    from clickhouse_table_copier_spark.queries_round7_prep import _MG_K
    from clickhouse_table_copier_spark.streaming.stateful import (
        latest_mg_candidates,
        streaming_misra_gries,
    )

    toks = _t(spark, SF_ORACLE, "documents").select(
        "source",
        "doc_id",
        F.explode(F.split(normalized_text("text"), " ")).alias("token"),
    )
    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("token", T.StringType()),
        ]
    )
    src, out, ck = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    toks.where(F.col("doc_id") % 2 == 0).write.parquet(src)
    streaming_misra_gries(spark, src, schema, out, ck, k=_MG_K).awaitTermination()
    toks.where(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    streaming_misra_gries(spark, src, schema, out, ck, k=_MG_K).awaitTermination()

    cand = {
        (r["source"], r["token"])
        for r in latest_mg_candidates(spark, out).collect()
    }
    exact = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    totals = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    true_heavy = {
        (r["source"], r["token"])
        for r in exact.join(totals, "source")
        .where(F.col("c") * _MG_K > F.col("n"))
        .collect()
    }
    assert true_heavy, "fixture must produce at least one heavy hitter"
    assert true_heavy <= cand, true_heavy - cand
    # and the summary really is bounded: <= k-1 counters per source
    per_source: dict = {}
    for s, t in cand:
        per_source[s] = per_source.get(s, 0) + 1
    assert all(v <= _MG_K - 1 for v in per_source.values()), per_source


def test_asof_tolerance_boundary_inclusive(spark):
    """A match EXACTLY tolerance_s old is kept; one second older is
    refused — pinning the inclusive boundary both engines implement."""
    from datetime import datetime

    from clickhouse_table_copier_spark.operators.temporal_joins import (
        asof_join_tolerance,
    )

    t0 = datetime(2024, 1, 10, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, t0, 101), (2, t0, 102)], "user_id long, ts timestamp_ntz, event_id long"
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 9, 12, 0, 0), 9, 7.0),   # exactly 86400 s
            (2, datetime(2024, 1, 9, 11, 59, 59), 8, 9.0),  # 86401 s
        ],
        "user_id long, ts timestamp_ntz, event_id long, v double",
    )
    out = {
        r["user_id"]: r["v"]
        for r in asof_join_tolerance(
            left, right, "user_id", "ts", ["v"], tolerance_s=86400,
            order_col="event_id",
        ).collect()
    }
    assert out[1] == 7.0
    assert out[2] is None


def test_asof_tolerance_right_tie_takes_max_order(spark):
    """Two right rows at the SAME timestamp: the max-order_col one wins,
    matching the oracle's ORDER BY ts DESC, event_id DESC."""
    from datetime import datetime

    from clickhouse_table_copier_spark.operators.temporal_joins import (
        asof_join_tolerance,
    )

    t0 = datetime(2024, 1, 10, 12, 0, 0)
    tr = datetime(2024, 1, 10, 11, 0, 0)
    left = spark.createDataFrame(
        [(1, t0, 101)], "user_id long, ts timestamp_ntz, event_id long"
    )
    right = spark.createDataFrame(
        [(1, tr, 5, 50.0), (1, tr, 9, 90.0), (1, tr, 7, 70.0)],
        "user_id long, ts timestamp_ntz, event_id long, v double",
    )
    rows = asof_join_tolerance(
        left, right, "user_id", "ts", ["v"], tolerance_s=86400,
        order_col="event_id",
    ).collect()
    assert rows[0]["v"] == 90.0
