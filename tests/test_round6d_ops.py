"""Property tests for the round-6d batch: sweep-line concurrency,
stream-static enrichment, partition-pruned layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_partitioned_scan_prunes_directories(spark):
    """The month filter must become a PartitionFilter (directory-level
    pruning), NOT a data filter: non-matching months are never opened."""
    from clickhouse_table_copier_spark.queries_round6d import (
        q_partitioned_scan_prune,
    )

    df = q_partitioned_scan_prune(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ship_month" in m.group(1), plan[:800]
    # and the pushed-data-filter list must NOT need the month predicate
    assert df.collect()[0]["cnt"] > 0


def test_concurrency_curve_matches_bruteforce(spark):
    """Recompute the curve in pure Python from the collected events
    (test-only collect; sf0.001) and compare hour-by-hour."""
    from clickhouse_table_copier_spark.queries import _events
    from clickhouse_table_copier_spark.queries_round6d import (
        _GAP_S,
        q_concurrent_sessions_curve,
    )

    rows = (
        _events(spark, SF_SMOKE)
        .select("user_id", "event_id", "ts")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"]))
    import datetime

    intervals = []
    for evs in by_user.values():
        evs.sort()
        start = prev = evs[0][0]
        for ts, _eid in evs[1:]:
            if (ts - prev).total_seconds() > _GAP_S:
                intervals.append((start, prev))
                start = ts
            prev = ts
        intervals.append((start, prev))
    deltas: dict = {}
    for s, e in intervals:
        deltas[s] = deltas.get(s, 0) + 1
        e1 = e + datetime.timedelta(seconds=1)
        deltas[e1] = deltas.get(e1, 0) - 1
    level = 0
    want: dict = {}
    for ts in sorted(deltas):
        level += deltas[ts]
        hour = ts.replace(minute=0, second=0, microsecond=0)
        want[hour] = max(want.get(hour, level), level)
    got = {
        r["hour"]: r["max_concurrent"]
        for r in q_concurrent_sessions_curve(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_stream_enrichment_matches_batch_join(spark):
    from clickhouse_table_copier_spark.queries import _events, _t
    from clickhouse_table_copier_spark.queries_round6d import (
        q_stream_static_enrichment,
    )

    got = {
        r["c_mktsegment"]: (r["n_events"], round(r["value_sum"], 2))
        for r in q_stream_static_enrichment(spark, SF_SMOKE).collect()
    }
    ev = _events(spark, SF_SMOKE)
    dim = _t(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    want = {
        r["c_mktsegment"]: (r["n_events"], round(r["value_sum"], 2))
        for r in ev.join(dim, ev.user_id == dim.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
        .collect()
    }
    assert got == want
