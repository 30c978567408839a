"""Round-8d pinned tests: path rendering determinism."""

from __future__ import annotations

import datetime as dt


def test_session_path_orders_equal_timestamps_by_event_id(spark, tmp_path):
    """Two events at the SAME timestamp must render in event_id order —
    the tie rule that makes the path string total and cross-engine
    deterministic."""
    from clickhouse_table_copier_spark.queries_round8d import (
        q_session_path_topk,
    )

    t = dt.datetime(2024, 1, 1)
    rows = [
        (2, t, 1, "click", 0.0, "{}"),
        (1, t, 1, "view", 0.0, "{}"),  # lower event_id: renders first
        (3, t + dt.timedelta(seconds=10), 1, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = q_session_path_topk(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["path"] == "view>click>purchase"
    assert out[0]["n_sessions"] == 1
