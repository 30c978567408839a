"""Round-8g tests: CH retention membership vs sequenceMatch ORDER —
planted timelines where the two aggregates must disagree."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from clickhouse_table_copier_spark.queries_round8g import (
    q_ch_retention_agg,
    q_ch_sequence_match,
)

TS = dt.datetime(2024, 1, 1)

_EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp_ntz, event_type string,"
    " value double"
)


def _write_events(spark, rows):
    d = tempfile.mkdtemp(prefix="r8g_")
    spark.createDataFrame(rows, _EV_SCHEMA).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def _t(seconds: int) -> dt.datetime:
    return TS + dt.timedelta(seconds=seconds)


def test_retention_membership_ignores_order(spark):
    # user 1: purchase BEFORE signup/view -> retention still counts it
    # user 2: signup only
    # user 3: view+purchase but NO signup -> r1 gate excludes entirely
    rows = [
        (1, 1, _t(0), "purchase", 1.0),
        (2, 1, _t(10), "signup", 1.0),
        (3, 1, _t(20), "view", 1.0),
        (4, 2, _t(0), "signup", 1.0),
        (5, 3, _t(0), "view", 1.0),
        (6, 3, _t(10), "purchase", 1.0),
    ]
    d = _write_events(spark, rows)
    out = q_ch_retention_agg(spark, d).collect()[0]
    assert (out["r1"], out["r2"], out["r3"], out["n_users"]) == (2, 1, 1, 3)


def test_sequence_match_requires_strict_order(spark):
    # user 1: view < click < purchase  -> matches
    # user 2: purchase BEFORE click (view < purchase < click) -> no match
    # user 3: click only -> no match (no view anchor)
    rows = [
        (1, 1, _t(0), "view", 1.0),
        (2, 1, _t(10), "click", 1.0),
        (3, 1, _t(20), "purchase", 1.0),
        (4, 2, _t(0), "view", 1.0),
        (5, 2, _t(10), "purchase", 1.0),
        (6, 2, _t(20), "click", 1.0),
        (7, 3, _t(0), "click", 1.0),
    ]
    d = _write_events(spark, rows)
    out = q_ch_sequence_match(spark, d).collect()[0]
    assert (out["n_matched"], out["n_users"]) == (1, 3)
    assert out["matched_ppm"] == 1_000_000 // 3


def test_sequence_match_greedy_anchor_is_not_a_miss(spark):
    # first view leads to a dead end ONLY if chaining were backward;
    # greedy earliest-next from the FIRST view: view(0) -> click(5) ->
    # purchase(10) exists even though a later view(7) also precedes the
    # purchase.  And equal timestamps do NOT match (strict >).
    rows = [
        (1, 1, _t(0), "view", 1.0),
        (2, 1, _t(5), "click", 1.0),
        (3, 1, _t(7), "view", 1.0),
        (4, 1, _t(10), "purchase", 1.0),
        (5, 2, _t(0), "view", 1.0),
        (6, 2, _t(0), "click", 1.0),  # same ts as view: NOT after it
        (7, 2, _t(5), "purchase", 1.0),
    ]
    d = _write_events(spark, rows)
    out = q_ch_sequence_match(spark, d).collect()[0]
    assert (out["n_matched"], out["n_users"]) == (1, 2)
