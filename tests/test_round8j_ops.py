"""Round-8j tests: argMax/argMin tie determinism, per-day bitmask
semantics, hash-bucket collision arithmetic, and the SRM boundary."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from clickhouse_table_copier_spark.queries_round8j import (
    q_ab_srm_check,
    q_ch_arg_min_max,
    q_feature_hashing_collisions,
    q_user_step_bitmask,
)

_EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp_ntz, event_type string,"
    " value double"
)


def _write(spark, name, rows, schema, d=None):
    d = d or tempfile.mkdtemp(prefix="r8j_")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


def test_arg_min_max_ties_break_to_lowest_suppkey(spark):
    sup = [
        # nation 0: suppliers 1 and 2 TIE at the max balance -> key 1 wins;
        # suppliers 3 and 4 tie at the min -> key 3 wins
        (1, "S1", 0, 100.0),
        (2, "S2", 0, 100.0),
        (3, "S3", 0, 5.0),
        (4, "S4", 0, 5.0),
        # nation 1: single supplier is both extremes
        (5, "S5", 1, 42.0),
    ]
    nat = [(0, "ALPHA", 0), (1, "BETA", 0)]
    d = _write(
        spark, "supplier", sup,
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    _write(
        spark, "nation", nat,
        "n_nationkey long, n_name string, n_regionkey long", d,
    )
    out = {r["n_name"]: r for r in q_ch_arg_min_max(spark, d).collect()}
    a = out["ALPHA"]
    assert (a["top_supplier"], a["top_bal"]) == ("S1", 100.0)
    assert (a["bottom_supplier"], a["bottom_bal"]) == ("S3", 5.0)
    b = out["BETA"]
    assert (b["top_supplier"], b["bottom_supplier"]) == ("S5", "S5")


def test_bitmask_is_per_user_day(spark):
    d1, d2 = dt.datetime(2024, 1, 1, 9), dt.datetime(2024, 1, 2, 9)
    rows = [
        # user 1 day 1: signup+view = 3; day 2: purchase = 8
        (1, 1, d1, "signup", 1.0),
        (2, 1, d1, "view", 1.0),
        (3, 1, d2, "purchase", 1.0),
        # user 2 day 1: click + unknown type -> 4|16 = 20
        (4, 2, d1, "click", 1.0),
        (5, 2, d1, "error", 1.0),
    ]
    d = _write(spark, "events", rows, _EV_SCHEMA)
    out = {r["mask"]: r["n_user_days"] for r in q_user_step_bitmask(spark, d).collect()}
    assert out == {3: 1, 8: 1, 20: 1}


def test_feature_hashing_counts_are_consistent(spark):
    # 3 docs, few distinct trigram shingles; with 4096 buckets and a
    # handful of features, collisions are essentially impossible, so the
    # identities pin the arithmetic: used == n_features, ppm == 0.
    docs = [
        (1, "aa bb cc dd", "en", "src0", 10),  # shingles: aa bb cc, bb cc dd
        (2, "aa bb cc", "en", "src0", 8),  # duplicate feature: aa bb cc
        (3, "xx yy", "en", "src0", 5),  # short doc -> whole-text shingle
    ]
    d = _write(
        spark, "documents", docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = q_feature_hashing_collisions(spark, d).collect()[0]
    assert out["n_features"] == 3  # 'aa bb cc', 'bb cc dd', 'xx yy'
    assert out["buckets_used"] == 3
    assert out["max_load"] == 1
    assert (out["colliding_features"], out["collision_ppm"]) == (0, 0)


def test_srm_flag_exact_integer_boundary(spark):
    # md5-parity assignment is deterministic: compute the expected split
    # from the same rule, then check chi2 = (na-nb)^2/n and the flag.
    import hashlib

    users = list(range(1, 41))
    rows = [
        (i, u, dt.datetime(2024, 1, 1), "view", 1.0)
        for i, u in enumerate(users)
    ]
    d = _write(spark, "events", rows, _EV_SCHEMA)
    out = q_ab_srm_check(spark, d).collect()[0]
    exp = [int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2 for u in users]
    na, nb = exp.count(0), exp.count(1)
    assert (out["na"], out["nb"], out["n"]) == (na, nb, 40)
    assert out["chi2"] == round((na - nb) ** 2 / 40, 9)
    assert out["srm_flag"] == (1 if (na - nb) ** 2 * 1000 > 3841 * 40 else 0)
