"""Round-8h tests: planted inputs with hand-computed answers for the
-If combinators, deltaSum, Theil–Sen (outlier robustness is THE point),
Hellinger extremes, and kappa's chance correction."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from clickhouse_table_copier_spark.queries_round8h import (
    q_ch_delta_sum,
    q_ch_if_combinators,
    q_cohens_kappa_quality,
    q_hellinger_source_drift,
    q_theilsen_daily_trend,
)

_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp"
)

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _write(spark, name, rows, schema):
    d = tempfile.mkdtemp(prefix="r8h_")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


def _li(order, qty, price, disc, tax, flag, status, day):
    return (
        order, 1, 1, 1, float(qty), float(price), float(disc), float(tax),
        flag, status, dt.datetime(1998, 1, 1) + dt.timedelta(days=day),
    )


def test_if_combinators_conditions_are_independent(spark):
    rows = [
        # flag A: one F-status, one small-qty, one discounted, tax-free
        _li(1, 5, 100.0, 0.0, 0.0, "A", "F", 0),  # small, taxfree
        _li(2, 20, 200.0, 0.10, 0.05, "A", "O", 1),  # discounted
        # flag B: nothing matches any condition
        _li(3, 20, 300.0, 0.0, 0.05, "B", "O", 2),
    ]
    d = _write(spark, "lineitem", rows, _LI_SCHEMA)
    out = {r["l_returnflag"]: r for r in q_ch_if_combinators(spark, d).collect()}
    a, b = out["A"], out["B"]
    assert (a["cnt_f"], a["sum_small"], a["avg_small"]) == (1, 100.0, 100.0)
    assert (a["min_disc"], a["max_disc"]) == (200.0, 200.0)
    assert a["uniq_taxfree"] == 1
    # empty conditions: NULL for min/max/avg, 0 for counts/sums
    assert (b["cnt_f"], b["sum_small"], b["uniq_taxfree"]) == (0, 0.0, 0)
    assert b["min_disc"] is None and b["avg_small"] is None


def test_delta_sum_counts_only_positive_increments(spark):
    # daily revenues 10 -> 15 -> 12 -> 20: deltas +5, -3, +8
    rows = [
        _li(1, 1, 10.0, 0.0, 0.0, "A", "F", 0),
        _li(2, 1, 15.0, 0.0, 0.0, "A", "F", 1),
        _li(3, 1, 12.0, 0.0, 0.0, "A", "F", 2),
        _li(4, 1, 20.0, 0.0, 0.0, "A", "F", 3),
    ]
    d = _write(spark, "lineitem", rows, _LI_SCHEMA)
    out = q_ch_delta_sum(spark, d).collect()[0]
    assert (out["delta_sum"], out["delta_count"], out["n_days"]) == (
        13.0, 2, 4,
    )


def test_theilsen_ignores_the_outlier_ols_would_chase(spark):
    # y = 2x + 10 on days 0..3, day 4 is a wild outlier (1000).
    # 10 pairwise slopes: six are exactly 2, four are outlier-driven
    # (247.5..984) -> lower median = 2.0; residuals at slope 2 are
    # [10,10,10,10,992] -> lower-median intercept 10.0.
    revs = [10.0, 12.0, 14.0, 16.0, 1000.0]
    rows = [
        _li(i + 1, 1, rev, 0.0, 0.0, "A", "F", i) for i, rev in enumerate(revs)
    ]
    d = _write(spark, "lineitem", rows, _LI_SCHEMA)
    out = q_theilsen_daily_trend(spark, d).collect()[0]
    assert (out["slope"], out["intercept"]) == (2.0, 10.0)
    assert (out["n_days"], out["n_pairs"]) == (5, 10)


def _doc(i, text, source, n_chars=100):
    return (i, text, "en", source, n_chars)


def test_hellinger_identical_and_disjoint_extremes(spark):
    same = [_doc(1, "aa bb", "src0"), _doc(2, "aa bb", "src1")]
    d = _write(spark, "documents", same, _DOC_SCHEMA)
    out = q_hellinger_source_drift(spark, d).collect()[0]
    assert out["hellinger"] == 0.0
    assert (out["n_terms"], out["tot_a"], out["tot_b"]) == (2, 2, 2)

    disjoint = [_doc(1, "aa aa", "src0"), _doc(2, "bb cc", "src1")]
    d = _write(spark, "documents", disjoint, _DOC_SCHEMA)
    out = q_hellinger_source_drift(spark, d).collect()[0]
    # p=(1,0,0) vs q=(0,.5,.5): H = sqrt((1 + .5 + .5)/2) = 1
    assert out["hellinger"] == 1.0
    assert out["n_terms"] == 3


def test_kappa_chance_level_is_zero_perfect_is_one(spark):
    long_text = " ".join(["tok"] * 60)  # rater B fires (>= 50 tokens)
    short_text = "tok tok"  # rater B silent
    # perfect agreement: 2 both-high, 2 both-low -> kappa = 1
    rows = [
        _doc(1, long_text, "src0", 400),
        _doc(2, long_text, "src0", 400),
        _doc(3, short_text, "src0", 100),
        _doc(4, short_text, "src0", 100),
    ]
    d = _write(spark, "documents", rows, _DOC_SCHEMA)
    out = q_cohens_kappa_quality(spark, d).collect()[0]
    assert (out["a"], out["b"], out["c"], out["d"]) == (2, 0, 0, 2)
    assert (out["po"], out["kappa"]) == (1.0, 1.0)

    # independence: each combination once -> po = pe = 0.5, kappa = 0
    rows = [
        _doc(1, long_text, "src0", 400),
        _doc(2, short_text, "src0", 400),
        _doc(3, long_text, "src0", 100),
        _doc(4, short_text, "src0", 100),
    ]
    d = _write(spark, "documents", rows, _DOC_SCHEMA)
    out = q_cohens_kappa_quality(spark, d).collect()[0]
    assert (out["a"], out["b"], out["c"], out["d"]) == (1, 1, 1, 1)
    assert (out["po"], out["pe"], out["kappa"]) == (0.5, 0.5, 0.0)
