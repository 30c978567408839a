"""Round-8i tests: RRF fusion arithmetic and tie rules, W1 on hand-built
histograms, zone-map skip/keep boundaries, MASE on a planted seasonal
series."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from clickhouse_table_copier_spark.queries_round8i import (
    _RRF_K,
    q_ann_rank_fusion,
    q_mase_seasonal_baseline,
    q_wasserstein_value_drift,
    q_zone_map_prune_estimate,
)

_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp"
)

_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _write(spark, name, rows, schema, d=None):
    d = d or tempfile.mkdtemp(prefix="r8i_")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


def _li(order, qty, price, day: dt.datetime):
    return (order, 1, 1, 1, float(qty), float(price), 0.0, 0.0, "A", "F", day)


def test_rrf_fusion_scores_and_tiebreak(spark):
    # doc 1: top of BOTH lists; doc 2 lexical-only; doc 3 dense-only.
    # texts: doc 1+2 contain the BM25 query terms, doc 3 does not;
    # embeddings: doc 3 = query direction, doc 1 close, doc 2 orthogonal.
    docs = [
        (0, "table join merge table", "en", "src0", 20),
        (1, "table join merge", "en", "src0", 15),
        (2, "table join", "en", "src0", 10),
        (3, "nothing relevant here", "en", "src0", 21),
    ]
    emb = [
        (0, [1.0] + [0.0] * 63, 0),
        (1, [1.0, 0.2] + [0.0] * 62, 0),
        (2, [0.0, 1.0] + [0.0] * 62, 0),
        (3, [1.0] + [0.0] * 63, 0),
    ]
    d = _write(
        spark, "documents", docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _write(spark, "embeddings", emb, "vec_id long, embedding array<float>, label int", d)
    out = q_ann_rank_fusion(spark, d).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 1: lexical rank 1 (doc 0's extra 'table' loses to BM25 length
    # normalization: 1.86 vs 1.80), dense rank 2
    assert (by_id[1]["r_lex"], by_id[1]["r_dense"]) == (1, 2)
    assert by_id[1]["rrf"] == round(
        1 / (_RRF_K + 1) + 1 / (_RRF_K + 2), 9
    )
    # doc 3: dense rank 1 (cosine 1.0), absent from lexical list
    assert by_id[3]["r_lex"] is None and by_id[3]["r_dense"] == 1
    assert by_id[3]["rrf"] == round(1 / (_RRF_K + 1), 9)
    # fused order: doc 1 (two contributions) first
    assert out[0]["doc_id"] == 1


def test_wasserstein_shifted_mass(spark):
    # cohort A: two orders in bin 0; cohort B: two orders in bin 2.
    # CDFs differ by 1 over bins 0 and 1 -> W1 = 2 * 12000.
    rows = [
        (1, 1, "O", 100.0, dt.datetime(1996, 2, 1), "1-URGENT"),
        (2, 1, "O", 200.0, dt.datetime(1996, 3, 1), "1-URGENT"),
        (3, 1, "O", 25_000.0, dt.datetime(1999, 2, 1), "1-URGENT"),
        (4, 1, "O", 26_000.0, dt.datetime(1999, 3, 1), "1-URGENT"),
        (5, 1, "O", 100.0, dt.datetime(1997, 1, 1), "1-URGENT"),  # ignored
    ]
    d = _write(spark, "orders", rows, _ORD_SCHEMA)
    out = q_wasserstein_value_drift(spark, d).collect()[0]
    assert (out["n_a"], out["n_b"], out["n_bins_used"]) == (2, 2, 2)
    assert out["w1"] == 24_000.0


def test_zone_map_skips_aligned_not_unaligned(spark):
    # 3 year-month partitions; date predicate [1997-03-01, 1997-05-31]
    # keeps only the 1997-03 partition; quantity zones all straddle the
    # BETWEEN 45..50 range (values 10 and 46 in each partition).
    rows = []
    for i, day in enumerate(
        [dt.datetime(1996, 1, 5), dt.datetime(1997, 3, 10), dt.datetime(1998, 7, 1)]
    ):
        rows.append(_li(2 * i, 10, 100.0, day))
        rows.append(_li(2 * i + 1, 46, 100.0, day))
    d = _write(spark, "lineitem", rows, _LI_SCHEMA)
    out = q_zone_map_prune_estimate(spark, d).collect()[0]
    assert (out["n_partitions"], out["n_rows"]) == (3, 6)
    assert (out["date_skippable"], out["date_rows_skipped"]) == (2, 4)
    assert (out["qty_skippable"], out["qty_rows_skipped"]) == (0, 0)


def test_mase_detects_weekly_structure(spark):
    # 21 days of a pure period-7 pattern: naive-7 error is 0, naive-1
    # error is not -> MASE = 0.
    base = dt.datetime(1998, 1, 1)
    pattern = [100.0, 200.0, 150.0, 120.0, 180.0, 90.0, 300.0]
    rows = [
        _li(i, 1, pattern[i % 7], base + dt.timedelta(days=i))
        for i in range(21)
    ]
    d = _write(spark, "lineitem", rows, _LI_SCHEMA)
    out = q_mase_seasonal_baseline(spark, d).collect()[0]
    assert out["mase"] == 0.0
    assert out["sum_abs_err_weekly"] == 0.0
    assert out["sum_abs_err_daily"] > 0
    assert out["n_days"] == 14  # 21 minus the 7-day warmup
