"""Round-8l tests: planted star/clique graphs pin assortativity's sign
and the degree histogram; a constant-rate series pins dispersion ~ 0."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from clickhouse_table_copier_spark.queries_round8l import (
    q_arrival_dispersion_index,
    q_graph_assortativity,
    q_graph_degree_distribution,
)

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp_ntz, event_type string,"
    " value double"
)


def _write(spark, name, rows, schema, d=None):
    d = d or tempfile.mkdtemp(prefix="r8l_")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


def _star_docs():
    """Hub H shares >= 0.5 trigram jaccard with each satellite; the
    satellites overlap each other only 1/3 — a pure star. doc_ids avoid
    % 10 in {0, 5} so the corpus dup branches stay silent."""
    return [
        (1, "a b c d e", "en", "src0", 9),  # hub: {abc, bcd, cde}
        (2, "a b c d", "en", "src0", 7),  # {abc, bcd}: 2/3 with hub
        (3, "b c d e", "en", "src0", 7),  # {bcd, cde}: 2/3 with hub
    ]


def test_star_graph_is_perfectly_disassortative(spark):
    d = _write(spark, "documents", _star_docs(), _DOC_SCHEMA)
    out = q_graph_assortativity(spark, d).collect()[0]
    # every edge pairs the degree-2 hub with a degree-1 satellite
    assert out["assortativity"] == -1.0
    assert (out["n_edges"], out["n_nodes"]) == (2, 3)


def test_degree_histogram_of_the_star(spark):
    d = _write(spark, "documents", _star_docs(), _DOC_SCHEMA)
    out = {r["degree"]: r["n_nodes"] for r in q_graph_degree_distribution(spark, d).collect()}
    assert out == {1: 2, 2: 1}


def test_dispersion_zero_for_constant_rate_one_for_nothing_shared(spark):
    # exactly 5 events every day for 4 days: variance 0 -> dispersion 0
    base = dt.datetime(2024, 3, 1)
    rows = [
        (i * 10 + j, j, base + dt.timedelta(days=i, hours=j), "view", 1.0)
        for i in range(4)
        for j in range(5)
    ]
    d = _write(spark, "events", rows, _EV_SCHEMA)
    out = q_arrival_dispersion_index(spark, d).collect()[0]
    assert out["dispersion"] == 0.0
    assert (out["n_days"], out["n_events"], out["mean_daily"]) == (4, 20, 5.0)

    # counts 1 and 3 over two days: mean 2, population var 1 -> D = 0.5
    rows = [(1, 1, base, "view", 1.0)] + [
        (10 + j, 1, base + dt.timedelta(days=1, hours=j), "view", 1.0)
        for j in range(3)
    ]
    d = _write(spark, "events", rows, _EV_SCHEMA)
    out = q_arrival_dispersion_index(spark, d).collect()[0]
    assert out["dispersion"] == 0.5
