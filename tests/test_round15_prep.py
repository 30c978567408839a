"""DuckDB parity for the round-15 prep batch (cross-codec scanned-page
aHash pairs, the .jsonl.lz4 egress ledger, PDF-crypt coverage, the JPX
decline taxonomy) — the exact compare() harness the registered-queries
gate uses, applied to queries implemented at round 14 but registered
at round 15 (the r14 window is booked by the age-6 r08 cohort plus the
4-query r14 flip; see queries_round15_prep docstring)."""

from __future__ import annotations

import re

import pytest

from clickhouse_table_copier_spark.queries_round15_prep import (
    PREP15_ORACLES,
    PREP15_QUERIES,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, run_oracle

# Driver-gate lane split (r17): SLOW lane (see pytest.ini) so the
# default gate completes inside the driver's verify budget; run with
#   python -m pytest tests/ -m slow -q
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", sorted(PREP15_QUERIES))
def test_prep15_query_matches_oracle(spark, name):
    df = PREP15_QUERIES[name](spark, SF_ORACLE)
    oracle = run_oracle(PREP15_ORACLES[name], SF_ORACLE)
    compare(df, oracle, name)


def test_registered_at_round15():
    """Flipped at round 15 (was test_not_yet_registered): the batch is
    in the live registry with byte-identical oracles — the same
    positive assertion the r7/r12/r13/r14 prep flips pinned."""
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(PREP15_QUERIES) <= set(qs)
    assert set(PREP15_QUERIES) == set(PREP15_ORACLES)
    for name in PREP15_QUERIES:
        assert oracles[name] == PREP15_ORACLES[name]


def test_prep15_plans_obey_repo_guards(spark):
    """Repo-wide invariants apply before these reach the registry: no
    cartesian joins, no global-window sort (the media stages are
    Arrow-batched mapInPandas, the pair join is the banded LSH
    equi-join)."""
    gw = re.compile(r"Window .*\n.*Sort .*\n.*Exchange SinglePartition")
    for name in ("scanned_codec_ahash_pairs", "jpx_decline_taxonomy",
                 "pdf_crypt_coverage"):
        plan = (
            PREP15_QUERIES[name](spark, SF_ORACLE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert not gw.search(plan), name


def test_prep15_locked_pdf_never_leaks_plaintext(spark):
    """The locked R4 twin must not extract ANY text under the empty
    password — a decline-contract regression here would quietly feed
    ciphertext-derived garbage into the corpus."""
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        _extract_pdf,
    )
    from clickhouse_table_copier_spark.queries_round15_prep import (
        _CRYPT_TEXT,
        _PDF_R2_OPEN,
        _PDF_R4_LOCKED,
        _PDF_R6_OPEN,
    )

    assert _extract_pdf(_PDF_R4_LOCKED)[1] is None
    assert _extract_pdf(_PDF_R2_OPEN)[1] == _CRYPT_TEXT
    assert _extract_pdf(_PDF_R6_OPEN)[1] == _CRYPT_TEXT
