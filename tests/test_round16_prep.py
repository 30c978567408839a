"""DuckDB parity for the round-16 prep batch (JP2 container-spelling
histogram, JBIG2 out-of-scope-segment ledger, WARC egress→ingest JP2
round trip, six-container raster cross-format identity) — the exact
compare() harness the registered-queries gate
uses, applied to queries implemented at round 15 but registered at
round 16 (the r15 window is booked by the age-6 r09 cohort plus the
4-query r15 flip; see queries_round16_prep docstring)."""

from __future__ import annotations

import re

import pytest

from clickhouse_table_copier_spark.queries_round16_prep import (
    PREP16_ORACLES,
    PREP16_QUERIES,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, run_oracle


@pytest.mark.parametrize("name", sorted(PREP16_QUERIES))
def test_prep16_query_matches_oracle(spark, name):
    df = PREP16_QUERIES[name](spark, SF_ORACLE)
    oracle = run_oracle(PREP16_ORACLES[name], SF_ORACLE)
    compare(df, oracle, name)


def test_not_yet_registered():
    """Deliberately NOT in the registry until round 16 (flip this to
    the positive assertion when registering — see module docstring):
    registering now would append FRESH obligations to a window whose
    r15 shape is already committed in COVERAGE.md."""
    import __spark_entry__ as entry

    qs = entry.queries()
    assert set(PREP16_QUERIES).isdisjoint(qs)
    assert set(PREP16_QUERIES) == set(PREP16_ORACLES)


def test_prep16_plans_obey_repo_guards(spark):
    """Repo-wide invariants apply before these reach the registry: no
    cartesian joins, no global-window sort (the media stages are
    Arrow-batched mapInPandas; all joins are equi-joins on planted
    ids)."""
    gw = re.compile(r"Window .*\n.*Sort .*\n.*Exchange SinglePartition")
    for name in ("jp2_spelling_histogram", "jbig2_segment_ledger",
                 "raster_format_identity"):
        plan = (
            PREP16_QUERIES[name](spark, SF_ORACLE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert not gw.search(plan), name


def test_prep16_planted_spellings_decode_as_declared():
    """Driver-side pin of every planted constant: both wavelet paths
    decode the same 8x8 gradient, the XLBox spelling decodes
    identically to the plain box, the truncated blob declines, and
    each patched JBIG2 spelling declines while the base stream
    lifts."""
    import numpy as np

    from clickhouse_table_copier_spark.operators.jbig2 import (
        decode_jbig2_pdf,
    )
    from clickhouse_table_copier_spark.operators.jpeg2000 import (
        decode_jp2_pdf,
    )
    from clickhouse_table_copier_spark.queries_round16_prep import (
        _J2K_53,
        _J2K_97,
        _J2K_COC,
        _J2K_TILED,
        _J2K_TRUNC,
        _JBIG2_RES5,
        _JBIG2_T0,
        _JBIG2_T16,
        _JBIG2_T40,
        _JP2_BOXED,
        _JP2_XLBOX,
    )

    base = decode_jp2_pdf(_J2K_53)
    assert base is not None and base.shape == (8, 8)
    # the lossy plant is 4:2:0-subsampled RGB whose LUMA is the
    # same gradient (fine quant: luma byte-exact)
    lossy = decode_jp2_pdf(_J2K_97)
    assert lossy.shape == (8, 8, 3)
    assert (lossy[..., 0] == base).all()
    assert (decode_jp2_pdf(_JP2_BOXED) == base).all()
    assert (decode_jp2_pdf(_JP2_XLBOX) == base).all()
    assert (decode_jp2_pdf(_J2K_TILED) == base).all()  # 2x2 grid
    assert (decode_jp2_pdf(_J2K_COC) == base).all()  # COC override
    assert decode_jp2_pdf(_J2K_TRUNC) is None
    # the six cross-format legs decode to the SAME pixels (the 8x8
    # gradient = the JP2 base raster) and hash into one bucket
    from clickhouse_table_copier_spark.operators.multimodal import (
        _make_raster_ahash,
        _make_raster_decoder_chain,
    )
    from clickhouse_table_copier_spark.queries_round16_prep import (
        _BMP_GRAD,
        _GIF_GRAD,
        _SOF3_GRAD,
        _TIFF_GRAD,
        _png_grad,
    )

    dec = _make_raster_decoder_chain()
    ah = _make_raster_ahash()
    hashes = set()
    for blob in (_png_grad(), _BMP_GRAD, _GIF_GRAD, _TIFF_GRAD,
                 _J2K_53, _SOF3_GRAD):
        got = dec(blob)
        assert got is not None
        w, h, nch, arr = got
        assert (w, h) == (8, 8)
        assert (arr.reshape(8, 8, nch)[..., 0] == base).all()
        hashes.add(ah(*got)[0])
    assert len(hashes) == 1
    valid = decode_jbig2_pdf(_JBIG2_T0, None, 38, 29)
    assert valid is not None and valid.shape == (29, 38)
    assert np.unique(valid).tolist() == [0, 255]
    for bad in (_JBIG2_T16, _JBIG2_T40, _JBIG2_RES5):
        assert decode_jbig2_pdf(bad, None, 38, 29) is None
