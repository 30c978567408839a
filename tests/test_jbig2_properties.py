"""JBIG2 property tests: the offline encoder transcription
(scripts/make_jbig2_golden.py) and the module decoder round-trip
across RANDOM bitmaps, templates, TPGDON states and AT-pixel
placements — including non-nominal ATs and the deep-row (dy < -2)
context path no fixed golden reaches.  The fixed goldens pin the
byte-exact spellings; these pin the SPACE of parameter shapes."""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_table_copier_spark.operators.jbig2 import (
    MQDecoder,
    decode_generic_region,
    new_states,
)

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "make_jbig2_golden.py",
)


def _mkg():
    spec = importlib.util.spec_from_file_location("mkg_props", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


MKG = _mkg()

_CONTEXT_BITS = (16, 13, 10, 10)


def _roundtrip(img, template, at, tpgdon):
    enc = MKG.MQEncoder()
    st_enc = MKG.new_states(_CONTEXT_BITS[template])
    MKG.encode_generic(enc, st_enc, img, template, at, tpgdon)
    blob = enc.flush()
    h, w = img.shape
    mq = MQDecoder(blob)
    st_dec = new_states(_CONTEXT_BITS[template])
    got = decode_generic_region(mq, st_dec, w, h, template, at, tpgdon)
    return got


@settings(max_examples=40, deadline=None)
@given(
    data=st.data(),
    template=st.integers(0, 3),
    tpgdon=st.booleans(),
    h=st.integers(1, 20),
    w=st.integers(1, 24),
)
def test_generic_region_roundtrip_random(data, template, tpgdon, h, w):
    bits = data.draw(
        st.lists(
            st.integers(0, 1), min_size=h * w, max_size=h * w
        )
    )
    img = np.array(bits, dtype=np.uint8).reshape(h, w)
    at = MKG.NOMINAL_AT[template]
    got = _roundtrip(img, template, at, tpgdon)
    assert (got == img).all()


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    template=st.integers(0, 3),
    h=st.integers(2, 16),
    w=st.integers(2, 20),
)
def test_generic_region_roundtrip_custom_at(data, template, h, w):
    """Arbitrary CAUSAL AT pixels — dy < 0, or dy == 0 with dx < 0 —
    including deep rows (dy < -2), the context path nominal ATs never
    exercise."""
    n_at = 4 if template == 0 else 1
    at = []
    for _ in range(n_at):
        dy = data.draw(st.integers(-4, 0))
        if dy == 0:
            dx = data.draw(st.integers(-8, -1))
        else:
            dx = data.draw(st.integers(-8, 7))
        at.append((dx, dy))
    bits = data.draw(
        st.lists(st.integers(0, 1), min_size=h * w, max_size=h * w)
    )
    img = np.array(bits, dtype=np.uint8).reshape(h, w)
    got = _roundtrip(img, template, tuple(at), False)
    assert (got == img).all()


def test_deep_at_row_fixed_case():
    """Deterministic pin of the deep-row path: template 0 with an AT
    pixel at dy=-4 on a pattern whose rows differ, so the deep
    reference actually matters."""
    img = MKG.text_lines(18, 22)
    at = ((3, -1), (-3, -1), (2, -2), (-2, -4))
    got = _roundtrip(img, 0, at, False)
    assert (got == img).all()
    got = _roundtrip(img, 0, at, True)
    assert (got == img).all()


@settings(max_examples=30, deadline=None)
@given(bits=st.lists(st.integers(0, 1), min_size=1, max_size=600))
def test_mq_coder_roundtrip_single_context(bits):
    enc = MKG.MQEncoder()
    st_enc = MKG.new_states(1)
    for b in bits:
        enc.encode(st_enc, 0, b)
    blob = enc.flush()
    mq = MQDecoder(blob)
    st_dec = new_states(1)
    assert [mq.decode(st_dec, 0) for _ in bits] == bits


@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(-100000, 100000), st.just("OOB")
        ),
        min_size=1,
        max_size=40,
    )
)
def test_integer_coding_roundtrip(vals):
    """Annex A integer encode/decode round-trip across every prefix
    range (0..3 / ..19 / ..83 / ..339 / ..4435 / 32-bit) and OOB."""
    from clickhouse_table_copier_spark.operators.jbig2 import (
        _OOB,
        decode_int,
    )

    enc = MKG.MQEncoder()
    st_enc = MKG.new_states(9)
    for v in vals:
        MKG.encode_int(enc, st_enc, v)
    blob = enc.flush()
    mq = MQDecoder(blob)
    st_dec = new_states(9)
    got = [decode_int(mq, st_dec) for _ in vals]
    want = [(_OOB if v == "OOB" else v) for v in vals]
    assert got == want


def test_integer_coding_range_edges():
    from clickhouse_table_copier_spark.operators.jbig2 import (
        _OOB,
        decode_int,
    )

    edges = [
        0, 1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
        1 << 20, -1, -4436, "OOB",
    ]
    enc = MKG.MQEncoder()
    st_enc = MKG.new_states(9)
    for v in edges:
        MKG.encode_int(enc, st_enc, v)
    mq = MQDecoder(enc.flush())
    st_dec = new_states(9)
    got = [decode_int(mq, st_dec) for _ in edges]
    assert got == [(_OOB if v == "OOB" else v) for v in edges]


def test_iaid_roundtrip_all_widths():
    from clickhouse_table_copier_spark.operators.jbig2 import (
        decode_iaid,
    )

    for code_len in (1, 2, 5, 8):
        ids = list(range(1 << code_len))
        enc = MKG.MQEncoder()
        st_enc = MKG.new_states(code_len + 1)
        for i in ids:
            MKG.encode_iaid(enc, st_enc, code_len, i)
        mq = MQDecoder(enc.flush())
        st_dec = new_states(code_len + 1)
        assert [
            decode_iaid(mq, st_dec, code_len) for _ in ids
        ] == ids
