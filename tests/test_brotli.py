"""Brotli behavior: the error contract, the transform engine against
its own derived table, and the WARC Content-Encoding wiring.
Exact-payload correctness against the reference encoder lives in
tests/test_brotli_golden.py."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_table_copier_spark.sources.brotli import (
    BrotliError,
    _transform_word,
    brotli_decompress,
)
from clickhouse_table_copier_spark.sources._brotli_data import (
    DICTIONARY,
    TRANSFORMS,
)

from tests.test_brotli_golden import HTML_Q9, TEXT_Q5


def test_malformed_inputs_raise_brotlierror_only():
    for bad in (
        b"",
        b"\x1b",  # header then nothing
        TEXT_Q5[: len(TEXT_Q5) // 2],
        b"\xff" * 20,
    ):
        try:
            brotli_decompress(bad, max_output=1 << 22)
        except BrotliError:
            pass  # every failure must be this type
        # (some byte soup decodes as a valid tiny stream — brotli has
        # no magic number; that is correct per spec, not fabrication)


def test_corrupt_byte_sweep_never_wrong_exception():
    for i in range(0, len(HTML_Q9), 53):
        mangled = bytearray(HTML_Q9)
        mangled[i] ^= 0xFF
        try:
            brotli_decompress(bytes(mangled), max_output=1 << 24)
        except BrotliError:
            pass


def test_max_output_bound():
    with pytest.raises(BrotliError):
        brotli_decompress(TEXT_Q5, max_output=16)


@given(st.binary(max_size=200))
@settings(max_examples=80, deadline=None)
def test_fuzz_only_brotlierror(raw):
    try:
        brotli_decompress(raw, max_output=1 << 22)
    except BrotliError:
        pass


def test_transform_engine_shapes():
    """The derived transform table drives the documented operations:
    identity, omit-first/last, uppercase — spot-check the semantics
    on a known word (the reference-equality pin for the uppercase
    byte-ops lives in scripts/make_brotli_tables.py, which verified
    non-ASCII probes against BrotliTransformDictionaryWord)."""
    word = b"example"
    ops = {op for _, op, _ in TRANSFORMS}
    assert "identity" in ops
    assert "uppercase_first" in ops and "uppercase_all" in ops
    assert any(op.startswith("omit_first_") for op in ops)
    for tid, (prefix, op, suffix) in enumerate(TRANSFORMS):
        got = _transform_word(word, tid)
        assert got.startswith(prefix) and got.endswith(suffix)
        if op == "identity":
            assert got == prefix + word + suffix
        elif op == "uppercase_first":
            assert got == prefix + b"Example" + suffix
        elif op == "uppercase_all":
            assert got == prefix + b"EXAMPLE" + suffix


def test_dictionary_blob_shape():
    assert len(DICTIONARY) == 122784
    # the length-4 section opens with the canonical first words
    assert DICTIONARY[:16] == b"timedownlifeleft"


def test_warc_br_content_encoding_undone():
    from scripts.make_brotli_tables import text_payload
    from tests.test_warc import _record

    from clickhouse_table_copier_spark.sources.warc import _parse_record

    rec = _record(
        {
            "WARC-Type": "response",
            "WARC-Target-URI": "https://example.com/br",
            "WARC-Date": "2026-08-16T00:00:00Z",
        },
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Content-Encoding: br\r\n\r\n" + TEXT_Q5,
    )
    got = _parse_record(rec)
    assert got is not None and got[5] == text_payload()
    bad = _record(
        {
            "WARC-Type": "response",
            "WARC-Target-URI": "https://example.com/bad",
            "WARC-Date": "2026-08-16T00:00:01Z",
        },
        b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n\xff\xff junk",
    )
    got = _parse_record(bad)
    assert got is not None and got[5] == b"\xff\xff junk"
