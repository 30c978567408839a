"""JBIG2 (ITU-T T.88) decoder tests.

Golden discipline (VERDICT r12 item 3, same as pdf_crypt): the
embedded streams below were minted OFFLINE by
``scripts/make_jbig2_golden.py`` — an INDEPENDENT transcription of
the T.88 *encoder*-side flowcharts (INITENC/ENCODE/BYTEOUT/FLUSH,
disjoint from the decoder's INITDEC/DECODE/BYTEIN) — and, for the
MMR flavor, by **libtiff's Group 4 encoder** (a fully independent
implementation).  The MQ decoder itself is additionally pinned by
the spec's own published coder test sequence (T.88 §H.2, identical
to the JPEG2000/T.800 conformance data), so a symmetric misreading
of the coder cannot survive.
"""

from __future__ import annotations

import numpy as np
import pytest

from clickhouse_table_copier_spark.operators.jbig2 import (
    Jbig2Error,
    MQDecoder,
    decode_embedded,
    decode_jbig2_pdf,
    decode_symbol_dict_segment,
    new_states,
    parse_segments,
)

# ---------------------------------------------------------------------
# T.88 §H.2 published test sequence for the arithmetic coder (shared
# with JPEG2000 T.800): 256 bits in, 30 bytes of MQ codestream out.
SPEC_TEST_IN = bytes.fromhex(
    "00020051000000c00352872aaaaaaaaa82c02000fcd79ef6bf7fed904f46a3bf"
)
SPEC_TEST_OUT = bytes.fromhex(
    "84c73bfce1a1430402200000410dbb86f4317fff88ff37471adb6adfffac"
)


def test_mq_decoder_spec_sequence():
    """Decoding the published codestream with one context must
    reproduce the published input bits exactly."""
    mq = MQDecoder(SPEC_TEST_OUT)
    states = new_states(1)
    got = bytearray()
    for _ in range(32):
        b = 0
        for _ in range(8):
            b = (b << 1) | mq.decode(states, 0)
        got.append(b)
    assert bytes(got) == SPEC_TEST_IN


# --------------------------------------------------------------------
# goldens from scripts/make_jbig2_golden.py (regenerate with:
#   python scripts/make_jbig2_golden.py)

GENERIC_T0 = bytes.fromhex(
    "0000000130000100000013000000260000001d0000000000000000000000000000022600"
    "0100000038000000260000001d0000000000000000000003fffdff02fefefe42867a6997"
    "a12edc5560c8950dc8ed42b7b139d49ba46e6c4da0acffffac"
)
GENERIC_TPGDON_T0 = bytes.fromhex(
    "000000013000010000001300000028000000210000000000000000000000000000022600"
    "010000004000000028000000210000000000000000000803fffdff02fefefea401f8def3"
    "fe5822ba2b556be3de4f7f5733bf4e2c6a815b7c89c804ebbc644ec6581fffffac"
)
GENERIC_TPGDON_T1 = bytes.fromhex(
    "000000013000010000001300000028000000210000000000000000000000000000022600"
    "010000003900000028000000210000000000000000000a03ffa402738aa83c001f74ce93"
    "4a2edbc40d2678ef7de3f5b234463c4e748fa59f0469e5dfffac"
)
GENERIC_TPGDON_T2 = bytes.fromhex(
    "000000013000010000001300000028000000210000000000000000000000000000022600"
    "010000003600000028000000210000000000000000000c02ffa4023df30d448d15c43dc7"
    "8600150c28b5c03ea1f714bd40fc86efcfa69bff7fffac"
)
GENERIC_TPGDON_T3 = bytes.fromhex(
    "000000013000010000001300000028000000210000000000000000000000000000022600"
    "010000003800000028000000210000000000000000000e02ffa401f8d9779cafd07d977d"
    "60252dd5c4fd6fff07eff38f92871bddcbae4c74db1fffffac"
)
GENERIC_MMR = bytes.fromhex(
    "00000001300001000000130000002e000000190000000000000000000000000000022600"
    "01000000460000002e0000001900000000000000000001cc036671c8a39147228e111d62"
    "22238f9806cce39147228e451c223ac444471f300d99c7228e451c8a38447588888e3f80"
    "080080"
)
SYMBOL_TEXT = bytes.fromhex(
    "00000001300001000000130000003c000000180000000000000000000000000000020000"
    "0100000024000003fffdff02fefefe00000003000000037cfe0dfd5c9058cbfabd13d3e9"
    "a302ffffac0000000306200201000000260000003c000000180000000000000000000010"
    "00000007a16229b41e80e99e1edd90a3ffffac"
)
SYMBOL_TEXT_STRIPS = bytes.fromhex(
    "00000001300001000000130000003c000000180000000000000000000000000000020000"
    "0100000024000003fffdff02fefefe00000003000000037cfe0dfd5c9058cbfabd13d3e9"
    "a302ffffac0000000306200201000000280000003c000000180000000000000000000818"
    "00000007a8b2c415b87e68292a7001aa59417fffac"
)
SYMBOL_TEXT_BOTTOM = bytes.fromhex(
    "00000001300001000000130000003c000000180000000000000000000000000000020000"
    "0100000024000003fffdff02fefefe00000003000000037cfe0dfd5c9058cbfabd13d3e9"
    "a302ffffac0000000306200201000000230000003c00000018000000000000000000000c"
    "00000007a67a6916b50bc2ff4dffffac"
)
SYMBOL_TEXT_GLOBALS_G = bytes.fromhex(
    "0000000100000000000024000003fffdff02fefefe00000003000000037cfe0dfd5c9058"
    "cbfabd13d3e9a302ffffac"
)
SYMBOL_TEXT_GLOBALS_B = bytes.fromhex(
    "00000002300001000000130000003c000000180000000000000000000000000000030620"
    "0101000000260000003c00000018000000000000000000001000000007a16229b41e80e9"
    "9e1edd90a3ffffac"
)


# fixture patterns — the same deterministic generators the minting
# script uses (fixtures, not an encoder: no coding logic here)

def checker(h, w, cell):
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy // cell) + (xx // cell)) % 2).astype(np.uint8)


def text_lines(h, w):
    img = np.zeros((h, w), np.uint8)
    for y0 in range(2, h - 3, 7):
        img[y0 : y0 + 3, 3 : w - 3] = 1
        img[y0 + 1, 5 : w : 9] = 0
    return img


def glyphs():
    t = np.zeros((8, 6), np.uint8)
    t[0:2, :] = 1
    t[2:, 2:4] = 1
    o = np.zeros((6, 6), np.uint8)
    o[0, 1:5] = 1
    o[5, 1:5] = 1
    o[1:5, 0] = 1
    o[1:5, 5] = 1
    dot = np.ones((2, 2), np.uint8)
    return [t, o, dot]


SYMBOL_PAGE_PLACEMENTS = [
    (2, 3, 0), (9, 5, 1), (17, 9, 2), (22, 5, 1), (31, 3, 0),
    (40, 12, 2), (45, 3, 0),
]


def symbol_page():
    want = np.zeros((24, 60), np.uint8)
    syms = glyphs()
    for x, y, sid in SYMBOL_PAGE_PLACEMENTS:
        g = syms[sid]
        h, w = g.shape
        want[y : y + h, x : x + w] |= g
    return want


def test_generic_region_template0():
    got = decode_embedded(GENERIC_T0)
    assert got.shape == (29, 38)
    assert (got == checker(29, 38, 3)).all()


@pytest.mark.parametrize(
    "blob,template",
    [
        (GENERIC_TPGDON_T0, 0),
        (GENERIC_TPGDON_T1, 1),
        (GENERIC_TPGDON_T2, 2),
        (GENERIC_TPGDON_T3, 3),
    ],
)
def test_generic_region_tpgdon_all_templates(blob, template):
    got = decode_embedded(blob)
    assert got.shape == (33, 40)
    assert (got == text_lines(33, 40)).all()


def test_generic_region_mmr_libtiff_golden():
    """MMR=1 region whose data is a libtiff-G4 strip — a fully
    independent encoder pins segment parse + raster orientation."""
    got = decode_embedded(GENERIC_MMR)
    assert got.shape == (25, 46)
    assert (got == text_lines(25, 46)).all()


def test_symbol_dict_and_text_region():
    got = decode_embedded(SYMBOL_TEXT)
    assert got.shape == (24, 60)
    assert (got == symbol_page()).all()


def test_symbol_dict_via_globals_stream():
    """The PDF /JBIG2Globals split: symbol dictionary in the globals
    stream, text region referring to it from the image stream."""
    got = decode_embedded(
        SYMBOL_TEXT_GLOBALS_B, globals_data=SYMBOL_TEXT_GLOBALS_G
    )
    assert (got == symbol_page()).all()
    # the body alone must decline (no symbols for the text region)
    assert decode_jbig2_pdf(SYMBOL_TEXT_GLOBALS_B) is None


@pytest.mark.parametrize(
    "blob",
    [SYMBOL_TEXT_STRIPS, SYMBOL_TEXT_BOTTOM],
    ids=["strips4_dsoffset2", "strips8_bottomleft"],
)
def test_text_region_strip_and_corner_variants(blob):
    """SBSTRIPS>1 (the IAIT per-symbol T path), a nonzero SBDSOFFSET,
    and the BOTTOMLEFT reference corner — the text-region parameter
    shapes jbig2enc-style writers emit — must produce the identical
    page the STRIPS=1/TOPLEFT golden renders."""
    got = decode_embedded(blob)
    assert got.shape == (24, 60)
    assert (got == symbol_page()).all()


def test_decode_jbig2_pdf_gray_contract():
    gray = decode_jbig2_pdf(GENERIC_T0)
    img = checker(29, 38, 3)
    assert gray.dtype == np.uint8
    assert (gray == (1 - img) * 255).all()  # 1=black -> gray 0


def test_segment_parser_fields():
    segs = parse_segments(GENERIC_T0)
    assert [s["type"] for s in segs] == [48, 38]
    assert segs[0]["page"] == 1 and segs[1]["page"] == 1
    segs = parse_segments(SYMBOL_TEXT)
    assert [s["type"] for s in segs] == [48, 0, 6]
    assert segs[2]["refs"] == [2]


def test_declines_never_raise():
    # truncation at every prefix length of a valid stream
    for cut in (0, 5, 11, 20, len(GENERIC_T0) - 3):
        assert decode_jbig2_pdf(GENERIC_T0[:cut]) is None
    # unknown-length segment (0xFFFFFFFF) declines
    blob = bytearray(GENERIC_T0)
    # second segment's length field: find via parser offsets — patch
    # the 4 bytes before the region data of segment 2
    segs = parse_segments(GENERIC_T0)
    idx = GENERIC_T0.index(segs[1]["data"])
    blob[idx - 4 : idx] = b"\xff\xff\xff\xff"
    assert decode_jbig2_pdf(bytes(blob)) is None
    # flipped bytes in the MQ data must not raise (may decode to a
    # different raster or decline — never throw into the batch)
    blob = bytearray(GENERIC_T0)
    blob[-10] ^= 0xFF
    decode_jbig2_pdf(bytes(blob))
    # random garbage
    rng = np.random.default_rng(7)
    for n in (1, 11, 64, 300):
        assert decode_jbig2_pdf(rng.bytes(n)) is None


def test_out_of_scope_flavors_decline():
    # symbol dict with SDHUFF=1 declines
    with pytest.raises(Jbig2Error):
        decode_symbol_dict_segment(b"\x00\x01" + b"\x00" * 20, [])
    # symbol dict with SDREFAGG=1 declines
    with pytest.raises(Jbig2Error):
        decode_symbol_dict_segment(b"\x00\x02" + b"\x00" * 20, [])
    # text region with SBHUFF=1 declines: build region info + flags
    import struct

    d = struct.pack(">IIIIB", 10, 10, 0, 0, 0) + struct.pack(">H", 1)
    d += b"\x00" * 8
    from clickhouse_table_copier_spark.operators.jbig2 import (
        decode_text_region_segment,
    )

    with pytest.raises(Jbig2Error):
        decode_text_region_segment(d, [np.ones((2, 2), np.uint8)])


def _header(number: int, stype: int, length: int) -> bytes:
    """Minimal §7.2 segment header: no refs, 1-byte page assoc 1."""
    return (
        number.to_bytes(4, "big")
        + bytes([stype & 0x3F, 0x00, 0x01])
        + length.to_bytes(4, "big")
    )


def test_known_out_of_scope_segment_types_decline():
    """Advisor r13 (medium): pattern dict (16), halftone (20/22/23)
    and refinement (40/42/43) regions carry page content — a stream
    mixing them with a decodable region must DECLINE, not silently
    return the raster with that content dropped."""
    for stype in (16, 20, 22, 23, 40, 42, 43):
        blob = GENERIC_T0 + _header(3, stype, 4) + b"\x00" * 4
        with pytest.raises(Jbig2Error):
            decode_embedded(blob)
        assert decode_jbig2_pdf(blob) is None  # API edge: None


def test_unknown_segment_types_still_skip():
    """Forward-compat per §7.3 retain bits: a genuinely unassigned
    type (60) is skipped and the rest of the page decodes."""
    blob = GENERIC_T0 + _header(3, 60, 4) + b"\x00" * 4
    got = decode_embedded(blob)
    assert (got == decode_embedded(GENERIC_T0)).all()


def test_reserved_referred_to_count_declines():
    """Advisor r13: short-form referred-to counts 5 and 6 are
    reserved (§7.2.4 allows 0-4) — decline deliberately instead of
    consuming phantom refs and desynchronizing the parse."""
    for count in (5, 6):
        blob = bytearray(GENERIC_T0)
        blob[5] = count << 5  # first segment's referred-to byte
        with pytest.raises(Jbig2Error, match="reserved referred-to"):
            parse_segments(bytes(blob))
        assert decode_jbig2_pdf(bytes(blob)) is None


def test_page_default_pixel_and_composition_ops():
    """A page-info default pixel of 1 with an XNOR-composited region
    exercises §8.2 composition."""
    import struct

    # page 8x8 default 1; generic region 8x8 of checker XOR'd on
    from clickhouse_table_copier_spark.operators.jbig2 import (
        _composite,
    )

    page = np.ones((8, 8), np.uint8)
    bmp = checker(8, 8, 2)
    _composite(page, bmp, 0, 0, 2)  # XOR
    assert (page == 1 - bmp).all()
    page = np.zeros((4, 4), np.uint8)
    _composite(page, np.ones((2, 2), np.uint8), 3, 3, 0)  # clip OR
    assert page.sum() == 1 and page[3, 3] == 1


# --------------------------------------------------------- PDF lift

def _pdf_with_stream(dict_extra: bytes, data: bytes) -> bytes:
    body = (
        b"<< " + dict_extra + f" /Length {len(data)} >>".encode()
        + b"\nstream\n" + data + b"\nendstream"
    )
    return b"%PDF-1.5\n1 0 obj\n" + body + b"\nendobj\n%%EOF\n"


def _jbig2_xobject_pdf(
    blob: bytes, w: int, h: int, globals_blob: bytes | None = None
) -> bytes:
    extra = b""
    img_dict = (
        b"/Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/BitsPerComponent 1 /ColorSpace /DeviceGray "
        b"/Filter /JBIG2Decode" % (w, h)
    )
    if globals_blob is not None:
        img_dict += b" /DecodeParms << /JBIG2Globals 7 0 R >>"
        extra = (
            b"7 0 obj\n<< /Length %d >>\nstream\n" % len(globals_blob)
            + globals_blob
            + b"\nendstream\nendobj\n"
        )
    body = (
        b"<< " + img_dict + f" /Length {len(blob)} >>".encode()
        + b"\nstream\n" + blob + b"\nendstream"
    )
    return (
        b"%PDF-1.5\n1 0 obj\n" + body + b"\nendobj\n" + extra + b"%%EOF\n"
    )


def _png_gray_raster(png: bytes) -> np.ndarray:
    from clickhouse_table_copier_spark.operators.multimodal import (
        _make_png_raster_decoder,
    )

    got = _make_png_raster_decoder()(png)
    assert got is not None
    w, h, nch, arr = got
    assert nch == 1
    return arr[:, :, 0]


def test_pdf_jbig2_image_lifts_as_png():
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        _extract_pdf_jpegs,
    )

    pdf = _jbig2_xobject_pdf(GENERIC_T0, 38, 29)
    got = _extract_pdf_jpegs(pdf)
    assert got is not None and len(got) == 1
    raster = _png_gray_raster(got[0])
    img = checker(29, 38, 3)
    assert (raster == (1 - img) * 255).all()


def test_pdf_jbig2_globals_stream_resolved():
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        _extract_pdf_jpegs,
    )

    pdf = _jbig2_xobject_pdf(
        SYMBOL_TEXT_GLOBALS_B, 60, 24,
        globals_blob=SYMBOL_TEXT_GLOBALS_G,
    )
    got = _extract_pdf_jpegs(pdf)
    assert got is not None and len(got) == 1
    raster = _png_gray_raster(got[0])
    assert (raster == (1 - symbol_page()) * 255).all()
    # without the globals object the image declines (no symbols),
    # the PDF itself still parses to zero images
    pdf_no_glob = _jbig2_xobject_pdf(SYMBOL_TEXT_GLOBALS_B, 60, 24)
    assert _extract_pdf_jpegs(pdf_no_glob) == []


def test_pdf_jbig2_ahash_matches_uncompressed_twin(spark):
    """VERDICT r12 item 3 done-check: a JBIG2-compressed page image
    lands in the media table and aHash-matches its uncompressed
    twin."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        image_ahash,
        near_duplicate_images,
    )
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        extract_pdf_images,
    )

    img = text_lines(33, 40)
    pdf = _jbig2_xobject_pdf(GENERIC_TPGDON_T0, 40, 33)
    pdf_df = spark.createDataFrame(
        [(200, bytearray(pdf))], "doc_id long, content binary"
    )
    embedded = extract_pdf_images(pdf_df, "content", "doc_id")
    twin_png = encode_png(
        ((1 - img) * np.uint8(255)).tobytes(), 40, 33, channels=1
    )
    standalone = spark.createDataFrame(
        [(1, "image", bytearray(twin_png), "{}")], MEDIA_SCHEMA
    )
    media = standalone.unionByName(embedded)
    hashes = [r["ahash"] for r in image_ahash(media).collect()]
    assert len(hashes) == 2 and hashes[0] == hashes[1] is not None
    pairs = near_duplicate_images(media, max_hamming=3).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0


def test_crafted_huge_dimensions_decline_fast():
    """r13 review regression: tiny crafted segments declaring huge
    regions/pages must decline in milliseconds — no multi-GiB
    allocation (OOM-kills the Arrow worker, uncatchable) and no
    hours-long pixel loop fed by the coder's 1-bits-forever rule."""
    import struct
    import time

    def seg(number, stype, refs, page, data):
        h = (
            struct.pack(">IB", number, stype & 0x3F)
            + bytes([len(refs) << 5])
            + bytes(refs)
            + bytes([page])
            + struct.pack(">I", len(data))
        )
        return h + data

    t0 = time.perf_counter()
    # generic region 65535x65535 with EMPTY coder data
    gr = struct.pack(">IIIIB", 65535, 65535, 0, 0, 0) + b"\x00" + (
        b"\x03\xff\xfd\xff\x02\xfe\xfe\xfe"
    )
    assert decode_jbig2_pdf(seg(1, 38, [], 1, gr)) is None
    # text region 60000x60000, zero symbols path replaced by 1 symbol
    tr = struct.pack(">IIIIB", 60000, 60000, 0, 0, 0) + struct.pack(
        ">H", 0
    ) + struct.pack(">I", 1)
    from clickhouse_table_copier_spark.operators.jbig2 import (
        decode_text_region_segment,
    )

    with pytest.raises(Jbig2Error):
        decode_text_region_segment(tr, [np.ones((2, 2), np.uint8)])
    # page info with absurd dims
    pi = struct.pack(">IIIIBH", 0xFFFFFFF0, 50000, 0, 0, 0, 0)
    assert decode_jbig2_pdf(seg(1, 48, [], 1, pi)) is None
    assert time.perf_counter() - t0 < 2.0


def test_coder_starvation_bounded():
    """A mid-size region whose coder data ends immediately must
    decline via the synthetic-feed bound, not loop through millions
    of fabricated pixels."""
    import struct
    import time

    from clickhouse_table_copier_spark.operators.jbig2 import (
        decode_generic_segment,
    )

    # 4096x4096 passes the area cap (16M < 2^28) but has no data
    gr = struct.pack(">IIIIB", 4096, 4096, 0, 0, 0) + b"\x00" + (
        b"\x03\xff\xfd\xff\x02\xfe\xfe\xfe"
    )
    t0 = time.perf_counter()
    with pytest.raises(Jbig2Error):
        decode_generic_segment(gr)
    assert time.perf_counter() - t0 < 60.0
