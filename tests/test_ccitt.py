"""CCITT G3/G4 behavior: the decline contract, container wiring (TIFF
raster decode, PDF /CCITTFaxDecode image lift), cross-format dedup
identity, and fuzz.  Exact-raster correctness against the independent
libtiff encoder lives in tests/test_ccitt_golden.py."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_table_copier_spark.operators import ccitt
from clickhouse_table_copier_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _make_tiff_raster_decoder,
    encode_png,
    image_ahash,
    image_pixel_stats,
    near_duplicate_images,
)
from clickhouse_table_copier_spark.operators.pdf_extract import (
    _extract_pdf_jpegs,
)

from tests.test_ccitt_golden import (
    G4_DIAG,
    G4_RAND,
    _strip,
    diag_pattern,
    rand_pattern,
)
from tests.test_pdf_crypt import encrypt_pdf


def _gray(img01):
    return np.where(img01 == 1, 0, 255).astype(np.uint8)


# ------------------------------------------------------------ decline


def test_decline_on_junk_and_truncation():
    data, w, h, _, _ = _strip(G4_RAND)
    # all-zero bits hit the T.6 extension prefix -> decline (note:
    # G4 has no magic header, so SOME byte soup decodes as valid
    # all-white lines, e.g. repeated V0 codes — that is correct
    # G4 semantics, not fabrication)
    assert ccitt.decode_g4(b"\x00\x00\x00\x00", 100, 10) is None
    assert ccitt.decode_g4(b"", 100, 10) is None
    # truncated stream with a declared height: incomplete -> None,
    # never a partially-fabricated raster
    assert ccitt.decode_g4(data[: len(data) // 2], w, h) is None
    # zero/absurd geometry
    assert ccitt.decode_g4(data, 0, h) is None
    assert ccitt.decode_g4(data, 1 << 21, h) is None


def test_unknown_height_decodes_available_rows():
    """Without /Rows the decoder stops at EOFB / trailing pad and
    returns what decoded — the PDF case where /Rows is absent."""
    data, w, h, _, _ = _strip(G4_DIAG)
    got = ccitt.decode_g4(data, w, None)
    assert got is not None
    assert got.shape == (h, w)
    assert np.array_equal(got, _gray(diag_pattern()))


@given(st.binary(max_size=200))
@settings(max_examples=80, deadline=None)
def test_fuzz_never_raises(raw):
    ccitt.decode_g4(raw, 64, 8)
    ccitt.decode_g3(raw, 64, 8, two_d=True)
    ccitt.decode_g3(raw, 64, None, two_d=False, has_eol=False)
    ccitt.decode_ccitt_pdf(raw, -1, 64, None)
    ccitt.decode_ccitt_pdf(raw, 0, 64, 8)


# -------------------------------------------------- TIFF container


def _tiff_1bit(img01, comp=1, photometric=0, fillorder=1):
    """Minimal single-strip little-endian 1-bit TIFF writer (test
    side) for the flag shapes libtiff won't emit on demand."""
    h, w = img01.shape
    packed = np.packbits(img01, axis=1).tobytes()
    if fillorder == 2:
        packed = bytes(int(f"{b:08b}"[::-1], 2) for b in packed)
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 1),
        (259, 3, 1, comp), (262, 3, 1, photometric),
        (266, 3, 1, fillorder),
        (273, 4, 1, 0),  # patched below
        (277, 3, 1, 1), (278, 4, 1, h), (279, 4, 1, len(packed)),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 273:
            val = data_off
        out += struct.pack("<HHI", tag, typ, cnt)
        out += struct.pack("<I", val) if typ == 4 else struct.pack(
            "<HH", val, 0
        )
    out += struct.pack("<I", 0)  # next IFD
    out += packed
    return bytes(out)


def test_tiff_raw_1bit_both_photometrics():
    dec = _make_tiff_raster_decoder()
    img = diag_pattern()
    got0 = dec(_tiff_1bit(img, photometric=0))  # MinIsWhite
    got1 = dec(_tiff_1bit(img, photometric=1))  # MinIsBlack
    assert got0 is not None and got1 is not None
    assert np.array_equal(got0[3][:, :, 0], _gray(img))
    assert np.array_equal(got1[3][:, :, 0], 255 - _gray(img))


def test_tiff_fillorder2_bit_reversal():
    dec = _make_tiff_raster_decoder()
    img = rand_pattern()[:16, :64]
    got = dec(_tiff_1bit(img, fillorder=2))
    assert got is not None
    assert np.array_equal(got[3][:, :, 0], _gray(img))


def test_tiff_png_identical_ahash(spark):
    """A G4 fax TIFF and a PNG of the SAME pixels must aHash
    IDENTICALLY — scanned documents join cross-format dedup exactly."""
    gray = _gray(diag_pattern())
    png = encode_png(gray.tobytes(), 64, 32, channels=1)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(bytes(G4_DIAG)), "{}"),
            (2, "image", bytearray(png), "{}"),
        ],
        MEDIA_SCHEMA,
    )
    hashes = {r["media_id"]: r["ahash"] for r in image_ahash(media).collect()}
    assert hashes[1] is not None and hashes[1] == hashes[2]
    pairs = near_duplicate_images(media, max_hamming=3).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0


def test_tiff_pixel_stats_exact(spark):
    gray = _gray(diag_pattern())
    media = spark.createDataFrame(
        [(7, "image", bytearray(bytes(G4_DIAG)), "{}")], MEDIA_SCHEMA
    )
    row = image_pixel_stats(media).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (64, 32, 1)
    assert row["mean_r"] == pytest.approx(float(gray.mean()))


# ---------------------------------------------------- PDF image lift


def _ccitt_xobject_pdf(strip: bytes, w: int, h: int, k: int = -1) -> bytes:
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R >>",
        (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/BitsPerComponent 1 /ImageMask false "
            f"/Filter /CCITTFaxDecode "
            f"/DecodeParms << /K {k} /Columns {w} /Rows {h} >> "
            f"/Length {len(strip)} >>".encode()
            + b"\nstream\n" + strip + b"\nendstream"
        ),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, body in enumerate(objs):
        out += f"{i + 1} 0 obj\n".encode() + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def test_pdf_ccitt_image_lifts_as_png():
    """A scanned-PDF page image (/CCITTFaxDecode G4) decodes and
    re-emits as a grayscale PNG payload."""
    data, w, h, _, _ = _strip(G4_DIAG)
    got = _extract_pdf_jpegs(_ccitt_xobject_pdf(data, w, h))
    assert got is not None and len(got) == 1
    assert got[0][:8] == b"\x89PNG\r\n\x1a\n"


def test_pdf_ccitt_image_pairs_with_png_twin(spark):
    """End-to-end: the PDF-embedded fax image and a standalone PNG of
    the same pixels land in ONE near-dup pair at hamming 0."""
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        extract_pdf_images,
    )

    data, w, h, _, _ = _strip(G4_DIAG)
    pdf_df = spark.createDataFrame(
        [(100, bytearray(_ccitt_xobject_pdf(data, w, h)))],
        "doc_id long, content binary",
    )
    embedded = extract_pdf_images(pdf_df, "content", "doc_id")
    gray = _gray(diag_pattern())
    png = encode_png(gray.tobytes(), w, h, channels=1)
    standalone = spark.createDataFrame(
        [(1, "image", bytearray(png), "{}")], MEDIA_SCHEMA
    )
    media = standalone.unionByName(embedded)
    pairs = near_duplicate_images(media, max_hamming=3).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0


def test_encrypted_pdf_ccitt_image_unwraps():
    """Crypt + CCITT compose: the image stream decrypts, then fax-
    decodes — the full scanned-DRM-PDF path."""
    data, w, h, _, _ = _strip(G4_DIAG)
    enc = encrypt_pdf(_ccitt_xobject_pdf(data, w, h), 4, owner_pwd=b"o")
    got = _extract_pdf_jpegs(enc)
    assert got is not None and len(got) == 1
    assert got[0][:8] == b"\x89PNG\r\n\x1a\n"


def test_pdf_ccitt_malformed_declines():
    got = _extract_pdf_jpegs(_ccitt_xobject_pdf(b"\xff\xff\xff", 64, 32))
    assert got == []


def test_tiff_deflate_compression():
    """Compression 8 (official Deflate) and 32946 (legacy code):
    zlib-compressed strips of a gray-8 image decode exactly."""
    import zlib

    gray = (np.arange(16 * 20, dtype=np.uint8)).reshape(16, 20)
    for comp in (8, 32946):
        payload = zlib.compress(gray.tobytes())
        entries = [
            (256, 4, 1, 20), (257, 4, 1, 16), (258, 3, 1, 8),
            (259, 3, 1, comp), (262, 3, 1, 1), (273, 4, 1, 0),
            (277, 3, 1, 1), (278, 4, 1, 16), (279, 4, 1, len(payload)),
        ]
        data_off = 8 + 2 + 12 * len(entries) + 4
        out = bytearray(b"II*\x00" + struct.pack("<I", 8))
        out += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            if tag == 273:
                val = data_off
            out += struct.pack("<HHI", tag, typ, cnt)
            out += (
                struct.pack("<I", val)
                if typ == 4
                else struct.pack("<HH", val, 0)
            )
        out += struct.pack("<I", 0)
        out += payload
        got = _make_tiff_raster_decoder()(bytes(out))
        assert got is not None
        assert np.array_equal(got[3][:, :, 0], gray)


def test_tiff_deflate_with_predictor2():
    """Predictor 2 applies after Deflate too (review finding): the
    horizontal deltas must be undone, not returned as pixels."""
    import zlib

    gray = np.arange(8 * 8, dtype=np.uint8).reshape(8, 8) * 3
    deltas = gray.astype(np.int16)
    deltas[:, 1:] = (gray[:, 1:].astype(np.int16) - gray[:, :-1]) % 256
    payload = zlib.compress(deltas.astype(np.uint8).tobytes())
    entries = [
        (256, 4, 1, 8), (257, 4, 1, 8), (258, 3, 1, 8),
        (259, 3, 1, 8), (262, 3, 1, 1), (273, 4, 1, 0),
        (277, 3, 1, 1), (278, 4, 1, 8), (279, 4, 1, len(payload)),
        (317, 3, 1, 2),
    ]
    data_off = 8 + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 273:
            val = data_off
        out += struct.pack("<HHI", tag, typ, cnt)
        out += (
            struct.pack("<I", val) if typ == 4
            else struct.pack("<HH", val, 0)
        )
    out += struct.pack("<I", 0)
    out += payload
    got = _make_tiff_raster_decoder()(bytes(out))
    assert got is not None
    assert np.array_equal(got[3][:, :, 0], gray)


def test_tiff_gray8_min_is_white_inverts():
    """PhotometricInterpretation 0 on 8-bit gray: 0 = white per spec
    — the raster must invert (review finding)."""
    gray = np.arange(8 * 8, dtype=np.uint8).reshape(8, 8)
    entries = [
        (256, 4, 1, 8), (257, 4, 1, 8), (258, 3, 1, 8),
        (259, 3, 1, 1), (262, 3, 1, 0), (273, 4, 1, 0),
        (277, 3, 1, 1), (278, 4, 1, 8), (279, 4, 1, 64),
    ]
    data_off = 8 + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 273:
            val = data_off
        out += struct.pack("<HHI", tag, typ, cnt)
        out += (
            struct.pack("<I", val) if typ == 4
            else struct.pack("<HH", val, 0)
        )
    out += struct.pack("<I", 0)
    out += gray.tobytes()
    got = _make_tiff_raster_decoder()(bytes(out))
    assert got is not None
    assert np.array_equal(got[3][:, :, 0], 255 - gray)


def test_final_eol_at_exact_stream_end_terminates():
    """A G3 stream whose final EOL's terminating 1 is the LAST bit
    must return, not spin (review finding: off-by-one in the EOL
    consumer left the bits unconsumed and the row loop made no
    progress — an executor hang no except can catch)."""
    # EOL + one all-white 8px row (white run 8 = '10011') + EOL ending
    # exactly at a bit boundary
    bits = "000000000001" + "10011" + "000000000001"
    pad = (8 - len(bits) % 8) % 8
    data = int(bits + "0" * pad, 2).to_bytes((len(bits) + pad) // 8, "big")
    got = ccitt.decode_g3(data, 8, rows=None)
    assert got is not None and got.shape == (1, 8)
    # and with an over-declared row count: decline, not hang
    assert ccitt.decode_g3(data, 8, rows=5) is None


def test_k_positive_stream_never_retried_as_mh():
    """A corrupt K>0 (MR) stream must decline — reinterpreting the
    same bits as byte-aligned MH could fabricate a raster (review
    finding)."""
    data, w, h, _, _ = _strip(G4_DIAG)  # G4 bits are not valid MR
    assert ccitt.decode_ccitt_pdf(data[: len(data) // 2], 2, w, h) is None
