"""JPEG 2000 decoder (operators/jpeg2000.py) vs GOLDEN codestreams
minted by ``scripts/make_jpeg2000_golden.py`` — an INDEPENDENT
transcription of the ITU-T T.800 *encoder* side (forward 5/3
lifting, tier-1 pass encoding, tag-tree/packet emission, Annex C
MQ ENCODER shared with the JBIG2 goldens) that imports nothing from
the decoder module.  The MQ coder itself is pinned to the published
T.88 H.2 test vector in tests/test_jbig2.py (T.800 Annex C and T.88
Annex E specify the identical coder).

Golden grid: gray 8x8 1-level; gray 37x29 2-level 2-layer RLCP
(odd dims exercise every DWT boundary branch; multi-codeblock bands
exercise the tag trees); RGB 24x16 with reversible MCT + SOP/EPH
markers; 16x16 with RESET|TERMALL|VCAUSAL|SEGSYM code-block modes;
and a JP2 box-wrapped twin.  Pixel formulas are restated here so a
decoder bug cannot hide behind a shared constant."""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_table_copier_spark.operators.jpeg2000 import (
    Jp2Error,
    decode_jp2,
    decode_jp2_pdf,
    inverse_dwt53,
    parse_codestream,
)

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "make_jpeg2000_golden.py",
)


def _mkg():
    spec = importlib.util.spec_from_file_location("mkj2k", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


MKG = _mkg()


# --------------------------------------------------------------------
# goldens from scripts/make_jpeg2000_golden.py (regenerate with:
#   python scripts/make_jpeg2000_golden.py)

J2K_GRAY8_L1 = bytes.fromhex(
    "ff4fff510029000000000008000000080000000000000000000000080000000800000000"
    "000000000001070101ff52000c00000001000100000001ff5c00074040484850ff90000a"
    "0000000000440001ff93df808811f708b52ec99d9ea937d2146191ba9447cfc02a1f504c"
    "7e00c0230f80ba296a5926e0bf1e83aebdc4e4733ae91e86fc52597fffd9"
)
J2K_RGB24X16_MCT = bytes.fromhex(
    "ff4fff51002f000000000018000000100000000000000000000000180000001000000000"
    "000000000003070101070101070101ff52000c06020001010101010001ff5c0007404048"
    "4850ff90000a0000000002dd0001ff93ff9100040000e7ed3cfda420ff9210cce07f7c4b"
    "42f5399439833e5c371cb3b155de9d1e9d250a09a781091d42747b9aff0e7cdc2edbff61"
    "bf7c7911a7e0459034c5c90f1125cad6ff7f1ee26640219b6606c13bc9c18410e08efa4f"
    "0332b528b6d09e425f9b6a274d1c1fff9100040001efe06bfc0880ff9213cdbeb66cdfa8"
    "e2c53b7400d89afd325226641e5e27a2406729604a708d452532236ed536096de4a30030"
    "60380770eb20865b92da2517427e80b38caf85b486cdd83ee4d020f2d3dabcfdd106e43d"
    "2b64a6656b111b8bff9100040002f7e065fcc840ff923e5caecb1ab545af0a1511d3c109"
    "6a2aa4a64b71afa4c3fb3ff710f07d562586aa8042ca8e4cbc94c44ddfaa55747819ce86"
    "2e439290c6e7d3cfdaac54254f6eab8a68689aa83fc3dd9ab1dee80163fbe198b7ff9100"
    "040003e2fa85ff345f1fb48ff68c62fb447f8078ff92626d4f4098cb2699e6f73a14e1d1"
    "5015b97e85d30dff7f202c0d4d18dcbd62e8a4df44d84f9a87ec208d4a06f2f36245970e"
    "a0cb4cecb6e533f8e5c6ade95891e0993162408a0381e7c272f0c7ed25ff7f28b5e96de8"
    "16466fa83ec7647d76a0543b604e536d8369975d173df6916410f1a837dbbeadebcd577f"
    "34bdb23d551dcdb40118d26eed6f77ff9100040004e3f68b7ed14dfcc82fc0572fc04bf9"
    "8500ff9209f718d96748e24b4eb3bc39bec12c074632e7135fbf17506d53cbae4cc1f00e"
    "890a37caaeca33f98abf61fa2e25c207c6140c24d261b0d3c8751930f755475ccf6522bc"
    "08ab01ff71df1207fe378d3825f01a64cf035fbafc15142ea1357f1bc2d0206774050f80"
    "4c16a66e5f447fff7f3569e2e0b02bdfbc383fff9100040005e9f6837f318cfe019fc04f"
    "2fc01bf98600ff9261d7d5f41fb3205cbcb0eeadb03614ac1f08728677c400e7b0fdb4b0"
    "3cbf61f84935d2e7cdb664bccc7f281367c67b3428da5214d0b147413a43a59fa95c4976"
    "7fff7f357e34f1ac4b9007162eff7fffd9"
)
J2K_GRAY16_MODES = bytes.fromhex(
    "ff4fff510029000000000010000000100000000000000000000000100000001000000000"
    "000000000001070101ff52000c00000001000100002e01ff5c00074040484850ff90000a"
    "0000000002e00001ff93efe06496494522514ca86fb5192894ca453299fe06ca44944a25"
    "128a47f8122d12514ca653299011ecef6a7f6fac253f3fbfbbc28fbf4adfb1a7bfbf585f"
    "bfff7fcc4a5fbfff7fca5fff7fbf1189292ffd90cfb3bfb53f1fbfff7f41f07fbfff7f41"
    "fdbfff7fb3477fbfff7f34c12fbf09ff7f0c207f7f059f720ab9bf0b1167bf0faf7ebf7f"
    "53cdbfbfd455bfff7f1d44bf1d255cdf7f117857d9b427bfbb5c73bfff7fd3dc3fbfff7f"
    "b4607fbfff7f0fd7bfbfff7f3b913fbfe7f0225a2522994ca45237da69144944929148ff"
    "0112912c94ca653299fe044a44a44a2594ca473f8112d129128a453299bed444a44a2512"
    "8a87f81929124928944a251bed444a24a251289472fc11128948a65329948ff3225228a2"
    "9148a4532919f6a94492a14ca45233ed648925229948a64021a7fb7f01afbff78f3b47f0"
    "dfaccfbfff7f34f1bfbfff7fc6a74fbfff7fbc83bfff7fd61fbf1a393fd95fff7fefdd7f"
    "ccbffb6d7fbff1dcbfff7fb37abfff7fd63fbf204fbc7f089d169fb73ff1f75f7fbfff7f"
    "ac1a3fbfff7f17057fbfff7fb9353fbfff7fcd459fbf204fbc7f089d8bcfbb47bc2f4c7f"
    "efcf34b0bfbfcb003fbfff7f38bd3fbfff7fcd4abf21a7577f0a1f5fdde645bfba3fb0af"
    "bfbf61f8bfff7fb229bfff7fc7d63fbfff7fb8ce7fbf1a37e04fd93fb7dd04df073fbf7f"
    "3afebf7fe71fbfef5557bfff7fbb31ff7fbf09ff7fa77f0d61e2076fbb47e3bf1f39a7bf"
    "7fad0fbf7fc72dbf7fc09fbf097fb83f8867bf475bdf47ef5f3a0fbf7fb84fbfe71c8fbf"
    "7fc8afbf08e1c1d7544f03effca7bcbfff7f59e7bfff7fad927fbfff7fc6c09fbfff7fac"
    "f17fbfff7fff7fbf0a15a37f0db795833f087f4fc91fbffa7f05dfbfff7fe33bbfff7fb6"
    "43bfff7fc9e77fbfff7feabdbf10cce4b04f37c9e7bff75cbfff7fc451ff7fbfff7fc769"
    "afbfff7fae1ebfff7fd075bf10cce4aeff7f3d7fc9ebbfe76fbfff7fc453bfff7fc76a1f"
    "bfff7fae1fbfff7fd071efbfffd9"
)
J2K_GRAY16_BYPASS = bytes.fromhex(
    "ff4fff510029000000000010000000100000000000000000000000100000001000000000"
    "000000000001070101ff52000c00000001000100000101ff5c00074040484850ff90000a"
    "0000000002100001ff93efe024d1a244afb4692244bf80b3448d12fe02c912244811ed38"
    "4974bcbfc82f2a8c60ff7fb072c0ff7fe28aff7fdd2cff7f118929221bca0be08f010fcc"
    "3f19a2ff7f8f9dff7f3d2aff7f0a0126f0e6782525c9ec4772e780ff7f049bff7ffd0e80"
    "ff7f55adff7f1d22c128704c34b0dd88c3fb14ff7f8495ff7f729dff7f25aaff7fe7f014"
    "48912257da2cd1235fc049a244897f01468d12259fc059a244895f68a246897f01268912"
    "257da2491a2597e034912246bf9893448912353ed1a489129f68c244890021c43ec5988b"
    "d9f3685f31e0ff7fc017ff7fba6bff7ff6f0ff7f1a393dc3a701b43a70e85caafef0ff7f"
    "8c80ff7ff6ff00ff7f204bb771d06c613f99a8ec80ff7f553dff7fafc3ff7fe7e1ff7f20"
    "4bb77272944ace057f857500ff7fb74e80ff7f2fc4ff7fe7efff7f218eb81889e98535bc"
    "185fc8ab00ff7f8912ff7fd2f9ff7faeeaff7f1a37e03a7942bf09ecbc3febff7ff08540"
    "ff7faee0ff7f0a0eef7487ea73dfbf40b300ff7f0989ff7f0cf4ff7f0bfdff7f097fb697"
    "36bc1166ed058fff7fc17900ff7f0bf8ff7f08e1c1635750248af1fefed91f9263ff7fcd"
    "3dff7f9662ff7fff7f80ff7f09fe940f03aa58658faa7800ff7fdf2fff7f8070ff7fdb2f"
    "ff7fff7800ff7f10cce4b04d62f6579286a290bfca62ff7f913dff7feeeeff7f10cce4af"
    "041bbf51380b5fafca6cff7f913fff7feee0ff7fffd9"
)
JP2_GRAY8_BOXED = bytes.fromhex(
    "0000000c6a5020200d0a870a00000014667479706a703220000000006a7032200000002d"
    "6a703268000000166968647200000008000000080001070700000000000f636f6c720100"
    "0000000011000000926a703263ff4fff5100290000000000080000000800000000000000"
    "00000000080000000800000000000000000001070101ff52000c00000001000100000001"
    "ff5c00074040484850ff90000a0000000000440001ff93df808811f708b52ec99d9ea937"
    "d2146191ba9447cfc02a1f504c7e00c0230f80ba296a5926e0bf1e83aebdc4e4733ae91e"
    "86fc52597fffd9"
)
# gray 37x29 2-level 2-layer RLCP (large — built here from the script
# to keep the file readable; byte-identity asserted against the
# decoder, pixel-identity against the LCG formula)


def _gray8():
    return np.fromfunction(
        lambda y, x: (x * 31 + y * 17) % 256, (8, 8), dtype=np.int64
    ).astype(np.uint8)


def _gray37x29():
    v = np.empty(37 * 29, dtype=np.int64)
    s = 12345
    for i in range(v.size):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        v[i] = (s >> 16) & 0xFF
    return v.reshape(29, 37).astype(np.uint8)


def _rgb24x16():
    y, x = np.mgrid[0:16, 0:24]
    r = ((x * 11 + y * 3) % 256).astype(np.uint8)
    g = ((x * 5 + y * 13) % 256).astype(np.uint8)
    b = ((x * 7 + y * 29 + 128) % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def _gray16modes():
    y, x = np.mgrid[0:16, 0:16]
    return (((x ^ y) * 37 + x * 5) % 256).astype(np.uint8)


def test_golden_gray8():
    got = decode_jp2(J2K_GRAY8_L1)
    assert got.dtype == np.uint8 and got.shape == (8, 8)
    assert (got == _gray8()).all()


def test_golden_gray37x29_two_levels_two_layers():
    blob = MKG.encode_j2k(
        MKG.gray37x29(), levels=2, xcb=4, ycb=4, layers=2, prog=1
    )
    got = decode_jp2(blob)
    assert got.shape == (29, 37)
    assert (got == _gray37x29()).all()


def test_golden_rgb_mct_sop_eph():
    got = decode_jp2(J2K_RGB24X16_MCT)
    assert got.shape == (16, 24, 3)
    assert (got == _rgb24x16()).all()


def test_golden_codeblock_modes():
    """RESET | TERMALL | VCAUSAL | SEGSYM (Table A.19 flags)."""
    got = decode_jp2(J2K_GRAY16_MODES)
    assert (got == _gray16modes()).all()


def test_golden_bypass():
    """Selective arithmetic bypass (§D.4 lazy coding, r14): SPP/MRP
    raw from the 11th pass, MQ/raw segment alternation, per-segment
    packet lengths."""
    got = decode_jp2(J2K_GRAY16_BYPASS)
    assert (got == _gray16modes()).all()
    assert decode_jp2(
        MKG.encode_j2k(
            MKG.gray16modes(), levels=1, xcb=2, ycb=2,
            cbstyle=0x01 | 0x04,  # bypass + termall
        )
    ).tolist() == _gray16modes().tolist()


def test_golden_jp2_boxed():
    got = decode_jp2(JP2_GRAY8_BOXED)
    assert (got == _gray8()).all()
    # the boxed stream embeds the raw golden verbatim
    assert J2K_GRAY8_L1 in JP2_GRAY8_BOXED


def test_goldens_are_script_reproducible():
    assert MKG.encode_j2k(
        MKG.gray8(), levels=1, xcb=2, ycb=2, layers=1, prog=0
    ) == J2K_GRAY8_L1
    assert MKG.encode_j2k(
        MKG.rgb24x16(), levels=1, xcb=3, ycb=3, prog=2, mct=1,
        sop=True, eph=True,
    ) == J2K_RGB24X16_MCT


# --------------------------------------------------------------------
# property round-trips (random images through the DISJOINT encoder)


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    levels=st.integers(0, 3),
    cbe=st.integers(2, 4),
    layers=st.integers(1, 3),
    prog=st.integers(0, 4),
)
def test_roundtrip_gray_random(seed, w, h, levels, cbe, layers, prog):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    blob = MKG.encode_j2k(
        img, levels=levels, xcb=cbe, ycb=cbe, layers=layers, prog=prog
    )
    got = decode_jp2(blob)
    assert got.shape == img.shape
    assert (got == img).all()


@settings(max_examples=8, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    mct=st.integers(0, 1),
    modes=st.sampled_from([0, 0x02, 0x04, 0x08, 0x20, 0x2E, 0x01, 0x05, 0x29, 0x2F]),
)
def test_roundtrip_rgb_and_modes(seed, mct, modes):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    blob = MKG.encode_j2k(
        img, levels=2, xcb=3, ycb=3, mct=mct, cbstyle=modes
    )
    got = decode_jp2(blob)
    assert (got == img).all()


def test_inverse_dwt_hand_vector():
    """Hand-computed 1-level synthesis of a 4x1 signal: interleaved
    Y = [10, -3, 14, 5] (L=[10,14], H=[-3,5]).
    X[0] = 10 - floor((Y[1ref]+Y[1]+2)/4) = 10 - floor((-3-3+2)/4)
         = 10 - (-1) = 11
    X[2] = 14 - floor((-3+5+2)/4) = 14 - 1 = 13
    X[1] = -3 + floor((11+13)/2) = 9
    X[3] = 5 + floor((13+13ref)/2) = 18
    """
    ll = np.array([[10, 14]], dtype=np.int32)
    hl = np.array([[-3, 5]], dtype=np.int32)
    lh = np.zeros((0, 2), dtype=np.int32)
    hh = np.zeros((0, 2), dtype=np.int32)
    out = inverse_dwt53(ll, [(hl, lh, hh)])
    assert out.tolist() == [[11, 9, 13, 18]]


# --------------------------------------------------------------------
# declines (out of scope / malformed — None from the API edge)


def _patch(blob: bytes, idx: int, val: int) -> bytes:
    b = bytearray(blob)
    b[idx] = val
    return bytes(b)


def test_out_of_scope_declines():
    g = J2K_GRAY8_L1
    # irreversible 9/7: COD transform byte 0 (last SPcod byte)
    cod_at = g.index(b"\xff\x52")
    with pytest.raises(Jp2Error, match="9/7"):
        parse_codestream(_patch(g, cod_at + 13, 0))
    # scalar quantization (Sqcd style bits)
    qcd_at = g.index(b"\xff\x5c")
    with pytest.raises(Jp2Error, match="quantization"):
        parse_codestream(_patch(g, qcd_at + 4, 0x42))
    # multiple tiles: XTsiz (bytes +22..25) halved below Xsiz
    siz_at = g.index(b"\xff\x51")
    with pytest.raises(Jp2Error, match="tiles"):
        parse_codestream(_patch(g, siz_at + 25, 0x04))
    # subsampling
    with pytest.raises(Jp2Error, match="subsampling"):
        parse_codestream(_patch(g, siz_at + 42, 2))
    # every decline comes back as None from the API edge
    for idx, val in (
        (cod_at + 13, 0), (qcd_at + 4, 0x42),
    ):
        assert decode_jp2_pdf(_patch(g, idx, val)) is None


def test_coc_qcc_poc_rgn_decline():
    g = J2K_GRAY8_L1
    sot_at = g.index(b"\xff\x90")
    for marker in (b"\x53", b"\x5d", b"\x5e", b"\x5f"):
        blob = (
            g[:sot_at] + b"\xff" + marker + b"\x00\x03\x00" + g[sot_at:]
        )
        with pytest.raises(Jp2Error, match="out of scope"):
            parse_codestream(blob)
        assert decode_jp2_pdf(blob) is None


def test_declines_never_raise():
    g = J2K_GRAY8_L1
    # truncation at every prefix length
    for cut in range(0, len(g), 7):
        assert decode_jp2_pdf(g[:cut]) is None or cut == 0
    # flipped bytes anywhere must not raise into the batch
    for i in range(0, len(g), 3):
        decode_jp2_pdf(_patch(g, i, g[i] ^ 0xFF))
    rng = np.random.default_rng(11)
    for n in (1, 12, 64, 300):
        assert decode_jp2_pdf(rng.bytes(n)) is None
    assert decode_jp2_pdf(b"") is None


def test_crafted_dims_decline_before_alloc():
    """65k x 65k SIZ must decline at the cap check, not allocate."""
    g = bytearray(J2K_GRAY8_L1)
    siz_at = g.index(b"\xff\x51")
    for off in (6, 10, 22, 26):  # Xsiz, Ysiz, XTsiz, YTsiz
        g[siz_at + off : siz_at + off + 4] = (1 << 16).to_bytes(4, "big")
    with pytest.raises(Jp2Error, match="too large"):
        parse_codestream(bytes(g))
    assert decode_jp2_pdf(bytes(g)) is None


def test_gray_contract_matches_sibling_codecs():
    """Same contract as ccitt/jbig2: uint8, no raise, self-described
    dims; RGB comes back channel-last."""
    got = decode_jp2_pdf(J2K_GRAY8_L1)
    assert got is not None and got.dtype == np.uint8
    rgb = decode_jp2_pdf(J2K_RGB24X16_MCT)
    assert rgb.shape[-1] == 3 and rgb.dtype == np.uint8


# --------------------------------------------------------------------
# PDF image-lift e2e (the /JPXDecode seam closed, VERDICT r13 item 3)


def _jpx_xobject_pdf(blob: bytes, w: int, h: int, gray=True) -> bytes:
    cs = b"/DeviceGray" if gray else b"/DeviceRGB"
    img_dict = (
        b"/Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/BitsPerComponent 8 /ColorSpace " % (w, h) + cs
        + b" /Filter /JPXDecode"
    )
    body = (
        b"<< " + img_dict + f" /Length {len(blob)} >>".encode()
        + b"\nstream\n" + blob + b"\nendstream"
    )
    return b"%PDF-1.5\n1 0 obj\n" + body + b"\nendobj\n%%EOF\n"


def test_pdf_jpx_image_lifts_as_png():
    from clickhouse_table_copier_spark.operators.multimodal import (
        _make_png_raster_decoder,
    )
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        _extract_pdf_jpegs,
    )

    pdf = _jpx_xobject_pdf(J2K_GRAY8_L1, 8, 8)
    got = _extract_pdf_jpegs(pdf)
    assert got is not None and len(got) == 1
    w, h, nch, arr = _make_png_raster_decoder()(got[0])
    assert (w, h, nch) == (8, 8, 1)
    assert (arr[:, :, 0] == _gray8()).all()
    # RGB variant round-trips channel-last
    pdf = _jpx_xobject_pdf(J2K_RGB24X16_MCT, 24, 16, gray=False)
    got = _extract_pdf_jpegs(pdf)
    assert len(got) == 1
    w, h, nch, arr = _make_png_raster_decoder()(got[0])
    assert (w, h, nch) == (24, 16, 3)
    assert (arr == _rgb24x16()).all()
    # JP2-boxed stream (the other PDF spelling) lifts identically
    pdf = _jpx_xobject_pdf(JP2_GRAY8_BOXED, 8, 8)
    assert len(_extract_pdf_jpegs(pdf)) == 1
    # malformed JPX payload declines; the PDF still parses
    pdf = _jpx_xobject_pdf(J2K_GRAY8_L1[:40], 8, 8)
    assert _extract_pdf_jpegs(pdf) == []


def test_pdf_jpx_ahash_matches_uncompressed_twin(spark):
    """VERDICT r13 item 3 done-check: a JPX-compressed page image
    lands in the media table and aHash-matches its uncompressed
    twin (the jbig2/ccitt e2e contract)."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        image_ahash,
        near_duplicate_images,
    )
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        extract_pdf_images,
    )

    img = _gray37x29()
    blob = MKG.encode_j2k(MKG.gray37x29(), levels=2, xcb=4, ycb=4)
    pdf = _jpx_xobject_pdf(blob, 37, 29)
    pdf_df = spark.createDataFrame(
        [(300, bytearray(pdf))], "doc_id long, content binary"
    )
    embedded = extract_pdf_images(pdf_df, "content", "doc_id")
    twin_png = encode_png(img.tobytes(), 37, 29, channels=1)
    standalone = spark.createDataFrame(
        [(1, "image", bytearray(twin_png), "{}")], MEDIA_SCHEMA
    )
    media = standalone.unionByName(embedded)
    hashes = [r["ahash"] for r in image_ahash(media).collect()]
    assert len(hashes) == 2 and hashes[0] == hashes[1] is not None
    pairs = near_duplicate_images(media, max_hamming=3).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0


def test_jp2_in_raster_chain_cross_format_identity(spark):
    """A standalone .jp2 (or raw codestream) in the media table hashes
    IDENTICALLY to its PNG twin through the shared raster chain (r14:
    JP2 joined PNG/BMP/JPEG/GIF/TIFF), so WARC-crawled JPEG 2000
    images dedup against their other-container twins."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        image_ahash,
        near_duplicate_images,
    )

    img = _gray37x29()
    jp2 = MKG.make_jp2(
        MKG.encode_j2k(MKG.gray37x29(), levels=2, xcb=4, ycb=4),
        37, 29, 1,
    )
    png = encode_png(img.tobytes(), 37, 29, channels=1)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(jp2), "{}"),
            (2, "image", bytearray(png), "{}"),
            (3, "image", bytearray(J2K_RGB24X16_MCT), "{}"),  # raw cs
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r["ahash"] for r in image_ahash(media).collect()}
    assert rows[1] is not None and rows[1] == rows[2]
    assert rows[3] is not None  # raw codestream decodes too
    pairs = near_duplicate_images(media, max_hamming=0).collect()
    assert len(pairs) == 1 and {pairs[0]["id_a"], pairs[0]["id_b"]} == {1, 2}


def test_jp2_pixel_stats(spark):
    """image_pixel_stats decodes .jp2 media (dims + exact means of the
    known raster)."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_pixel_stats,
    )

    img = _gray37x29()
    jp2 = MKG.make_jp2(
        MKG.encode_j2k(MKG.gray37x29(), levels=2, xcb=4, ycb=4),
        37, 29, 1,
    )
    media = spark.createDataFrame(
        [(9, "image", bytearray(jp2), "{}")], MEDIA_SCHEMA
    )
    row = image_pixel_stats(media).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (37, 29, 1)
    assert row["mean_r"] == pytest.approx(float(img.mean()))


def test_jp2_image_meta(spark):
    """decode_image_meta sniffs both JP2 spellings (box container via
    jp2h/ihdr, raw codestream via SIZ) with real dimensions."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        decode_image_meta,
    )

    jp2 = MKG.make_jp2(
        MKG.encode_j2k(MKG.gray37x29(), levels=2, xcb=4, ycb=4),
        37, 29, 1,
    )
    media = spark.createDataFrame(
        [(1, bytearray(jp2)), (2, bytearray(J2K_RGB24X16_MCT))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in decode_image_meta(media).collect()}
    assert (rows[1]["fmt"], rows[1]["width"], rows[1]["height"]) == (
        "jp2", 37, 29,
    )
    assert (rows[2]["fmt"], rows[2]["width"], rows[2]["height"]) == (
        "jp2", 24, 16,
    )


def test_non_8bit_depths():
    """4/12/16-bit unsigned samples decode through the depth-scaling
    edge (expand <8-bit to full range; >>(depth-8) above 8)."""
    rng = np.random.default_rng(9)
    img12 = rng.integers(0, 1 << 12, (20, 22), dtype=np.int64)
    got = decode_jp2(
        MKG.encode_j2k(img12, levels=2, xcb=3, ycb=3, depth=12)
    )
    assert (got == (img12 >> 4).astype(np.uint8)).all()
    img4 = rng.integers(0, 16, (15, 9), dtype=np.int64)
    got = decode_jp2(
        MKG.encode_j2k(img4, levels=1, xcb=2, ycb=2, depth=4)
    )
    assert (got == (img4 * 255 // 15).astype(np.uint8)).all()
    img16 = rng.integers(0, 1 << 16, (12, 12), dtype=np.int64)
    got = decode_jp2(
        MKG.encode_j2k(img16, levels=1, xcb=3, ycb=3, depth=16)
    )
    assert (got == (img16 >> 8).astype(np.uint8)).all()


def test_signed_samples_render_offset():
    """Signed components (Ssiz bit 7) map [-2^(d-1), 2^(d-1)-1] onto
    the unsigned gray scale via the +2^(d-1) offset — review r14:
    the negative half previously clipped to black."""
    rng = np.random.default_rng(21)
    img = rng.integers(-128, 128, (14, 18), dtype=np.int64)
    got = decode_jp2(
        MKG.encode_j2k(img, levels=1, xcb=3, ycb=3, signed=True)
    )
    assert (got == (img + 128).astype(np.uint8)).all()


def test_reserved_mct_declines():
    """SGcod MCT >= 2 is reserved — decline, never emit Y/Cb/Cr as
    R/G/B (review r14)."""
    g = J2K_RGB24X16_MCT
    cod_at = g.index(b"\xff\x52")
    bad = _patch(g, cod_at + 8, 2)  # SGcod MCT byte
    with pytest.raises(Jp2Error, match="reserved MCT"):
        decode_jp2(bad)
    assert decode_jp2_pdf(bad) is None


def test_warc_jp2_response_meets_jpx_pdf_in_media(spark, tmp_path):
    """Crawl e2e: an image/jp2 WARC response and a /JPXDecode PDF
    figure of the same raster land in ONE media table and pair at
    hamming 0 — the JP2 crawl path (responses_to_media → raster
    chain) and the JPX PDF path (responses_to_pdfs →
    extract_pdf_images) meet in the same dedup join."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        near_duplicate_images,
    )
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        extract_pdf_images,
    )
    from clickhouse_table_copier_spark.sources.warc import (
        read_warc,
        responses_to_media,
        responses_to_pdfs,
    )
    from tests.test_warc import _record

    cs = MKG.encode_j2k(MKG.gray37x29(), levels=2, xcb=4, ycb=4)
    jp2 = MKG.make_jp2(cs, 37, 29, 1)
    pdf_bytes = (
        b"%PDF-1.5\n1 0 obj\n<< /Type /XObject /Subtype /Image "
        b"/Width 37 /Height 29 /BitsPerComponent 8 "
        b"/ColorSpace /DeviceGray /Filter /JPXDecode "
        + b"/Length %d >>\nstream\n" % len(cs)
        + cs + b"\nendstream\nendobj\n%%EOF\n"
    )
    recs = [
        _record(
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "https://example.com/scan.jp2",
                "WARC-Date": "2026-08-16T00:00:00Z",
            },
            b"HTTP/1.1 200 OK\r\nContent-Type: image/jp2\r\n\r\n" + jp2,
        ),
        _record(
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "https://example.com/scan.pdf",
                "WARC-Date": "2026-08-16T00:00:00Z",
            },
            b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n"
            + pdf_bytes,
        ),
    ]
    p = tmp_path / "crawl.warc"
    with open(p, "wb") as f:
        f.write(b"".join(recs))
    warc = read_warc(spark, str(p))
    media = responses_to_media(warc).unionByName(
        extract_pdf_images(responses_to_pdfs(warc), "pdf_bytes", "doc_id")
    )
    assert media.count() == 2
    pairs = near_duplicate_images(media, max_hamming=0).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0


def test_declared_precinct_sizes():
    """Scod&1 streams (explicit precinct sizes — the spelling
    size-declaring encoders emit) decode when every resolution fits
    one precinct, including the PPx-clamped effective code-block
    size; true multi-precinct grids still decline."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (29, 37), dtype=np.uint8)
    blob = MKG.encode_j2k(
        img, levels=2, xcb=4, ycb=4,
        precincts=[(15, 15), (15, 15), (15, 15)],
    )
    assert (decode_jp2(blob) == img).all()
    # PPx/PPy small enough to clamp cblk exponents at r>0
    blob = MKG.encode_j2k(
        img, levels=2, xcb=4, ycb=4,
        precincts=[(6, 6), (6, 5), (7, 6)],
    )
    assert (decode_jp2(blob) == img).all()
    # resolution grid wider than one precinct: decline
    blob = MKG.encode_j2k(
        img, levels=1, xcb=4, ycb=4, precincts=[(5, 5), (5, 5)],
    )
    with pytest.raises(Jp2Error, match="multiple precincts"):
        decode_jp2(blob)
    assert decode_jp2_pdf(blob) is None


# --------------------------------------------------------------------
# crafted-header resource gates (ADVICE r14: decode_tile must price
# the declared code-block grid BEFORE allocating band/tag-tree
# structures — a 60-byte header used to cost ~850 MB / 7 s)


def test_crafted_cblk_grid_declines_before_alloc():
    """4096x4096 with 4x4 code-blocks declares >1M blocks: decline at
    the absolute count cap in well under a second, allocating none of
    the per-cblk lists or tag trees."""
    import time

    g = bytearray(J2K_GRAY8_L1)
    siz_at = g.index(b"\xff\x51")
    for off in (6, 10, 22, 26):  # Xsiz, Ysiz, XTsiz, YTsiz
        g[siz_at + off : siz_at + off + 4] = (4096).to_bytes(4, "big")
    t0 = time.monotonic()
    with pytest.raises(Jp2Error, match="code-block count"):
        decode_jp2(bytes(g))
    assert time.monotonic() - t0 < 0.5
    assert decode_jp2_pdf(bytes(g)) is None


def test_cblk_count_gated_by_stream_size():
    """Below the absolute cap, the data-proportional gate still
    declines a tiny stream whose declared grid it could never
    reference (every included code-block costs header bits)."""
    g = bytearray(J2K_GRAY8_L1)
    siz_at = g.index(b"\xff\x51")
    for off in (6, 10, 22, 26):
        g[siz_at + off : siz_at + off + 4] = (512).to_bytes(4, "big")
    with pytest.raises(Jp2Error, match="stream size"):
        decode_jp2(bytes(g))
    assert decode_jp2_pdf(bytes(g)) is None


def test_tag_tree_lazy_paths():
    """_TagTree allocates nothing at construction; nodes and paths
    materialize only for leaves the packet walk actually touches."""
    from clickhouse_table_copier_spark.operators.jpeg2000 import _TagTree

    t = _TagTree(4096, 4096)
    assert t.paths == {} and all(not lv for lv in t.levels)
    p = t._path(0)
    assert len(p) == len(t.dims)
    # one leaf touched -> exactly one node per level, shared on re-walk
    assert sum(len(lv) for lv in t.levels) == len(t.dims)
    assert t._path(0) is p


def test_jp2_image_meta_xlbox(spark):
    """XLBox form (box size field == 1, 64-bit length after the
    type): decode_image_meta must walk it like
    jpeg2000._jp2_codestream does (ADVICE r14 — it used to treat 1 as
    the length and report (-1, -1) for valid files)."""
    import struct as _s

    from clickhouse_table_copier_spark.operators.multimodal import (
        decode_image_meta,
    )

    jp2 = MKG.make_jp2(J2K_GRAY8_L1, 8, 8, 1)
    at = jp2.index(b"jp2h") - 4
    size = _s.unpack(">I", jp2[at : at + 4])[0]
    xl = (
        b"\x00\x00\x00\x01" + b"jp2h"
        + _s.pack(">Q", size + 8) + jp2[at + 8 : at + size]
    )
    boxed = jp2[:at] + xl + jp2[at + size :]
    media = spark.createDataFrame(
        [(1, bytearray(boxed))], "media_id long, content binary",
    )
    row = decode_image_meta(media).collect()[0]
    assert (row["fmt"], row["width"], row["height"]) == ("jp2", 8, 8)
    # the decoder edge accepts the same spelling
    assert (decode_jp2_pdf(boxed) == _gray8()).all()


# --------------------------------------------------------------------
# third-party cross-check (ADVICE r14): self-activates the moment an
# independent JPEG 2000 implementation appears in the container


def _external_jp2_decode():
    """Return (name, decode_fn bytes->HxW[xC] uint8) for the first
    available independent implementation, else None.  Probed r14/r15:
    none in this container (no glymur/Pillow-j2k/OpenJPEG CLI)."""
    try:
        import glymur  # noqa: F401

        def _g(blob):
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".jp2") as f:
                f.write(blob)
                f.flush()
                return np.asarray(glymur.Jp2k(f.name)[:])

        return "glymur", _g
    except ImportError:
        pass
    try:
        from PIL import Image, features

        if features.check_codec("jpg_2000"):

            def _p(blob):
                import io

                return np.asarray(Image.open(io.BytesIO(blob)))

            return "pillow", _p
    except Exception:
        pass
    import shutil

    if shutil.which("opj_decompress"):

        def _o(blob):
            import subprocess
            import tempfile

            with tempfile.TemporaryDirectory() as d:
                src = os.path.join(d, "in.j2k")
                dst = os.path.join(d, "out.pgm")
                with open(src, "wb") as f:
                    f.write(blob)
                subprocess.run(
                    ["opj_decompress", "-i", src, "-o", dst], check=True
                )
                raw = open(dst, "rb").read()
                # minimal binary PGM/PPM (P5/P6, maxval 255)
                parts = raw.split(maxsplit=4)
                magic, w, h, maxv = (
                    parts[0], int(parts[1]), int(parts[2]), int(parts[3]),
                )
                assert magic in (b"P5", b"P6") and maxv == 255
                px = np.frombuffer(parts[4], dtype=np.uint8)
                if magic == b"P6":
                    return px[: w * h * 3].reshape(h, w, 3)
                return px[: w * h].reshape(h, w)

        return "openjpeg-cli", _o
    return None


_EXT_JP2 = _external_jp2_decode()


@pytest.mark.skipif(
    _EXT_JP2 is None,
    reason="no independent JPEG 2000 implementation in container "
    "(probed r14/r15; this cross-check self-activates when one appears)",
)
def test_external_crosscheck_band_conventions():
    """Decode the repo goldens with a third-party implementation and
    require raster identity with decode_jp2 — pins QCD exponent
    order, band ordering, and 2D DWT pass order against a convention
    misreading that a symmetric in-repo encoder/decoder pair could
    round-trip invisibly (ADVICE r14)."""
    name, ext = _EXT_JP2
    for blob, img in (
        (J2K_GRAY8_L1, _gray8()),
        (
            MKG.encode_j2k(_gray37x29(), levels=2, xcb=4, ycb=4),
            _gray37x29(),
        ),
        (J2K_RGB24X16_MCT, _rgb24x16()),
    ):
        theirs = ext(blob)
        ours = decode_jp2(blob)
        assert theirs.shape == ours.shape, name
        assert (theirs == ours).all(), name
        assert (ours == img).all()
