"""Lossless JPEG (SOF3, T.81 process 14): test-side encoder +
roundtrip pins.  With SOF3 decoding, the JPEG seam narrows to
hierarchical frames (and the documented lossless sub-cases: DRI,
subsampled or per-component lossless scans).

The encoder mirrors the spec's predictor formulas — like the early
arithmetic tests this shares conventions with the decoder, BUT
lossless-ness itself is the check: any prediction/extend mismatch
corrupts absolute sample values, and the roundtrip demands EXACT
equality (no quantization to hide behind).  No independent golden
exists in this container (system libjpeg-turbo 2.1.5 predates lossless
support, added in 3.0) — documented, not hidden."""

import numpy as np

from clickhouse_table_copier_spark.operators.multimodal import (
    _make_jpeg_raster_decoder,
)
from tests.test_jpeg_decode import _BitWriter, _canonical_table


def encode_lossless_jpeg(
    img: np.ndarray, predictor: int = 1, precision: int = 8, pt: int = 0
) -> bytes:
    """SOF3 writer: 1×1 sampling, one interleaved scan, no DRI —
    exactly the decoder's supported shape.  ``img``: (h, w) or
    (h, w, 3) ints already within ``precision`` bits."""
    gray = img.ndim == 2
    planes = [img] if gray else [img[..., i] for i in range(img.shape[2])]
    h, w = img.shape[:2]
    default = 1 << (precision - 1 - pt)
    recon = [[[0] * w for _ in range(h)] for _ in planes]
    toks: list[tuple[int, int]] = []  # (category, extra bits)
    for y in range(h):
        for x in range(w):
            for ci, pl in enumerate(planes):
                v = int(pl[y][x]) >> pt
                row = recon[ci][y]
                if y == 0:
                    px = default if x == 0 else row[x - 1]
                elif x == 0:
                    px = recon[ci][y - 1][0]
                else:
                    up = recon[ci][y - 1]
                    if predictor == 1:
                        px = row[x - 1]
                    elif predictor == 2:
                        px = up[x]
                    elif predictor == 3:
                        px = up[x - 1]
                    elif predictor == 4:
                        px = row[x - 1] + up[x] - up[x - 1]
                    elif predictor == 5:
                        px = row[x - 1] + ((up[x] - up[x - 1]) >> 1)
                    elif predictor == 6:
                        px = up[x] + ((row[x - 1] - up[x - 1]) >> 1)
                    else:
                        px = (row[x - 1] + up[x]) >> 1
                d = (v - px) & 0xFFFF
                if d == 32768:
                    toks.append((16, 0))
                else:
                    signed = d if d < 32768 else d - 65536
                    t = abs(signed).bit_length()
                    bits = signed if signed >= 0 else signed + (1 << t) - 1
                    toks.append((t, bits))
                row[x] = v & 0xFFFF
    bits16, vals, code_map = _canonical_table([t for t, _ in toks])
    out = bytearray(b"\xff\xd8")
    dht = bytes([0x00]) + bytes(bits16) + bytes(vals)
    out += b"\xff\xc4" + (len(dht) + 2).to_bytes(2, "big") + dht
    nc = len(planes)
    sof = bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc3" + (len(sof) + 2).to_bytes(2, "big") + sof
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    bw = _BitWriter()
    for t, bits in toks:
        length, code = code_map[t]
        bw.put(code, length)
        if t and t != 16:
            bw.put(bits, t)
    bw.align()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def _decode(blob: bytes):
    got = _make_jpeg_raster_decoder()(blob)
    assert got is not None
    w, h, c, raster = got
    return np.frombuffer(raster, np.uint8).reshape(h, w, c)


def test_gray_roundtrip_exact():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (13, 11), dtype=np.uint8)  # odd dims
    for predictor in range(1, 8):
        r = _decode(encode_lossless_jpeg(img, predictor))
        assert r.shape == (13, 11, 1)
        assert np.array_equal(r[..., 0], img), predictor


def test_rgb_roundtrip_exact_and_no_color_transform():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (9, 14, 3), dtype=np.uint8)
    r = _decode(encode_lossless_jpeg(img, predictor=4))
    # LOSSLESS means byte-exact — also proves no YCbCr transform is
    # applied (a transform would perturb every channel)
    assert np.array_equal(r, img)


def test_all_predictors_reconstruct_identically():
    """Predictor choice is an ENCODER choice; every selection must
    land the identical raster (the dedup-bucket invariant the DCT
    cross-mode tests pin)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    rasters = {
        p: _decode(encode_lossless_jpeg(img, p)).tobytes()
        for p in range(1, 8)
    }
    assert len(set(rasters.values())) == 1


def test_16bit_precision_scales_to_contract():
    """12/16-bit lossless samples scale onto the 8-bit raster contract
    (same normalization as the 12-bit DCT path)."""
    img = np.array([[0, 4095], [2048, 1024]], dtype=np.int64)
    r = _decode(encode_lossless_jpeg(img, predictor=1, precision=12))
    exp = np.round(img * (255.0 / 4095)).astype(np.uint8)
    assert np.array_equal(r[..., 0], exp)


def test_point_transform_shifts_output():
    img = (np.arange(16, dtype=np.int64).reshape(4, 4) * 16) % 256
    r = _decode(encode_lossless_jpeg(img, predictor=2, pt=1))
    # encoder feeds v >> 1; decoder reconstructs (v >> 1) << 1
    exp = ((img >> 1) << 1).astype(np.uint8)
    assert np.array_equal(r[..., 0], exp)


def test_ssss16_diff_path():
    """A 32768 prediction step exercises the lossless-only SSSS=16
    code (no extra bits)."""
    img = np.array([[0, 32768 & 0xFFFF]], dtype=np.int64) % (1 << 16)
    blob = encode_lossless_jpeg(img, predictor=1, precision=16)
    r = _decode(blob)
    exp = np.round(img * (255.0 / 65535)).astype(np.uint8)
    assert np.array_equal(r[..., 0], exp)


def test_unsupported_lossless_shapes_decline():
    img = np.zeros((4, 4), dtype=np.uint8)
    blob = bytearray(encode_lossless_jpeg(img))
    # plant a DRI segment right after SOI: decoder must decline, not
    # misdecode (restart handling in lossless is the documented seam)
    dri = b"\xff\xdd\x00\x04\x00\x02"
    blob2 = bytes(blob[:2]) + dri + bytes(blob[2:])
    assert _make_jpeg_raster_decoder()(blob2) is None


def test_cross_format_identity_with_png(spark):
    """Both containers are LOSSLESS, so the same pixels must produce
    the IDENTICAL aHash — the strongest cross-format dedup pin (the
    DCT modes only get near-identity through quantization)."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        image_ahash,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(encode_lossless_jpeg(img, 7)), "{}"),
            (2, "image", bytearray(encode_png(img.tobytes(), 16, 16, 3)), "{}"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert rows[1] is not None
    assert rows[1] == rows[2]
