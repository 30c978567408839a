"""Decline-contract fuzz: no decoder may RAISE on corrupt bytes.

Every raster/container decoder promises None for input it can't
handle; a raise would escape the mapInPandas fn and fail the Spark
task. The classic crash source is a VALID file truncated mid-stream
(transfer cut) or with flipped bytes — so each format's fixture is
truncated at a spread of offsets and bit-flipped at a spread of
positions, plus pure-noise blobs wearing valid magic headers. Pure
driver-side (no Spark session needed): the closures are exactly what
the executors run.
"""

import numpy as np
import pytest

from clickhouse_table_copier_spark.operators.multimodal import (
    _make_avi_parser,
    _make_bmp_raster_decoder,
    _make_gif_raster_decoder,
    _make_jpeg_raster_decoder,
    _make_png_raster_decoder,
    _make_tiff_raster_decoder,
    _make_wav_parser,
    encode_png,
)


def _fixtures():
    import sys

    sys.path.insert(0, "tests")
    from test_jpeg_arith import (
        encode_arith_progressive,
        encode_arith_sequential,
    )
    from test_jpeg_decode import encode_baseline_jpeg, encode_progressive_jpeg
    from test_pipeline_ops import _gif_bytes, _lzw_encode
    from test_png_variants import _bmp_paletted
    from test_video_frames import make_mjpeg_avi

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    pal = [tuple(int(x) for x in rng.integers(0, 256, 3)) for _ in range(4)]
    idx = rng.integers(0, 4, (16, 16), dtype=np.uint8)
    pixels = list(idx.flatten())
    palette = b"".join(bytes(p) for p in pal)
    import struct

    pcm = b"".join(
        struct.pack("<h", int(8000 * np.sin(t / 5))) for t in range(256)
    )
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    from test_jpeg_lossless import encode_lossless_jpeg
    from test_jpeg2000 import J2K_GRAY16_MODES, JP2_GRAY8_BOXED
    from test_pdf_extract import _CJK_CMAP, _SIMPLE, _cid_pdf, make_pdf

    return {
        "jp2_codestream": J2K_GRAY16_MODES,
        "jp2_boxed": JP2_GRAY8_BOXED,
        "jpeg_lossless": encode_lossless_jpeg(
            rng.integers(0, 256, (16, 16), dtype=np.uint8), predictor=4
        ),
        "pdf_text": make_pdf([_SIMPLE]),
        "pdf_cid": _cid_pdf(
            b"BT /F1 12 Tf <00010002> Tj ET", _CJK_CMAP
        ),
        "pdf_jpegs": make_pdf([_SIMPLE]),
        "png": encode_png(img.tobytes(), 16, 16, 3),
        "jpeg": encode_baseline_jpeg(img),
        "jpeg_prog": encode_progressive_jpeg(img),
        "jpeg_arith": encode_arith_sequential(img),
        "jpeg_arith_prog": encode_arith_progressive(img),
        "gif": _gif_bytes(
            16, 16, pixels, palette, _lzw_encode(2, pixels), min_code=2
        ),
        "bmp": _bmp_paletted(16, 16, idx, pal, 8),
        "avi": make_mjpeg_avi([encode_baseline_jpeg(img)] * 3, 16, 16),
        "wav": wav,
        "tiff_strip": _tiff_fixtures().GRAY8_LZW_PRED_STRIP,
        "tiff_tiled": _tiff_fixtures().BILEVEL_G4_TILED,
        "tiff_tiled16": _tiff_fixtures().GRAY16_LZW_PRED_TILED_BE,
    }


def _tiff_fixtures():
    from tests import test_tiff_tiled

    return test_tiff_tiled


def _decoders():
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        _extract_pdf,
        _extract_pdf_jpegs,
    )

    from clickhouse_table_copier_spark.operators.jpeg2000 import (
        decode_jp2_pdf,
    )

    wav_parse = _make_wav_parser()
    avi_parse = _make_avi_parser()
    return {
        "jp2_codestream": decode_jp2_pdf,
        "jp2_boxed": decode_jp2_pdf,
        "pdf_text": _extract_pdf,
        "pdf_cid": _extract_pdf,
        "pdf_jpegs": _extract_pdf_jpegs,
        "png": _make_png_raster_decoder(),
        "jpeg": _make_jpeg_raster_decoder(),
        "jpeg_prog": _make_jpeg_raster_decoder(),
        "jpeg_arith": _make_jpeg_raster_decoder(),
        "jpeg_arith_prog": _make_jpeg_raster_decoder(),
        "jpeg_lossless": _make_jpeg_raster_decoder(),
        "gif": _make_gif_raster_decoder(),
        "bmp": _make_bmp_raster_decoder(),
        "avi": avi_parse,
        "wav": wav_parse,
        "tiff_strip": _make_tiff_raster_decoder(),
        "tiff_tiled": _make_tiff_raster_decoder(),
        "tiff_tiled16": _make_tiff_raster_decoder(),
    }


@pytest.mark.parametrize("fmt", list(_decoders().keys()))
def test_truncations_never_raise(fmt):
    blob = _fixtures()[fmt]
    dec = _decoders()[fmt]
    # truncate at ~40 offsets spread over the file, incl. 0 and len-1
    cuts = sorted({0, 1, len(blob) - 1} | {
        len(blob) * k // 40 for k in range(1, 40)
    })
    for cut in cuts:
        dec(blob[:cut])  # must return (anything), never raise


@pytest.mark.parametrize("fmt", list(_decoders().keys()))
def test_bitflips_never_raise(fmt):
    blob = bytearray(_fixtures()[fmt])
    dec = _decoders()[fmt]
    rng = np.random.default_rng(11)
    for pos in rng.integers(0, len(blob), size=60):
        flipped = bytearray(blob)
        flipped[pos] ^= 0xFF
        dec(bytes(flipped))


@pytest.mark.parametrize("fmt", list(_decoders().keys()))
def test_noise_behind_valid_magic_never_raises(fmt):
    magic = {
        "pdf_text": b"%PDF-1.5\n",
        "pdf_cid": b"%PDF-1.5\n",
        "pdf_jpegs": b"%PDF-1.5\n",
        "png": b"\x89PNG\r\n\x1a\n",
        "jpeg": b"\xff\xd8",
        "jpeg_prog": b"\xff\xd8",
        "jpeg_arith": b"\xff\xd8",
        "jpeg_arith_prog": b"\xff\xd8",
        "jpeg_lossless": b"\xff\xd8",
        "gif": b"GIF89a",
        "bmp": b"BM",
        "avi": b"RIFF\x00\x01\x00\x00AVI ",
        "wav": b"RIFF\x00\x01\x00\x00WAVE",
        "jp2_codestream": b"\xff\x4f\xff\x51",
        "jp2_boxed": b"\x00\x00\x00\x0cjP  \r\n\x87\n",
        "tiff_strip": b"II*\x00",
        "tiff_tiled": b"II*\x00",
        "tiff_tiled16": b"MM\x00*",
    }[fmt]
    dec = _decoders()[fmt]
    rng = np.random.default_rng(13)
    for i in range(40):
        noise = rng.integers(0, 256, size=64 + i * 16, dtype=np.uint8)
        dec(magic + noise.tobytes())
