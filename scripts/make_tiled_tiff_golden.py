#!/usr/bin/env python
"""Mint GOLDEN tiled + 16-bit TIFFs with an INDEPENDENT encoder (the
system libtiff 4.x via ctypes), for tests/test_tiff_tiled.py.

Round-12 coverage (VERDICT r11 item 6): scanned-document corpora ship
TILE-organized TIFFs (tags 322-325) and 16-bit samples; until r12 both
declined.  The fixtures here pin the new paths against libtiff's
encoder — not a mirrored test-side writer:

- the SAME bilevel page as one G4 strip and as 32x32 G4 tiles
  (decoded rasters must be identical — the aHash-identity criterion);
- the SAME 8-bit gray page as LZW+Predictor-2 strips and tiles;
- the SAME 16-bit gray page as little-endian LZW+Pred2 strips and as
  BIG-endian LZW+Pred2 tiles (byte-order fold must agree);
- a tiny uncompressed 16-bit strip file and a 16-bit RGB LZW file.

All pixel patterns are pure functions of (x, y) reproduced inside the
test, so the decode is checked against ground truth, not against
another decoder.

Usage: python scripts/make_tiled_tiff_golden.py  → python source to
paste into tests/test_tiff_tiled.py.
"""

from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np

_T = ctypes.CDLL("libtiff.so.6")
_T.TIFFOpen.restype = ctypes.c_void_p
_T.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
_T.TIFFSetField.restype = ctypes.c_int
_T.TIFFWriteScanline.restype = ctypes.c_int
_T.TIFFWriteScanline.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16
]
_T.TIFFWriteTile.restype = ctypes.c_long
_T.TIFFWriteTile.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint16,
]
_T.TIFFClose.argtypes = [ctypes.c_void_p]


def _set16(tif, tag, val):
    assert _T.TIFFSetField(
        ctypes.c_void_p(tif), ctypes.c_uint32(tag), ctypes.c_uint16(val)
    )


def _set32(tif, tag, val):
    assert _T.TIFFSetField(
        ctypes.c_void_p(tif), ctypes.c_uint32(tag), ctypes.c_uint32(val)
    )


def _open(path, big_endian):
    tif = _T.TIFFOpen(path.encode(), b"wb" if big_endian else b"w")
    assert tif, path
    return tif


def _common(tif, w, h, bps, spp, comp, photo, predictor=None,
            planar=1):
    _set32(tif, 256, w)
    _set32(tif, 257, h)
    _set16(tif, 258, bps)
    _set16(tif, 259, comp)
    _set16(tif, 262, photo)
    _set16(tif, 277, spp)
    _set16(tif, 284, planar)
    if predictor is not None:
        _set16(tif, 317, predictor)


def write_strips(path, img, bps, comp, photo, rps, predictor=None,
                 big_endian=False, planar=1):
    """img: (h, w) or (h, w, spp); bilevel input is 0/1 uint8."""
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    tif = _open(path, big_endian)
    _common(tif, w, h, bps, spp, comp, photo, predictor, planar)
    _set32(tif, 278, rps)
    if planar == 2:
        for s in range(spp):
            for y in range(h):
                row = np.ascontiguousarray(img[y, :, s]).tobytes()
                assert _T.TIFFWriteScanline(tif, row, y, s) == 1
    else:
        for y in range(h):
            if bps == 1:
                row = np.packbits(img[y]).tobytes()
            else:
                row = np.ascontiguousarray(img[y]).tobytes()
            assert _T.TIFFWriteScanline(tif, row, y, 0) == 1, (path, y)
    _T.TIFFClose(tif)
    return open(path, "rb").read()


def write_tiles(path, img, bps, comp, photo, tw, tl, predictor=None,
                big_endian=False, planar=1):
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    tif = _open(path, big_endian)
    _common(tif, w, h, bps, spp, comp, photo, predictor, planar)
    _set32(tif, 322, tw)
    _set32(tif, 323, tl)
    if planar == 2:
        for s in range(spp):
            for y0 in range(0, h, tl):
                for x0 in range(0, w, tw):
                    tile = np.zeros((tl, tw), dtype=img.dtype)
                    sub = img[y0 : y0 + tl, x0 : x0 + tw, s]
                    tile[: sub.shape[0], : sub.shape[1]] = sub
                    buf = np.ascontiguousarray(tile).tobytes()
                    assert (
                        _T.TIFFWriteTile(tif, buf, x0, y0, 0, s) > 0
                    ), (path, x0, y0, s)
        _T.TIFFClose(tif)
        return open(path, "rb").read()
    for y0 in range(0, h, tl):
        for x0 in range(0, w, tw):
            # full padded tile buffer (TIFF 6: tiles are always tw×tl)
            if img.ndim == 2:
                tile = np.zeros((tl, tw), dtype=img.dtype)
                sub = img[y0 : y0 + tl, x0 : x0 + tw]
                tile[: sub.shape[0], : sub.shape[1]] = sub
            else:
                tile = np.zeros((tl, tw, spp), dtype=img.dtype)
                sub = img[y0 : y0 + tl, x0 : x0 + tw]
                tile[: sub.shape[0], : sub.shape[1]] = sub
            if bps == 1:
                buf = np.packbits(tile, axis=1).tobytes()
            else:
                buf = np.ascontiguousarray(tile).tobytes()
            assert (
                _T.TIFFWriteTile(tif, buf, x0, y0, 0, 0) > 0
            ), (path, x0, y0)
    _T.TIFFClose(tif)
    return open(path, "rb").read()


# deterministic patterns — REPRODUCED in the test as ground truth
def bilevel_page(w=72, h=56):
    y, x = np.mgrid[0:h, 0:w]
    return (((x + 2 * y) // 5) % 2).astype(np.uint8)  # 1 = black


def gray8_page(w=72, h=56):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 7 + y * 13) % 251).astype(np.uint8)


def gray16_page(w=72, h=56):
    y, x = np.mgrid[0:h, 0:w]
    return (((x * 531 + y * 997) * 97) % 65521).astype(np.uint16)


def rgb16_page(w=24, h=20):
    y, x = np.mgrid[0:h, 0:w]
    r = ((x * 2999 + y * 101) % 65521).astype(np.uint16)
    g = ((x * 577 + y * 7919) % 65521).astype(np.uint16)
    b2 = ((x * 31 + y * 65011) % 65521).astype(np.uint16)
    return np.stack([r, g, b2], axis=2)


def _emit(name: str, b: bytes):
    print(f"{name} = bytes.fromhex(")
    hx = b.hex()
    for i in range(0, len(hx), 96):
        print(f'    "{hx[i:i + 96]}"')
    print(")")


def main():
    d = tempfile.mkdtemp()
    p = lambda n: os.path.join(d, n)  # noqa: E731
    bl, g8, g16, rgb16 = (
        bilevel_page(), gray8_page(), gray16_page(), rgb16_page()
    )
    _emit(
        "BILEVEL_G4_STRIP",
        write_strips(p("a.tif"), bl, 1, 4, 0, bl.shape[0]),
    )
    _emit(
        "BILEVEL_G4_TILED",
        write_tiles(p("b.tif"), bl, 1, 4, 0, 32, 32),
    )
    _emit(
        "GRAY8_LZW_PRED_STRIP",
        write_strips(p("c.tif"), g8, 8, 5, 1, 16, predictor=2),
    )
    _emit(
        "GRAY8_LZW_PRED_TILED",
        write_tiles(p("d.tif"), g8, 8, 5, 1, 32, 32, predictor=2),
    )
    _emit(
        "GRAY16_LZW_PRED_STRIP_LE",
        write_strips(p("e.tif"), g16, 16, 5, 1, 16, predictor=2),
    )
    _emit(
        "GRAY16_LZW_PRED_TILED_BE",
        write_tiles(
            p("f.tif"), g16, 16, 5, 1, 32, 32, predictor=2,
            big_endian=True,
        ),
    )
    _emit(
        "GRAY16_NONE_STRIP_TINY",
        write_strips(p("g.tif"), gray16_page(16, 16), 16, 1, 1, 16),
    )
    _emit(
        "RGB16_LZW_STRIP",
        write_strips(p("h.tif"), rgb16, 16, 5, 2, 20, predictor=2),
    )
    rgb8 = (rgb16_page() >> 8).astype(np.uint8)
    _emit(
        "RGB8_CHUNKY_STRIP",
        write_strips(p("i.tif"), rgb8, 8, 5, 2, 8, predictor=2),
    )
    _emit(
        "RGB8_PLANAR_STRIP",
        write_strips(
            p("j.tif"), rgb8, 8, 5, 2, 8, predictor=2, planar=2
        ),
    )
    _emit(
        "RGB8_PLANAR_TILED",
        write_tiles(
            p("k.tif"), rgb8, 8, 5, 2, 16, 16, predictor=2, planar=2
        ),
    )
    _emit(
        "RGB16_PLANAR_STRIP_BE",
        write_strips(
            p("l.tif"), rgb16_page(), 16, 5, 2, 8, predictor=2,
            planar=2, big_endian=True,
        ),
    )


if __name__ == "__main__":
    main()
