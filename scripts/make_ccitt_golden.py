#!/usr/bin/env python
"""Mint GOLDEN CCITT-compressed TIFFs with an INDEPENDENT encoder:
the system libtiff (libtiff.so.6, 4.x) driven through ctypes writes
Group 4 (Compression=4), Group 3 1-D and 2-D (Compression=3, T4Options
0/1) and Modified-Huffman (Compression=2) files of fixed deterministic
patterns.  The bytes are printed as hex for embedding in
tests/test_ccitt_golden.py, so the tests need no system library at
runtime and a transcription typo in operators/ccitt.py's T.4 code
tables cannot survive (the tables would disagree with libtiff's
encodings, not just with a mirrored test-side encoder).

Usage: python scripts/make_ccitt_golden.py  →  python source to paste.
"""

from __future__ import annotations

import ctypes

import numpy as np

_T = ctypes.CDLL("libtiff.so.6")
_T.TIFFOpen.restype = ctypes.c_void_p
_T.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
_T.TIFFSetField.restype = ctypes.c_int
_T.TIFFWriteScanline.restype = ctypes.c_int
_T.TIFFWriteScanline.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16
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


def write_tiff(path: str, img: np.ndarray, comp: int, t4opts=None) -> bytes:
    """img: (h, w) uint8 of 0/1 where 1 = black (PhotometricInterpretation
    0 = MinIsWhite, the fax convention)."""
    h, w = img.shape
    packed = np.packbits(img, axis=1)
    tif = _T.TIFFOpen(path.encode(), b"w")
    assert tif, path
    _set32(tif, 256, w)   # ImageWidth
    _set32(tif, 257, h)   # ImageLength
    _set16(tif, 258, 1)   # BitsPerSample
    _set16(tif, 259, comp)
    _set16(tif, 262, 0)   # Photometric: MinIsWhite
    _set16(tif, 277, 1)   # SamplesPerPixel
    _set32(tif, 278, h)   # RowsPerStrip: one strip
    if t4opts is not None:
        _set32(tif, 292, t4opts)  # T4Options (bit 0: 2-D)
    for y in range(h):
        assert _T.TIFFWriteScanline(tif, packed[y].tobytes(), y, 0) == 1
    _T.TIFFClose(tif)
    with open(path, "rb") as f:
        return f.read()


def diag_pattern() -> np.ndarray:
    """64×32 diagonal stripes — exercises short runs of both colors."""
    y, x = np.mgrid[0:32, 0:64]
    return (((x + y) // 4) % 2 == 0).astype(np.uint8)


def rand_pattern() -> np.ndarray:
    """73×178 pseudo-random — exercises most terminating codes."""
    rng = np.random.RandomState(42)
    return (rng.rand(73, 178) > 0.5).astype(np.uint8)


def wide_pattern() -> np.ndarray:
    """5×3000, 2900 white + 100 black per row — extended make-ups."""
    img = np.zeros((5, 3000), dtype=np.uint8)
    img[:, 2900:] = 1
    return img


def _emit(name: str, b: bytes):
    print(f"{name} = bytes.fromhex(")
    h = b.hex()
    for i in range(0, len(h), 96):
        print(f'    "{h[i:i + 96]}"')
    print(")")


def main():
    for name, img, comp, t4o in [
        ("G4_DIAG", diag_pattern(), 4, None),
        ("G3_1D_DIAG", diag_pattern(), 3, 0),
        ("G3_2D_DIAG", diag_pattern(), 3, 1),
        ("MH_DIAG", diag_pattern(), 2, None),
        ("G4_RAND", rand_pattern(), 4, None),
        ("G4_WIDE", wide_pattern(), 4, None),
        ("MH_WIDE", wide_pattern(), 2, None),
    ]:
        b = write_tiff(f"/tmp/ccitt_{name}.tif", img, comp, t4o)
        _emit(name, b)


if __name__ == "__main__":
    main()
