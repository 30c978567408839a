#!/usr/bin/env python
"""Mint GOLDEN JBIG2 embedded streams for tests/test_jbig2.py.

No JBIG2 encoder or decoder exists in this container (libjbig is
JBIG1/T.82), so this follows the pdf_crypt discipline (VERDICT r11
item 7): an INDEPENDENT transcription of the ITU-T T.88 *encoder*
side — INITENC / ENCODE / BYTEOUT / FLUSH (Annex E flowcharts, the
procedures DISJOINT from the decoder's INITDEC / DECODE / BYTEIN
that operators/jbig2.py transcribes) — plus, for the MMR=1 generic
region flavor, **libtiff's Group 4 encoder** (a fully independent
implementation; the G4 strip bytes ARE the MMR region data per T.88
§6.2.6, which defers to T.4/T.6).

This script must NOT import clickhouse_table_copier_spark.operators
.jbig2 — the whole point is that the bytes are minted by separately
written code, so a symmetric misreading of the BYTEOUT carry /
stuffing rules or the integer-coding prefixes cannot round-trip.
(The generic-region context template layout is shared knowledge
between both sides — the one seam this cannot pin; the MQ coder
itself is additionally pinned by the spec's published test sequence
embedded in the tests.)

Usage: python scripts/make_jbig2_golden.py  →  python source to
paste into tests/test_jbig2.py.
"""

from __future__ import annotations

import ctypes
import os
import struct
import tempfile

import numpy as np

# ---------------------------------------------------------------- MQ
# T.88 Table E.1 (published data; identical on both sides by nature)
QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQEncoder:
    """T.88 Annex E encoder (E.3.2 CODELPS/CODEMPS, E.3.6 INITENC,
    E.3.7 BYTEOUT, E.3.8 FLUSH).  Output starts with one scratch
    byte standing in for the byte at BPST-1; it is stripped at
    flush unless a carry propagated into it (then it is real
    output)."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray(b"\x00")  # scratch 'B' at BPST-1
        self.b = 0  # index of B in out

    def encode(self, states, cx, d):
        st = states[cx]
        i, mps = st >> 1, st & 1
        qe, nmps, nlps, sw = QE[i]
        if d == mps:
            # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            states[cx] = (nmps << 1) | mps
        else:
            # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if sw:
                mps ^= 1
            states[cx] = (nlps << 1) | mps
        # RENORME
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _byteout(self):
        out = self.out
        if out[self.b] == 0xFF:
            self._stuff()
        elif self.c < 0x8000000:
            self._nostuff()
        else:
            out[self.b] += 1
            if out[self.b] == 0xFF:
                self.c &= 0x7FFFFFF
                self._stuff()
            else:
                self._nostuff()

    def _stuff(self):
        self.b = len(self.out)
        self.out.append((self.c >> 20) & 0xFF)
        self.c &= 0xFFFFF
        self.ct = 7

    def _nostuff(self):
        self.b = len(self.out)
        self.out.append((self.c >> 19) & 0xFF)
        self.c &= 0x7FFFF
        self.ct = 8

    def flush(self) -> bytes:
        # SETBITS (E.3.8): push C to the largest value inside the
        # final interval so trailing bits are all 1 (droppable)
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        data = self.out
        # the spec's FLUSH terminator pair (present in the published
        # H.2 test sequence; decoders treat 0xAC > 0x8F as a marker)
        data += b"\xff\xac"
        # scratch byte is real output only if a carry reached it
        return bytes(data[1:] if data[0] == 0 else data)


def new_states(nbits):
    return [0] * (1 << nbits)


def encode_int(enc, states, v):
    """Annex A.2 inverse: encode int (or the string 'OOB')."""
    prev = 1

    def bit(b):
        nonlocal prev
        enc.encode(states, prev, b)
        prev = (
            ((prev << 1) | b)
            if prev < 256
            else ((((prev << 1) | b) & 511) | 256)
        )

    if v == "OOB":
        s, mag = 1, 0
    else:
        s = 1 if v < 0 else 0
        mag = -v if v < 0 else v
    bit(s)
    for hi, n, off in (
        (3, 2, 0), (19, 4, 4), (83, 6, 20), (339, 8, 84),
        (4435, 12, 340),
    ):
        if mag <= hi:
            bit(0)
            for k in range(n - 1, -1, -1):
                bit((mag - off) >> k & 1)
            return
        bit(1)
    for k in range(31, -1, -1):
        bit((mag - 4436) >> k & 1)


def encode_iaid(enc, states, code_len, sym_id):
    prev = 1
    for k in range(code_len - 1, -1, -1):
        b = (sym_id >> k) & 1
        enc.encode(states, prev, b)
        prev = (prev << 1) | b


# ------------------------------------------- generic region encoder
# Context layouts — shared knowledge with the decoder (see module
# docstring for why this seam cannot be independently pinned here).
TEMPLATES = (
    (((-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
      (2, -1, 5), (1, -1, 6), (0, -1, 7), (-1, -1, 8), (-2, -1, 9),
      (1, -2, 11), (0, -2, 12), (-1, -2, 13)),
     (4, 10, 14, 15), 0x9B25, 16),
    (((-1, 0, 0), (-2, 0, 1), (-3, 0, 2),
      (2, -1, 4), (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8),
      (2, -2, 9), (1, -2, 10), (0, -2, 11), (-1, -2, 12)),
     (3,), 0x0795, 13),
    (((-1, 0, 0), (-2, 0, 1),
      (1, -1, 3), (0, -1, 4), (-1, -1, 5), (-2, -1, 6),
      (1, -2, 7), (0, -2, 8), (-1, -2, 9)),
     (2,), 0x00E5, 10),
    (((-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
      (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8), (-3, -1, 9)),
     (4,), 0x0195, 10),
)

NOMINAL_AT = (
    ((3, -1), (-3, -1), (2, -2), (-2, -2)),
    ((3, -1),), ((2, -1),), ((2, -1),),
)


def encode_generic(enc, states, img, template, at, tpgdon):
    """img: (h, w) uint8 of 0/1 (1 = black)."""
    h, w = img.shape
    fixed, at_bits, sltp_cx, _ = TEMPLATES[template]
    pixels = list(fixed) + [
        (dx, dy, bit) for (dx, dy), bit in zip(at, at_bits)
    ]

    def get(x, y):
        if 0 <= x < w and 0 <= y < h:
            return int(img[y, x])
        return 0

    ltp = 0
    for y in range(h):
        if tpgdon:
            typical = y > 0 and bool((img[y] == img[y - 1]).all())
            sltp = int(typical) ^ ltp
            enc.encode(states, sltp_cx, sltp)
            ltp = int(typical)
            if ltp:
                continue
        for x in range(w):
            cx = 0
            for dx, dy, bit in pixels:
                cx |= get(x + dx, y + dy) << bit
            enc.encode(states, cx, int(img[y, x]))


# ------------------------------------------------- segment assembly

def segment(number, stype, refs, page, data):
    head = struct.pack(">IB", number, stype & 0x3F)
    assert len(refs) <= 4
    head += bytes([len(refs) << 5])
    for r in refs:
        assert number <= 256
        head += bytes([r])
    head += bytes([page])
    head += struct.pack(">I", len(data))
    return head + data


def page_info(w, h, default=0):
    flags = (default & 1) << 2
    return struct.pack(">IIIIBH", w, h, 0, 0, flags, 0)


def region_info(w, h, x=0, y=0, op=0):
    return struct.pack(">IIIIB", w, h, x, y, op)


def generic_region_data(img, template, tpgdon, mmr_data=None):
    h, w = img.shape
    out = region_info(w, h)
    if mmr_data is not None:
        out += bytes([1])  # MMR=1
        return out + mmr_data
    flags = (template << 1) | (8 if tpgdon else 0)
    out += bytes([flags])
    at = NOMINAL_AT[template]
    for dx, dy in at:
        out += bytes([dx & 0xFF, dy & 0xFF])
    enc = MQEncoder()
    states = new_states(TEMPLATES[template][3])
    encode_generic(enc, states, img, template, at, tpgdon)
    return out + enc.flush()


def symbol_dict_data(symbols, template=0):
    """Arithmetic symbol dictionary (SDHUFF=0, SDREFAGG=0) exporting
    every symbol, encoded per the §6.5.5 height-class procedure."""
    flags = template << 10
    out = struct.pack(">H", flags)
    at = NOMINAL_AT[template]
    for dx, dy in at:
        out += bytes([dx & 0xFF, dy & 0xFF])
    out += struct.pack(">II", len(symbols), len(symbols))
    enc = MQEncoder()
    gb = new_states(TEMPLATES[template][3])
    iadh = new_states(9)
    iadw = new_states(9)
    iaex = new_states(9)
    order = sorted(range(len(symbols)), key=lambda i: symbols[i].shape[0])
    hc_height = 0
    i = 0
    while i < len(order):
        h = symbols[order[i]].shape[0]
        encode_int(enc, iadh, h - hc_height)
        hc_height = h
        sym_w = 0
        while i < len(order) and symbols[order[i]].shape[0] == h:
            w = symbols[order[i]].shape[1]
            encode_int(enc, iadw, w - sym_w)
            sym_w = w
            encode_generic(
                enc, gb, symbols[order[i]], template, at, False
            )
            i += 1
        encode_int(enc, iadw, "OOB")
    # export runs: skip 0, export all
    encode_int(enc, iaex, 0)
    encode_int(enc, iaex, len(symbols))
    return out + enc.flush(), order


def text_region_data(
    w, h, placements, exported_syms,
    log_strips=0, ref_corner=1, ds_offset=0,
):
    """Immediate text region (SBHUFF=0, REFINE=0, TRANSPOSED=0).
    placements: list of (x, y, sym_id) with y the TOP row of the
    symbol and sym_id indexing ``exported_syms`` — the dictionary's
    EXPORT order (CURS advances by the placed symbol's width, so the
    widths must be looked up in the same order the decoder sees).
    ``log_strips`` > 0 exercises the IAIT per-symbol T path;
    ``ref_corner`` 0/2 (bottom corners) encodes T at the symbol's
    BOTTOM row; ``ds_offset`` shifts every IDS delta."""
    n_syms = len(exported_syms)
    strips = 1 << log_strips
    out = region_info(w, h)
    flags = (log_strips << 2) | (ref_corner << 4) | (
        (ds_offset & 0x1F) << 10
    )
    out += struct.pack(">H", flags)
    out += struct.pack(">I", len(placements))
    code_len = max(1, (n_syms - 1).bit_length())
    enc = MQEncoder()
    iadt = new_states(9)
    iafs = new_states(9)
    iads = new_states(9)
    iait = new_states(9)
    iaid = new_states(code_len + 1)
    # encoded T per placement: top row for TL/TR, bottom row for BL/BR
    items = []
    for x, y, sid in placements:
        t = y if ref_corner in (1, 3) else y + exported_syms[sid].shape[0] - 1
        items.append((t // strips * strips, t - t // strips * strips, x, sid))
    strip_map: dict[int, list] = {}
    for base, curt, x, sid in items:
        strip_map.setdefault(base, []).append((x, curt, sid))
    encode_int(enc, iadt, 0)  # STRIPT = 0
    stript = 0
    firsts = 0
    for base in sorted(strip_map):
        assert (base - stript) % strips == 0
        encode_int(enc, iadt, (base - stript) // strips)  # DT
        stript = base
        row = sorted(strip_map[base])
        first_x = row[0][0]
        encode_int(enc, iafs, first_x - firsts)  # DFS
        firsts = first_x
        curs = first_x
        for j, (x, curt, sid) in enumerate(row):
            if j:
                encode_int(enc, iads, (x - curs) - ds_offset)  # IDS
                curs = x
            if strips > 1:
                encode_int(enc, iait, curt)
            encode_iaid(enc, iaid, code_len, sid)
            curs += exported_syms[sid].shape[1] - 1
        encode_int(enc, iads, "OOB")
    return out + enc.flush()


# ------------------------------------------------------ MMR (libtiff)

def g4_strip_bytes(img) -> bytes:
    """Group 4 encode img (1 = black) via libtiff; return the raw G4
    strip bytes (the MMR region data per T.88 §6.2.6)."""
    T = ctypes.CDLL("libtiff.so.6")
    T.TIFFOpen.restype = ctypes.c_void_p
    T.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    T.TIFFWriteScanline.restype = ctypes.c_int
    T.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_uint16,
    ]
    T.TIFFClose.argtypes = [ctypes.c_void_p]
    h, w = img.shape
    packed = np.packbits(img, axis=1)
    fd, path = tempfile.mkstemp(suffix=".tif")
    os.close(fd)
    try:
        tif = T.TIFFOpen(path.encode(), b"w")
        assert tif

        def set16(tag, val):
            assert T.TIFFSetField(
                ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                ctypes.c_uint16(val),
            )

        def set32(tag, val):
            assert T.TIFFSetField(
                ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                ctypes.c_uint32(val),
            )

        set32(256, w)
        set32(257, h)
        set16(258, 1)
        set16(259, 4)  # COMPRESSION_CCITTFAX4
        set16(262, 0)  # MinIsWhite
        set16(277, 1)
        set32(278, h)
        for y in range(h):
            row = packed[y].tobytes()
            assert (
                T.TIFFWriteScanline(
                    ctypes.c_void_p(tif), row, y, 0
                ) == 1
            )
        T.TIFFClose(ctypes.c_void_p(tif))
        blob = open(path, "rb").read()
    finally:
        os.unlink(path)
    # minimal TIFF walk for StripOffsets(273)/StripByteCounts(279)
    assert blob[:4] in (b"II*\x00", b"MM\x00*")
    le = blob[:2] == b"II"
    u16 = (lambda o: int.from_bytes(blob[o : o + 2], "little" if le else "big"))
    u32 = (lambda o: int.from_bytes(blob[o : o + 4], "little" if le else "big"))
    ifd = u32(4)
    n = u16(ifd)
    off = cnt = None
    for i in range(n):
        e = ifd + 2 + 12 * i
        tag = u16(e)
        if tag == 273:
            off = u32(e + 8)
        elif tag == 279:
            cnt = u32(e + 8)
    assert off is not None and cnt is not None
    return blob[off : off + cnt]


# --------------------------------------------------------- fixtures

def checker(h, w, cell):
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy // cell) + (xx // cell)) % 2).astype(np.uint8)


def text_lines(h, w):
    """Horizontal runs resembling scanned text lines (TPGDON-friendly:
    many identical consecutive rows)."""
    img = np.zeros((h, w), np.uint8)
    for y0 in range(2, h - 3, 7):
        img[y0 : y0 + 3, 3 : w - 3] = 1
        img[y0 + 1, 5 : w : 9] = 0
    return img


def glyph_T():
    g = np.zeros((8, 6), np.uint8)
    g[0:2, :] = 1
    g[2:, 2:4] = 1
    return g


def glyph_o():
    g = np.zeros((6, 6), np.uint8)
    g[0, 1:5] = 1
    g[5, 1:5] = 1
    g[1:5, 0] = 1
    g[1:5, 5] = 1
    return g


def glyph_dot():
    return np.ones((2, 2), np.uint8)


SYMS = [glyph_T(), glyph_o(), glyph_dot()]


def _emit(name, b):
    hx = b.hex()
    print(f"{name} = bytes.fromhex(")
    for i in range(0, len(hx), 72):
        print(f'    "{hx[i : i + 72]}"')
    print(")")


def main():
    # 1. arithmetic generic region, template 0, no TPGDON, 38x29
    img1 = checker(29, 38, 3)
    stream1 = segment(1, 48, [], 1, page_info(38, 29)) + segment(
        2, 38, [], 1, generic_region_data(img1, 0, False)
    )
    _emit("GENERIC_T0", stream1)

    # 2. every template, TPGDON on, text-line pattern 33x40
    img2 = text_lines(33, 40)
    for t in range(4):
        s = segment(1, 48, [], 1, page_info(40, 33)) + segment(
            2, 38, [], 1, generic_region_data(img2, t, True)
        )
        _emit(f"GENERIC_TPGDON_T{t}", s)

    # 3. MMR generic region (libtiff G4 — independent encoder)
    img3 = text_lines(25, 46)
    mmr = g4_strip_bytes(img3)
    s = segment(1, 48, [], 1, page_info(46, 25)) + segment(
        2, 38, [], 1, generic_region_data(img3, 0, False, mmr_data=mmr)
    )
    _emit("GENERIC_MMR", s)

    # 4. symbol dict + text region ("To.o T" layout on 60x24)
    sd, order = symbol_dict_data(SYMS)
    # exported order is height-sorted: map original ids -> exported ids
    exp_id = {orig: k for k, orig in enumerate(order)}
    placements = [
        (2, 3, 0), (9, 5, 1), (17, 9, 2), (22, 5, 1), (31, 3, 0),
        (40, 12, 2), (45, 3, 0),
    ]
    exported = [SYMS[orig] for orig in order]
    tr = text_region_data(
        60, 24, [(x, y, exp_id[s]) for x, y, s in placements], exported
    )
    stream4 = (
        segment(1, 48, [], 1, page_info(60, 24))
        + segment(2, 0, [], 1, sd)
        + segment(3, 6, [2], 1, tr)
    )
    _emit("SYMBOL_TEXT", stream4)

    # 4b. strips=4 + dsoffset=2 (IAIT path) and BOTTOMLEFT corner
    tr_strips = text_region_data(
        60, 24, [(x, y, exp_id[s]) for x, y, s in placements],
        exported, log_strips=2, ds_offset=2,
    )
    _emit(
        "SYMBOL_TEXT_STRIPS",
        segment(1, 48, [], 1, page_info(60, 24))
        + segment(2, 0, [], 1, sd)
        + segment(3, 6, [2], 1, tr_strips),
    )
    tr_bottom = text_region_data(
        60, 24, [(x, y, exp_id[s]) for x, y, s in placements],
        exported, log_strips=3, ref_corner=0,
    )
    _emit(
        "SYMBOL_TEXT_BOTTOM",
        segment(1, 48, [], 1, page_info(60, 24))
        + segment(2, 0, [], 1, sd)
        + segment(3, 6, [2], 1, tr_bottom),
    )

    # 5. same, with the symbol dict in a separate globals stream
    glob = segment(1, 0, [], 0, sd)
    body = segment(2, 48, [], 1, page_info(60, 24)) + segment(
        3, 6, [1], 1, tr
    )
    _emit("SYMBOL_TEXT_GLOBALS_G", glob)
    _emit("SYMBOL_TEXT_GLOBALS_B", body)


if __name__ == "__main__":
    main()
