"""CCITT Group 3 / Group 4 fax decoding (ITU-T T.4 / T.6).

Scanned documents are the single biggest bilevel-image population a
crawl sees: fax-era TIFFs (Compression 2/3/4) and PDF page images
behind ``/CCITTFaxDecode`` — until this round both declined, so every
scanned page was invisible to the image-dedup table and to pixel
statistics.  This module implements the three public encodings:

- **MH (Modified Huffman, T.4 one-dimensional)**: alternating
  white/black run lengths from the standard code tables (terminating
  codes 0–63, make-up codes 64–1728, the shared extended make-ups
  1792–2560).
- **MR (Modified READ, T.4 two-dimensional, K>0)**: EOL-tagged mix of
  1-D and 2-D lines.
- **MMR (Modified Modified READ, T.6, Group 4)**: pure 2-D coding
  against the reference line — pass / horizontal / vertical(±3) modes;
  what TIFF Compression=4 and PDF ``/K -1`` use, i.e. the format of
  essentially every scanned PDF in the wild.

Decode tables are built as flat 8192-entry lookup arrays (max code
length 13 bits), so each code resolves with ONE peek — no bit-by-bit
trie walk in the hot loop.  Rows decode to changing-element lists
(the T.6 data model) and materialize to a numpy ``(h, w)`` uint8
raster at the end, white=255/black=0 regardless of the container's
bit-sense flags (``/BlackIs1``, TIFF PhotometricInterpretation) —
those flags describe the BIT representation the codes bypass.

Correctness pins (tests/test_ccitt.py): golden G4/G3/MH TIFFs minted
OFFLINE by the system libtiff 4.x via ctypes
(``scripts/make_ccitt_golden.py``, fixture bytes committed) must
decode to the exact known raster — an INDEPENDENT encoder, so a
symmetric misreading of T.4's tables cannot pass.  Malformed input
declines (None), never raises, never fabricates rows.

Scale shape (100 TB): pure per-row Python/numpy inside the existing
Arrow-batched decode edges (:mod:`operators.multimodal` TIFF rasters,
:mod:`operators.pdf_extract` image lifts); compressed bytes never
shuffle.

Reference parity: none — north-star LLM-pipeline surface (SURVEY.md
§2.8); the reference engine reads SQL tables only.
"""

from __future__ import annotations

import numpy as np

# T.4 code tables as (run_length, code_string) — transcribed from the
# public ITU-T T.4 tables 2/3 (terminating + make-up codes) and the
# shared extended make-ups of table 4.  Any transcription typo is
# caught by the libtiff golden fixtures.
_WHITE_CODES = [
    (0, "00110101"), (1, "000111"), (2, "0111"), (3, "1000"),
    (4, "1011"), (5, "1100"), (6, "1110"), (7, "1111"),
    (8, "10011"), (9, "10100"), (10, "00111"), (11, "01000"),
    (12, "001000"), (13, "000011"), (14, "110100"), (15, "110101"),
    (16, "101010"), (17, "101011"), (18, "0100111"), (19, "0001100"),
    (20, "0001000"), (21, "0010111"), (22, "0000011"), (23, "0000100"),
    (24, "0101000"), (25, "0101011"), (26, "0010011"), (27, "0100100"),
    (28, "0011000"), (29, "00000010"), (30, "00000011"),
    (31, "00011010"), (32, "00011011"), (33, "00010010"),
    (34, "00010011"), (35, "00010100"), (36, "00010101"),
    (37, "00010110"), (38, "00010111"), (39, "00101000"),
    (40, "00101001"), (41, "00101010"), (42, "00101011"),
    (43, "00101100"), (44, "00101101"), (45, "00000100"),
    (46, "00000101"), (47, "00001010"), (48, "00001011"),
    (49, "01010010"), (50, "01010011"), (51, "01010100"),
    (52, "01010101"), (53, "00100100"), (54, "00100101"),
    (55, "01011000"), (56, "01011001"), (57, "01011010"),
    (58, "01011011"), (59, "01001010"), (60, "01001011"),
    (61, "00110010"), (62, "00110011"), (63, "00110100"),
    # make-up codes
    (64, "11011"), (128, "10010"), (192, "010111"), (256, "0110111"),
    (320, "00110110"), (384, "00110111"), (448, "01100100"),
    (512, "01100101"), (576, "01101000"), (640, "01100111"),
    (704, "011001100"), (768, "011001101"), (832, "011010010"),
    (896, "011010011"), (960, "011010100"), (1024, "011010101"),
    (1088, "011010110"), (1152, "011010111"), (1216, "011011000"),
    (1280, "011011001"), (1344, "011011010"), (1408, "011011011"),
    (1472, "010011000"), (1536, "010011001"), (1600, "010011010"),
    (1664, "011000"), (1728, "010011011"),
]

_BLACK_CODES = [
    (0, "0000110111"), (1, "010"), (2, "11"), (3, "10"),
    (4, "011"), (5, "0011"), (6, "0010"), (7, "00011"),
    (8, "000101"), (9, "000100"), (10, "0000100"), (11, "0000101"),
    (12, "0000111"), (13, "00000100"), (14, "00000111"),
    (15, "000011000"), (16, "0000010111"), (17, "0000011000"),
    (18, "0000001000"), (19, "00001100111"), (20, "00001101000"),
    (21, "00001101100"), (22, "00000110111"), (23, "00000101000"),
    (24, "00000010111"), (25, "00000011000"), (26, "000011001010"),
    (27, "000011001011"), (28, "000011001100"), (29, "000011001101"),
    (30, "000001101000"), (31, "000001101001"), (32, "000001101010"),
    (33, "000001101011"), (34, "000011010010"), (35, "000011010011"),
    (36, "000011010100"), (37, "000011010101"), (38, "000011010110"),
    (39, "000011010111"), (40, "000001101100"), (41, "000001101101"),
    (42, "000011011010"), (43, "000011011011"), (44, "000001010100"),
    (45, "000001010101"), (46, "000001010110"), (47, "000001010111"),
    (48, "000001100100"), (49, "000001100101"), (50, "000001010010"),
    (51, "000001010011"), (52, "000000100100"), (53, "000000110111"),
    (54, "000000111000"), (55, "000000100111"), (56, "000000101000"),
    (57, "000001011000"), (58, "000001011001"), (59, "000000101011"),
    (60, "000000101100"), (61, "000001011010"), (62, "000001100110"),
    (63, "000001100111"),
    # make-up codes
    (64, "0000001111"), (128, "000011001000"), (192, "000011001001"),
    (256, "000001011011"), (320, "000000110011"), (384, "000000110100"),
    (448, "000000110101"), (512, "0000001101100"),
    (576, "0000001101101"), (640, "0000001001010"),
    (704, "0000001001011"), (768, "0000001001100"),
    (832, "0000001001101"), (896, "0000001110010"),
    (960, "0000001110011"), (1024, "0000001110100"),
    (1088, "0000001110101"), (1152, "0000001110110"),
    (1216, "0000001110111"), (1280, "0000001010010"),
    (1344, "0000001010011"), (1408, "0000001010100"),
    (1472, "0000001010101"), (1536, "0000001011010"),
    (1600, "0000001011011"), (1664, "0000001100100"),
    (1728, "0000001100101"),
]

# extended make-ups, shared by both colors (T.4 table 4)
_EXT_CODES = [
    (1792, "00000001000"), (1856, "00000001100"), (1920, "00000001101"),
    (1984, "000000010010"), (2048, "000000010011"),
    (2112, "000000010100"), (2176, "000000010101"),
    (2240, "000000010110"), (2304, "000000010111"),
    (2368, "000000011100"), (2432, "000000011101"),
    (2496, "000000011110"), (2560, "000000011111"),
]

_RUN_LUT_BITS = 13  # longest run code is 13 bits


def _build_run_lut(codes):
    """Flat (1 << 13)-entry LUT: 13-bit peek → (run, code length).
    run = -1 marks an unassigned prefix (invalid code)."""
    runs = np.full(1 << _RUN_LUT_BITS, -1, dtype=np.int32)
    lens = np.zeros(1 << _RUN_LUT_BITS, dtype=np.int32)
    for run, code in codes:
        n = len(code)
        base = int(code, 2) << (_RUN_LUT_BITS - n)
        span = 1 << (_RUN_LUT_BITS - n)
        runs[base : base + span] = run
        lens[base : base + span] = n
    return runs, lens


_WHITE_LUT = _build_run_lut(_WHITE_CODES + _EXT_CODES)
_BLACK_LUT = _build_run_lut(_BLACK_CODES + _EXT_CODES)

# 2-D mode codes (T.4 §4.2.1.3 / T.6): value, code
_M_PASS, _M_HORIZ = 0, 1
_M_V0, _M_VR1, _M_VR2, _M_VR3 = 2, 3, 4, 5
_M_VL1, _M_VL2, _M_VL3 = 6, 7, 8
_M_EXT = 9  # 0000001…: T.6 extensions (uncompressed mode) — decline
_MODE_CODES = [
    (_M_V0, "1"), (_M_VR1, "011"), (_M_VL1, "010"), (_M_HORIZ, "001"),
    (_M_PASS, "0001"), (_M_VR2, "000011"), (_M_VL2, "000010"),
    (_M_VR3, "0000011"), (_M_VL3, "0000010"), (_M_EXT, "0000001"),
]
_MODE_LUT_BITS = 7


def _build_mode_lut():
    modes = np.full(1 << _MODE_LUT_BITS, -1, dtype=np.int32)
    lens = np.zeros(1 << _MODE_LUT_BITS, dtype=np.int32)
    for mode, code in _MODE_CODES:
        n = len(code)
        base = int(code, 2) << (_MODE_LUT_BITS - n)
        span = 1 << (_MODE_LUT_BITS - n)
        modes[base : base + span] = mode
        lens[base : base + span] = n
    return modes, lens


_MODE_LUT = _build_mode_lut()


def make_ccitt_decoders():
    """Build ``(decode_g4, decode_g3, decode_ccitt_pdf)`` as
    SELF-CONTAINED closures: every helper, class and lookup table is a
    closure cell, so cloudpickle serializes them BY VALUE and executors
    never import this package (the :mod:`operators.multimodal` decoder
    discipline — its raster chain ships these closures inside an
    Arrow-batched stage).  The module-level functions below are the
    driver-side singletons of the same build."""
    from bisect import bisect_right as _bisect

    import numpy as _np

    white_lut = _WHITE_LUT
    black_lut = _BLACK_LUT
    mode_lut = _MODE_LUT
    run_bits = _RUN_LUT_BITS
    mode_bits = _MODE_LUT_BITS
    m_pass, m_horiz, m_ext = _M_PASS, _M_HORIZ, _M_EXT
    vdelta = {
        _M_V0: 0, _M_VR1: 1, _M_VR2: 2, _M_VR3: 3,
        _M_VL1: -1, _M_VL2: -2, _M_VL3: -3,
    }
    eol = int("000000000001", 2)

    class Decline(Exception):
        """Malformed stream — converted to None at the API edge."""

    class Bits:
        """MSB-first bit reader with bounded peek (no whole-stream
        bigint)."""

        __slots__ = ("b", "pos", "n")

        def __init__(self, b: bytes):
            self.b = b + b"\x00\x00\x00"  # peek pad past the end
            self.pos = 0
            self.n = len(b) * 8

        def peek(self, k: int) -> int:
            byte, bit = self.pos >> 3, self.pos & 7
            window = int.from_bytes(self.b[byte : byte + 4], "big")
            return (window >> (32 - bit - k)) & ((1 << k) - 1)

        def skip(self, k: int):
            self.pos += k

        def exhausted(self) -> bool:
            return self.pos >= self.n

        def peek1_at(self, off: int) -> int:
            p = self.pos + off
            return (self.b[p >> 3] >> (7 - (p & 7))) & 1

        def byte_align(self):
            self.pos = (self.pos + 7) & ~7

    def read_run(bits, color: int) -> int:
        """One complete run: make-up chain (each ≥64) + terminator."""
        runs, lens = black_lut if color else white_lut
        total = 0
        for _ in range(64):  # fuzz bound: no real run chains this long
            if bits.exhausted():
                raise Decline
            v = bits.peek(run_bits)
            run = int(runs[v])
            if run < 0:
                raise Decline
            bits.skip(int(lens[v]))
            total += run
            if run < 64:  # terminating code ends the chain
                return total
        raise Decline

    def skip_eols(bits, two_d: bool):
        """Skip fill bits + EOL sequences at a row boundary.  An EOL
        is 11 zeros + 1; encoders may pad with extra zero FILL bits
        before it.  Returns the 1-D/2-D tag bit of the LAST EOL
        consumed (True = next line is 1-D; always True without
        ``two_d``) or None when no EOL was present."""
        tag = None
        while not bits.exhausted():
            z = 0
            # the EOL's terminating 1 may be the stream's LAST bit —
            # an off-by-one here once refused to consume a final EOL
            # and the caller spun forever on the unconsumed bits
            limit = min(bits.n - bits.pos, 4096)
            while z < limit and bits.peek1_at(z) == 0:
                z += 1
            if z < 11 or z >= limit or bits.peek1_at(z) != 1:
                break  # not fill+EOL: actual row data (or stream end)
            bits.skip(z + 1)
            if two_d:
                if bits.exhausted():
                    break
                tag = bits.peek(1) == 1
                bits.skip(1)
            else:
                tag = True
        return tag

    def decode_1d_row(bits, columns: int):
        """One MH-coded row → changing-element positions."""
        changes = []
        pos = 0
        color = 0
        while pos < columns:
            run = read_run(bits, color)
            pos += run
            if pos > columns:
                raise Decline
            changes.append(pos)
            color ^= 1
        return changes

    def decode_2d_row(bits, ref: list, columns: int):
        """One 2-D (MR/MMR) row against reference changes → changes."""
        changes = []
        a0 = -1
        color = 0
        while a0 < columns:
            if bits.exhausted():
                raise Decline
            v = bits.peek(mode_bits)
            mode = int(mode_lut[0][v])
            if mode < 0 or mode == m_ext:
                raise Decline
            bits.skip(int(mode_lut[1][v]))
            # b1: first change in ref strictly right of a0 with color
            # opposite to the current color (even index = white→black)
            i = _bisect(ref, a0)
            if (i & 1) != color:
                i += 1
            b1 = ref[i] if i < len(ref) else columns
            b2 = ref[i + 1] if i + 1 < len(ref) else columns
            if mode == m_pass:
                a0 = b2
            elif mode == m_horiz:
                base = a0 if a0 >= 0 else 0
                r1 = read_run(bits, color)
                r2 = read_run(bits, color ^ 1)
                a1 = base + r1
                a2 = a1 + r2
                if a2 > columns:
                    raise Decline
                changes.append(a1)
                changes.append(a2)
                a0 = a2
            else:  # vertical
                a1 = b1 + vdelta[mode]
                if a1 < 0 or a1 > columns or (
                    changes and a1 < changes[-1]
                ):
                    raise Decline
                changes.append(a1)
                a0 = a1
                color ^= 1
            if len(changes) > columns + 2:
                raise Decline
        return changes

    def changes_to_row(changes, columns: int):
        """Changing elements → uint8 row, white=255 black=0."""
        row = _np.full(columns, 255, dtype=_np.uint8)
        it = iter(changes)
        for start in it:
            end = next(it, columns)
            row[start : min(end, columns)] = 0
        return row

    def decode_g4(data, columns, rows=None, byte_align=False):
        """T.6 (Group 4 / MMR) → (h, w) uint8 raster, or None
        (decline).  ``rows`` bounds the output when known (TIFF strip /
        PDF /Rows); without it, decoding stops at EOFB or stream
        end."""
        try:
            if columns <= 0 or columns > 1 << 20:
                return None
            bits = Bits(data)
            ref = []
            out = []
            while not bits.exhausted() and (
                rows is None or len(out) < rows
            ):
                if byte_align:
                    bits.byte_align()
                if bits.peek(24) == (eol << 12 | eol):  # EOFB
                    break
                # tolerate a weird-but-seen leading EOL
                if bits.peek(12) == eol:
                    bits.skip(12)
                    continue
                try:
                    changes = decode_2d_row(bits, ref, columns)
                except Decline:
                    if rows is None and out:
                        break  # unknown height: pad ends the image
                    raise
                out.append(changes_to_row(changes, columns))
                ref = changes if changes else []
                if bits.n - bits.pos < 8 and rows is None:
                    break
            if not out or (rows is not None and len(out) < rows):
                return None
            return _np.stack(out)
        except Exception:
            return None

    def decode_g3(
        data, columns, rows=None, two_d=False, has_eol=True,
        byte_align=False,
    ):
        """T.4 (Group 3) → (h, w) uint8 raster, or None.  ``two_d`` =
        MR (K>0 in PDF, T4Options bit 0 in TIFF); ``has_eol=False`` is
        the TIFF Compression=2 'Modified Huffman, byte-aligned rows'
        shape."""
        try:
            if columns <= 0 or columns > 1 << 20:
                return None
            bits = Bits(data)
            out = []
            ref = []
            next_is_1d = True
            while not bits.exhausted() and (
                rows is None or len(out) < rows
            ):
                if byte_align or not has_eol:
                    bits.byte_align()
                if has_eol:
                    tag = skip_eols(bits, two_d)
                    if tag is not None:
                        next_is_1d = tag
                    if bits.exhausted():
                        break
                    if bits.peek(12) == eol:
                        # skip_eols declined to consume an EOL it can
                        # see (e.g. truncated tag bit) — no forward
                        # progress is possible; end the image
                        break
                try:
                    if two_d and not next_is_1d:
                        changes = decode_2d_row(bits, ref, columns)
                    else:
                        changes = decode_1d_row(bits, columns)
                except Decline:
                    if rows is None and out:
                        break  # unknown height: pad ends the image
                    raise
                out.append(changes_to_row(changes, columns))
                ref = changes
            if not out or (rows is not None and len(out) < rows):
                return None
            return _np.stack(out)
        except Exception:
            return None

    def decode_ccitt_pdf(data, k, columns, rows, byte_align=False):
        """PDF ``/CCITTFaxDecode`` dispatch on /K: K<0 → G4, K=0 → G3
        1-D, K>0 → G3 2-D (EOL-tagged mix)."""
        if k < 0:
            return decode_g4(data, columns, rows, byte_align=byte_align)
        got = decode_g3(
            data, columns, rows, two_d=k > 0, has_eol=True,
            byte_align=byte_align,
        )
        if got is None and k == 0:
            # writers that omit EOLs despite K=0 exist; retry as
            # byte-aligned MH — K>0 (MR) streams must NOT be
            # reinterpreted under a different coding scheme (a wrong
            # raster would enter the dedup tables)
            got = decode_g3(
                data, columns, rows, two_d=False, has_eol=False
            )
        return got

    return decode_g4, decode_g3, decode_ccitt_pdf


# driver-side singletons of the same build (tests, direct callers)
decode_g4, decode_g3, decode_ccitt_pdf = make_ccitt_decoders()
