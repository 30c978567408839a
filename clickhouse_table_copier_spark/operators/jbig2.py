"""JBIG2 decoding (ITU-T T.88) — the scanned-PDF image lift's last
common codec seam (VERDICT r12 item 3): ``/JBIG2Decode`` image
XObjects decode here into the same grayscale-raster contract the
``/CCITTFaxDecode`` path uses, so a JBIG2-compressed page image
enters the media table and pairs with its uncompressed twin in the
near-dup tables exactly like a CCITT fax page does.

Scope (the subset PDF generators actually emit, T.88 §7.4 / PDF
32000-1 §7.4.7):

- **MQ arithmetic decoder** (T.88 Annex E, software conventions
  E.3.2–E.3.5) with the published 47-state Qe table — shared by every
  arithmetic-coded segment kind.
- **Generic region decoding** (§6.2): GB templates 0–3 with arbitrary
  AT pixels, TPGDON typical-prediction rows, and the MMR=1 flavor,
  which is T.6 two-dimensional coding — decoded by the SAME
  :func:`operators.ccitt.decode_g4` the fax path uses (T.88 §6.2.6
  defers to T.4/T.6; a private re-implementation here could disagree
  with the fax decoder on the same bytes).
- **Symbol dictionary (§6.5) + text region (§6.4)** — the
  symbol-coded subset emitted for text pages: arithmetic integer
  decoding (Annex A) IADH/IADW/IAEX/IADT/IAFS/IADS/IAIT/IAID,
  arithmetic and MMR-free symbol bitmaps via the generic decoder,
  no refinement (SDREFAGG=0, SBREFINE=0 — refinement-coded streams
  decline).
- **Segment layer** (§7.2): headers, page info, immediate regions,
  end-of-page/stripe/file; the PDF *embedded stream* organisation
  (no file header, page associations all 1, optional
  ``/JBIG2Globals`` stream carrying shared symbol dictionaries).

Decline contract: every public entry returns ``None`` on malformed,
truncated, unknown-length, refinement-coded or otherwise
out-of-scope input — a corrupt stream must decline the image, never
fabricate a raster (the raster feeds dedup tables) and never raise
into the Arrow batch.

Goldens: no JBIG2 encoder or decoder exists in this container
(``libjbig`` is JBIG1/T.82), so the pin is the pdf_crypt discipline
(VERDICT r11 item 7): ``scripts/make_jbig2_golden.py`` transcribes
the T.88 Annex E *encoder*-side flowcharts (INITENC/ENCODE/BYTEOUT/
FLUSH — procedures disjoint from the decoder's INITDEC/DECODE/BYTEIN
transcribed here) and mints arithmetic goldens offline, while the
MMR flavor is minted by **libtiff's G4 encoder** — a fully
independent implementation.  The MQ decoder is additionally pinned
against the spec's own published coder test sequence
(tests/test_jbig2.py).

Scale shape: decoding is per-document map work inside the Arrow
batch edge (:mod:`operators.pdf_extract`) — PDF bytes never shuffle;
throughput scales with document parallelism.  The MQ coder is
inherently serial per region (adaptive arithmetic), so a single huge
region decodes on one core; scanned PDFs emit one region per page,
and pages fan out across the batch.

Reference parity: none — north-star LLM-pipeline surface
(SURVEY.md §2.8); the reference engine reads SQL tables only.
"""

from __future__ import annotations

import numpy as np


class Jbig2Error(Exception):
    """Malformed/out-of-scope JBIG2 — converted to None at API edges."""


# Region/page pixel-area bound (second r13 review pass): large enough
# for the biggest real bilevel scans — a tabloid/A3 page at 1200 dpi
# is ~0.27 Gpx, an A0 poster at 600 dpi ~0.9 Gpx, both under this
# 2^30 bound — while capping the worst crafted-dims allocation at a
# ~1 GiB raster (the 60000x60000 = 3.6 Gpx attack from the first
# review pass stays declined).
_MAX_AREA = 1 << 30


# T.88 Table E.1 — (Qe, NMPS, NLPS, SWITCH).  Published data shared
# with JPEG2000 (T.800 Table C.2).
_QE = (
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
)


class MQDecoder:
    """T.88 Annex E decoder (INITDEC / DECODE / BYTEIN, E.3.2–E.3.5
    software conventions: C is 32-bit, chigh = bits 16..31).  Context
    state lives OUTSIDE the coder (``states``: a list of packed
    ``index << 1 | mps`` ints) because JBIG2 shares one coder across
    several context arrays (GB, IADH, IAID, …)."""

    __slots__ = ("data", "bp", "c", "a", "ct", "fed", "starved_decodes")

    # A VALID stream needs only a couple of synthesized bytes past
    # its flush (SETBITS guarantees the final interval resolves
    # within CT more bits); a decode still hungry hundreds of bytes
    # past end-of-data is reading pixels the encoder never coded —
    # decline instead of fabricating a raster or looping for hours
    # (r13 review: crafted huge-dims segment with empty coder data =
    # CPU DoS / fabrication through the 1-bits-forever rule).
    _MAX_SYNTHETIC_FEEDS = 256

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        self.fed = 0
        self.starved_decodes = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self):
        d = self.data
        n = len(d)
        bp = self.bp
        cur = d[bp] if bp < n else 0xFF
        if cur == 0xFF:
            nxt = d[bp + 1] if bp + 1 < n else 0xFF
            if nxt > 0x8F:
                # marker / end of data: feed 1-bits (E.3.4) — bounded
                self.fed += 1
                if self.fed > self._MAX_SYNTHETIC_FEEDS:
                    raise Jbig2Error("coder starved past end of data")
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += nxt << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            nxt = d[bp + 1] if bp + 1 < n else 0xFF
            self.c += nxt << 8
            self.ct = 8

    def decode(self, states: list, cx: int) -> int:
        if self.fed:
            # Post-starvation decode budget (second r13 review pass):
            # the feed bound alone lets a context pre-adapted to the
            # qe=0x0001 state decode ~32k pixels per synthetic bit
            # (renorm-free decodes consume no input), i.e. ~67M
            # decodes inside 256 feeds.  Valid flushed tails resolve
            # in far fewer; 4M decodes past the first synthetic feed
            # caps the adversarial loop at seconds.
            self.starved_decodes += 1
            if self.starved_decodes > 1 << 22:
                raise Jbig2Error("coder starved past end of data")
        st = states[cx]
        i = st >> 1
        mps = st & 1
        qe, nmps, nlps, sw = _QE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path (E.3.2 DECODE → LPS_EXCHANGE)
            if self.a < qe:
                d = mps
                states[cx] = (nmps << 1) | mps
            else:
                d = mps ^ 1
                states[cx] = (nlps << 1) | (mps ^ 1 if sw else mps)
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mps
            # MPS_EXCHANGE
            if self.a < qe:
                d = mps ^ 1
                states[cx] = (nlps << 1) | (mps ^ 1 if sw else mps)
            else:
                d = mps
                states[cx] = (nmps << 1) | mps
        # RENORMD
        a = self.a
        c = self.c
        ct = self.ct
        while True:
            if ct == 0:
                self.c = c
                self._bytein()
                c = self.c
                ct = self.ct
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self.a = a
        self.c = c
        self.ct = ct
        return d


def new_states(nbits: int) -> list:
    """Fresh context-state array for an ``nbits``-wide context."""
    return [0] * (1 << nbits)


_OOB = object()  # Annex A out-of-band value (ends IADS runs)


def decode_int(mq: MQDecoder, states: list):
    """Annex A.2 integer arithmetic decoding (IADH/IADW/IAEX/IAAI/
    IADT/IAFS/IADS/IAIT/IARI/…): returns an int or ``_OOB``.  The
    512-entry context tree is tracked in PREV exactly as specified
    (cap at 9 bits once PREV ≥ 256)."""
    prev = 1

    def bit():
        nonlocal prev
        b = mq.decode(states, prev)
        prev = (
            ((prev << 1) | b)
            if prev < 256
            else ((((prev << 1) | b) & 511) | 256)
        )
        return b

    s = bit()
    if not bit():
        n, off = 2, 0
    elif not bit():
        n, off = 4, 4
    elif not bit():
        n, off = 6, 20
    elif not bit():
        n, off = 8, 84
    elif not bit():
        n, off = 12, 340
    else:
        n, off = 32, 4436
    v = 0
    for _ in range(n):
        v = (v << 1) | bit()
    v += off
    if s:
        if v == 0:
            return _OOB
        return -v
    return v


def decode_iaid(mq: MQDecoder, states: list, code_len: int) -> int:
    """Annex A.3 IAID decoding: ``code_len`` bits down the context
    tree; result is PREV − 2^code_len."""
    prev = 1
    for _ in range(code_len):
        prev = (prev << 1) | mq.decode(states, prev)
    return prev - (1 << code_len)


# Generic-region context layouts (templates 0–3), transcribed with
# the de-facto bit positions (AT pixels at FIXED context bits, per
# the spec figures): each entry is (dx, dy, bit).  TPGDON SLTP
# pseudo-pixel contexts per §6.2.5.7.
_TEMPLATES = (
    # template 0: 16-bit context, 4 AT pixels at bits 4, 10, 14, 15
    (
        ((-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
         (2, -1, 5), (1, -1, 6), (0, -1, 7), (-1, -1, 8), (-2, -1, 9),
         (1, -2, 11), (0, -2, 12), (-1, -2, 13)),
        (4, 10, 14, 15),
        0x9B25,
    ),
    # template 1: 13-bit context, 1 AT pixel at bit 3
    (
        ((-1, 0, 0), (-2, 0, 1), (-3, 0, 2),
         (2, -1, 4), (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8),
         (2, -2, 9), (1, -2, 10), (0, -2, 11), (-1, -2, 12)),
        (3,),
        0x0795,
    ),
    # template 2: 10-bit context, 1 AT pixel at bit 2
    (
        ((-1, 0, 0), (-2, 0, 1),
         (1, -1, 3), (0, -1, 4), (-1, -1, 5), (-2, -1, 6),
         (1, -2, 7), (0, -2, 8), (-1, -2, 9)),
        (2,),
        0x00E5,
    ),
    # template 3: 10-bit context, single reference line, AT at bit 4
    (
        ((-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
         (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8), (-3, -1, 9)),
        (4,),
        0x0195,
    ),
)

_NOMINAL_AT = (
    ((3, -1), (-3, -1), (2, -2), (-2, -2)),
    ((3, -1),),
    ((2, -1),),
    ((2, -1),),
)

_CONTEXT_BITS = (16, 13, 10, 10)


def decode_generic_region(
    mq: MQDecoder,
    states: list,
    w: int,
    h: int,
    template: int,
    at,
    tpgdon: bool,
) -> np.ndarray:
    """§6.2.5 arithmetic generic-region decoding → (h, w) uint8
    bitmap, 1 = black.  ``at`` is the AT-pixel list ((dx, dy), …) —
    4 entries for template 0, 1 for templates 1–3.

    Hot-loop shape: rows are stored PADDED by ``pad`` zero cells on
    each side so the per-pixel context build needs no bounds checks,
    and the context expression is compiled ONCE per region from the
    template's (dx, dy, bit) triples (constant offsets folded in) —
    the MQ coder is inherently serial, so this per-pixel Python loop
    is the floor; throughput at scale comes from document
    parallelism in the Arrow batch edge, not from this loop."""
    if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16) or w * h > _MAX_AREA:
        raise Jbig2Error("generic region dimensions out of range")
    fixed, at_bits, sltp_cx = _TEMPLATES[template]
    if len(at) != len(at_bits):
        raise Jbig2Error("AT pixel count mismatch")
    pixels = list(fixed) + [
        (dx, dy, bit) for (dx, dy), bit in zip(at, at_bits)
    ]
    for dx, dy, _ in pixels:
        if dy > 0 or (dy == 0 and dx >= 0):
            # non-causal AT pixel: invalid per §6.2.5.3
            raise Jbig2Error("non-causal AT pixel")
    pad = max(4, max(abs(p[0]) for p in pixels))
    # context expression compiled per region: e.g.
    #   (r1[x+11]<<4)|(r1[x+10]<<5)|...|(r0[x+7]<<0)
    # rN = padded row at dy=-N; deeper rows (AT dy < -2) index the
    # rows list directly (rare — nominal ATs never do)
    deep = sorted({dy for _, dy, _ in pixels if dy < -2})
    names = {0: "r0", -1: "r1", -2: "r2"}
    names.update({dy: f"rd{-dy}" for dy in deep})
    terms = []
    for dx, dy, bit in pixels:
        idx = f"x+{pad + dx}" if pad + dx else "x"
        term = f"{names[dy]}[{idx}]"
        terms.append(f"({term}<<{bit})" if bit else term)
    ctx_fn = eval(  # noqa: S307 - template-derived constants only
        "lambda x," + ",".join(sorted(set(names.values()))) + ": "
        + "|".join(terms)
    )
    nominal0 = template == 0 and tuple(at) == _NOMINAL_AT[0]
    # Peak-memory discipline (advisor r13): decoded rows land
    # directly in the preallocated output array; only the last
    # `depth` PADDED rows (context reach) stay live as bytearrays —
    # peak is ~area bytes, not the ~2x a full padded-row list plus
    # b''.join would hold.
    depth = max(2, -min(dy for _, dy, _ in pixels))
    out = np.empty((h, w), dtype=np.uint8)
    hist: dict[int, bytearray] = {}  # y -> padded row, last `depth`
    zero = bytes(w + 2 * pad)
    ltp = 0
    decode = mq.decode
    for y in range(h):
        if tpgdon:
            ltp ^= decode(states, sltp_cx)
            if ltp:
                row = (
                    bytearray(hist[y - 1]) if y
                    else bytearray(w + 2 * pad)
                )
                hist[y] = row
                out[y] = np.frombuffer(row, np.uint8)[pad : pad + w]
                if y >= depth:
                    del hist[y - depth]
                continue
        row = bytearray(w + 2 * pad)
        r1 = hist[y - 1] if y >= 1 else zero
        r2 = hist[y - 2] if y >= 2 else zero
        if nominal0:
            # Incremental fast path for the shape real scanners emit
            # (template 0, nominal ATs): the three context slices are
            # ROLLING WINDOWS — row y bits 0-3 (x-1..x-4), row y-1
            # bits 4-10 (x+3..x-3, AT1/AT2 at the ends), row y-2 bits
            # 11-13 (x+1..x-1) — each shifts left by one per pixel;
            # only AT3 (x+2,y-2) at bit 14 and AT4 (x-2,y-2) at bit
            # 15 are indexed directly.  ~2x over the compiled
            # expression (measured; same context VALUES, so the
            # adaptive states are bit-identical).
            w0 = 0
            w1 = (
                (r1[pad] << 7) | (r1[pad + 1] << 6)
                | (r1[pad + 2] << 5) | (r1[pad + 3] << 4)
            )
            w2 = (r2[pad] << 12) | (r2[pad + 1] << 11)
            for x in range(w):
                cx = (
                    w0 | w1 | w2
                    | (r2[x + pad + 2] << 14)
                    | (r2[x + pad - 2] << 15)
                )
                p = decode(states, cx)
                row[x + pad] = p
                w0 = ((w0 << 1) | p) & 0xF
                w1 = ((w1 << 1) & 0x7F0) | (r1[x + pad + 4] << 4)
                w2 = ((w2 << 1) & 0x3800) | (r2[x + pad + 2] << 11)
        else:
            refs = {"r0": row, "r1": r1, "r2": r2}
            for dy in deep:
                refs[f"rd{-dy}"] = hist[y + dy] if y + dy >= 0 else zero
            args = [refs[nm] for nm in sorted(set(names.values()))]
            for x in range(w):
                row[x + pad] = decode(states, ctx_fn(x, *args))
        hist[y] = row
        out[y] = np.frombuffer(row, np.uint8)[pad : pad + w]
        if y >= depth:
            del hist[y - depth]
    return out


def decode_generic_mmr(data: bytes, w: int, h: int) -> np.ndarray:
    """§6.2.6 MMR=1 generic region: T.6 (Group 4) coded — decoded by
    the SAME decoder the fax path uses.  → (h, w) uint8, 1 = black."""
    from clickhouse_table_copier_spark.operators.ccitt import decode_g4

    gray = decode_g4(data, w, h)
    if gray is None:
        raise Jbig2Error("MMR generic region declined")
    return (gray == 0).astype(np.uint8)


# ------------------------------------------------------------ segments

_SEG_PAGE_INFO = 48
_SEG_END_OF_PAGE = 49
_SEG_END_OF_STRIPE = 50
_SEG_END_OF_FILE = 51
_SEG_PROFILES = 52
_SEG_TABLES = 53
_SEG_EXTENSION = 62
_SEG_SYMBOL_DICT = 0
_SEG_TEXT_IMM = (6, 7)
_SEG_TEXT_INTERMEDIATE = 4
_SEG_GENERIC_IMM = (38, 39)
_SEG_GENERIC_INTERMEDIATE = 36
# Known-but-out-of-scope segment types (T.88 §7.3): pattern
# dictionary (16), halftone regions (20/22/23), refinement regions
# (40/42/43).  These carry page CONTENT, so silently skipping them
# (the forward-compat path for genuinely unknown/extension types)
# would hand an incomplete raster to the near-dup tables — decline
# instead (advisor r13, medium).
_SEG_KNOWN_OUT_OF_SCOPE = (16, 20, 22, 23, 40, 42, 43)


def _be32(b: bytes, p: int) -> int:
    return int.from_bytes(b[p : p + 4], "big")


def parse_segments(data: bytes):
    """§7.2 segment headers → list of dicts
    ``{number, type, refs, page, data}``.  Raises :class:`Jbig2Error`
    on truncation or the unknown-length (0xFFFFFFFF) form — PDF
    writers emit known lengths; unknown-length generic regions are
    out of scope (decline, never guess at the terminator scan)."""
    segs = []
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 11 > n:
            raise Jbig2Error("truncated segment header")
        number = _be32(data, pos)
        flags = data[pos + 4]
        pos += 5
        stype = flags & 0x3F
        count = data[pos] >> 5
        if count == 7:
            count = _be32(data, pos) & 0x1FFFFFFF
            pos += 4 + (count + 8) // 8
        elif count in (5, 6):
            # §7.2.4: short form allows counts 0-4 only; 5/6 are
            # reserved — decline deliberately rather than consume
            # 5-6 phantom refs and desynchronize the header parse
            raise Jbig2Error("reserved referred-to count")
        else:
            pos += 1
        if count > 1 << 20:
            raise Jbig2Error("implausible referred-segment count")
        rsz = 1 if number <= 256 else (2 if number <= 65536 else 4)
        if pos + count * rsz > n:
            raise Jbig2Error("truncated referred-segment list")
        refs = [
            int.from_bytes(data[pos + i * rsz : pos + (i + 1) * rsz], "big")
            for i in range(count)
        ]
        pos += count * rsz
        if flags & 0x40:
            page = _be32(data, pos)
            pos += 4
        else:
            page = data[pos] if pos < n else 0
            pos += 1
        if pos + 4 > n:
            raise Jbig2Error("truncated segment length")
        length = _be32(data, pos)
        pos += 4
        if length == 0xFFFFFFFF:
            raise Jbig2Error("unknown-length segment (out of scope)")
        if pos + length > n:
            raise Jbig2Error("truncated segment data")
        segs.append(
            {
                "number": number,
                "type": stype,
                "refs": refs,
                "page": page,
                "data": data[pos : pos + length],
            }
        )
        pos += length
    return segs


def _region_info(d: bytes):
    """§7.4.1 region segment information field (17 bytes)."""
    if len(d) < 17:
        raise Jbig2Error("truncated region info")
    op = d[16] & 0x07
    if op > 4:
        # 5-7 are reserved — decline rather than guess a combinator
        raise Jbig2Error("reserved region combination operator")
    return {
        "w": _be32(d, 0),
        "h": _be32(d, 4),
        "x": _be32(d, 8),
        "y": _be32(d, 12),
        "op": op,
    }


def _signed8(v: int) -> int:
    return v - 256 if v >= 128 else v


def decode_generic_segment(d: bytes) -> tuple[dict, np.ndarray]:
    """§7.4.6 generic region segment data → (region info, bitmap)."""
    info = _region_info(d)
    flags = d[17]
    mmr = flags & 1
    template = (flags >> 1) & 3
    tpgdon = bool(flags & 8)
    pos = 18
    if mmr:
        bmp = decode_generic_mmr(d[pos:], info["w"], info["h"])
        return info, bmp
    n_at = 4 if template == 0 else 1
    if len(d) < pos + 2 * n_at:
        raise Jbig2Error("truncated AT pixels")
    at = tuple(
        (_signed8(d[pos + 2 * i]), _signed8(d[pos + 2 * i + 1]))
        for i in range(n_at)
    )
    pos += 2 * n_at
    mq = MQDecoder(d[pos:])
    states = new_states(_CONTEXT_BITS[template])
    bmp = decode_generic_region(
        mq, states, info["w"], info["h"], template, at, tpgdon
    )
    return info, bmp


# -------------------------------------------- symbol dictionary + text

def decode_symbol_dict_segment(d: bytes, input_symbols: list):
    """§6.5/§7.4.3 symbol dictionary segment → list of (h, w) uint8
    symbol bitmaps (the EXPORTED symbols).  Scope: arithmetic coding,
    SDHUFF=0, SDREFAGG=0 (no refinement) — the jbig2enc-style subset;
    everything else declines."""
    if len(d) < 2:
        raise Jbig2Error("truncated symbol dict flags")
    flags = int.from_bytes(d[:2], "big")
    sdhuff = flags & 1
    sdrefagg = (flags >> 1) & 1
    template = (flags >> 10) & 3
    # bit 12: refinement template (only meaningful with SDREFAGG)
    ctx_used = (flags >> 8) & 1
    ctx_retained = (flags >> 9) & 1
    if sdhuff or sdrefagg or ctx_used or ctx_retained:
        raise Jbig2Error("symbol dict flavor out of scope")
    pos = 2
    n_at = 4 if template == 0 else 1
    if len(d) < pos + 2 * n_at + 8:
        raise Jbig2Error("truncated symbol dict header")
    at = tuple(
        (_signed8(d[pos + 2 * i]), _signed8(d[pos + 2 * i + 1]))
        for i in range(n_at)
    )
    pos += 2 * n_at
    n_ex = _be32(d, pos)
    n_new = _be32(d, pos + 4)
    pos += 8
    if n_new > 1 << 16 or n_ex > 1 << 16:
        raise Jbig2Error("implausible symbol counts")
    mq = MQDecoder(d[pos:])
    gb = new_states(_CONTEXT_BITS[template])
    iadh = new_states(9)
    iadw = new_states(9)
    iaex = new_states(9)
    new_syms: list = []
    total_area = 0
    hc_height = 0
    # §6.5.5 height-class loop
    while len(new_syms) < n_new:
        dh = decode_int(mq, iadh)
        if dh is _OOB:
            raise Jbig2Error("OOB height delta")
        hc_height += dh
        if hc_height <= 0 or hc_height > 1 << 14:
            raise Jbig2Error("bad symbol height")
        sym_w = 0
        while True:
            dw = decode_int(mq, iadw)
            if dw is _OOB:
                break  # end of height class
            sym_w += dw
            if sym_w <= 0 or sym_w > 1 << 14:
                raise Jbig2Error("bad symbol width")
            if len(new_syms) >= n_new:
                raise Jbig2Error("symbol count overrun")
            total_area += sym_w * hc_height
            if total_area > _MAX_AREA:
                raise Jbig2Error("symbol dictionary area bound")
            bmp = decode_generic_region(
                mq, gb, sym_w, hc_height, template, at, False
            )
            new_syms.append(bmp)
    # §6.5.10 export flags: runs of (skip, export) over input+new
    all_syms = list(input_symbols) + new_syms
    exported: list = []
    i = 0
    cur = 0
    while i < len(all_syms) and len(exported) < n_ex:
        run = decode_int(mq, iaex)
        if run is _OOB or run < 0:
            raise Jbig2Error("bad export run")
        if cur:
            exported.extend(all_syms[i : i + run])
        i += run
        cur ^= 1
    if len(exported) != n_ex:
        raise Jbig2Error("export count mismatch")
    return exported


def decode_text_region_segment(d: bytes, symbols: list):
    """§6.4/§7.4.4 text region segment → (region info, bitmap).
    Scope: SBHUFF=0, REFINE=0, TRANSPOSED=0 — the symbol-coded
    subset scanned-PDF generators emit."""
    info = _region_info(d)
    if len(d) < 19:
        raise Jbig2Error("truncated text region")
    flags = int.from_bytes(d[17:19], "big")
    sbhuff = flags & 1
    refine = (flags >> 1) & 1
    log_strips = (flags >> 2) & 3
    ref_corner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    comb_op = (flags >> 7) & 3
    def_pixel = (flags >> 9) & 1
    ds_offset = (flags >> 10) & 0x1F
    if ds_offset > 15:
        ds_offset -= 32
    if sbhuff or refine or transposed:
        raise Jbig2Error("text region flavor out of scope")
    strips = 1 << log_strips
    pos = 19
    if len(d) < pos + 4:
        raise Jbig2Error("truncated instance count")
    n_instances = _be32(d, pos)
    pos += 4
    if n_instances > 1 << 24:
        raise Jbig2Error("implausible instance count")
    n_syms = len(symbols)
    if n_syms == 0:
        raise Jbig2Error("text region with no symbols")
    code_len = max(1, (n_syms - 1).bit_length())
    mq = MQDecoder(d[pos:])
    iadt = new_states(9)
    iafs = new_states(9)
    iads = new_states(9)
    iait = new_states(9)
    iaid = new_states(code_len + 1)
    w, h = info["w"], info["h"]
    if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16) or w * h > _MAX_AREA:
        raise Jbig2Error("text region dimensions out of range")
    page = np.full((h, w), def_pixel, dtype=np.uint8)
    # §6.4.5 decoding procedure
    stript = decode_int(mq, iadt)
    if stript is _OOB:
        raise Jbig2Error("OOB STRIPT")
    stript = -stript * strips
    firsts = 0
    decoded = 0
    while decoded < n_instances:
        dt = decode_int(mq, iadt)
        if dt is _OOB:
            raise Jbig2Error("OOB DT")
        stript += dt * strips
        # first symbol of strip
        dfs = decode_int(mq, iafs)
        if dfs is _OOB:
            raise Jbig2Error("OOB first S")
        firsts += dfs
        curs = firsts
        first = True
        while True:
            if not first:
                ds = decode_int(mq, iads)
                if ds is _OOB:
                    break  # end of strip
                curs += ds + ds_offset
            first = False
            if strips == 1:
                curt = 0
            else:
                t = decode_int(mq, iait)
                if t is _OOB:
                    raise Jbig2Error("OOB T")
                curt = t
            tt = stript + curt
            sym_id = decode_iaid(mq, iaid, code_len)
            if sym_id >= n_syms:
                raise Jbig2Error("symbol id out of range")
            sym = symbols[sym_id]
            sh, sw = sym.shape
            # place per REFCORNER (§6.4.5 step 3.c.x)
            if ref_corner in (1, 3):  # TOPLEFT / TOPRIGHT
                y0, x0 = tt, curs
            else:  # BOTTOMLEFT / BOTTOMRIGHT
                y0, x0 = tt - sh + 1, curs
            _composite(page, sym, x0, y0, comb_op)
            curs += sw - 1
            decoded += 1
            if decoded > n_instances:
                raise Jbig2Error("instance overrun")
    return info, page


def _composite(page: np.ndarray, bmp: np.ndarray, x: int, y: int, op: int):
    """§8.2 external combination: clip + combine ``bmp`` onto
    ``page`` at (x, y).  op: 0 OR, 1 AND, 2 XOR, 3 XNOR, 4 REPLACE."""
    ph, pw = page.shape
    bh, bw = bmp.shape
    x0, y0 = max(x, 0), max(y, 0)
    x1, y1 = min(x + bw, pw), min(y + bh, ph)
    if x0 >= x1 or y0 >= y1:
        return
    src = bmp[y0 - y : y1 - y, x0 - x : x1 - x]
    dst = page[y0:y1, x0:x1]
    if op == 0:
        dst |= src
    elif op == 1:
        dst &= src
    elif op == 2:
        dst ^= src
    elif op == 3:
        dst[...] = 1 - (dst ^ src)
    else:
        dst[...] = src


def decode_embedded(
    data: bytes,
    globals_data: bytes | None = None,
    width: int | None = None,
    height: int | None = None,
):
    """PDF ``/JBIG2Decode`` embedded-stream decode → (h, w) uint8
    bitmap (1 = black) of page 1, or raises :class:`Jbig2Error`.
    ``globals_data`` is the optional ``/JBIG2Globals`` stream (shared
    symbol dictionaries); ``width``/``height`` from the image XObject
    bound the page when the page-info segment is striped/absent."""
    segs = []
    if globals_data:
        segs.extend(parse_segments(globals_data))
    segs.extend(parse_segments(data))
    page = None
    page_default = 0
    sym_dicts: dict[int, list] = {}
    regions = []
    for seg in segs:
        st = seg["type"]
        d = seg["data"]
        if st == _SEG_PAGE_INFO:
            if len(d) < 19:
                raise Jbig2Error("truncated page info")
            pw, ph = _be32(d, 0), _be32(d, 4)
            page_default = (d[16] >> 2) & 1
            if ph == 0xFFFFFFFF:  # striped page: height from PDF dict
                ph = height or 0
            if width and (pw == 0 or pw > 1 << 16):
                pw = width
            if pw > 1 << 16 or ph > 1 << 16 or pw * ph > _MAX_AREA:
                # crafted page-info dims: decline BEFORE allocating
                raise Jbig2Error("page dimensions out of range")
            if pw and ph:
                page = np.full((ph, pw), page_default, dtype=np.uint8)
        elif st == _SEG_SYMBOL_DICT:
            inputs: list = []
            for r in seg["refs"]:
                inputs.extend(sym_dicts.get(r, []))
            sym_dicts[seg["number"]] = decode_symbol_dict_segment(d, inputs)
        elif st in _SEG_GENERIC_IMM:
            regions.append(decode_generic_segment(d))
        elif st in _SEG_TEXT_IMM:
            syms: list = []
            for r in seg["refs"]:
                syms.extend(sym_dicts.get(r, []))
            regions.append(decode_text_region_segment(d, syms))
        elif st in (_SEG_GENERIC_INTERMEDIATE, _SEG_TEXT_INTERMEDIATE):
            raise Jbig2Error("intermediate regions out of scope")
        elif st in _SEG_KNOWN_OUT_OF_SCOPE:
            # pattern dict / halftone / refinement: content-bearing,
            # so skipping would drop page content — decline
            raise Jbig2Error(f"segment type {st} out of scope")
        elif st in (
            _SEG_END_OF_PAGE, _SEG_END_OF_STRIPE, _SEG_END_OF_FILE,
            _SEG_PROFILES, _SEG_EXTENSION,
        ):
            continue
        elif st == _SEG_TABLES:
            raise Jbig2Error("custom Huffman tables out of scope")
        # unknown types: skip (forward-compatible per §7.3 retain bits)
    if not regions:
        raise Jbig2Error("no region segments")
    if page is None:
        # no page info (tolerated: some writers emit bare regions):
        # page = bounding box of the regions, or the PDF-declared size
        pw = width or max(i["x"] + i["w"] for i, _ in regions)
        ph = height or max(i["y"] + i["h"] for i, _ in regions)
        if (
            not (0 < pw <= 1 << 16 and 0 < ph <= 1 << 16)
            or pw * ph > _MAX_AREA
        ):
            raise Jbig2Error("page dimensions out of range")
        page = np.zeros((ph, pw), dtype=np.uint8)
    for info, bmp in regions:
        _composite(page, bmp, info["x"], info["y"], info["op"])
    return page


def decode_jbig2_pdf(
    data: bytes,
    globals_data: bytes | None = None,
    width: int | None = None,
    height: int | None = None,
):
    """API edge for the PDF image lift: JBIG2 embedded stream →
    (h, w) uint8 GRAYSCALE raster (white=255, black=0 — the same
    contract :func:`operators.ccitt.decode_ccitt_pdf` returns), or
    ``None`` (decline, never raise)."""
    try:
        bmp = decode_embedded(data, globals_data, width, height)
        if bmp is None or bmp.size == 0:
            return None
        # in-place gray flip (advisor r13: np.where added a second
        # area-sized allocation): 1=black -> gray 0, 0 -> 255; with
        # the streaming row writer the decode path now peaks at ~1x
        # region area instead of ~3x
        np.minimum(bmp, 1, out=bmp)
        bmp ^= 1
        bmp *= 255
        return bmp
    except Exception:
        return None
