"""JPEG 2000 (ITU-T T.800 / ISO 15444-1) baseline decoder for the
``/JPXDecode`` PDF image path — the LAST common scanned-PDF codec seam
after CCITT (r9) and JBIG2 (r13).

Scope — the shape PDF generators actually emit (VERDICT r13 item 3)
plus the lossy path photographic ``.jp2`` files in a crawl use
(VERDICT r14 item 3): single tile, reversible 5/3 wavelet (no
quantization) OR irreversible 9/7 wavelet with scalar quantization —
both the expounded (Sqcd style 2) and derived (style 1, §E.1.1 Eq
E-5) spellings (§E.1/Annex F — r15), grayscale or RGB (RCT with 5/3,
ICT with 9/7), 1-16 bit unsigned/signed samples, component
subsampling with factors 1/2/4 (the 4:2:0 chroma spelling — each
sample renders over its Rsiz x Rsiz reference-grid cell, the grid
semantic; MCT requires uniform factors and the image origin must
sit on a cell boundary — r15 tail),
default precincts, any progression order, any layer count, code-block
styles: default, RESET, TERMALL, vertically-causal, segmentation
symbols, and selective arithmetic BYPASS (lazy raw passes, §D.4 —
r14).  Everything else DECLINES deliberately (raise
:class:`Jp2Error`; the API edge returns None, never raises, never
fabricates — the CCITT/JBIG2 contract): reserved quantization
styles, 9/7 spelled without quantization (and vice versa),
POC/RGN/PPM/PPT overrides, TRUE multi-precinct grids (declared
precinct sizes are accepted when each resolution fits one precinct,
with the PPx-clamped effective code-block size), component counts
other than 1/3, subsampling factors outside {1, 2, 4},
subsampling-unaligned image origins, MCT over mixed grids.
Non-zero image/tile offsets are IN scope (r15
tail): the image area [XOsiz, Xsiz) x [YOsiz, Ysiz) and the tile
grid anchored at (XTOsiz, YTOsiz) place every tile on the reference
grid, and because ALL geometry here is computed in absolute
coordinates, offsets fall out of the same rect math (§A.5.1
constraint violations decline).
Main-header per-component overrides are IN scope (r15): QCC
quantization (the spelling lossy encoders use to quantize chroma
coarser than luma) and COC coding style (per-component decomposition
levels, code-block size/style, precincts — the §B.12 packet
sequencing runs the resolution loop to the max level count and emits
a packet only for components that have that resolution).  A COC
declaring a different wavelet than COD declines (mixed per-component
transforms out of scope); tile-part QCC/COC still decline.

Multi-tile (r15): regular XTsiz x YTsiz grids with ragged right/
bottom edges decode tile-by-tile and stitch by raster position —
tiles are independent by construction (DWT and all coding state
reset at tile boundaries), multiple tile-parts per tile concatenate
in stream order, and a declared grid with a missing tile DECLINES
(stitching a partial grid would fabricate a zero region).  All tile
geometry anchors to ABSOLUTE reference-grid coordinates (r15 tail):
the DWT even/odd split follows the sample's absolute index
(§F.3.8), subband rects follow B-15, and code-block partitions
anchor at absolute zero on the band axes (§B.7) — a tile whose
origin is odd at some level, or whose band origin is misaligned to
the code-block grid (the OpenJPEG-default 512-tile/5-level/64-cblk
shape), decodes per the spec rather than per a tile-local origin-0
reading.  The one degenerate spelling with no constructible pin — a
SINGLE-sample dimension at an ODD origin — declines by name.

9/7 pin story (the ADVICE r14 symmetric-misreading concern): the
lifting implementation (both directions) is pinned against a DIRECT
FIR filter-bank decomposition built from the published Table F.4 taps
(lowpass DC gain exactly 1, highpass Nyquist gain exactly 2) — two
different published formulations of the same transform that must
agree to 1e-9 — plus perfect-reconstruction round-trips and
fine-quantization goldens whose reconstruction error is below the
rounding threshold, making the decoded raster byte-exact.
Reconstruction uses r = 0 in §E.1.1.2's value formula (any r in
[0, 1) is a conformant decoder choice; 0 keeps fully-decoded goldens
exact).

Spark-side role: per-document map work inside the Arrow batch edge of
:func:`operators.pdf_extract.extract_pdf_images` — PDF bytes never
shuffle; the MQ coder is inherently serial per code-block but
code-blocks, components and documents all fan out (SCALE.md r14).

The MQ arithmetic coder is SHARED with JBIG2: T.800 Annex C and T.88
Annex E specify the identical coder (same Qe table, same
INITDEC/DECODE/BYTEIN procedures), so :class:`operators.jbig2
.MQDecoder` — pinned to the spec's published H.2 test sequence — is
reused here verbatim, starvation bounds included.

Goldens: scripts/make_jpeg2000_golden.py (encoder-side transcription,
Annex C ENCODER procedures + forward 5/3 + tier-1/tier-2 encoders —
deliberately disjoint from this module, imports nothing from it).

Reference parity note: the reference engine
(noperformance/clickhouse-table-copier) has no media surface at all;
this is north-star LLM-pipeline scope (SURVEY.md §2.8).
"""

from __future__ import annotations

import struct

import numpy as np

from clickhouse_table_copier_spark.operators.jbig2 import (
    MQDecoder,
    new_states,
)


class Jp2Error(Exception):
    """Deliberate decline (out of scope / malformed / crafted)."""


# hard caps (crafted-stream DoS discipline, same as jbig2._MAX_AREA):
# total SAMPLES across components; int32 coefficient planes mean
# 4 bytes/sample, so 1<<27 samples tops out near 512 MiB live
_MAX_SAMPLES = 1 << 27
# NOTE: for default-precinct spellings (PPx=PPy=15) the EFFECTIVE
# decodable width/height is 2^15, not _MAX_DIM: a resolution grid that
# crosses an absolute 2^15 boundary genuinely carries two precincts per
# (layer, resolution, component) under B.6 and declines as 'multiple
# precincts out of scope' (_eff_cb straddle check; ADVICE r15) — 2^16
# here is the parse-time dimension cap, not the decode bound.
_MAX_DIM = 1 << 16
_MAX_LAYERS = 1024
_MAX_PASSES = 109  # 3*37-2: 37 planes is already beyond int32 range
# total code-blocks across every (component, resolution, band): the
# per-cblk state lists plus two tag trees per band are the only
# header-driven allocations, so bounding the count bounds decode_tile's
# pre-packet memory at ~50 MiB worst case (a dense _MAX_SAMPLES image
# with 32x32 code-blocks stays under it; 16x16 at max size declines by
# name).  A second gate bounds WORK: every non-empty packet visits all
# of its resolution's code-blocks once per layer, so layers x
# total_cblks prices the packet-walk ceiling — a crafted 1024-layer
# header over a dense grid declines before the walk starts, while
# conformant empty-packet streams (blank or rate-truncated pages,
# which cost O(1) per packet and were over-declined by an earlier
# stream-length-proportional gate — review r15) decode normally.
_MAX_CBLKS = 1 << 18
_MAX_CBLK_VISITS = 1 << 24


# ------------------------------------------------------------------
# bit readers


class _HeaderBits:
    """Packet-header bit reader with the §B.10.1 stuffing rule: a byte
    following 0xFF carries only 7 payload bits (its MSB is a stuffed
    0)."""

    __slots__ = ("data", "pos", "bitpos", "cur")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitpos = 8
        self.cur = 0  # last consumed byte; 0 = none yet (no stuffing)

    def bit(self) -> int:
        if self.bitpos == 8:
            if self.pos >= len(self.data):
                raise Jp2Error("packet header past end of data")
            prev = self.cur
            self.cur = self.data[self.pos]
            self.pos += 1
            if prev == 0xFF:
                # byte after 0xFF: MSB is a stuffed 0, 7 payload bits
                if self.cur & 0x80:
                    raise Jp2Error("invalid stuffing byte")
                self.bitpos = 1
            else:
                self.bitpos = 0
        b = (self.cur >> (7 - self.bitpos)) & 1
        self.bitpos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> int:
        """End of packet header: byte-align; if the final header byte
        was 0xFF, the encoder appended a stuff byte that belongs to
        the header — skip it.  Returns the body start offset."""
        return self.pos + (1 if self.cur == 0xFF else 0)


# ------------------------------------------------------------------
# tag trees (§B.10.2)


class _TagTree:
    """Quad-tree of lower bounds; one per (band, tree-kind), state
    persists across layers.

    Nodes and root→leaf paths are built LAZILY on first touch: memory
    is proportional to the leaves a packet stream actually references,
    never to the declared band geometry — a crafted header cannot make
    __init__ allocate (it used to precompute every path eagerly, ~850
    MB for a 60-byte stream declaring 4096x4096 with 4x4 blocks)."""

    __slots__ = ("dims", "levels", "paths")

    def __init__(self, w: int, h: int):
        # level dims from leaves up to the 1x1 root (arithmetic only)
        dims = [(w, h)]
        while dims[-1] != (1, 1):
            pw, ph = dims[-1]
            dims.append(((pw + 1) // 2, (ph + 1) // 2))
        self.dims = dims
        # per-level sparse node store: index -> [low, known]
        self.levels = [dict() for _ in dims]
        self.paths: dict = {}  # leaf -> root→leaf node list

    def _path(self, leaf: int):
        p = self.paths.get(leaf)
        if p is not None:
            return p
        w = self.dims[0][0]
        cy, cx = divmod(leaf, w)
        p = []
        for lvl, (lw, _lh) in enumerate(self.dims):
            store = self.levels[lvl]
            idx = cy * lw + cx
            node = store.get(idx)
            if node is None:
                node = [0, False]
                store[idx] = node
            p.append(node)
            cx >>= 1
            cy >>= 1
        p.reverse()
        self.paths[leaf] = p
        return p

    def query(self, rd: _HeaderBits, leaf: int, threshold: int) -> bool:
        """Consume bits until it is known whether value(leaf) <
        ``threshold``; True iff it is (leaf value then exact)."""
        low = 0
        node = None
        for node in self._path(leaf):
            if node[0] < low:
                node[0] = low
            while not node[1] and node[0] < threshold:
                if rd.bit():
                    node[1] = True
                else:
                    node[0] += 1
            low = node[0]
            if not node[1] and node[0] >= threshold:
                return False
        return node[1] and node[0] < threshold

    def value(self, rd: _HeaderBits, leaf: int) -> int:
        """Fully decode value(leaf) (zero-bitplanes tree)."""
        t = 1
        while not self.query(rd, leaf, t):
            t += 1
            if t > 64:
                raise Jp2Error("tag tree value out of range")
        return self._path(leaf)[-1][0]


# ------------------------------------------------------------------
# tier-1: EBCOT context tables (§D, Tables D.1-D.4)
#
# context numbering (the conventional 0-18 layout): 0-8 zero coding,
# 9-13 sign coding, 14-16 magnitude refinement, 17 run-length,
# 18 uniform.

_CTX_RL = 17
_CTX_UNI = 18
_N_CTX = 19


def _zc_lut():
    """ZC context from (orientation, H, V, D) — Table D.1.
    orientation: 0=LL, 1=HL, 2=LH, 3=HH."""
    lut = np.zeros((4, 3, 3, 5), dtype=np.uint8)
    for hh in range(3):
        for vv in range(3):
            for dd in range(5):
                # LL and LH column of Table D.1
                if hh == 2:
                    c = 8
                elif hh == 1:
                    c = 7 if vv >= 1 else (6 if dd >= 1 else 5)
                else:
                    if vv == 2:
                        c = 4
                    elif vv == 1:
                        c = 3
                    else:
                        c = 2 if dd >= 2 else (1 if dd == 1 else 0)
                lut[0, hh, vv, dd] = c
                lut[2, hh, vv, dd] = c
                lut[1, vv, hh, dd] = c  # HL: H and V swapped
                # HH column: driven by D with H+V secondary
                s = hh + vv
                if dd >= 3:
                    c = 8
                elif dd == 2:
                    c = 7 if s >= 1 else 6
                elif dd == 1:
                    c = 5 if s >= 2 else (4 if s == 1 else 3)
                else:
                    c = 2 if s >= 2 else (1 if s == 1 else 0)
                lut[3, hh, vv, dd] = c
    return lut


_ZC = _zc_lut()

# sign coding (Tables D.3/D.4): index [Hc+1][Vc+1] -> (ctx, xorbit)
_SC = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


def _fresh_states() -> list:
    """Initial context states, Table D.7: all at index 0 except UNI
    (46), RL (3) and ZC context 0 (4)."""
    st = new_states(5)[:_N_CTX]
    st[0] = 4 << 1
    st[_CTX_RL] = 3 << 1
    st[_CTX_UNI] = 46 << 1
    return st


# code-block style flags (Table A.19)
_CB_BYPASS = 0x01
_CB_RESET = 0x02
_CB_TERMALL = 0x04
_CB_VCAUSAL = 0x08
_CB_PREDTERM = 0x10
_CB_SEGSYM = 0x20


def _seg_index(i: int, bypass: bool, termall: bool) -> int:
    """Codeword-segment index of coding pass ``i`` (0-based).  TERMALL
    terminates every pass; BYPASS (§D.4, lazy coding) codes passes
    0-9 as one MQ segment, then alternates raw (SPP+MRP) and MQ (CUP)
    segments; otherwise the whole code-block is one segment."""
    if termall:
        return i
    if not bypass or i < 10:
        return 0
    k = i - 10
    return 1 + 2 * (k // 3) + (1 if k % 3 == 2 else 0)


def _raw_pass(i: int, bypass: bool) -> bool:
    """True when pass ``i`` is raw-coded (bypass mode: significance
    propagation and magnitude refinement from the 11th pass on)."""
    return bypass and i >= 10 and (i - 10) % 3 != 2


_ZC_FLAT = [
    [int(_ZC[o, hh, vv, dd]) for hh in range(3) for vv in range(3)
     for dd in range(5)]
    for o in range(4)
]
_SC_FLAT = [_SC[(hc, vc)] for hc in (-1, 0, 1) for vc in (-1, 0, 1)]


def decode_codeblock(
    segments: list,
    w: int,
    h: int,
    orient: int,
    missing: int,
    numpasses: int,
    mb: int,
    cbstyle: int,
) -> np.ndarray:
    """Tier-1 decode of one code-block → (h, w) int32 signed
    coefficients.  ``segments`` is the list of byte strings in coding
    order (one per packet contribution in default mode; one per PASS
    under TERMALL).

    Hot-loop shape (the jbig2 discipline): the MQ coder is inherently
    serial, so throughput comes from NOT sweeping — per-4-row-stripe
    significance counters let the significance-propagation and
    refinement passes skip stripes that provably contain no work (a
    skipped stripe can never flip a coefficient, so the skip is
    self-consistent), and the cleanup pass takes a one-decode-per-
    column run-length fast path through quiet stripes.  The decode
    CALL SEQUENCE is bit-identical to the naive triple sweep — pinned
    by the golden streams and the encoder round-trip properties."""
    nplanes = mb - missing
    if nplanes <= 0:
        return np.zeros((h, w), dtype=np.int32)
    if nplanes > 31 or numpasses > min(_MAX_PASSES, 3 * nplanes - 2):
        raise Jp2Error("implausible plane/pass count")
    termall = bool(cbstyle & _CB_TERMALL)
    vcausal = bool(cbstyle & _CB_VCAUSAL)
    # padded state planes: 1-cell border so neighbor reads are
    # branch-free; sig/sgn in {0,1}
    W = w + 2
    npix = W * (h + 2)
    sig = bytearray(npix)
    sgn = bytearray(npix)
    visited = bytearray(npix)
    mag = [0] * (w * h)
    refined = bytearray(w * h)
    zc = _ZC_FLAT[orient]
    sc = _SC_FLAT
    states = _fresh_states()
    bypass = bool(cbstyle & _CB_BYPASS)
    # contribution chunks merged per codeword-segment id (order of
    # arrival = layer order, so concatenation restores each segment)
    segmap: dict = {}
    for sid, chunk in segments:
        segmap.setdefault(sid, bytearray()).extend(chunk)
    cur_sid = -1
    mq = None
    raw = None
    nstripes = (h + 3) >> 2
    # ssig[s + 1] = number of significant coefficients in stripe s
    # (padded by one sentinel zero on each side)
    ssig = [0] * (nstripes + 2)
    stripe_spans = [
        (y0, min(y0 + 4, h)) for y0 in range(0, h, 4)
    ]

    def sign_decode(px: int, y: int):
        # Tables D.3/D.4: each horizontal/vertical neighbour
        # contributes +1 / -1 / 0, sums clamped to [-1, 1];
        # vcausal clips the row BELOW the stripe
        hc = (sig[px - 1] * (1 - 2 * sgn[px - 1])
              + sig[px + 1] * (1 - 2 * sgn[px + 1]))
        vc = sig[px - W] * (1 - 2 * sgn[px - W])
        if not vcausal or (y & 3) != 3:
            vc += sig[px + W] * (1 - 2 * sgn[px + W])
        if hc > 1:
            hc = 1
        elif hc < -1:
            hc = -1
        if vc > 1:
            vc = 1
        elif vc < -1:
            vc = -1
        ctx, xb = sc[(hc + 1) * 3 + vc + 1]
        return mq.decode(states, ctx) ^ xb

    passes_done = 0
    plane = nplanes - 1
    # pass-type cycle: the first plane has only a cleanup pass
    ptype = 2
    while passes_done < numpasses:
        sid = _seg_index(passes_done, bypass, termall)
        is_raw = _raw_pass(passes_done, bypass)
        if sid != cur_sid:
            cur_sid = sid
            segbytes = bytes(segmap.get(sid, b""))
            if is_raw:
                # raw (lazy) segment: stuffed bit reader, D.4
                raw = _HeaderBits(segbytes, 0)
                mq = None
            else:
                mq = MQDecoder(segbytes)
                raw = None
        if cbstyle & _CB_RESET:
            states = _fresh_states()
        decode = mq.decode if mq is not None else None
        rawbit = raw.bit if raw is not None else None
        bit = 1 << plane
        if ptype == 0:
            # significance propagation: only stripes with significance
            # in reach can hold a candidate
            for si, (y0, y1) in enumerate(stripe_spans):
                if not (ssig[si] or ssig[si + 1] or ssig[si + 2]):
                    continue
                for x in range(w):
                    base = x + 1 + W * (y0 + 1)
                    for y in range(y0, y1):
                        px = base
                        base += W
                        if sig[px]:
                            continue
                        hh = sig[px - 1] + sig[px + 1]
                        if vcausal and (y & 3) == 3:
                            vv = sig[px - W]
                            dd = sig[px - W - 1] + sig[px - W + 1]
                        else:
                            vv = sig[px - W] + sig[px + W]
                            dd = (sig[px - W - 1] + sig[px - W + 1]
                                  + sig[px + W - 1] + sig[px + W + 1])
                        if not (hh | vv | dd):
                            continue
                        visited[px] = 1
                        if is_raw:
                            b = rawbit()
                        else:
                            b = decode(
                                states,
                                zc[hh * 15 + vv * 5
                                   + (dd if dd < 4 else 4)],
                            )
                        if b:
                            # raw sign: straight bit, no prediction
                            sgn[px] = (
                                rawbit() if is_raw
                                else sign_decode(px, y)
                            )
                            sig[px] = 1
                            ssig[si + 1] += 1
                            mag[y * w + x] |= bit
        elif ptype == 1:
            # magnitude refinement: only significant coefficients
            for si, (y0, y1) in enumerate(stripe_spans):
                if not ssig[si + 1]:
                    continue
                for x in range(w):
                    base = x + 1 + W * (y0 + 1)
                    for y in range(y0, y1):
                        px = base
                        base += W
                        if not sig[px] or visited[px]:
                            continue
                        i = y * w + x
                        if is_raw:
                            if rawbit():
                                mag[i] |= bit
                            refined[i] = 1
                            continue
                        if refined[i]:
                            ctx = 16
                        else:
                            if vcausal and (y & 3) == 3:
                                any_n = (
                                    sig[px - 1] or sig[px + 1]
                                    or sig[px - W] or sig[px - W - 1]
                                    or sig[px - W + 1]
                                )
                            else:
                                any_n = (
                                    sig[px - 1] or sig[px + 1]
                                    or sig[px - W] or sig[px + W]
                                    or sig[px - W - 1]
                                    or sig[px - W + 1]
                                    or sig[px + W - 1]
                                    or sig[px + W + 1]
                                )
                            ctx = 15 if any_n else 14
                        if decode(states, ctx):
                            mag[i] |= bit
                        refined[i] = 1
        else:
            # cleanup
            for si, (y0, y1) in enumerate(stripe_spans):
                full = (y1 - y0) == 4
                x = 0
                if full and not (
                    ssig[si] or ssig[si + 1] or ssig[si + 2]
                ):
                    # quiet stripe: every column is run-length
                    # eligible (nothing significant in reach, nothing
                    # visited) until the first flip
                    while x < w:
                        if not decode(states, _CTX_RL):
                            x += 1
                            continue
                        r = (decode(states, _CTX_UNI) << 1) | decode(
                            states, _CTX_UNI
                        )
                        y = y0 + r
                        px = (y + 1) * W + x + 1
                        sgn[px] = sign_decode(px, y)
                        sig[px] = 1
                        ssig[si + 1] += 1
                        mag[y * w + x] |= bit
                        for y in range(y0 + r + 1, y1):
                            px = (y + 1) * W + x + 1
                            if sig[px] or visited[px]:
                                continue
                            hh = sig[px - 1] + sig[px + 1]
                            if vcausal and (y & 3) == 3:
                                vv = sig[px - W]
                                dd = (sig[px - W - 1]
                                      + sig[px - W + 1])
                            else:
                                vv = sig[px - W] + sig[px + W]
                                dd = (sig[px - W - 1]
                                      + sig[px - W + 1]
                                      + sig[px + W - 1]
                                      + sig[px + W + 1])
                            if decode(
                                states,
                                zc[hh * 15 + vv * 5
                                   + (dd if dd < 4 else 4)],
                            ):
                                sgn[px] = sign_decode(px, y)
                                sig[px] = 1
                                ssig[si + 1] += 1
                                mag[y * w + x] |= bit
                        x += 1
                        break  # significance appeared: careful mode
                # careful mode (from column x)
                while x < w:
                    y = y0
                    if full:
                        ok = True
                        base = x + 1 + W * (y0 + 1)
                        for yy in range(y0, y1):
                            px = base
                            base += W
                            if sig[px] or visited[px]:
                                ok = False
                                break
                            if vcausal and (yy & 3) == 3:
                                if (sig[px - 1] or sig[px + 1]
                                        or sig[px - W]
                                        or sig[px - W - 1]
                                        or sig[px - W + 1]):
                                    ok = False
                                    break
                            elif (sig[px - 1] or sig[px + 1]
                                    or sig[px - W] or sig[px + W]
                                    or sig[px - W - 1]
                                    or sig[px - W + 1]
                                    or sig[px + W - 1]
                                    or sig[px + W + 1]):
                                ok = False
                                break
                        if ok:
                            if not decode(states, _CTX_RL):
                                x += 1
                                continue
                            r = (decode(states, _CTX_UNI) << 1
                                 ) | decode(states, _CTX_UNI)
                            y = y0 + r
                            px = (y + 1) * W + x + 1
                            sgn[px] = sign_decode(px, y)
                            sig[px] = 1
                            ssig[si + 1] += 1
                            mag[y * w + x] |= bit
                            y += 1
                    while y < y1:
                        px = (y + 1) * W + x + 1
                        if not sig[px] and not visited[px]:
                            hh = sig[px - 1] + sig[px + 1]
                            if vcausal and (y & 3) == 3:
                                vv = sig[px - W]
                                dd = (sig[px - W - 1]
                                      + sig[px - W + 1])
                            else:
                                vv = sig[px - W] + sig[px + W]
                                dd = (sig[px - W - 1]
                                      + sig[px - W + 1]
                                      + sig[px + W - 1]
                                      + sig[px + W + 1])
                            if decode(
                                states,
                                zc[hh * 15 + vv * 5
                                   + (dd if dd < 4 else 4)],
                            ):
                                sgn[px] = sign_decode(px, y)
                                sig[px] = 1
                                ssig[si + 1] += 1
                                mag[y * w + x] |= bit
                        y += 1
                    x += 1
            if cbstyle & _CB_SEGSYM:
                s = 0
                for _ in range(4):
                    s = (s << 1) | decode(states, _CTX_UNI)
                if s != 0xA:
                    raise Jp2Error("segmentation symbol mismatch")
            # π resets after each cleanup
            visited = bytearray(npix)
        passes_done += 1
        if ptype == 2:
            plane -= 1
            ptype = 0
            if plane < 0 and passes_done < numpasses:
                raise Jp2Error("more passes than bit-planes")
        else:
            ptype += 1
    out = np.array(mag, dtype=np.int32).reshape(h, w)
    sg = np.frombuffer(bytes(sgn), dtype=np.uint8).reshape(
        h + 2, W
    )[1 : h + 1, 1 : w + 1]
    return np.where(sg != 0, -out, out)


# ------------------------------------------------------------------
# inverse 5/3 DWT (§F.3, reversible)
#
# ABSOLUTE-COORDINATE anchoring (review r15): T.800's 1D_SR splits
# even/odd by the sample's index on the REFERENCE GRID (§F.3.8.2
# operates over [i0, i1) with i0 the tile-component coordinate), so
# a tile whose origin is odd at some decomposition level swaps which
# interleave slot is lowpass.  The tile-local (origin-0) spelling
# the r15 multi-tile code assumed is only correct when every tile
# origin stays even at every level — true for power-of-two tile
# sizes with shallow decompositions, wrong in general.  Every 1D
# routine therefore takes the absolute origin ``i0``; origin 0
# reproduces the prior behavior bit-for-bit (goldens pin this).


def _ext_ws(a: np.ndarray, pad: int) -> np.ndarray:
    """Whole-sample-symmetric extension by ``pad`` columns each side
    (§F.3.7: reflection about the boundary SAMPLES).  The reflection
    is origin-agnostic — parity only changes which lifting formula
    applies at each absolute index."""
    n = a.shape[1]
    lp = n - 1
    js = np.arange(-pad, n + pad)
    if lp == 0:
        idx = np.zeros(js.shape, dtype=np.int64)
    else:
        t = np.mod(js, 2 * lp)
        idx = np.where(t > lp, 2 * lp - t, t)
    return a[:, idx]


def _isr_rows(a: np.ndarray, i0: int = 0) -> np.ndarray:
    """1D_SR (§F.3.8.2) along axis 1 over ABSOLUTE indices
    [i0, i0+n): even absolute index = lowpass.  Integer lifting,
    whole-sample symmetric extension."""
    n = a.shape[1]
    if n == 0:
        return a  # empty span (deep level of a 1-wide ragged tile)
    if n == 1:
        if i0 % 2 == 0:
            return a  # single lowpass sample: X = Y
        # a single highpass sample needs the spec's degenerate-case
        # convention, which no in-container source can pin — decline
        raise Jp2Error(
            "odd-parity single-sample dimension out of scope"
        )
    e = np.ascontiguousarray(_ext_ws(a, 2))
    m = n + 4
    s0 = i0 - 2  # absolute index of e[:, 0]
    qe0 = (-s0) % 2  # first local q with absolute index EVEN
    # X[2i] = Y[2i] - floor((Y[2i-1] + Y[2i+1] + 2) / 4), computed
    # for every even position with both neighbors present
    qe = np.arange(qe0 if qe0 >= 1 else qe0 + 2, m - 1, 2)
    e[:, qe] -= (e[:, qe - 1] + e[:, qe + 1] + 2) >> 2
    # X[2i+1] = Y[2i+1] + floor((X[2i] + X[2i+2]) / 2), over the crop
    qo0 = 1 - qe0
    qo = np.arange(2 + ((2 - qo0) % 2), 2 + n, 2)
    e[:, qo] += (e[:, qo - 1] + e[:, qo + 1]) >> 1
    return e[:, 2 : 2 + n]


def inverse_dwt53(ll: np.ndarray, bands: list,
                  origins: list | None = None) -> np.ndarray:
    """Multi-level 2D synthesis: ``bands`` is [(HL, LH, HH), …] from
    the COARSEST level to the finest; ``origins`` gives the ABSOLUTE
    (x0, y0) of each level's target LL rect (None = all zero — a
    tile at the canvas origin).  2D_SR order: interleave by absolute
    parity, then horizontal 1D_SR on rows, then vertical on columns
    (the inverse of analysis' vertical-then-horizontal)."""
    cur = ll
    for li, (hl, lh, hh) in enumerate(bands):
        ax0, ay0 = (0, 0) if origins is None else origins[li]
        h = cur.shape[0] + lh.shape[0]
        w = cur.shape[1] + hl.shape[1]
        a = np.zeros((h, w), dtype=np.int32)
        pr, pc = ay0 % 2, ax0 % 2  # local slot of the lowpass rows/cols
        a[pr::2, pc::2] = cur
        a[pr::2, 1 - pc::2] = hl
        a[1 - pr::2, pc::2] = lh
        a[1 - pr::2, 1 - pc::2] = hh
        a = _isr_rows(a, ax0)
        a = np.ascontiguousarray(_isr_rows(a.T, ay0).T)
        cur = a
    return cur


# ------------------------------------------------------------------
# codestream structures


class _Siz:
    """SIZ fields; ``w``/``h`` are the RASTER dims (Xsiz - XOsiz,
    Ysiz - YOsiz); ``x0``/``y0`` the image-area offsets and
    ``xt0``/``yt0`` the tile-grid offsets on the reference grid
    (§A.5.1, r15 tail — offsets were previously a decline)."""

    __slots__ = (
        "w", "h", "x0", "y0", "xt", "yt", "xt0", "yt0",
        "ncomp", "depths", "signed", "rx", "ry",
    )


def _tile_grid(siz: _Siz):
    """(ntx, nty) per B-5: tiles counted from the tile-grid origin
    to the image's far edge."""
    ntx = -(-(siz.x0 + siz.w - siz.xt0) // siz.xt)
    nty = -(-(siz.y0 + siz.h - siz.yt0) // siz.yt)
    return ntx, nty


def _tile_rect(siz: _Siz, t: int):
    """ABSOLUTE rect (x0, y0, x1, y1) of tile index t (raster
    order), clipped to the image area (B-7)."""
    ntx, _ = _tile_grid(siz)
    ty, tx = divmod(t, ntx)
    x0 = max(siz.xt0 + tx * siz.xt, siz.x0)
    y0 = max(siz.yt0 + ty * siz.yt, siz.y0)
    x1 = min(siz.xt0 + (tx + 1) * siz.xt, siz.x0 + siz.w)
    y1 = min(siz.yt0 + (ty + 1) * siz.yt, siz.y0 + siz.h)
    return x0, y0, x1, y1


class _Cod:
    __slots__ = (
        "prog", "layers", "mct", "levels", "xcb", "ycb",
        "cbstyle", "transform", "sop", "eph", "prec",
    )


class _Cst:
    """Per-component coding style: COD's SPcod defaults, overridden
    by a main-header COC (§A.6.2) for that component.  The wavelet
    transform stays in :class:`_Cod` — a COC declaring a different
    transform than COD declines (mixed per-component transforms are
    out of scope; see parse_codestream)."""

    __slots__ = ("levels", "xcb", "ycb", "cbstyle", "prec")


class _Band:
    """One subband of one component at one resolution, carrying its
    ABSOLUTE band-coordinate origin (B-15): the code-block partition
    anchors at multiples of the nominal size on the band's own
    coordinate axes starting from ZERO (§B.7), so a band whose
    origin is not grid-aligned has a NARROWER first row/column of
    code-blocks — real multi-tile streams hit this whenever the
    tile size over 2^nb is not a multiple of the code-block size
    (review r15)."""

    __slots__ = (
        "orient", "x0", "y0", "w", "h", "mb", "xcb", "ycb",
        "cx0", "cy0", "ncx", "ncy", "cblks", "incl_tree", "zbp_tree",
    )

    def __init__(self, orient, x0, y0, w, h, mb, xcb, ycb):
        self.orient = orient
        self.x0 = x0
        self.y0 = y0
        self.w = w
        self.h = h
        self.mb = mb
        self.xcb = xcb  # EFFECTIVE exponents (precinct-clamped)
        self.ycb = ycb
        self.cx0, self.ncx = _cblk_grid(x0, w, xcb)
        self.cy0, self.ncy = _cblk_grid(y0, h, ycb)
        n = self.ncx * self.ncy
        # per cblk: [included, missing, numpasses, lblock, segments]
        self.cblks = [[False, 0, 0, 3, []] for _ in range(n)]
        if n:
            self.incl_tree = _TagTree(self.ncx, self.ncy)
            self.zbp_tree = _TagTree(self.ncx, self.ncy)


def _u8(d, p):
    return d[p]


def _u16(d, p):
    return (d[p] << 8) | d[p + 1]


def _u32(d, p):
    return struct.unpack_from(">I", d, p)[0]


def parse_codestream(cs: bytes):
    """Main header + tile data → (siz, cod, csty, exps, mants,
    guard, [tile_bytes per tile, raster order]); ``csty`` is the
    per-component coding style (COD defaults + COC overrides)."""
    if len(cs) < 4 or cs[:2] != b"\xff\x4f":
        raise Jp2Error("not a JPEG 2000 codestream")
    pos = 2
    siz = cod = None
    exps = None
    mants = None
    qderived = None
    qcc: dict = {}
    coc: dict = {}
    guard = 0
    tile_parts: dict = {}
    n = len(cs)
    while pos + 2 <= n:
        marker = _u16(cs, pos)
        pos += 2
        if marker == 0xFFD9:  # EOC
            break
        if marker == 0xFF93:
            raise Jp2Error("SOD before SOT")
        if pos + 2 > n:
            raise Jp2Error("truncated marker segment")
        ln = _u16(cs, pos)
        if ln < 2 or pos + ln > n:
            raise Jp2Error("marker length out of range")
        body = cs[pos + 2 : pos + ln]
        if tile_parts and marker in (
            0xFF51, 0xFF52, 0xFF53, 0xFF5C, 0xFF5D, 0xFF5E, 0xFF5F,
            0xFF60, 0xFF61,
        ):
            # the main header ends at the first SOT (§A.3); a
            # decode-altering marker between tile-parts would apply
            # retroactively to already-captured tile bytes and
            # fabricate a raster (review r15 — the hole predates COC
            # but per-component overrides made it decode-altering).
            # Non-semantic markers (COM/TLM/PLT) keep skipping.
            raise Jp2Error("main-header marker after first tile-part")
        if marker == 0xFF51:  # SIZ
            if len(body) < 36:
                raise Jp2Error("truncated SIZ")
            siz = _Siz()
            rsiz = _u16(body, 0)
            xs = _u32(body, 2)   # Xsiz: far edge on the reference grid
            ys = _u32(body, 6)
            xo, yo = _u32(body, 10), _u32(body, 14)
            xt, yt = _u32(body, 18), _u32(body, 22)
            xto, yto = _u32(body, 26), _u32(body, 30)
            siz.ncomp = _u16(body, 34)
            if xt == 0 or yt == 0:
                raise Jp2Error("tile size out of range")
            # image/tile offsets (§A.5.1, r15 tail): the image area
            # is [XOsiz, Xsiz) x [YOsiz, Ysiz); the tile grid
            # anchors at (XTOsiz, YTOsiz) which must sit at or
            # before the image origin with the first tile
            # overlapping it — violations decline
            if not (xo < xs and yo < ys):
                raise Jp2Error("dimensions out of range")
            if not (xto <= xo and yto <= yo):
                raise Jp2Error("tile grid origin after image origin")
            if not (xto + xt > xo and yto + yt > yo):
                raise Jp2Error("first tile misses the image area")
            siz.x0, siz.y0 = xo, yo
            siz.xt0, siz.yt0 = xto, yto
            siz.xt, siz.yt = xt, yt
            siz.w = xs - xo   # RASTER dims
            siz.h = ys - yo
            # tile grid (r15): xt/yt smaller than the image spell a
            # regular grid with ragged edges; each tile decodes
            # independently (in ABSOLUTE coordinates) and stitches
            # by position
            if siz.ncomp not in (1, 3):
                raise Jp2Error("component count out of scope")
            if xs > _MAX_DIM or ys > _MAX_DIM:
                raise Jp2Error("dimensions out of range")
            if siz.w * siz.h * siz.ncomp > _MAX_SAMPLES:
                raise Jp2Error("image too large")
            siz.depths, siz.signed = [], []
            siz.rx, siz.ry = [], []
            for c in range(siz.ncomp):
                if len(body) < 36 + 3 * (c + 1):
                    raise Jp2Error("truncated SIZ components")
                ssiz = body[36 + 3 * c]
                xr, yr = body[37 + 3 * c], body[38 + 3 * c]
                # component subsampling (r15 tail): a component's
                # sample at (cx, cy) covers the reference-grid cell
                # [cx*XRsiz, (cx+1)*XRsiz) x [...] — the 4:2:0
                # chroma spelling.  Factors {1, 2, 4} with
                # Rsiz-aligned offsets are in scope (rendering
                # replicates each sample over its grid cell);
                # anything else declines by name
                if xr not in (1, 2, 4) or yr not in (1, 2, 4):
                    raise Jp2Error("subsampling factor out of scope")
                # the image-area ORIGIN must sit on a cell boundary
                # or the first reference columns/rows have no
                # covering sample (tile boundaries need no
                # alignment — ceil-division partitions the samples;
                # the far edge just crops the last cell)
                if xo % xr or yo % yr:
                    raise Jp2Error(
                        "subsampling-unaligned offsets out of scope"
                    )
                siz.rx.append(xr)
                siz.ry.append(yr)
                siz.depths.append((ssiz & 0x7F) + 1)
                siz.signed.append(bool(ssiz & 0x80))
                if siz.depths[-1] > 16:
                    raise Jp2Error("sample depth out of scope")
        elif marker == 0xFF52:  # COD
            if len(body) < 10:
                raise Jp2Error("truncated COD")
            cod = _Cod()
            scod = body[0]
            cod.prec = None
            cod.sop = bool(scod & 0x02)
            cod.eph = bool(scod & 0x04)
            cod.prog = body[1]
            cod.layers = _u16(body, 2)
            cod.mct = body[4]
            cod.levels = body[5]
            cod.xcb = (body[6] & 0x0F) + 2
            cod.ycb = (body[7] & 0x0F) + 2
            cod.cbstyle = body[8]
            cod.transform = body[9]
            if cod.prog > 4:
                raise Jp2Error("unknown progression order")
            if not (1 <= cod.layers <= _MAX_LAYERS):
                raise Jp2Error("layer count out of range")
            if cod.levels > 32:
                raise Jp2Error("decomposition levels out of range")
            if cod.xcb > 10 or cod.ycb > 10 or cod.xcb + cod.ycb > 12:
                raise Jp2Error("code-block size out of range")
            if cod.transform > 1:
                raise Jp2Error("unknown wavelet transform")
            if scod & 0x01:
                # explicit precinct sizes: one byte per resolution
                # (PPx low nibble, PPy high nibble).  Accepted when
                # every resolution fits ONE precinct (the spelling
                # size-declaring encoders use for whole-image
                # precincts); true multi-precinct grids decline in
                # decode_tile's per-resolution check
                if len(body) < 10 + cod.levels + 1:
                    raise Jp2Error("truncated precinct sizes")
                cod.prec = [
                    (b_ & 0x0F, b_ >> 4)
                    for b_ in body[10 : 10 + cod.levels + 1]
                ]
        elif marker == 0xFF5C:  # QCD
            if not body:
                raise Jp2Error("truncated QCD")
            sq = body[0]
            guard = sq >> 5
            style = sq & 0x1F
            if style == 0:
                # no quantization (reversible path): 8-bit fields,
                # exponent in the top 5 bits
                exps = [b >> 3 for b in body[1:]]
                mants = None
            elif style == 2:
                # scalar expounded: 16-bit (eps << 11) | mu per band
                if (len(body) - 1) % 2:
                    raise Jp2Error("truncated QCD fields")
                vals = [
                    _u16(body, i) for i in range(1, len(body) - 1, 2)
                ]
                if not vals:
                    raise Jp2Error("truncated QCD fields")
                exps = [v >> 11 for v in vals]
                mants = [v & 0x7FF for v in vals]
            elif style == 1:
                # scalar derived: ONE (eps0, mu0) field; every band
                # derives eps_b = eps0 - NL + nsb (§E.1.1 Eq E-5,
                # nsb = the band's decomposition-level count) —
                # expanded after the header loop once cod.levels is
                # known (QCD may precede COD)
                if len(body) < 3:
                    raise Jp2Error("truncated QCD fields")
                v = _u16(body, 1)
                qderived = (v >> 11, v & 0x7FF)
            else:
                raise Jp2Error(
                    "reserved quantization style out of scope"
                )
        elif marker == 0xFF5D:  # QCC (main header, r15)
            # per-component quantization override — the spelling
            # lossy encoders use to quantize chroma coarser than
            # luma; same field layout as QCD after the component
            # index (ncomp <= 3 in scope, so the index is 1 byte)
            if siz is None:
                raise Jp2Error("QCC before SIZ")
            if len(body) < 2:
                raise Jp2Error("truncated QCC")
            ci = body[0]
            if ci >= siz.ncomp:
                raise Jp2Error("QCC component out of range")
            sq = body[1]
            g_c = sq >> 5
            style = sq & 0x1F
            fields = body[2:]
            if style == 0:
                qcc[ci] = ([b >> 3 for b in fields], None, g_c)
            elif style == 2:
                if len(fields) % 2 or not fields:
                    raise Jp2Error("truncated QCC fields")
                vals = [
                    _u16(fields, i) for i in range(0, len(fields) - 1, 2)
                ]
                qcc[ci] = (
                    [v >> 11 for v in vals],
                    [v & 0x7FF for v in vals],
                    g_c,
                )
            elif style == 1:
                if len(fields) < 2:
                    raise Jp2Error("truncated QCC fields")
                v = _u16(fields, 0)
                qcc[ci] = (None, (v >> 11, v & 0x7FF), g_c)
            else:
                raise Jp2Error(
                    "reserved quantization style out of scope"
                )
        elif marker == 0xFF53:  # COC (main header, r15 tail)
            # per-component coding-style override (§A.6.2): levels,
            # code-block size/style and precincts may differ per
            # component; progression/layers/MCT stay in COD.  The
            # transform byte is kept for a post-loop cross-check
            # against COD (which may legally follow this marker) —
            # mixed per-component transforms decline by name.
            if siz is None:
                raise Jp2Error("COC before SIZ")
            if len(body) < 7:
                raise Jp2Error("truncated COC")
            ci = body[0]
            if ci >= siz.ncomp:
                raise Jp2Error("COC component out of range")
            scoc = body[1]
            if scoc > 1:
                raise Jp2Error("reserved COC style")
            o = _Cst()
            o.levels = body[2]
            o.xcb = (body[3] & 0x0F) + 2
            o.ycb = (body[4] & 0x0F) + 2
            o.cbstyle = body[5]
            o.prec = None
            if o.levels > 32:
                raise Jp2Error("decomposition levels out of range")
            if o.xcb > 10 or o.ycb > 10 or o.xcb + o.ycb > 12:
                raise Jp2Error("code-block size out of range")
            if scoc & 1:
                if len(body) < 7 + o.levels + 1:
                    raise Jp2Error("truncated COC precinct sizes")
                o.prec = [
                    (b_ & 0x0F, b_ >> 4)
                    for b_ in body[7 : 7 + o.levels + 1]
                ]
            coc[ci] = (o, body[6])
        elif marker in (0xFF5E, 0xFF5F, 0xFF60, 0xFF61):
            # RGN / POC / PPM / PPT
            raise Jp2Error("ROI/POC/packed-header overrides out of scope")
        elif marker == 0xFF90:  # SOT
            if siz is None or cod is None or (
                exps is None and qderived is None
            ):
                raise Jp2Error("SOT before SIZ/COD/QCD")
            if len(body) < 8:
                raise Jp2Error("truncated SOT")
            isot = _u16(body, 0)
            psot = _u32(body, 2)
            ntx_, nty_ = _tile_grid(siz)
            ntiles = ntx_ * nty_
            if isot >= ntiles:
                raise Jp2Error("tile index out of range")
            # TPsot must equal the count of tile-parts already captured
            # for this tile (§A.4.2 numbers tile-parts 0..TNsot-1 in
            # stream order): out-of-order or duplicate TPsot would
            # concatenate reordered bitstream data into a wrong raster
            # instead of declining (ADVICE r15)
            if body[6] != len(tile_parts.get(isot, ())):
                raise Jp2Error("tile-part order mismatch")
            sot_start = pos - 2
            # tile-part header: markers until SOD
            tp = pos + ln
            while True:
                if tp + 2 > n:
                    raise Jp2Error("truncated tile-part header")
                m2 = _u16(cs, tp)
                if m2 == 0xFF93:  # SOD
                    tp += 2
                    break
                if m2 in (0xFF52, 0xFF53, 0xFF5C, 0xFF5D, 0xFF5E,
                          0xFF5F, 0xFF61):
                    raise Jp2Error("tile-part overrides out of scope")
                if tp + 4 > n:
                    raise Jp2Error("truncated tile-part header")
                tp += 2 + _u16(cs, tp + 2)
            end = sot_start + psot if psot else n
            # Psot == 0: data runs to EOC (last 2 bytes) if present
            if psot == 0 and cs[-2:] == b"\xff\xd9":
                end = n - 2
            if end > n or end < tp:
                raise Jp2Error("tile-part length out of range")
            # §A.4.2 permits Psot=0 only for the LAST tile-part of the
            # codestream.  Packet bodies and headers are bit-stuffed
            # (a byte after 0xFF is < 0x90), so a raw SOT marker inside
            # the claimed span proves this tile-part swallowed later
            # tile-parts — decline instead of decoding their SOT/SOD
            # bytes as packet data (ADVICE r15)
            if psot == 0 and cs.find(b"\xff\x90", tp, end) != -1:
                raise Jp2Error("Psot=0 before further tile-parts")
            tile_parts.setdefault(isot, []).append(cs[tp:end])
            pos = end
            continue
        # COM/TLM/PLM/PLT/CRG and unknown segments: skip
        pos += ln
    if siz is None or cod is None or (exps is None and qderived is None):
        raise Jp2Error("missing SIZ/COD/QCD")
    if cod.mct == 1 and len(set(zip(siz.rx, siz.ry))) != 1:
        # the component transform is per-sample: it needs the three
        # planes on the same grid (§A.5.1/G) — declined at PARSE
        # time so a crafted stream cannot buy a full tier-1 decode
        # before the decline (review r15)
        raise Jp2Error("MCT with mixed subsampling out of scope")
    if not tile_parts:
        raise Jp2Error("no tile data")

    # per-component coding style: COD's SPcod defaults, COC
    # overrides.  COC's transform byte is cross-checked HERE (COD
    # may follow COC in the main header): a component spelled with a
    # different wavelet than the tile would need per-component
    # synthesis/quantization coherence this scope declines.
    csty = []
    for c in range(siz.ncomp):
        if c in coc:
            o, tr = coc[c]
            if tr != cod.transform:
                raise Jp2Error(
                    "per-component transform out of scope"
                )
            csty.append(o)
        else:
            o = _Cst()
            o.levels = cod.levels
            o.xcb = cod.xcb
            o.ycb = cod.ycb
            o.cbstyle = cod.cbstyle
            o.prec = cod.prec
            csty.append(o)

    def _expand_derived(e0: int, m0: int, levels: int):
        # expand derived signalling now that the component's level
        # count is known: our resolution index r (1 = coarsest) has
        # nsb = NL - r + 1 decompositions, so eps_b = eps0 - NL +
        # nsb = eps0 - r + 1
        ex = [e0] + [
            e0 - r + 1 for r in range(1, levels + 1) for _ in range(3)
        ]
        if min(ex) < 1:
            raise Jp2Error("derived quantization exponent underflow")
        return ex, [m0] * len(ex)

    # per-component quantization (QCD default + QCC overrides) with
    # transform/quantization coherence (§A.6.4) checked per
    # component: the reversible 5/3 pairs with "no quantization",
    # the irreversible 9/7 with scalar quantization — mismatched
    # spellings decline rather than guess a step size.  The field
    # count is checked against the COMPONENT's own level count (a
    # COC may lower it below COD's; extra QCD fields are ignored
    # per §A.6.4, so the shared-QCD prefix spelling decodes)
    exps_pc, mants_pc, guard_pc = [], [], []
    for c in range(siz.ncomp):
        if c in qcc:
            e_c, m_c, g_c = qcc[c]
            if e_c is None:  # derived override
                e_c, m_c = _expand_derived(*m_c, csty[c].levels)
        else:
            e_c, m_c, g_c = exps, mants, guard
            if qderived is not None:
                e_c, m_c = _expand_derived(*qderived, csty[c].levels)
        if len(e_c) < 3 * csty[c].levels + 1:
            raise Jp2Error("QCD exponent count mismatch")
        if cod.transform == 0 and m_c is None:
            raise Jp2Error(
                "9/7 without scalar quantization out of scope"
            )
        if cod.transform == 1 and m_c is not None:
            raise Jp2Error("quantized reversible out of scope")
        exps_pc.append(e_c)
        mants_pc.append(m_c)
        guard_pc.append(g_c)
    exps, mants, guard = exps_pc, mants_pc, guard_pc
    # per-tile data, tile-parts concatenated in stream order (the
    # order TPsot ascends in a conformant stream); every tile of the
    # declared grid must be present — a partial grid would stitch a
    # fabricated (zero) region into the raster
    ntx_, nty_ = _tile_grid(siz)
    ntiles = ntx_ * nty_
    tiles = []
    for t in range(ntiles):
        parts = tile_parts.get(t)
        if not parts:
            raise Jp2Error("missing tile data")
        tiles.append(b"".join(parts))
    return siz, cod, csty, exps, mants, guard, tiles


def _tile_rects(x0: int, x1: int, y0: int, y1: int, levels: int):
    """Per-level ABSOLUTE rects: index k is the LL_k rect (B-14,
    with the tile-component rect as level 0): each level halves by
    ceil on both edges."""
    rects = [(x0, x1, y0, y1)]
    for _ in range(levels):
        a0, a1, b0, b1 = rects[-1]
        rects.append(
            (-(-a0 // 2), -(-a1 // 2), -(-b0 // 2), -(-b1 // 2))
        )
    return rects


def _ecnt(a0: int, a1: int) -> int:
    """Count of EVEN integers in [a0, a1) — the lowpass sample count
    of that span (B-15)."""
    return -(-a1 // 2) - (-(-a0 // 2))


def _comp_span(v0: int, v1: int, r: int):
    """Project an absolute reference-grid span onto a component's
    coordinate axis (B-12: ceil-division by the subsampling factor)
    — ONE definition shared by the tile geometry, the plane dims
    and the stitching slices so they can never drift."""
    return -(-v0 // r), -(-v1 // r)


def _cblk_grid(o: int, span: int, exp: int):
    """Absolute code-block grid over a band span [o, o+span): the
    partition anchors at multiples of 2^exp from absolute zero
    (§B.7); returns (first_cell_index, cell_count) — shared by
    _Band and the resource gate so the two can never drift."""
    if span <= 0:
        return o >> exp, 0
    return o >> exp, -(-(o + span) // (1 << exp)) - (o >> exp)


def _band_rects(rects, nb: int):
    """Band rects (x0, y0, w, h) for (HL, LH, HH) at decomposition
    level nb (they split rects[nb-1]); B-15: the high half's origin
    is floor(parent/2), the low half's is ceil(parent/2)."""
    a0, a1, b0, b1 = rects[nb - 1]
    lx0, lw = -(-a0 // 2), _ecnt(a0, a1)
    hx0, hw = a0 // 2, (a1 - a0) - _ecnt(a0, a1)
    ly0, lh_ = -(-b0 // 2), _ecnt(b0, b1)
    hy0, hh_ = b0 // 2, (b1 - b0) - _ecnt(b0, b1)
    return (
        (hx0, ly0, hw, lh_),   # HL: high in x, low in y
        (lx0, hy0, lw, hh_),   # LH
        (hx0, hy0, hw, hh_),   # HH
    )


# ------------------------------------------------------------------
# inverse 9/7 DWT (§F.4, irreversible) — float64 lifting.
#
# Lifting coefficients per Table F.4; spec subband normalization is
# lowpass DC gain 1 / highpass Nyquist gain 2 (the same convention as
# the 5/3 filters and the 0/1/1/2 log2 band gains), which fixes the
# final analysis scaling at low x (1/K), high x K — the unscaled
# lifting steps have DC gain exactly K on the low branch and Nyquist
# gain 2/K on the high branch (derivable by pushing a constant /
# alternating signal through the four steps).  tests pin both
# directions against a direct FIR convolution with the published taps.

_K97_A = -1.586134342059924
_K97_B = -0.052980118572961
_K97_G = 0.882911075530934
_K97_D = 0.443506852043971
_K97_K = 1.230174104914001


def _isr97_rows(a: np.ndarray, i0: int = 0) -> np.ndarray:
    """1D_SR (§F.4.8.2) along axis 1 over ABSOLUTE indices
    [i0, i0+n): undo the K scaling by absolute parity, then the four
    lifting steps in reverse order, on a once-extended signal (the
    Table F.6 approach: extend by 4 each side, shrink the valid
    window by one per lifting step, crop)."""
    n = a.shape[1]
    if n == 0:
        return a  # empty span (deep level of a 1-wide ragged tile)
    if n == 1:
        if i0 % 2 == 0:
            return a
        raise Jp2Error(
            "odd-parity single-sample dimension out of scope"
        )
    e = _ext_ws(a, 4).astype(np.float64)
    m = n + 8
    s0 = i0 - 4  # absolute index of e[:, 0]
    qe = np.arange((-s0) % 2, m, 2)      # absolute-even locals
    qo = np.arange(1 - (-s0) % 2, m, 2)  # absolute-odd locals
    e[:, qe] *= _K97_K
    e[:, qo] *= 1.0 / _K97_K
    for k, (qs, coef) in enumerate(
        ((qe, _K97_D), (qo, _K97_G), (qe, _K97_B), (qo, _K97_A)), 1
    ):
        qs = qs[(qs >= k) & (qs < m - k)]
        e[:, qs] -= coef * (e[:, qs - 1] + e[:, qs + 1])
    return e[:, 4 : 4 + n]


def inverse_dwt97(ll: np.ndarray, bands: list,
                  origins: list | None = None) -> np.ndarray:
    """Multi-level 2D synthesis, float64; same absolute-parity
    interleave + HOR then VER order as :func:`inverse_dwt53`."""
    cur = ll
    for li, (hl, lh, hh) in enumerate(bands):
        ax0, ay0 = (0, 0) if origins is None else origins[li]
        h = cur.shape[0] + lh.shape[0]
        w = cur.shape[1] + hl.shape[1]
        a = np.zeros((h, w), dtype=np.float64)
        pr, pc = ay0 % 2, ax0 % 2
        a[pr::2, pc::2] = cur
        a[pr::2, 1 - pc::2] = hl
        a[1 - pr::2, pc::2] = lh
        a[1 - pr::2, 1 - pc::2] = hh
        a = _isr97_rows(a, ax0)
        a = np.ascontiguousarray(_isr97_rows(a.T, ay0).T)
        cur = a
    return cur


def decode_tile(siz: _Siz, cod: _Cod, csty, exps, mants, guard,
                data: bytes, x0: int, y0: int, x1: int, y1: int):
    """Packet walk (tier-2) + tier-1 per code-block for ONE tile
    covering the ABSOLUTE reference-grid rect [x0, x1) x [y0, y1) →
    list of per-component sample arrays (int32 for 5/3, float64 for
    9/7; after IDWT, before MCT/shift).  ``csty`` carries the
    per-component coding style (levels, code-block size/style,
    precincts) — COD defaults unless a COC overrode them.  All
    geometry — subband rects, DWT parity, code-block grids,
    precinct spans — anchors to absolute coordinates (B-14/B-15,
    §B.6/B.7, §F.3.8; review r15)."""
    # per-component decomposition geometry: level counts may differ
    # (COC) and subsampling divides the tile rect per component
    # (B-12: tcx0 = ceil(tx0/XRsiz)), so per-level rects are per
    # component; rects_pc[c][k] is the LL_k rect and the
    # resolution-r grid is rects_pc[c][nl-r]
    rects_pc = []
    for c in range(siz.ncomp):
        ca0, ca1 = _comp_span(x0, x1, siz.rx[c])
        cb0, cb1 = _comp_span(y0, y1, siz.ry[c])
        rects_pc.append(
            _tile_rects(ca0, ca1, cb0, cb1, csty[c].levels)
        )

    def _eff_cb(c: int, r: int):
        """Effective code-block exponents for component c at
        resolution r: precinct sizes clamp them (xcb' = min(xcb,
        PPx - (r>0))); only single-precinct-per-resolution layouts
        are in scope.  The span check uses ABSOLUTE grid coords —
        the precinct partition anchors at (0, 0) of the resolution
        grid (§B.6), so a tile can straddle a precinct boundary
        even when it is narrower than one precinct; with the
        DEFAULT 2^15 precincts this happens once coordinates cross
        32768 (declines rather than misparse)."""
        st = csty[c]
        nl_c = st.levels
        gx0, gx1, gy0, gy1 = rects_pc[c][nl_c - r]
        if st.prec is None:
            ppx = ppy = 15  # default: PPx = PPy = 15 (§A.6.1)
        else:
            ppx, ppy = st.prec[r]
        if gx1 > gx0 and gy1 > gy0 and (
            (gx1 - 1) >> ppx != gx0 >> ppx
            or (gy1 - 1) >> ppy != gy0 >> ppy
        ):
            raise Jp2Error("multiple precincts out of scope")
        if st.prec is None:
            return st.xcb, st.ycb
        ex = min(st.xcb, ppx - (1 if r else 0))
        ey = min(st.ycb, ppy - (1 if r else 0))
        if ex < 2 or ey < 2:
            raise Jp2Error("precinct too small for a code-block")
        return ex, ey

    # crafted-header resource gate: the per-cblk state lists and tag
    # trees below are sized by SIZ/COD/COC fields alone, BEFORE any
    # packet byte is validated — so price the declared geometry
    # first.  Two bounds: an absolute count cap (worst-case
    # pre-packet memory), and a layers x count work cap (each
    # layer's non-empty packets visit every code-block of their
    # resolution once, so the product prices the packet-walk
    # ceiling).  Empty packets cost O(1) and are NOT gated by stream
    # length — a conformant ~80-byte blank page with thousands of
    # declared code-blocks decodes (review r15; an earlier
    # data-proportional gate over-declined it).
    def _cblk_count(bx0, by0, bw, bh, ex, ey):
        return _cblk_grid(bx0, bw, ex)[1] * _cblk_grid(by0, bh, ey)[1]

    total_cblks = 0
    for c in range(siz.ncomp):
        nl_c = csty[c].levels
        for r in range(nl_c + 1):
            ex, ey = _eff_cb(c, r)
            if r == 0:
                a0, a1, b0, b1 = rects_pc[c][nl_c]
                brs = [(a0, b0, a1 - a0, b1 - b0)]
            else:
                brs = _band_rects(rects_pc[c], nl_c - r + 1)
            for bx0, by0, bw, bh in brs:
                total_cblks += _cblk_count(bx0, by0, bw, bh, ex, ey)
    if total_cblks > _MAX_CBLKS:
        raise Jp2Error("code-block count out of range")
    if cod.layers * total_cblks > _MAX_CBLK_VISITS:
        raise Jp2Error("layer/code-block work out of range")

    comps = []
    for c in range(siz.ncomp):
        nl_c = csty[c].levels
        res = []
        mb0 = guard[c] + exps[c][0] - 1
        ex0, ey0 = _eff_cb(c, 0)
        a0, a1, b0, b1 = rects_pc[c][nl_c]
        res.append([_Band(0, a0, b0, a1 - a0, b1 - b0, mb0, ex0, ey0)])
        for r in range(1, nl_c + 1):
            # resolution r bands sit at decomposition level nb
            brs = _band_rects(rects_pc[c], nl_c - r + 1)
            exr, eyr = _eff_cb(c, r)
            bands = []
            for oi, (bx0, by0, bw, bh) in zip((1, 2, 3), brs):
                mb = guard[c] + exps[c][1 + 3 * (r - 1) + (oi - 1)] - 1
                bands.append(
                    _Band(oi, bx0, by0, bw, bh, mb, exr, eyr)
                )
            res.append(bands)
        comps.append(res)

    # packet iteration (single precinct per resolution).  With
    # per-component level counts the resolution loop runs to the MAX
    # count and a (r, c) pair only emits a packet when component c
    # HAS that resolution (§B.12: "only those packets that exist") —
    # the same guard OpenJPEG's packet iterator applies.
    nres_c = [csty[c].levels + 1 for c in range(siz.ncomp)]
    nres = max(nres_c)
    L, C = cod.layers, siz.ncomp
    if cod.prog == 0:  # LRCP
        order = [(l_, r, c) for l_ in range(L) for r in range(nres)
                 for c in range(C) if r < nres_c[c]]
    elif cod.prog == 1:  # RLCP
        order = [(l_, r, c) for r in range(nres) for l_ in range(L)
                 for c in range(C) if r < nres_c[c]]
    elif cod.prog == 2:  # RPCL
        order = [(l_, r, c) for r in range(nres) for c in range(C)
                 if r < nres_c[c] for l_ in range(L)]
    elif cod.prog == 3:  # PCRL
        order = [(l_, r, c) for c in range(C) for r in range(nres_c[c])
                 for l_ in range(L)]
    else:  # CPRL
        order = [(l_, r, c) for c in range(C) for r in range(nres_c[c])
                 for l_ in range(L)]

    pos = 0
    n = len(data)
    for layer, r, c in order:
        if cod.sop:
            if pos + 6 <= n and data[pos : pos + 2] == b"\xff\x91":
                pos += 6
        if pos >= n:
            raise Jp2Error("truncated packet stream")
        rd = _HeaderBits(data, pos)
        contribs = []  # (band, cblk, passes_added, [seg lengths])
        if rd.bit():  # non-empty packet
            for band in comps[c][r]:
                for ci in range(band.ncx * band.ncy):
                    cb = band.cblks[ci]
                    if not cb[0]:
                        inc = band.incl_tree.query(rd, ci, layer + 1)
                    else:
                        inc = bool(rd.bit())
                    if not inc:
                        continue
                    if not cb[0]:
                        cb[1] = band.zbp_tree.value(rd, ci)
                        cb[0] = True
                    # number of new passes (§B.10.6)
                    if not rd.bit():
                        np_ = 1
                    elif not rd.bit():
                        np_ = 2
                    else:
                        x = rd.bits(2)
                        if x < 3:
                            np_ = 3 + x
                        else:
                            x = rd.bits(5)
                            if x < 31:
                                np_ = 6 + x
                            else:
                                np_ = 37 + rd.bits(7)
                    while rd.bit():
                        cb[3] += 1
                        if cb[3] > 32:
                            raise Jp2Error("Lblock out of range")
                    # one length per codeword segment touched by the
                    # contribution (B.10.7: TERMALL/BYPASS terminate
                    # mid-block), bit width Lblock + floor(log2(new
                    # passes in that segment))
                    bypass = bool(csty[c].cbstyle & _CB_BYPASS)
                    termall = bool(csty[c].cbstyle & _CB_TERMALL)
                    groups = []  # (seg_id, n_new_passes)
                    for i in range(cb[2], cb[2] + np_):
                        s = _seg_index(i, bypass, termall)
                        if groups and groups[-1][0] == s:
                            groups[-1][1] += 1
                        else:
                            groups.append([s, 1])
                    lens = [
                        (s, rd.bits(cb[3] + g.bit_length() - 1))
                        for s, g in groups
                    ]
                    cb[2] += np_
                    if cb[2] > _MAX_PASSES:
                        raise Jp2Error("pass count out of range")
                    contribs.append((band, ci, lens))
        pos = rd.align()
        if cod.eph:
            if data[pos : pos + 2] != b"\xff\x92":
                raise Jp2Error("missing EPH")
            pos += 2
        for band, ci, lens in contribs:
            for sid, ln in lens:
                if pos + ln > n:
                    raise Jp2Error("packet body past end of data")
                band.cblks[ci][4].append((sid, data[pos : pos + ln]))
                pos += ln

    # tier-1 + IDWT per component
    out = []
    for c in range(siz.ncomp):
        res = comps[c]

        def band_array(band: _Band, bi: int) -> np.ndarray:
            arr = np.zeros((band.h, band.w), dtype=np.int32)
            for cy in range(band.ncy):
                for cx in range(band.ncx):
                    cb = band.cblks[cy * band.ncx + cx]
                    if not cb[0] or cb[2] == 0:
                        continue
                    # absolute code-block cell, clipped to the band
                    # rect: a grid-misaligned band origin makes the
                    # first row/column of code-blocks narrower
                    ax = (band.cx0 + cx) << band.xcb
                    ay = (band.cy0 + cy) << band.ycb
                    lox = max(ax, band.x0)
                    loy = max(ay, band.y0)
                    cw = min(ax + (1 << band.xcb), band.x0 + band.w) - lox
                    ch = min(ay + (1 << band.ycb), band.y0 + band.h) - loy
                    bx, by = lox - band.x0, loy - band.y0
                    arr[by : by + ch, bx : bx + cw] = decode_codeblock(
                        cb[4], cw, ch, band.orient, cb[1], cb[2],
                        band.mb, csty[c].cbstyle,
                    )
            if mants[c] is None:
                return arr
            # §E.1.1.2 dequantization with r = 0 (conformant decoder
            # choice; keeps fully-decoded goldens exact): v = q * Δb,
            # Δb = 2^(Rb - εb) * (1 + μb/2^11), Rb = depth + log2
            # band gain (LL 0, HL/LH 1, HH 2)
            gain = (
                0 if band.orient == 0 else (2 if band.orient == 3 else 1)
            )
            delta = (1.0 + mants[c][bi] / 2048.0) * 2.0 ** (
                siz.depths[c] + gain - exps[c][bi]
            )
            return arr.astype(np.float64) * delta

        ll = band_array(res[0][0], 0)
        bands = []
        nl_c = csty[c].levels
        for r in range(1, nl_c + 1):
            hl, lh, hh = (
                band_array(b, 1 + 3 * (r - 1) + oi)
                for oi, b in enumerate(res[r])
            )
            bands.append((hl, lh, hh))
        # synthesis level li composes the LL_(nl-1-li) rect — its
        # absolute origin fixes the interleave parity (§F.3.8)
        origins = [
            (rects_pc[c][nl_c - 1 - li][0],
             rects_pc[c][nl_c - 1 - li][2])
            for li in range(nl_c)
        ]
        out.append(
            inverse_dwt53(ll, bands, origins) if mants[c] is None
            else inverse_dwt97(ll, bands, origins)
        )
    return out


# ------------------------------------------------------------------
# JP2 container + API edge


def _jp2_codestream(data: bytes) -> bytes:
    """Unwrap a JP2 box container to its contiguous codestream; a bare
    codestream passes through."""
    if data[:2] == b"\xff\x4f":
        return data
    if data[:12] != b"\x00\x00\x00\x0cjP  \r\n\x87\n":
        raise Jp2Error("neither JP2 container nor codestream")
    pos, n = 12, len(data)
    while pos + 8 <= n:
        ln = _u32(data, pos)
        btype = data[pos + 4 : pos + 8]
        body_at = pos + 8
        if ln == 1:
            if pos + 16 > n:
                raise Jp2Error("truncated XLBox")
            ln = struct.unpack_from(">Q", data, pos + 8)[0]
            body_at = pos + 16
            if ln < 16:
                # below the XLBox header size: advancing by it would
                # desynchronize the walk into this box's own header
                raise Jp2Error("XLBox length out of range")
        elif ln == 0:
            ln = n - pos
        if ln < 8 or pos + ln > n:
            raise Jp2Error("box length out of range")
        if btype == b"jp2c":
            return data[body_at : pos + ln]
        pos += ln
    raise Jp2Error("no jp2c box")


def decode_jp2(data: bytes) -> np.ndarray:
    """JP2 container or raw codestream → (h, w) or (h, w, 3) uint8.
    Raises :class:`Jp2Error` on malformed/out-of-scope input."""
    cs = _jp2_codestream(data)
    siz, cod, csty, exps, mants, guard, tiles = parse_codestream(cs)
    # decode per tile and stitch by raster position (tiles are
    # independent by construction — the DWT and all coding state
    # reset at tile boundaries)
    dtype = np.float64 if cod.transform == 0 else np.int32
    # component planes live at COMPONENT resolution (subsampling
    # divides dims); each is replicated over its grid cells after
    # the (optional) MCT
    cdims = []
    corigin = []
    for c in range(siz.ncomp):
        ca0, ca1 = _comp_span(siz.x0, siz.x0 + siz.w, siz.rx[c])
        cb0, cb1 = _comp_span(siz.y0, siz.y0 + siz.h, siz.ry[c])
        cdims.append((cb1 - cb0, ca1 - ca0))
        corigin.append((ca0, cb0))
    planes = [
        np.zeros(cdims[c], dtype=dtype) for c in range(siz.ncomp)
    ]
    for t, tdata in enumerate(tiles):
        x0, y0, x1, y1 = _tile_rect(siz, t)
        tplanes = decode_tile(
            siz, cod, csty, exps, mants, guard, tdata, x0, y0, x1, y1
        )
        for c in range(siz.ncomp):
            # tile rects are absolute; component coords project
            # through the SAME _comp_span the tile geometry used,
            # relative to the plane origin
            ta0, ta1 = _comp_span(x0, x1, siz.rx[c])
            tb0, tb1 = _comp_span(y0, y1, siz.ry[c])
            ox, oy = corigin[c]
            planes[c][tb0 - oy : tb1 - oy, ta0 - ox : ta1 - ox] = (
                tplanes[c]
            )
    if cod.mct > 1:
        # reserved SGcod values: decline like prog/transform do —
        # treating them as no-MCT would emit Y/Cb/Cr as R/G/B
        # (review r14)
        raise Jp2Error("reserved MCT value")
    if cod.mct == 1:
        if siz.ncomp != 3:
            raise Jp2Error("MCT with non-3 components")
        # mixed subsampling under MCT declined at parse time
        y0, y1, y2 = planes
        if cod.transform == 1:
            g = y0 - ((y1 + y2) >> 2)  # inverse RCT (§G.3, reversible)
            r = y2 + g
            b = y1 + g
        else:
            # inverse ICT (§G.2, irreversible): Y/Cb/Cr floats; the
            # G-row constants derive exactly from the published
            # forward ones (0.114*1.772/0.587, 0.299*1.402/0.587)
            r = y0 + 1.402 * y2
            g = y0 - (0.114 * 1.772 / 0.587) * y1 - (
                0.299 * 1.402 / 0.587
            ) * y2
            b = y0 + 1.772 * y1
        planes = [r, g, b]
    if cod.transform == 0:
        # float synthesis output → integer samples (round half up;
        # fine-quantization streams land within ±0.5 of the original
        # so this recovers it exactly)
        planes = [
            np.floor(p + 0.5).astype(np.int32) for p in planes
        ]
    chans = []
    for c, p in enumerate(planes):
        depth = siz.depths[c]
        # unsigned: undo the DC level shift; signed: map the
        # [-2^(d-1), 2^(d-1)-1] range onto the unsigned gray scale —
        # the SAME +2^(d-1) offset either way (review r14: signed
        # samples previously clipped their negative half to black)
        p = p + (1 << (depth - 1))
        np.clip(p, 0, (1 << depth) - 1, out=p)
        if depth == 8:
            q = p.astype(np.uint8)
        elif depth < 8:
            # expand to full 8-bit range (bit replication)
            q = (p * 255 // ((1 << depth) - 1)).astype(np.uint8)
        else:
            q = (p >> (depth - 8)).astype(np.uint8)
        # subsampled components replicate over their reference-grid
        # cells (each sample covers Rsiz x Rsiz cells; the far edge
        # crops a partial last cell)
        rx, ry = siz.rx[c], siz.ry[c]
        if rx != 1 or ry != 1:
            q = np.repeat(np.repeat(q, ry, 0), rx, 1)[
                : siz.h, : siz.w
            ]
        chans.append(q)
    if len(chans) == 1:
        return chans[0]
    return np.stack(chans, axis=-1)


def decode_jp2_pdf(data: bytes):
    """API edge for the PDF ``/JPXDecode`` image lift: bytes →
    grayscale (h, w) or RGB (h, w, 3) uint8 raster, or ``None``
    (decline, never raise, never fabricate — the
    :func:`operators.jbig2.decode_jbig2_pdf` contract)."""
    try:
        return decode_jp2(data)
    except Exception:
        return None
