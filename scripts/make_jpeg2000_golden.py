#!/usr/bin/env python
"""Mint GOLDEN JPEG 2000 codestreams for tests/test_jpeg2000.py.

No JPEG 2000 implementation exists in this container (no OpenJPEG,
JasPer, PIL, ffmpeg or ImageMagick — verified r14), so this follows
the jbig2-golden discipline: an INDEPENDENT transcription of the
ITU-T T.800 *encoder* side — forward 5/3 lifting (F.4), tier-1
coding-pass ENCODING, tag-tree and packet-header emission (B.10),
marker assembly (A) — whose MQ arithmetic coder is the Annex E/C
ENCODER (INITENC / BYTEOUT / FLUSH) already transcribed for the
JBIG2 goldens (T.88 Annex E and T.800 Annex C specify the identical
coder; the shared encoder is imported from
scripts/make_jbig2_golden.py, NOT from the package).

This script must NOT import clickhouse_table_copier_spark.operators
.jpeg2000 — the bytes are minted by separately written code, so a
symmetric misreading of the stuffing/flush/length rules cannot
round-trip.  (The EBCOT context tables are published spec data
shared by nature; the MQ coder itself is pinned by the published
T.88 H.2 vector embedded in tests/test_jbig2.py.)

Usage: python scripts/make_jpeg2000_golden.py  →  python source to
paste into tests/test_jpeg2000.py.
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_jbig2_golden import QE, MQEncoder, new_states  # noqa: E402


class MQEncoderJ2K(MQEncoder):
    """Same coder, J2K termination: no JBIG2 FF AC terminator, and a
    trailing 0xFF is dropped (T.800 forbids a codeword segment ending
    in 0xFF; the decoder's BYTEIN resynthesizes the 1-bits)."""

    def flush(self) -> bytes:
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        data = self.out
        data = bytes(data[1:] if data[0] == 0 else data)
        while data and data[-1] == 0xFF:
            data = data[:-1]
        return data


# ------------------------------------------------------------- DWT
# Analysis is the exact inverse of the decoder's synthesis order:
# synthesis interleaves then filters rows (HOR_SR) then columns
# (VER_SR), so analysis filters columns (VER_SD) first, then rows.


def _ext_ws(a: np.ndarray, pad: int) -> np.ndarray:
    """Whole-sample-symmetric extension by ``pad`` columns each side
    (F.3.7: reflection about the boundary samples)."""
    n = a.shape[1]
    lp = n - 1
    js = np.arange(-pad, n + pad)
    if lp == 0:
        idx = np.zeros(js.shape, dtype=np.int64)
    else:
        t = np.mod(js, 2 * lp)
        idx = np.where(t > lp, 2 * lp - t, t)
    return a[:, idx]


def _fsd_rows(a: np.ndarray, i0: int = 0) -> np.ndarray:
    """1D_SD (F.3.8.1) along axis 1 over ABSOLUTE indices
    [i0, i0+n) → interleaved L/H (even ABSOLUTE index = lowpass).
    T.800 anchors the even/odd split to the reference grid, so a
    tile at an odd origin at some level swaps the roles — encoder
    and decoder must agree on the ABSOLUTE convention for streams
    to be conformant (review r15)."""
    n = a.shape[1]
    if n == 0:
        return a.copy()
    if n == 1:
        if i0 % 2 == 0:
            return a.copy()
        raise ValueError("odd-parity single-sample dimension")
    e = np.ascontiguousarray(_ext_ws(a, 2))
    m = n + 4
    s0 = i0 - 2
    qe0 = (-s0) % 2  # first local q with absolute index EVEN
    qo0 = 1 - qe0
    # Y[2i+1] = X[2i+1] - floor((X[2i] + X[2i+2]) / 2)
    qo = np.arange(qo0 if qo0 >= 1 else qo0 + 2, m - 1, 2)
    e[:, qo] -= (e[:, qo - 1] + e[:, qo + 1]) >> 1
    # Y[2i] = X[2i] + floor((Y[2i-1] + Y[2i+1] + 2) / 4)
    qe = np.arange(2 + ((2 - qe0) % 2), 2 + n, 2)
    e[:, qe] += (e[:, qe - 1] + e[:, qe + 1] + 2) >> 2
    return e[:, 2 : 2 + n]


def forward_dwt53(img: np.ndarray, levels: int,
                  x0: int = 0, y0: int = 0):
    """→ (LL, [(HL, LH, HH) coarsest→finest]); (x0, y0) is the
    tile's ABSOLUTE origin — parity decides which interleave slot
    is lowpass at every level."""
    cur = img.astype(np.int32)
    a0, b0 = x0, y0
    bands = []
    for _ in range(levels):
        a = _fsd_rows(cur.T, b0).T  # vertical first
        a = _fsd_rows(a, a0)  # then horizontal
        pr, pc = b0 % 2, a0 % 2  # local slot of the lowpass rows/cols
        bands.append((
            a[pr::2, 1 - pc::2],
            a[1 - pr::2, pc::2],
            a[1 - pr::2, 1 - pc::2],
        ))
        cur = np.ascontiguousarray(a[pr::2, pc::2])
        a0, b0 = -(-a0 // 2), -(-b0 // 2)
    bands.reverse()
    return cur, bands


# irreversible 9/7 analysis (T.800 F.4/Table F.4 lifting constants).
# Final scaling low x (1/K) / high x K puts the subbands in the
# spec's normalization (lowpass DC gain exactly 1, highpass Nyquist
# gain exactly 2 — same convention as the 5/3 pair and the 0/1/1/2
# log2 band gains).

_K97_A = -1.586134342059924
_K97_B = -0.052980118572961
_K97_G = 0.882911075530934
_K97_D = 0.443506852043971
_K97_K = 1.230174104914001


def _fsd97_rows(a: np.ndarray, i0: int = 0) -> np.ndarray:
    """1D_SD (F.4.8.1) along axis 1 (float64) over ABSOLUTE indices
    [i0, i0+n) → interleaved L/H (even ABSOLUTE index = lowpass); a
    once-extended signal (Table F.6 style: extend 4 each side,
    shrink the valid window per lifting step, crop + scale)."""
    n = a.shape[1]
    if n == 0:
        return a.astype(np.float64).copy()
    if n == 1:
        if i0 % 2 == 0:
            return a.astype(np.float64).copy()
        raise ValueError("odd-parity single-sample dimension")
    e = _ext_ws(a, 4).astype(np.float64)
    m = n + 8
    s0 = i0 - 4
    qe = np.arange((-s0) % 2, m, 2)      # absolute-even locals
    qo = np.arange(1 - (-s0) % 2, m, 2)  # absolute-odd locals
    for k, (qs, coef) in enumerate(
        ((qo, _K97_A), (qe, _K97_B), (qo, _K97_G), (qe, _K97_D)), 1
    ):
        qs = qs[(qs >= k) & (qs < m - k)]
        e[:, qs] += coef * (e[:, qs - 1] + e[:, qs + 1])
    out = e[:, 4 : 4 + n].copy()
    p = i0 % 2  # local slot of the first absolute-even sample
    out[:, p::2] *= 1.0 / _K97_K
    out[:, 1 - p::2] *= _K97_K
    return out


def forward_dwt97(img: np.ndarray, levels: int,
                  x0: int = 0, y0: int = 0):
    """→ (LL, [(HL, LH, HH) coarsest→finest]) float64 subbands;
    absolute-origin parity as in :func:`forward_dwt53`."""
    cur = img.astype(np.float64)
    a0, b0 = x0, y0
    bands = []
    for _ in range(levels):
        a = _fsd97_rows(cur.T, b0).T  # vertical first
        a = _fsd97_rows(a, a0)  # then horizontal
        pr, pc = b0 % 2, a0 % 2
        bands.append((
            a[pr::2, 1 - pc::2],
            a[1 - pr::2, pc::2],
            a[1 - pr::2, 1 - pc::2],
        ))
        cur = np.ascontiguousarray(a[pr::2, pc::2])
        a0, b0 = -(-a0 // 2), -(-b0 // 2)
    bands.reverse()
    return cur, bands


# ------------------------------------------------- EBCOT tables (§D)

_CTX_RL = 17
_CTX_UNI = 18


def _zc_lut():
    lut = np.zeros((4, 3, 3, 5), dtype=np.uint8)
    for hh in range(3):
        for vv in range(3):
            for dd in range(5):
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
                lut[1, vv, hh, dd] = c
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
_SC = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


def _fresh_states():
    st = new_states(5)[:19]
    st[0] = 4 << 1
    st[_CTX_RL] = 3 << 1
    st[_CTX_UNI] = 46 << 1
    return st


CB_BYPASS, CB_RESET, CB_TERMALL = 0x01, 0x02, 0x04
CB_VCAUSAL, CB_SEGSYM = 0x08, 0x20


def _seg_index(i, bypass, termall):
    if termall:
        return i
    if not bypass or i < 10:
        return 0
    k = i - 10
    return 1 + 2 * (k // 3) + (1 if k % 3 == 2 else 0)


def _raw_pass(i, bypass):
    return bypass and i >= 10 and (i - 10) % 3 != 2


def encode_codeblock(coeffs: np.ndarray, orient: int, mb: int,
                     cbstyle: int = 0):
    """Tier-1 encode → (missing_planes, numpasses, segments) where
    segments is an ordered list of (seg_id, npasses, bytes): one
    segment in default mode, one per pass under TERMALL, and the
    MQ/raw alternation of §D.4 under BYPASS."""
    h, w = coeffs.shape
    mag = np.abs(coeffs).astype(np.int64)
    neg = (coeffs < 0).astype(np.uint8)
    maxmag = int(mag.max()) if mag.size else 0
    if maxmag == 0:
        return None  # never included
    nplanes = maxmag.bit_length()
    assert nplanes <= mb, "coefficient exceeds Mb dynamic range"
    missing = mb - nplanes
    numpasses = 3 * nplanes - 2
    termall = bool(cbstyle & CB_TERMALL)
    vcausal = bool(cbstyle & CB_VCAUSAL)
    bypass = bool(cbstyle & CB_BYPASS)
    W = w + 2
    sig = bytearray(W * (h + 2))
    sgn = bytearray(W * (h + 2))
    visited = bytearray(W * (h + 2))
    refined = bytearray(w * h)
    magf = mag.reshape(-1)
    negf = neg.reshape(-1)
    states = _fresh_states()
    enc = MQEncoderJ2K()
    raww = None  # BitWriter during raw (bypass) passes
    segments = []  # (seg_id, npasses, bytes)

    def nbr_counts(px, y):
        hh = sig[px - 1] + sig[px + 1]
        if vcausal and (y & 3) == 3:
            vv = sig[px - W]
            dd = sig[px - W - 1] + sig[px - W + 1]
        else:
            vv = sig[px - W] + sig[px + W]
            dd = (sig[px - W - 1] + sig[px - W + 1]
                  + sig[px + W - 1] + sig[px + W + 1])
        return hh, vv, dd

    def sign_encode(px, x, y):
        hc = (sig[px - 1] * (1 - 2 * sgn[px - 1])
              + sig[px + 1] * (1 - 2 * sgn[px + 1]))
        vc = sig[px - W] * (1 - 2 * sgn[px - W])
        if not vcausal or (y & 3) != 3:
            vc += sig[px + W] * (1 - 2 * sgn[px + W])
        hc = max(-1, min(1, hc))
        vc = max(-1, min(1, vc))
        ctx, xb = _SC[(hc, vc)]
        enc.encode(states, ctx, int(negf[y * w + x]) ^ xb)

    zc = _ZC[orient]
    passes_done = 0
    plane = nplanes - 1
    ptype = 2
    cur_sid = 0
    seg_start = 0
    is_raw = False
    while passes_done < numpasses:
        sid = _seg_index(passes_done, bypass, termall)
        if sid != cur_sid:
            segments.append((
                cur_sid, passes_done - seg_start,
                raww.flush() if is_raw else enc.flush(),
            ))
            cur_sid = sid
            seg_start = passes_done
            is_raw = _raw_pass(passes_done, bypass)
            if is_raw:
                raww = BitWriter()
            else:
                enc = MQEncoderJ2K()
        if cbstyle & CB_RESET and passes_done:
            states = _fresh_states()
        if ptype == 0:
            for y0 in range(0, h, 4):
                y1 = min(y0 + 4, h)
                for x in range(w):
                    for y in range(y0, y1):
                        px = (y + 1) * W + x + 1
                        if sig[px]:
                            continue
                        hh, vv, dd = nbr_counts(px, y)
                        if not (hh | vv | dd):
                            continue
                        visited[px] = 1
                        b = int(magf[y * w + x] >> plane) & 1
                        if is_raw:
                            raww.put(b)
                        else:
                            enc.encode(
                                states, int(zc[hh, vv, min(dd, 4)]), b
                            )
                        if b:
                            if is_raw:
                                raww.put(int(negf[y * w + x]))
                            else:
                                sign_encode(px, x, y)
                            sgn[px] = negf[y * w + x]
                            sig[px] = 1
        elif ptype == 1:
            for y0 in range(0, h, 4):
                y1 = min(y0 + 4, h)
                for x in range(w):
                    for y in range(y0, y1):
                        px = (y + 1) * W + x + 1
                        if not sig[px] or visited[px]:
                            continue
                        i = y * w + x
                        if is_raw:
                            raww.put(int(magf[i] >> plane) & 1)
                            refined[i] = 1
                            continue
                        if refined[i]:
                            ctx = 16
                        else:
                            hh, vv, dd = nbr_counts(px, y)
                            ctx = 15 if (hh | vv | dd) else 14
                        enc.encode(
                            states, ctx, int(magf[i] >> plane) & 1
                        )
                        refined[i] = 1
        else:
            for y0 in range(0, h, 4):
                y1 = min(y0 + 4, h)
                full = (y1 - y0) == 4
                for x in range(w):
                    y = y0
                    if full:
                        ok = True
                        for yy in range(y0, y1):
                            px = (yy + 1) * W + x + 1
                            if sig[px] or visited[px]:
                                ok = False
                                break
                            hh, vv, dd = nbr_counts(px, yy)
                            if hh | vv | dd:
                                ok = False
                                break
                        if ok:
                            bits = [
                                int(magf[(y0 + k) * w + x] >> plane)
                                & 1
                                for k in range(4)
                            ]
                            if not any(bits):
                                enc.encode(states, _CTX_RL, 0)
                                continue
                            r = bits.index(1)
                            enc.encode(states, _CTX_RL, 1)
                            enc.encode(states, _CTX_UNI, (r >> 1) & 1)
                            enc.encode(states, _CTX_UNI, r & 1)
                            y = y0 + r
                            px = (y + 1) * W + x + 1
                            sign_encode(px, x, y)
                            sgn[px] = negf[y * w + x]
                            sig[px] = 1
                            y += 1
                    while y < y1:
                        px = (y + 1) * W + x + 1
                        if not sig[px] and not visited[px]:
                            hh, vv, dd = nbr_counts(px, y)
                            b = int(magf[y * w + x] >> plane) & 1
                            enc.encode(
                                states, int(zc[hh, vv, min(dd, 4)]), b
                            )
                            if b:
                                sign_encode(px, x, y)
                                sgn[px] = negf[y * w + x]
                                sig[px] = 1
                        y += 1
            if cbstyle & CB_SEGSYM:
                for b in (1, 0, 1, 0):
                    enc.encode(states, _CTX_UNI, b)
            visited = bytearray(W * (h + 2))
        passes_done += 1
        if ptype == 2:
            plane -= 1
            ptype = 0
        else:
            ptype += 1
    segments.append((
        cur_sid, numpasses - seg_start,
        raww.flush() if is_raw else enc.flush(),
    ))
    return missing, numpasses, segments


# --------------------------------------------------------- tier-2


class BitWriter:
    """Packet-header bit emitter with §B.10.1 stuffing (a byte after
    0xFF carries 7 bits); flush stuffs a trailing 0x00 after a final
    0xFF."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0
        self.prev = 0

    def put(self, b):
        limit = 7 if self.prev == 0xFF else 8
        self.cur = (self.cur << 1) | b
        self.n += 1
        if self.n == limit:
            self.out.append(self.cur)
            self.prev = self.cur
            self.cur = 0
            self.n = 0

    def bits(self, v, n):
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1)

    def flush(self) -> bytes:
        if self.n:
            limit = 7 if self.prev == 0xFF else 8
            self.out.append(self.cur << (limit - self.n))
            self.prev = self.out[-1]
            self.cur = 0
            self.n = 0
        if self.prev == 0xFF:
            self.out.append(0x00)
        return bytes(self.out)


class TagTreeEnc:
    def __init__(self, w, h, values):
        dims = [(w, h)]
        while dims[-1] != (1, 1):
            pw, ph = dims[-1]
            dims.append(((pw + 1) // 2, (ph + 1) // 2))
        vals = [list(values)]
        for lvl in range(1, len(dims)):
            pw, ph = dims[lvl - 1]
            lw, lh = dims[lvl]
            up = []
            for y in range(lh):
                for x in range(lw):
                    m = None
                    for dy in (0, 1):
                        for dx in (0, 1):
                            cy, cx = 2 * y + dy, 2 * x + dx
                            if cy < ph and cx < pw:
                                v = vals[lvl - 1][cy * pw + cx]
                                m = v if m is None else min(m, v)
                    up.append(m)
            vals.append(up)
        # node = [low, emitted_known, value]
        levels = [
            [[0, False, vals[lvl][i]] for i in range(lw * lh)]
            for lvl, (lw, lh) in enumerate(dims)
        ]
        self.paths = []
        for y in range(h):
            for x in range(w):
                path = []
                cx, cy = x, y
                for lvl, (lw, lh) in enumerate(dims):
                    path.append(levels[lvl][cy * lw + cx])
                    cx >>= 1
                    cy >>= 1
                path.reverse()
                self.paths.append(path)

    def encode(self, bw: BitWriter, leaf: int, threshold: int):
        low = 0
        for node in self.paths[leaf]:
            if node[0] < low:
                node[0] = low
            while not node[1] and node[0] < threshold:
                if node[0] < node[2]:
                    bw.put(0)
                    node[0] += 1
                else:
                    bw.put(1)
                    node[1] = True
            low = node[0]
            if not node[1]:
                return


def _numpasses_code(bw, n):
    if n == 1:
        bw.put(0)
    elif n == 2:
        bw.put(1)
        bw.put(0)
    elif n <= 5:
        bw.bits(3, 2)
        bw.bits(n - 3, 2)
    elif n <= 36:
        bw.bits(3, 2)
        bw.bits(3, 2)
        bw.bits(n - 6, 5)
    else:
        bw.bits(3, 2)
        bw.bits(3, 2)
        bw.bits(31, 5)
        bw.bits(n - 37, 7)


def _comp_span(v0, v1, r):
    """Absolute span -> component axis (B-12 ceil-division)."""
    return -(-v0 // r), -(-v1 // r)


def _tile_rects(x0, x1, y0, y1, levels):
    """Per-level ABSOLUTE rects (index k = LL_k rect, B-14): each
    level halves both edges by ceil."""
    rects = [(x0, x1, y0, y1)]
    for _ in range(levels):
        a0, a1, b0, b1 = rects[-1]
        rects.append(
            (-(-a0 // 2), -(-a1 // 2), -(-b0 // 2), -(-b1 // 2))
        )
    return rects


def _ecnt(a0, a1):
    """Count of EVEN integers in [a0, a1) (lowpass samples)."""
    return -(-a1 // 2) - (-(-a0 // 2))


def _band_rects(rects, nb):
    """(HL, LH, HH) band rects (x0, y0, w, h) at decomposition level
    nb (B-15): high half's origin floor(parent/2), low half's
    ceil(parent/2)."""
    a0, a1, b0, b1 = rects[nb - 1]
    lx0, lw = -(-a0 // 2), _ecnt(a0, a1)
    hx0, hw = a0 // 2, (a1 - a0) - _ecnt(a0, a1)
    ly0, lh = -(-b0 // 2), _ecnt(b0, b1)
    hy0, hh = b0 // 2, (b1 - b0) - _ecnt(b0, b1)
    return (
        (hx0, ly0, hw, lh),
        (lx0, hy0, lw, hh),
        (hx0, hy0, hw, hh),
    )


def encode_j2k(
    img: np.ndarray,
    levels: int = 1,
    xcb: int = 4,
    ycb: int = 4,
    layers: int = 1,
    prog: int = 0,
    mct: int = 0,
    cbstyle: int = 0,
    sop: bool = False,
    eph: bool = False,
    guard: int = 2,
    depth: int = 8,
    signed: bool = False,
    precincts: list | None = None,
    transform: int = 1,
    quant: list | None = None,
    qstyle: int = 2,
    tiles: tuple | None = None,
    qcc: dict | None = None,
    coc: dict | None = None,
    offsets: tuple | None = None,
    subsampling: list | None = None,
    size: tuple | None = None,
) -> bytes:
    """Image (h, w) or (h, w, 3) of ``depth``-bit samples → full
    codestream.  ``signed`` (gray only): samples are already centered
    (no DC level shift, Ssiz sign bit set).

    ``transform`` 1 = reversible 5/3 (default), 0 = irreversible 9/7
    — then ``quant`` must give (eps, mu) per subband in QCD order
    (LL, then HL/LH/HH coarsest→finest; len 3*levels+1), emitted as
    scalar-expounded QCD fields; coefficients are quantized
    round-to-nearest (q = sign * floor(|v|/Δ + 0.5), |error| ≤ Δ/2).

    ``offsets`` = (XOsiz, YOsiz, XTOsiz, YTOsiz) places the image
    area and tile grid on the reference grid (§A.5.1): ``img``
    supplies the samples of [XOsiz, Xsiz) x [YOsiz, Ysiz), and all
    tile/DWT/code-block geometry anchors to the ABSOLUTE
    coordinates, so an odd XOsiz genuinely changes the transform's
    parity.

    ``coc`` maps a component index to per-component coding-style
    overrides (keys ``levels``/``xcb``/``ycb``/``cbstyle``/``prec``,
    COD defaults otherwise), emitted as a main-header COC marker;
    the packet sequence runs the resolution loop to the max level
    count and emits packets only for components that have the
    resolution (§B.12), mirroring the decoder.  ``qcc`` overrides a
    component's quantization signalling: (eps, mu) pairs for 9/7
    (style 2) or bare eps ints for 5/3 (style 0) — required when a
    COC raises a component's level count past what QCD covers.

    ``subsampling`` = per-component (XRsiz, YRsiz) list; ``img``
    must then be a LIST of per-component arrays at COMPONENT dims
    (sample (cx, cy) covers the reference cells
    [cx*XRsiz, (cx+1)*XRsiz) x [...]), and ``size`` = (w, h) gives
    the raster dims (inferable only when component 0 is
    unsubsampled); MCT requires uniform factors."""
    shift = 0 if signed else 1 << (depth - 1)
    if isinstance(img, (list, tuple)):
        raw = list(img)
    elif img.ndim == 2:
        raw = [img]
    else:
        raw = [img[..., i] for i in range(img.shape[-1])]
    if transform == 0:
        assert quant is not None and len(quant) == 3 * levels + 1
        comps = [a.astype(np.float64) - shift for a in raw]
        if mct and len(comps) == 3:
            r, g, b = comps
            # forward ICT (G.1)
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = (b - y) / 1.772
            cr = (r - y) / 1.402
            comps = [y, cb, cr]
    else:
        # DC level shift FIRST, then forward RCT (G.2) — the decoder
        # inverts in the opposite order (inverse RCT, then unshift)
        comps = [a.astype(np.int32) - shift for a in raw]
        if mct and len(comps) == 3:
            r, g, b = comps
            comps = [(r + 2 * g + b) >> 2, b - g, r - g]  # Y, Cb, Cr
    ncomp = len(comps)
    subs = subsampling or [(1, 1)] * ncomp
    if mct:
        assert len(set(subs)) == 1, "MCT needs uniform subsampling"
    if size is not None:
        w, h = size
    else:
        assert subs[0] == (1, 1), "size= required when comp 0 subsamples"
        h, w = comps[0].shape

    # per-subband exponents: eps = depth + gain (LL 0, HL/LH 1, HH 2)
    # for the unquantized 5/3 path; the caller's eps for 9/7
    if transform == 0:
        exps = [e for e, _ in quant]
    else:
        exps = [depth] + [depth + g_ for _ in range(levels)
                          for g_ in (1, 1, 2)]

    # per-component coding style: COD defaults + COC overrides
    def _cparam(ci):
        ov = coc.get(ci, {}) if coc else {}
        return (ov.get("levels", levels), ov.get("xcb", xcb),
                ov.get("ycb", ycb), ov.get("cbstyle", cbstyle),
                ov.get("prec", precincts))

    # wavelet + tier-1 per component; explicit precincts clamp the
    # effective code-block exponents (xcb' = min(xcb, PPx - (r>0)))
    def eff_cb(ci, r):
        lv, cx, cy, _, prec = _cparam(ci)
        if prec is None:
            return cx, cy
        ppx, ppy = prec[r]
        return (min(cx, ppx - (1 if r else 0)),
                min(cy, ppy - (1 if r else 0)))

    def _quantize(arr, bi, orient, ql):
        """Round-to-nearest scalar quantizer (encoder choice, §E)."""
        gain = 0 if orient == 0 else (2 if orient == 3 else 1)
        eps, mu = ql[bi]
        delta = (1.0 + mu / 2048.0) * 2.0 ** (depth + gain - eps)
        q = np.sign(arr) * np.floor(np.abs(arr) / delta + 0.5)
        if q.size:
            assert np.abs(q).max() < 1 << (guard + eps - 1), "Mb overflow"
        return q.astype(np.int32)

    def _comp_quant(ci):
        """Component ci's quant list (QCC override else QCD)."""
        if qcc and ci in qcc:
            return qcc[ci]
        return quant

    def _tile_body(tile_comps, tx0, ty0, tx1, ty1):
        all_bands = []  # [comp][res] -> list of band dicts
        for ci, c in enumerate(tile_comps):
            lv, _, _, cst, _ = _cparam(ci)
            rx_, ry_ = subs[ci]
            ca0, ca1 = _comp_span(tx0, tx1, rx_)
            cb0, cb1 = _comp_span(ty0, ty1, ry_)
            rects = _tile_rects(ca0, ca1, cb0, cb1, lv)
            # single precinct per resolution on the ABSOLUTE grid
            # (the precinct partition anchors at (0, 0), B.6) —
            # checked only for DEFAULT precincts: an explicit
            # ``precincts`` caller may deliberately mint an
            # out-of-scope stream for the decoder's decline tests
            if _cparam(ci)[4] is None:
                for r in range(lv + 1):
                    gx0, gx1, gy0, gy1 = rects[lv - r]
                    assert (gx1 - 1) >> 15 == gx0 >> 15, "multi-precinct"
                    assert (gy1 - 1) >> 15 == gy0 >> 15, "multi-precinct"
            if transform == 0:
                ql = _comp_quant(ci)
                assert len(ql) >= 3 * lv + 1
                cexps = [e for e, _ in ql]
                llf, bandsf = forward_dwt97(c, lv, ca0, cb0)
                ll = _quantize(llf, 0, 0, ql)
                bands = [
                    tuple(
                        _quantize(arr, 1 + 3 * r + oi, oi + 1, ql)
                        for oi, arr in enumerate(trio)
                    )
                    for r, trio in enumerate(bandsf)
                ]
            else:
                # the QCC list (bare eps ints) IS the signalling for
                # an overridden reversible component; default is the
                # depth + gain pattern over the component's levels
                if qcc and ci in qcc:
                    cexps = qcc[ci]
                else:
                    cexps = [depth] + [depth + g_ for _ in range(lv)
                                       for g_ in (1, 1, 2)]
                assert len(cexps) >= 3 * lv + 1
                ll, bands = forward_dwt53(c, lv, ca0, cb0)
            res_list = []
            mb = guard + cexps[0] - 1
            ex0, ey0 = eff_cb(ci, 0)
            la0, _, lb0, _ = rects[lv]
            res_list.append(
                [_make_band(ll, 0, mb, ex0, ey0, cst, la0, lb0)]
            )
            for r, (hl, lh, hh) in enumerate(bands):
                # bands[r] (coarsest→finest) = decomposition lv - r
                brs = _band_rects(rects, lv - r)
                trio = []
                exr, eyr = eff_cb(ci, r + 1)
                for (oi, arr), (bx0, by0, _, _) in zip(
                    ((1, hl), (2, lh), (3, hh)), brs
                ):
                    mb = guard + cexps[1 + 3 * r + (oi - 1)] - 1
                    trio.append(
                        _make_band(arr, oi, mb, exr, eyr, cst,
                                   bx0, by0)
                    )
                res_list.append(trio)
            all_bands.append(res_list)

        _split_layers(all_bands, layers, cbstyle)

        # packet emission order (single precinct per resolution);
        # with per-component level counts (COC) the resolution loop
        # runs to the max and a packet is emitted only when the
        # component HAS the resolution — mirrors decode_tile
        nres_c = [_cparam(ci)[0] + 1 for ci in range(ncomp)]
        nres = max(nres_c)
        if prog == 0:
            order = [(l_, r, c) for l_ in range(layers)
                     for r in range(nres) for c in range(ncomp)
                     if r < nres_c[c]]
        elif prog == 1:
            order = [(l_, r, c) for r in range(nres)
                     for l_ in range(layers) for c in range(ncomp)
                     if r < nres_c[c]]
        elif prog == 2:
            order = [(l_, r, c) for r in range(nres)
                     for c in range(ncomp) if r < nres_c[c]
                     for l_ in range(layers)]
        else:
            order = [(l_, r, c) for c in range(ncomp)
                     for r in range(nres_c[c]) for l_ in range(layers)]

        body = bytearray()
        nsop = 0
        for layer, r, c in order:
            contribs = []
            for band in all_bands[c][r]:
                for ci, cb in enumerate(band["cblks"]):
                    if cb is None:
                        continue
                    ln = cb["layer_passes"][layer]
                    if ln:
                        contribs.append((band, ci, cb, ln))
            if sop:
                body += b"\xff\x91\x00\x04" + struct.pack(
                    ">H", nsop & 0xFFFF
                )
            nsop += 1
            if not contribs:
                bw = BitWriter()
                bw.put(0)  # empty packet
                body += bw.flush()
                if eph:
                    body += b"\xff\x92"
                continue
            bw = BitWriter()
            bw.put(1)
            data = bytearray()
            for band in all_bands[c][r]:
                for ci, cb in enumerate(band["cblks"]):
                    incl = (cb is not None
                            and cb["layer_passes"][layer] > 0)
                    if cb is None or not cb["included"]:
                        # first-inclusion signalling via tag tree
                        band["incl_enc"].encode(bw, ci, layer + 1)
                        if not incl:
                            continue
                        band["zbp_enc"].encode(
                            bw, ci, cb["missing"] + 1
                        )
                        cb["included"] = True
                    else:
                        bw.put(1 if incl else 0)
                        if not incl:
                            continue
                    np_ = cb["layer_passes"][layer]
                    _numpasses_code(bw, np_)
                    # one length per codeword segment touched, width
                    # Lblock + floor(log2(new passes in that segment)) —
                    # mirrors the decoder's grouping exactly
                    groups = cb["layer_segs"][layer]  # [(np_g, bytes)]
                    while any(
                        len(s).bit_length()
                        > cb["lblock"] + g.bit_length() - 1
                        for g, s in groups
                    ):
                        bw.put(1)
                        cb["lblock"] += 1
                    bw.put(0)
                    for g, s in groups:
                        bw.bits(len(s), cb["lblock"] + g.bit_length() - 1)
                    for _, s in groups:
                        data += s
            body += bw.flush()
            if eph:
                body += b"\xff\x92"
            body += data
        return bytes(body)


    # tile grid: slice each (already color-transformed) component
    # into xt x yt tiles with ragged right/bottom edges and encode
    # each tile independently — DWT and all coding state reset at
    # tile boundaries, exactly what the decoder assumes
    ix0, iy0, gx0, gy0 = offsets or (0, 0, 0, 0)
    assert gx0 <= ix0 and gy0 <= iy0, "tile grid origin after image"
    xs, ys = ix0 + w, iy0 + h  # Xsiz / Ysiz (far edges)
    if tiles is None:
        xt, yt = xs - gx0, ys - gy0
    else:
        xt, yt = tiles
    assert gx0 + xt > ix0 and gy0 + yt > iy0, "first tile misses image"
    ntx = -(-(xs - gx0) // xt)
    nty = -(-(ys - gy0) // yt)
    bodies = []
    for t in range(ntx * nty):
        ty_, tx_ = divmod(t, ntx)
        tx0 = max(gx0 + tx_ * xt, ix0)
        ty0 = max(gy0 + ty_ * yt, iy0)
        tx1 = min(gx0 + (tx_ + 1) * xt, xs)
        ty1 = min(gy0 + (ty_ + 1) * yt, ys)
        sub = []
        for ci, c in enumerate(comps):
            rx_, ry_ = subs[ci]
            assert ix0 % rx_ == 0 and iy0 % ry_ == 0, \
                "image origin must align with subsampling"
            ta0, ta1 = _comp_span(tx0, tx1, rx_)
            tb0, tb1 = _comp_span(ty0, ty1, ry_)
            cx0, cy0 = ix0 // rx_, iy0 // ry_
            sub.append(
                c[tb0 - cy0 : tb1 - cy0, ta0 - cx0 : ta1 - cx0]
            )
        bodies.append(_tile_body(sub, tx0, ty0, tx1, ty1))

    # markers
    out = bytearray(b"\xff\x4f")  # SOC
    siz = struct.pack(
        ">HHIIIIIIIIH", 38 + 3 * ncomp, 0, xs, ys, ix0, iy0, xt, yt,
        gx0, gy0, ncomp,
    )
    for ci in range(ncomp):
        siz += bytes([
            (depth - 1) | (0x80 if signed else 0),
            subs[ci][0], subs[ci][1],
        ])
    out += b"\xff\x51" + siz
    scod = (2 if sop else 0) | (4 if eph else 0)
    if precincts is not None:
        scod |= 1
        assert len(precincts) == levels + 1
    out += b"\xff\x52" + struct.pack(
        ">HBBHBBBBBB", 12 + (0 if precincts is None else levels + 1),
        scod, prog, layers, mct, levels,
        xcb - 2, ycb - 2, cbstyle, transform,
    )
    if precincts is not None:
        out += bytes((ppy << 4) | ppx for ppx, ppy in precincts)
    if coc:
        for ci in sorted(coc):
            lv, cx, cy, cst, prec = _cparam(ci)
            scoc = 0 if prec is None else 1
            body_c = bytes([ci, scoc, lv, cx - 2, cy - 2, cst,
                            transform])
            if prec is not None:
                assert len(prec) == lv + 1
                body_c += bytes((ppy << 4) | ppx for ppx, ppy in prec)
            out += b"\xff\x53" + struct.pack(">H", 2 + len(body_c))
            out += body_c
    if transform == 0 and qstyle == 1:
        # scalar derived (Sqcd style 1): ONE (eps0, mu0) field; the
        # quant list the coefficients were quantized with must follow
        # the §E.1.1 derivation so decoder and encoder agree
        e0, m0 = quant[0]
        assert all(
            quant[1 + 3 * (r - 1) + oi] == (e0 - r + 1, m0)
            for r in range(1, levels + 1) for oi in range(3)
        ), "derived quant list must follow eps0 - r + 1"
        qcd = bytes([(guard << 5) | 1]) + struct.pack(
            ">H", (e0 << 11) | m0
        )
    elif transform == 0:
        # scalar expounded (Sqcd style 2): 16-bit (eps << 11) | mu
        qcd = bytes([(guard << 5) | 2]) + b"".join(
            struct.pack(">H", (e << 11) | mu) for e, mu in quant
        )
    else:
        qcd = bytes([guard << 5]) + bytes(e << 3 for e in exps)
    out += b"\xff\x5c" + struct.pack(">H", 2 + len(qcd)) + qcd
    if qcc:
        for ci in sorted(qcc):
            if transform == 0:
                # scalar expounded (style 2): (eps, mu) pairs
                fields = b"".join(
                    struct.pack(">H", (e << 11) | mu)
                    for e, mu in qcc[ci]
                )
                body_q = bytes([ci, (guard << 5) | 2]) + fields
            else:
                # no quantization (style 0): bare eps ints
                body_q = bytes([ci, guard << 5]) + bytes(
                    e << 3 for e in qcc[ci]
                )
            out += b"\xff\x5d" + struct.pack(">H", 2 + len(body_q))
            out += body_q
    for t, body in enumerate(bodies):
        psot = 12 + 2 + len(body)
        out += b"\xff\x90" + struct.pack(">HHIBB", 10, t, psot, 0, 1)
        out += b"\xff\x93" + body
    out += b"\xff\xd9"
    return bytes(out)


def _make_band(arr, orient, mb, xcb, ycb, cbstyle, bx0=0, by0=0):
    """Band array → band dict; the code-block partition anchors at
    multiples of the nominal size on the band's ABSOLUTE coordinate
    axes (§B.7), so a grid-misaligned band origin (bx0, by0) makes
    the first row/column of code-blocks narrower."""
    bh, bw_ = arr.shape
    cx0, cy0 = bx0 >> xcb, by0 >> ycb
    ncx = (-(-(bx0 + bw_) // (1 << xcb)) - cx0) if bw_ > 0 else 0
    ncy = (-(-(by0 + bh) // (1 << ycb)) - cy0) if bh > 0 else 0
    cblks = []
    incl_vals = []
    zbp_vals = []
    for cy in range(ncy):
        for cx in range(ncx):
            ax = (cx0 + cx) << xcb
            ay = (cy0 + cy) << ycb
            lox, loy = max(ax, bx0), max(ay, by0)
            hix = min(ax + (1 << xcb), bx0 + bw_)
            hiy = min(ay + (1 << ycb), by0 + bh)
            sub = arr[loy - by0 : hiy - by0, lox - bx0 : hix - bx0]
            r = encode_codeblock(sub, orient, mb, cbstyle)
            if r is None:
                cblks.append(None)
                incl_vals.append(1 << 16)  # never included
                zbp_vals.append(0)
            else:
                missing, numpasses, segments = r
                cblks.append({
                    "missing": missing,
                    "numpasses": numpasses,
                    "segments": segments,
                    "included": False,
                    "lblock": 3,
                    "layer_passes": None,
                    "layer_segs": None,
                })
                incl_vals.append(0)  # split assigns real values below
                zbp_vals.append(missing)
    band = {
        "orient": orient,
        "cblks": cblks,
        "incl_vals": incl_vals,
        "zbp_vals": zbp_vals,
        "ncx": ncx,
        "ncy": ncy,
    }
    return band


def _split_layers(all_bands, layers, cbstyle):
    """Assign passes/bytes to layers (front-loaded: layer 0 gets
    ceil(n/layers) passes, remaining layers split the rest; byte
    split is proportional for the default single-codeword mode, per
    terminated segment under TERMALL)."""
    for res_list in all_bands:
        for bands in res_list:
            for band in bands:
                incl_vals = []
                for cb in band["cblks"]:
                    if cb is None:
                        incl_vals.append(1 << 16)
                        continue
                    n = cb["numpasses"]
                    base = [0] * layers
                    # front-load: all passes in layer 0 except one
                    # trailing pass per extra layer (when available)
                    extra = min(layers - 1, n - 1)
                    base[0] = n - extra
                    for i in range(extra):
                        base[1 + i] = 1
                    cb["layer_passes"] = base
                    # segments carry (seg_id, npasses, bytes); each
                    # layer takes its pass range, grouped by segment,
                    # with byte splits proportional to pass progress
                    # inside a segment (any split point reassembles
                    # identically on the decode side)
                    segs = cb["segments"]
                    spans = []
                    g0 = 0
                    for _, nps, blob in segs:
                        spans.append((g0, g0 + nps, blob))
                        g0 += nps
                    ls = []
                    p0 = 0
                    for np_l in base:
                        p1 = p0 + np_l
                        groups = []
                        for gs, ge, blob in spans:
                            a = max(p0, gs)
                            b_ = min(p1, ge)
                            if a >= b_:
                                continue
                            nps = ge - gs
                            lo = len(blob) * (a - gs) // nps
                            hi = (len(blob) if b_ == ge
                                  else len(blob) * (b_ - gs) // nps)
                            groups.append((b_ - a, blob[lo:hi]))
                        ls.append(groups)
                        p0 = p1
                    cb["layer_segs"] = ls
                    incl_vals.append(0)
                band["incl_vals"] = incl_vals
                band["incl_enc"] = TagTreeEnc(
                    band["ncx"], band["ncy"], incl_vals
                ) if band["ncx"] * band["ncy"] else None
                band["zbp_enc"] = TagTreeEnc(
                    band["ncx"], band["ncy"], band["zbp_vals"]
                ) if band["ncx"] * band["ncy"] else None


def make_jp2(codestream: bytes, w: int, h: int, ncomp: int) -> bytes:
    """Wrap a codestream in the minimal JP2 box set (I.5)."""
    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    sig = box(b"jP  ", b"\x0d\x0a\x87\x0a")
    ftyp = box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    ihdr = box(
        b"ihdr",
        struct.pack(">IIHBBBB", h, w, ncomp, 7, 7, 0, 0),
    )
    colr = box(
        b"colr",
        b"\x01\x00\x00" + struct.pack(">I", 17 if ncomp == 1 else 16),
    )
    jp2h = box(b"jp2h", ihdr + colr)
    return sig + ftyp + jp2h + box(b"jp2c", codestream)


# ------------------------------------------------------------ images


def gray8():
    return np.fromfunction(
        lambda y, x: (x * 31 + y * 17) % 256, (8, 8), dtype=np.int64
    ).astype(np.uint8)


def gray37x29():
    # deterministic LCG texture (same formula in the test)
    v = np.empty(37 * 29, dtype=np.int64)
    s = 12345
    for i in range(v.size):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        v[i] = (s >> 16) & 0xFF
    return v.reshape(29, 37).astype(np.uint8)


def rgb24x16():
    y, x = np.mgrid[0:16, 0:24]
    r = ((x * 11 + y * 3) % 256).astype(np.uint8)
    g = ((x * 5 + y * 13) % 256).astype(np.uint8)
    b = ((x * 7 + y * 29 + 128) % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def gray16modes():
    y, x = np.mgrid[0:16, 0:16]
    return (((x ^ y) * 37 + x * 5) % 256).astype(np.uint8)


def quant97_derived(levels: int, eps0: int, mu: int = 0):
    """(eps, mu) per subband following the scalar-DERIVED signalling
    (§E.1.1 Eq E-5): the LL keeps eps0, resolution r (1 = coarsest)
    gets eps0 - r + 1 — what a style-1 QCD implies, spelled out so
    the quantizer and the emitted marker agree by construction."""
    return [(eps0, mu)] + [
        (eps0 - r + 1, mu) for r in range(1, levels + 1) for _ in range(3)
    ]


def quant97(levels: int, extra: int, mu: int = 0, depth: int = 8):
    """(eps, mu) per subband in QCD order for the 9/7 path: eps =
    depth + log2-gain + ``extra`` — extra=4 gives Δ = 2^-4/(band
    gain), fine enough that reconstruction error stays below the
    rounding threshold (byte-exact raster); negative extra gives
    visible loss for the tolerance goldens."""
    gains = [0] + [g for _ in range(levels) for g in (1, 1, 2)]
    return [(depth + g + extra, mu) for g in gains]


def _emit(name, blob):
    print(f"{name} = bytes.fromhex(")
    hx = blob.hex()
    for i in range(0, len(hx), 72):
        print(f'    "{hx[i : i + 72]}"')
    print(")")


if __name__ == "__main__":
    cases = [
        ("J2K_GRAY8_L1", gray8(),
         dict(levels=1, xcb=2, ycb=2, layers=1, prog=0)),
        ("J2K_GRAY37X29_L2", gray37x29(),
         dict(levels=2, xcb=4, ycb=4, layers=2, prog=1)),
        ("J2K_RGB24X16_MCT", rgb24x16(),
         dict(levels=1, xcb=3, ycb=3, layers=1, prog=2, mct=1,
              sop=True, eph=True)),
        ("J2K_GRAY16_MODES", gray16modes(),
         dict(levels=1, xcb=2, ycb=2, layers=1, prog=0,
              cbstyle=CB_RESET | CB_TERMALL | CB_VCAUSAL
              | CB_SEGSYM)),
    ]
    cases += [
        ("J2K_GRAY8_97_FINE", gray8(),
         dict(levels=1, xcb=2, ycb=2, transform=0,
              quant=quant97(1, 4))),
        ("J2K_RGB24X16_97_ICT", rgb24x16(),
         dict(levels=1, xcb=3, ycb=3, mct=1, transform=0,
              quant=quant97(1, 5))),
        ("J2K_GRAY37X29_97_COARSE", gray37x29(),
         dict(levels=2, xcb=4, ycb=4, layers=2, prog=1, transform=0,
              quant=quant97(2, -1, 512))),
    ]
    for name, img, kw in cases:
        _emit(name, encode_j2k(img, **kw))
    cs = encode_j2k(gray8(), levels=1, xcb=2, ycb=2)
    _emit("JP2_GRAY8_BOXED", make_jp2(cs, 8, 8, 1))
