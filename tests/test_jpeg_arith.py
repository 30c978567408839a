"""Arithmetic-coded JPEG (SOF9/SOF10) and 12-bit precision.

The encoder lives test-side (like the baseline/progressive Huffman
encoders): a T.81 Annex D QM arithmetic ENCODER plus the Annex F DC/AC
statistical models, sharing `_QM_STATES` (Table D.3) with the decoder.
The headline assertion is cross-ENTROPY-MODE identity: the same
quantized coefficients carried by Huffman (SOF0/SOF2) and by arithmetic
coding (SOF9/SOF10) must decode to bit-identical rasters — entropy
coding is lossless, so any raster difference is a coder bug on one
side.  The QM coder itself is additionally pinned by an adaptive-state
roundtrip over adversarial bit patterns (MPS/LPS exchanges, carry
propagation through stacked 0xFF bytes, flush alignment).
"""

import struct

import numpy as np

from clickhouse_table_copier_spark.operators.multimodal import (
    _QM_STATES,
    _make_jpeg_raster_decoder,
)
from tests.test_jpeg_decode import _M, _ZIGZAG, encode_baseline_jpeg

decode_raster = _make_jpeg_raster_decoder()


# ---------------------------------------------------------------------------
# T.81 Annex D arithmetic ENCODER (Figures D.1-D.16): INITENC / CODE /
# RENORME / BYTEOUT (carry via a pending byte + stacked-0xFF counter) /
# FLUSH.  0xFF data bytes get a stuffed 0x00 so the decoder's
# unstuffing sees them as data, never as a marker.
# ---------------------------------------------------------------------------
class _ArithEnc:
    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # no pending byte yet
        self.sc = 0  # stacked 0xFF bytes awaiting a carry decision
        self.out = bytearray()

    def _emit(self, byte):
        byte &= 0xFF
        self.out.append(byte)
        if byte == 0xFF:
            self.out.append(0x00)  # stuff: this 0xFF is data

    def _byteout(self):
        t = self.c >> 19
        if t > 0xFF:  # carry: absorb into the pending byte
            if self.buffer >= 0:
                self._emit(self.buffer + 1)
            for _ in range(self.sc):
                self.out.append(0x00)  # carried-through 0xFF becomes 0x00
            self.sc = 0
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1  # defer: may still receive a carry
        else:
            if self.buffer >= 0:
                self._emit(self.buffer)
            for _ in range(self.sc):
                self.out.append(0xFF)
                self.out.append(0x00)
            self.sc = 0
            self.buffer = t
        self.c &= 0x7FFFF
        self.ct = 8

    def code(self, idx, mps, i, d):
        qe, nmps, nlps, sw = _QM_STATES[idx[i]]
        if d == mps[i]:  # CODEMPS (Figure D.3)
            self.a -= qe
            if self.a & 0x8000:
                return  # no renorm, no estimation update
            if self.a < qe:  # conditional exchange
                self.c += self.a
                self.a = qe
            idx[i] = nmps
        else:  # CODELPS (Figure D.4)
            self.a -= qe
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            # else conditional exchange: LPS keeps the (larger) bottom
            if sw:
                mps[i] ^= 1
            idx[i] = nlps
        while True:  # RENORME
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # CLEARBITS: pick the value in [C, C+A) with most trailing zeros
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:  # final carry
            if self.buffer >= 0:
                self._emit(self.buffer + 1)
            for _ in range(self.sc):
                self.out.append(0x00)
        else:
            if self.buffer >= 0:
                self._emit(self.buffer)
            for _ in range(self.sc):
                self.out.append(0xFF)
                self.out.append(0x00)
        self.sc = 0
        self._emit((self.c >> 19) & 0xFF)
        self._emit((self.c >> 11) & 0xFF)
        return bytes(self.out)


def _fresh_stats():
    return {
        "dc": (bytearray(64), bytearray(64)),
        "ac": (bytearray(256), bytearray(256)),
        "fixed": (bytearray([113]), bytearray(1)),
        "ctx": None,  # set by caller: one slot per component
        "pred": None,
    }


def _enc_dc_diff(enc, stats, ctx, ci, lo, hi, v):
    """Mirror of the decoder's _arith_dc_diff (T.81 F.1.4.1)."""
    idx, mps = stats
    s0 = ctx[ci]
    if v == 0:
        enc.code(idx, mps, s0, 0)
        ctx[ci] = 0
        return
    enc.code(idx, mps, s0, 1)
    sign = 1 if v < 0 else 0
    enc.code(idx, mps, s0 + 1, sign)
    am = abs(v) - 1
    st = s0 + 2 + sign
    if am == 0:
        enc.code(idx, mps, st, 0)
        mcat = 0
    else:
        enc.code(idx, mps, st, 1)
        nbits = am.bit_length()
        st = 20
        for _ in range(nbits - 1):
            enc.code(idx, mps, st, 1)
            st += 1
        enc.code(idx, mps, st, 0)
        mcat = 1 << (nbits - 1)
    if mcat < lo:
        ctx[ci] = 0
    elif mcat > hi:
        ctx[ci] = 12 + 4 * sign
    else:
        ctx[ci] = 4 + 4 * sign
    st += 14
    mm = mcat >> 1
    while mm:
        enc.code(idx, mps, st, 1 if am & mm else 0)
        mm >>= 1


def _enc_ac_coefs(enc, stats, fixed, zz, ss, se, kx, al=0):
    """Mirror of the decoder's _arith_ac_block (T.81 F.1.4.2); values
    in ``zz`` are the RAW band coefficients — ``al`` drops the low bits
    (progressive first scans code v >> al)."""
    idx, mps = stats
    fx_idx, fx_mps = fixed
    vals = {k: int(zz[k]) >> al if int(zz[k]) >= 0 else -((-int(zz[k])) >> al)
            for k in range(ss, se + 1)}
    nz = [k for k in range(ss, se + 1) if vals[k]]
    k = ss
    for k_i in nz:
        st = 3 * (k - 1)
        enc.code(idx, mps, st, 0)  # not EOB
        while k < k_i:
            enc.code(idx, mps, st + 1, 0)
            st += 3
            k += 1
        enc.code(idx, mps, st + 1, 1)
        v = vals[k]
        sign = 1 if v < 0 else 0
        enc.code(fx_idx, fx_mps, 0, sign)
        am = abs(v) - 1
        st += 2
        if am == 0:
            enc.code(idx, mps, st, 0)
            mcat = 0
        else:
            enc.code(idx, mps, st, 1)
            if am == 1:
                enc.code(idx, mps, st, 0)
                mcat = 1
            else:
                enc.code(idx, mps, st, 1)
                nbits = am.bit_length()
                st = 189 if k <= kx else 217
                for _ in range(nbits - 2):
                    enc.code(idx, mps, st, 1)
                    st += 1
                enc.code(idx, mps, st, 0)
                mcat = 1 << (nbits - 1)
        st += 14
        mm = mcat >> 1
        while mm:
            enc.code(idx, mps, st, 1 if am & mm else 0)
            mm >>= 1
        k += 1
    if k <= se:
        enc.code(idx, mps, 3 * (k - 1), 1)  # EOB


def _grids(img, subsample, precision=8):
    """Per-component zigzag coefficient grids with all-ones quant —
    the same pipeline the Huffman test encoders use, parameterized by
    sample precision (level shift 2^(P-1))."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    shift = float(1 << (precision - 1))
    if gray:
        planes, hs, vs = [img.astype(np.float64)], [1], [1]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + shift
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + shift
        if subsample:
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            planes, hs, vs = [y, cb, cr], [2, 1, 1], [2, 1, 1]
        else:
            planes, hs, vs = [y, cb, cr], [1, 1, 1], [1, 1, 1]
    grids = []
    for p in planes:
        ph, pw = p.shape
        g = np.zeros((ph // 8, pw // 8, 64), dtype=np.int64)
        for by in range(ph // 8):
            for bx in range(pw // 8):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _M @ (blk - shift) @ _M.T
                g[by, bx] = np.rint(coef).astype(np.int64).flatten()[_ZIGZAG]
        grids.append(g)
    return grids, hs, vs


def _headers(h, w, hs, vs, precision, sof, dri=0, emit_dac=False):
    out = bytearray(b"\xff\xd8")
    if precision == 8:
        qtb = bytes([0]) + bytes([1] * 64)
    else:  # 12-bit frames need 16-bit DQT entries (Pq=1)
        qtb = bytes([0x10]) + struct.pack(">64H", *([1] * 64))
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(qtb)) + qtb
    nc = len(hs)
    sofb = bytes([precision]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sofb += bytes([ci + 1, (hs[ci] << 4) | vs[ci], 0])
    out += bytes([0xFF, sof]) + struct.pack(">H", 2 + len(sofb)) + sofb
    if emit_dac:  # explicit default conditioning: DC L=0 U=1, AC Kx=5
        dac = bytes([0x00, 0x01, 0x10, 5])
        out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    return out


def encode_arith_sequential(
    img, subsample=False, dri=0, precision=8, emit_dac=False
):
    """SOF9: extended sequential DCT, arithmetic coding."""
    h, w = img.shape[:2]
    grids, hs, vs = _grids(img, subsample, precision)
    nc = len(grids)
    out = _headers(h, w, hs, vs, precision, 0xC9, dri, emit_dac)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    hmax, vmax = max(hs), max(vs)
    mcux, mcuy = w // (8 * hmax), h // (8 * vmax)

    def fresh():
        s = _fresh_stats()
        s["ctx"] = [0] * nc
        s["pred"] = [0] * nc
        return s, _ArithEnc()

    st, enc = fresh()
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                st, enc = fresh()
            for ci in range(nc):
                for by in range(vs[ci]):
                    for bx in range(hs[ci]):
                        zz = grids[ci][my * vs[ci] + by, mx * hs[ci] + bx]
                        diff = int(zz[0]) - st["pred"][ci]
                        st["pred"][ci] = int(zz[0])
                        _enc_dc_diff(
                            enc, st["dc"], st["ctx"], ci,
                            (1 << 0) >> 1, (1 << 1) >> 1, diff,
                        )
                        _enc_ac_coefs(
                            enc, st["ac"], st["fixed"], zz, 1, 63, 5
                        )
            n_mcu += 1
    out += enc.flush() + b"\xff\xd9"
    return bytes(out)


def _img(seed, h=16, w=16, ch=3, maxv=256):
    rng = np.random.default_rng(seed)
    return rng.integers(0, maxv, (h, w, ch) if ch else (h, w)).astype(
        np.uint8 if maxv <= 256 else np.uint16
    )


def test_qm_coder_roundtrip_adversarial_bits():
    """The raw QM coder roundtrips adversarial decision sequences
    through shared adaptive state: long MPS runs (carry + stacked-FF
    paths), alternation (constant exchange), and random bits."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        _make_jpeg_raster_decoder,
    )
    import clickhouse_table_copier_spark.operators.multimodal as mm

    # reach the closure-level decoder class via a tiny shim: rebuild it
    # the same way decode_jpeg does — through a scan over a crafted
    # stream is indirect, so instead drive the decoder class directly
    # by instantiating the factory's internals through a probe module
    # attribute if present; otherwise replicate via decode of encoded
    # stream below (the JPEG-level tests cover integration).
    rng = np.random.default_rng(5)
    patterns = [
        [0] * 600,                      # one-sided: exercises carries
        [1] * 600,
        [0, 1] * 300,                   # constant exchange
        list(rng.integers(0, 2, 2000)),
    ]
    for bits in patterns:
        enc = _ArithEnc()
        idx, mps = bytearray(8), bytearray(8)
        for j, d in enumerate(bits):
            enc.code(idx, mps, j % 8, int(d))
        data = enc.flush()
        # decode with the library's decoder class, reconstructed from
        # the module's factory-internal definition via a 1-MCU JPEG is
        # overkill — use the private hook: the decoder class is defined
        # per factory call, so instantiate through a fresh factory's
        # arithmetic path indirectly in the JPEG tests; here, verify
        # with a reference decode implemented against the same spec.
        pos = 0
        # reference decoder: mirror of operators' _ArithDec
        class Dec:
            def __init__(self, d):
                self.d = d
                self.pos = 0
                self.marker = None
                self.ct = 0
                self.c = self._byte() << 16
                self._bytein()
                self.c = (self.c << 8) & 0xFFFFFFFF
                self.ct -= 8
                self.a = 0x10000

            def _byte(self):
                d = self.d
                if self.marker is None and self.pos < len(d):
                    b = d[self.pos]
                    if b != 0xFF:
                        self.pos += 1
                        return b
                    nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                    if nxt == 0x00:
                        self.pos += 2
                        return 0xFF
                    self.marker = nxt
                return 0

            def _bytein(self):
                self.c = (self.c + (self._byte() << 8)) & 0xFFFFFFFF
                self.ct = 8

            def decode(self, idx, mps, i):
                qe, nmps, nlps, sw = _QM_STATES[idx[i]]
                self.a -= qe
                if (self.c >> 16) < self.a:
                    if self.a & 0x8000:
                        return mps[i]
                    if self.a < qe:
                        d = 1 - mps[i]
                        if sw:
                            mps[i] ^= 1
                        idx[i] = nlps
                    else:
                        d = mps[i]
                        idx[i] = nmps
                else:
                    self.c = (self.c - (self.a << 16)) & 0xFFFFFFFF
                    if self.a < qe:
                        d = mps[i]
                        idx[i] = nmps
                    else:
                        d = 1 - mps[i]
                        if sw:
                            mps[i] ^= 1
                        idx[i] = nlps
                    self.a = qe
                while True:
                    if self.ct == 0:
                        self._bytein()
                    self.a = (self.a << 1) & 0xFFFF
                    self.c = (self.c << 1) & 0xFFFFFFFF
                    self.ct -= 1
                    if self.a & 0x8000:
                        break
                return d

        dec = Dec(data)
        idx2, mps2 = bytearray(8), bytearray(8)
        got = [dec.decode(idx2, mps2, j % 8) for j in range(len(bits))]
        assert got == [int(x) for x in bits]


def test_arith_sequential_gray_matches_baseline():
    img = _img(1, ch=0)
    a = decode_raster(encode_arith_sequential(img))
    hf = decode_raster(encode_baseline_jpeg(img))
    assert a is not None and hf is not None
    assert a[:3] == hf[:3]
    assert np.array_equal(a[3], hf[3])


def test_arith_sequential_rgb_444_matches_baseline():
    img = _img(2)
    a = decode_raster(encode_arith_sequential(img, emit_dac=True))
    hf = decode_raster(encode_baseline_jpeg(img))
    assert a is not None and hf is not None
    assert np.array_equal(a[3], hf[3])


def test_arith_sequential_420_matches_baseline():
    img = _img(3, h=32, w=32)
    a = decode_raster(encode_arith_sequential(img, subsample=True))
    hf = decode_raster(encode_baseline_jpeg(img, subsample=True))
    assert a is not None and hf is not None
    assert np.array_equal(a[3], hf[3])


def test_arith_sequential_restart_markers():
    img = _img(4, h=32, w=32)
    a = decode_raster(encode_arith_sequential(img, dri=2))
    plain = decode_raster(encode_arith_sequential(img))
    assert a is not None and plain is not None
    assert np.array_equal(a[3], plain[3])


def test_arith_large_coefficients_survive():
    """Max-contrast blocks produce large DC diffs and AC magnitudes —
    the full magnitude-category chains and bit patterns get exercised."""
    img = np.zeros((16, 16), dtype=np.uint8)
    img[::2, :] = 255  # maximal vertical frequency
    a = decode_raster(encode_arith_sequential(img))
    hf = decode_raster(encode_baseline_jpeg(img))
    assert a is not None and np.array_equal(a[3], hf[3])


def test_arith_corrupt_bytes_decline_not_raise():
    img = _img(6, ch=0)
    blob = bytearray(encode_arith_sequential(img))
    rng = np.random.default_rng(7)
    for _ in range(50):
        bad = bytearray(blob)
        for _ in range(3):
            bad[rng.integers(2, len(bad))] = rng.integers(0, 256)
        got = decode_raster(bytes(bad))
        assert got is None or isinstance(got, tuple)  # never raises


# ---------------------------------------------------------------------------
# 12-bit precision: SOF1 (extended sequential Huffman) as the second
# witness, so 12-bit arithmetic and 12-bit Huffman pin each other.
# ---------------------------------------------------------------------------
def encode_huffman_ext_sequential(img, precision=12):
    """SOF1 extended-sequential Huffman writer, grayscale, 8/12-bit
    (DC categories can exceed baseline's 11 at 12-bit — the canonical
    single-length table construction handles any symbol set)."""
    from tests.test_jpeg_decode import _BitWriter, _canonical_table

    h, w = img.shape[:2]
    grids, hs, vs = _grids(img, False, precision)
    zzs = grids[0]
    tokens = []
    pred = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            zz = zzs[by, bx]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            t = abs(diff).bit_length()
            bits = diff if diff >= 0 else diff + (1 << t) - 1
            tokens.append(("dc", t, bits, t))
            nz = [k for k in range(1, 64) if zz[k]]
            last = nz[-1] if nz else 0
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if k > last:
                    tokens.append(("ac", 0, 0, 0))
                    break
                if v == 0:
                    run += 1
                    if run == 16:
                        tokens.append(("ac", 0xF0, 0, 0))
                        run = 0
                    continue
                s = abs(v).bit_length()
                bits = v if v >= 0 else v + (1 << s) - 1
                tokens.append(("ac", (run << 4) | s, bits, s))
                run = 0
    dc_bits, dc_vals, dc_map = _canonical_table(
        [t[1] for t in tokens if t[0] == "dc"]
    )
    ac_bits, ac_vals, ac_map = _canonical_table(
        [t[1] for t in tokens if t[0] == "ac"]
    )
    out = bytearray(_headers(h, w, [1], [1], precision, 0xC1))
    for cls, (bits16, vals) in enumerate(
        [(dc_bits, dc_vals), (ac_bits, ac_vals)]
    ):
        body = bytes([cls << 4]) + bytes(bits16) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    bw = _BitWriter()
    for kind, sym, bits, blen in tokens:
        ln, code = (dc_map if kind == "dc" else ac_map)[sym]
        bw.put(code, ln)
        if blen:
            bw.put(bits, blen)
    bw.align()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def _img12(seed, h=16, w=16):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4096, (h, w)).astype(np.uint16)


def test_12bit_huffman_roundtrip_close_to_source():
    """12-bit SOF1 with all-ones quant is near-lossless: the decoded
    8-bit raster sits within ±1 of round(source·255/4095)."""
    img = _img12(10)
    got = decode_raster(encode_huffman_ext_sequential(img))
    assert got is not None and got[:3] == (16, 16, 1)
    want = np.rint(img.astype(np.float64) * 255.0 / 4095.0)
    assert np.abs(got[3][:, :, 0].astype(float) - want).max() <= 1


def test_12bit_arith_matches_12bit_huffman():
    """Same coefficients, same precision, two entropy modes: SOF9
    arithmetic at 12-bit must decode bit-identically to SOF1 Huffman."""
    img = _img12(11)
    a = decode_raster(encode_arith_sequential(img, precision=12))
    hf = decode_raster(encode_huffman_ext_sequential(img, precision=12))
    assert a is not None and hf is not None
    assert np.array_equal(a[3], hf[3])


# ---------------------------------------------------------------------------
# SOF10: progressive arithmetic — DC first/refine + per-band AC
# first/refine scans, one encoder + fresh statistics per scan.
# ---------------------------------------------------------------------------
def _enc_ac_refine(enc, stats, fixed, zz, ss, se, al):
    """Mirror of the decoder's AC refinement branch."""
    idx, mps = stats
    fx_idx, fx_mps = fixed
    p1 = 1 << al

    def mag(k, a):
        return abs(int(zz[k])) >> a

    kex = se
    while kex > 0 and mag(kex, al + 1) == 0:
        kex -= 1
    newly = [
        k for k in range(ss, se + 1) if mag(k, al) and not mag(k, al + 1)
    ]
    last_new = newly[-1] if newly else ss - 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if k > last_new:
                enc.code(idx, mps, st, 1)  # EOB: nothing new follows
                return
            enc.code(idx, mps, st, 0)
        while True:
            if mag(k, al + 1):  # previously nonzero: correction bit
                enc.code(idx, mps, st + 2, mag(k, al) & 1)
                break
            if mag(k, al):  # newly nonzero: sign via the fixed bin
                enc.code(idx, mps, st + 1, 1)
                enc.code(fx_idx, fx_mps, 0, 1 if int(zz[k]) < 0 else 0)
                break
            enc.code(idx, mps, st + 1, 0)
            st += 3
            k += 1
        k += 1


def encode_arith_progressive(img, subsample=False, dri=0, precision=8):
    """SOF10: DC first (Al=1) + DC refine, then per-component AC band
    scans (first Al=1, refine Al=0) — the same scan script as the
    Huffman progressive test encoder, arithmetic entropy.  ``dri``
    inserts restart markers every ``dri`` MCUs (DC scans) / blocks
    (AC scans), each restart flushing the coder and resetting the
    statistics + DC state, per T.81 F.1.3.2."""
    h, w = img.shape[:2]
    grids, hs, vs = _grids(img, subsample, precision)
    nc = len(grids)
    out = bytearray(_headers(h, w, hs, vs, precision, 0xCA, dri=dri))
    hmax, vmax = max(hs), max(vs)
    mcux, mcuy = w // (8 * hmax), h // (8 * vmax)

    def sos_header(comp_ids, ss, se, ah, al):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    class Scan:
        """One scan's coder + restart bookkeeping."""

        def __init__(self):
            self.enc = _ArithEnc()
            self.st = _fresh_stats()
            self.ctx = [0] * nc
            self.pred = [0] * nc
            self.n = 0
            self.rst = 0
            self.bytes = bytearray()

        def unit_boundary(self):
            if dri and self.n and self.n % dri == 0:
                self.bytes += self.enc.flush()
                self.bytes += bytes([0xFF, 0xD0 + (self.rst & 7)])
                self.rst += 1
                self.enc = _ArithEnc()
                self.st = _fresh_stats()
                self.ctx = [0] * nc
                self.pred = [0] * nc

        def finish(self):
            self.bytes += self.enc.flush()
            return bytes(self.bytes)

    # --- DC first scan, Al=1, interleaved over all components
    out += sos_header(list(range(1, nc + 1)), 0, 0, 0, 1)
    sc = Scan()
    for my in range(mcuy):
        for mx in range(mcux):
            sc.unit_boundary()
            for ci in range(nc):
                for by in range(vs[ci]):
                    for bx in range(hs[ci]):
                        dc = int(grids[ci][my * vs[ci] + by, mx * hs[ci] + bx][0])
                        v = (dc >> 1) - sc.pred[ci]
                        sc.pred[ci] = dc >> 1
                        _enc_dc_diff(sc.enc, sc.st["dc"], sc.ctx, ci, 0, 1, v)
            sc.n += 1
    out += sc.finish()
    # --- DC refine scan, Al=0 (fixed-bin bits)
    out += sos_header(list(range(1, nc + 1)), 0, 0, 1, 0)
    sc = Scan()
    for my in range(mcuy):
        for mx in range(mcux):
            sc.unit_boundary()
            for ci in range(nc):
                for by in range(vs[ci]):
                    for bx in range(hs[ci]):
                        dc = int(grids[ci][my * vs[ci] + by, mx * hs[ci] + bx][0])
                        sc.enc.code(
                            sc.st["fixed"][0], sc.st["fixed"][1], 0, dc & 1
                        )
            sc.n += 1
    out += sc.finish()
    # --- AC scans per component: two bands, first then refine
    for ci in range(nc):
        g = grids[ci]
        nbh, nbw = g.shape[:2]
        for ah_, al_, fn in (
            (0, 1, None),
            (1, 0, None),
        ):
            for ss_, se_ in ((1, 5), (6, 63)):
                out += sos_header([ci + 1], ss_, se_, ah_, al_)
                sc = Scan()
                for by in range(nbh):
                    for bx in range(nbw):
                        sc.unit_boundary()
                        if ah_ == 0:
                            _enc_ac_coefs(
                                sc.enc, sc.st["ac"], sc.st["fixed"],
                                g[by, bx], ss_, se_, 5, al=al_,
                            )
                        else:
                            _enc_ac_refine(
                                sc.enc, sc.st["ac"], sc.st["fixed"],
                                g[by, bx], ss_, se_, al_,
                            )
                        sc.n += 1
                out += sc.finish()
    out += b"\xff\xd9"
    return bytes(out)


def test_arith_progressive_gray_matches_baseline():
    img = _img(20, ch=0)
    a = decode_raster(encode_arith_progressive(img))
    hf = decode_raster(encode_baseline_jpeg(img))
    assert a is not None and hf is not None
    assert np.array_equal(a[3], hf[3])


def test_arith_progressive_rgb_matches_sequential_arith():
    img = _img(21)
    a = decode_raster(encode_arith_progressive(img))
    s = decode_raster(encode_arith_sequential(img))
    assert a is not None and s is not None
    assert np.array_equal(a[3], s[3])


def test_arith_progressive_420(spark_noop=None):
    img = _img(22, h=32, w=32)
    a = decode_raster(encode_arith_progressive(img, subsample=True))
    hf = decode_raster(encode_baseline_jpeg(img, subsample=True))
    assert a is not None and hf is not None
    assert np.array_equal(a[3], hf[3])


def test_ahash_cross_entropy_mode(spark):
    """Spark surface: the same image as baseline-Huffman and as
    arithmetic-coded JPEG must land in the same aHash bucket — entropy
    mode can never split a dedup cluster."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_ahash,
    )

    img = _img(30, h=16, w=16)
    rows = [
        (1, "image", bytearray(encode_baseline_jpeg(img)), "{}"),
        (2, "image", bytearray(encode_arith_sequential(img)), "{}"),
        (3, "image", bytearray(encode_arith_progressive(img)), "{}"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = {r["media_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert hashes[1] == hashes[2] == hashes[3]


def test_qm_coder_property_roundtrip():
    """Property: ANY decision sequence over ANY context assignment
    roundtrips through the QM coder — encoder and decoder walk the
    same estimation-state path or diverge visibly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st_

    @settings(max_examples=120, deadline=None)
    @given(
        st_.lists(
            st_.tuples(st_.integers(0, 7), st_.integers(0, 1)),
            min_size=1,
            max_size=400,
        )
    )
    def run(seq):
        enc = _ArithEnc()
        idx, mps = bytearray(8), bytearray(8)
        for i, d in seq:
            enc.code(idx, mps, i, d)
        data = enc.flush()
        # decode through the library path: wrap the entropy bytes in a
        # 1-block JPEG? Too structured — use the decoder class via a
        # fresh factory is closure-internal, so mirror-decode with the
        # reference decoder defined in the adversarial test above.
        dec = _mk_ref_decoder(data)
        idx2, mps2 = bytearray(8), bytearray(8)
        got = [dec.decode(idx2, mps2, i) for i, _ in seq]
        assert got == [d for _, d in seq]

    run()


def _mk_ref_decoder(data):
    """Reference QM decoder — same register conventions as the
    library's closure-internal _ArithDec (kept in sync by the
    JPEG-level cross-mode tests, which exercise the real one)."""

    class Dec:
        def __init__(self, d):
            self.d = d
            self.pos = 0
            self.marker = None
            self.ct = 0
            self.c = self._byte() << 16
            self._bytein()
            self.c = (self.c << 8) & 0xFFFFFFFF
            self.ct -= 8
            self.a = 0x10000

        def _byte(self):
            d = self.d
            if self.marker is None and self.pos < len(d):
                b = d[self.pos]
                if b != 0xFF:
                    self.pos += 1
                    return b
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                    return 0xFF
                self.marker = nxt
            return 0

        def _bytein(self):
            self.c = (self.c + (self._byte() << 8)) & 0xFFFFFFFF
            self.ct = 8

        def decode(self, idx, mps, i):
            qe, nmps, nlps, sw = _QM_STATES[idx[i]]
            self.a -= qe
            if (self.c >> 16) < self.a:
                if self.a & 0x8000:
                    return mps[i]
                if self.a < qe:
                    d = 1 - mps[i]
                    if sw:
                        mps[i] ^= 1
                    idx[i] = nlps
                else:
                    d = mps[i]
                    idx[i] = nmps
            else:
                self.c = (self.c - (self.a << 16)) & 0xFFFFFFFF
                if self.a < qe:
                    d = mps[i]
                    idx[i] = nmps
                else:
                    d = 1 - mps[i]
                    if sw:
                        mps[i] ^= 1
                    idx[i] = nlps
                self.a = qe
            while True:
                if self.ct == 0:
                    self._bytein()
                self.a = (self.a << 1) & 0xFFFF
                self.c = (self.c << 1) & 0xFFFFFFFF
                self.ct -= 1
                if self.a & 0x8000:
                    break
            return d

    return Dec(data)


def test_arith_progressive_restart_markers():
    """Restarts inside SOF10 scans (decoder reinit of coder, stats and
    DC state at every RSTn) leave the raster bit-identical."""
    img = _img(23, h=32, w=32)
    with_dri = decode_raster(encode_arith_progressive(img, dri=2))
    plain = decode_raster(encode_arith_progressive(img))
    assert with_dri is not None and plain is not None
    assert np.array_equal(with_dri[3], plain[3])


def test_12bit_progressive_arith_matches_sequential():
    """12-bit SOF10 progressive == 12-bit SOF9 sequential, bit-exact."""
    img = _img12(12)
    p = decode_raster(encode_arith_progressive(img, precision=12))
    s = decode_raster(encode_arith_sequential(img, precision=12))
    assert p is not None and s is not None
    assert np.array_equal(p[3], s[3])


def test_hierarchical_and_lossless_frames_decline():
    """The one remaining seam: SOF3 (lossless), SOF5-7 (differential),
    SOF11/13-15 (lossless/differential arithmetic) return None —
    decline, never a wrong raster or a raise."""
    img = _img(40, ch=0)
    base = encode_arith_sequential(img)
    soi = base.index(b"\xff\xc9")
    for sof in (0xC3, 0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
        blob = bytearray(base)
        blob[soi + 1] = sof
        assert decode_raster(bytes(blob)) is None, hex(sof)


# ---------------------------------------------------------------------------
# Non-interleaved sequential frames: one SOS per component (T.81
# A.2.2) — the last legal DCT scan layout, both entropy modes.
# ---------------------------------------------------------------------------
def encode_arith_sequential_noninterleaved(img, subsample=False):
    h, w = img.shape[:2]
    grids, hs, vs = _grids(img, subsample)
    nc = len(grids)
    out = bytearray(_headers(h, w, hs, vs, 8, 0xC9))
    for ci in range(nc):
        sos = bytes([1, ci + 1, 0x00, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        enc = _ArithEnc()
        st = _fresh_stats()
        ctx = [0]
        pred = 0
        g = grids[ci]
        for by in range(g.shape[0]):
            for bx in range(g.shape[1]):
                zz = g[by, bx]
                diff = int(zz[0]) - pred
                pred = int(zz[0])
                _enc_dc_diff(enc, st["dc"], ctx, 0, 0, 1, diff)
                _enc_ac_coefs(enc, st["ac"], st["fixed"], zz, 1, 63, 5)
        out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_huffman_sequential_noninterleaved(img, subsample=False):
    from tests.test_jpeg_decode import _BitWriter, _canonical_table

    h, w = img.shape[:2]
    grids, hs, vs = _grids(img, subsample)
    nc = len(grids)
    out = bytearray(_headers(h, w, hs, vs, 8, 0xC0))
    for ci in range(nc):
        g = grids[ci]
        tokens = []
        pred = 0
        for by in range(g.shape[0]):
            for bx in range(g.shape[1]):
                zz = g[by, bx]
                diff = int(zz[0]) - pred
                pred = int(zz[0])
                t = abs(diff).bit_length()
                bits = diff if diff >= 0 else diff + (1 << t) - 1
                tokens.append(("dc", t, bits, t))
                nzs = [k for k in range(1, 64) if zz[k]]
                last = nzs[-1] if nzs else 0
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if k > last:
                        tokens.append(("ac", 0, 0, 0))
                        break
                    if v == 0:
                        run += 1
                        if run == 16:
                            tokens.append(("ac", 0xF0, 0, 0))
                            run = 0
                        continue
                    s = abs(v).bit_length()
                    bits = v if v >= 0 else v + (1 << s) - 1
                    tokens.append(("ac", (run << 4) | s, bits, s))
                    run = 0
        dc_bits, dc_vals, dc_map = _canonical_table(
            [t[1] for t in tokens if t[0] == "dc"]
        )
        ac_bits, ac_vals, ac_map = _canonical_table(
            [t[1] for t in tokens if t[0] == "ac"]
        )
        # tables may legally be redefined between scans
        for cls, (bits16, vals) in enumerate(
            [(dc_bits, dc_vals), (ac_bits, ac_vals)]
        ):
            body = bytes([cls << 4]) + bytes(bits16) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        sos = bytes([1, ci + 1, 0x00, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        bw = _BitWriter()
        for kind, sym, bits, blen in tokens:
            ln, code = (dc_map if kind == "dc" else ac_map)[sym]
            bw.put(code, ln)
            if blen:
                bw.put(bits, blen)
        bw.align()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def test_noninterleaved_sequential_both_modes_match_interleaved():
    img = _img(50)
    want = decode_raster(encode_baseline_jpeg(img))
    nh = decode_raster(encode_huffman_sequential_noninterleaved(img))
    na = decode_raster(encode_arith_sequential_noninterleaved(img))
    assert nh is not None and na is not None and want is not None
    assert np.array_equal(nh[3], want[3])
    assert np.array_equal(na[3], want[3])


def test_noninterleaved_420_subsampled():
    img = _img(51, h=32, w=32)
    want = decode_raster(encode_baseline_jpeg(img, subsample=True))
    nh = decode_raster(
        encode_huffman_sequential_noninterleaved(img, subsample=True)
    )
    na = decode_raster(
        encode_arith_sequential_noninterleaved(img, subsample=True)
    )
    assert nh is not None and na is not None
    assert np.array_equal(nh[3], want[3])
    assert np.array_equal(na[3], want[3])


def test_missing_component_scan_declines():
    """A sequential multi-scan file whose third component never gets a
    scan must decline at EOI, not render a half-image."""
    img = _img(52)
    blob = encode_huffman_sequential_noninterleaved(img)
    # drop the last SOS segment (find the final 0xFFDA and cut to EOI)
    last_sos = blob.rfind(b"\xff\xda")
    cut = blob[:last_sos] + b"\xff\xd9"
    assert decode_raster(cut) is None
