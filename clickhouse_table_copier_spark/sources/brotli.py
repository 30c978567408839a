"""Brotli (RFC 7932) decompression — pure Python, zero dependencies.

``Content-Encoding: br`` is the modern web's default for text
responses, so a raw-capture crawl is full of brotli-coded HTML —
until this round those bodies stayed compressed byte soup (the WARC
wire decoder handled only gzip/deflate/zstd).  This module implements
the complete decoder:

- stream header (window bits), metablock framing (compressed,
  uncompressed, metadata/skip, last-empty);
- prefix codes: simple (1-4 symbols, both 4-symbol shapes) and
  complex (code-length code with HSKIP, repeat codes 16/17 with
  brotli's count stacking, degenerate single-symbol trees);
- block types and counts for all three categories with the
  previous/next special symbols;
- context modeling: the four literal context modes through the
  2048-byte lookup table, context maps with run-length encoding and
  inverse move-to-front, distance contexts from copy length;
- insert-and-copy commands (the 704-symbol alphabet), the distance
  ring buffer with all 16 special codes, direct and postfix-extended
  distances;
- the STATIC DICTIONARY (122,784 bytes) with all 121 word transforms
  — real brotli streams reference it constantly; a decoder without it
  cannot decode the web.

The dictionary, the context lookup table and the transform list are
GENERATED data (``sources/_brotli_data.py``), extracted offline from
the system libbrotli by ``scripts/make_brotli_tables.py`` — the
transforms empirically, by probing ``BrotliTransformDictionaryWord``,
so no hand transcription could introduce typos.  The uppercase
transform byte-operations are verified against the reference on
non-ASCII probes by the same script.

Correctness pins (tests/test_brotli_golden.py): fixtures minted
OFFLINE by libbrotlienc (the reference encoder) at qualities 1-11,
window 10-22, over shapes that force every feature — dictionary-heavy
HTML, UTF-8 multi-script text, incompressible bytes, empty input, a
pure-dictionary tiny input.

Scale shape (100 TB): runs inside the existing Arrow-batched WARC
decode edge (`Content-Encoding: br` bodies); compressed bytes never
shuffle.  Pure-Python throughput is the documented trade, same seam
as :mod:`sources.zstd` (`brotli_decompress(bytes) -> bytes`), with the
same ctypes fast path through the system library when it loads.

Reference parity: none — north-star LLM-pipeline surface (SURVEY.md
§2.8); the reference engine reads SQL tables only.
"""

from __future__ import annotations

from clickhouse_table_copier_spark.sources._brotli_data import (
    CONTEXT_LUT,
    DICT_OFFSETS_BY_LENGTH,
    DICT_SIZE_BITS_BY_LENGTH,
    DICTIONARY,
    TRANSFORMS,
)


class BrotliError(ValueError):
    """Malformed brotli data."""


class _Bits:
    """Forward LSB-first bit reader."""

    __slots__ = ("b", "pos", "n")

    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0
        self.n = len(b) * 8

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if self.pos + k > self.n:
            raise BrotliError("bitstream exhausted")
        byte = self.pos >> 3
        end = (self.pos + k + 7) >> 3
        window = int.from_bytes(self.b[byte:end], "little")
        v = (window >> (self.pos & 7)) & ((1 << k) - 1)
        self.pos += k
        return v

    def read1(self) -> int:
        if self.pos >= self.n:
            raise BrotliError("bitstream exhausted")
        v = (self.b[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return v

    def peek8(self) -> int:
        """Next 8 bits without consuming, zero-padded past the end."""
        byte = self.pos >> 3
        window = int.from_bytes(self.b[byte : byte + 2], "little")
        return (window >> (self.pos & 7)) & 0xFF

    def byte_align(self):
        self.pos = (self.pos + 7) & ~7


# stream bits arrive LSB-first but prefix-code bits are MSB-of-code
# first — the flat-lookup fast path reverses the peeked byte
_REV8 = bytes(int(f"{i:08b}"[::-1], 2) for i in range(256))


class _Tree:
    """Canonical prefix code (DEFLATE-style: codes assigned in
    ascending length, within a length by symbol order; code bits
    appear in the stream MSB-of-code first).  Decoding peeks 8 bits
    into a flat root table — one lookup resolves every code of ≤ 8
    bits (virtually all literal/command codes); longer codes fall back
    to the per-length canonical walk."""

    __slots__ = ("counts", "offsets", "firsts", "syms", "single", "flat")

    def __init__(self, lengths: dict):
        nonzero = [(s, l) for s, l in lengths.items() if l > 0]
        if len(nonzero) == 1:
            self.single = nonzero[0][0]
            return
        self.single = None
        maxlen = max(l for _, l in nonzero)
        counts = [0] * (maxlen + 1)
        for _, l in nonzero:
            counts[l] += 1
        firsts = [0] * (maxlen + 1)
        offsets = [0] * (maxlen + 1)
        code = 0
        off = 0
        for l in range(1, maxlen + 1):
            code = (code + counts[l - 1]) << 1
            firsts[l] = code
            offsets[l] = off
            off += counts[l]
        syms = [s for s, l in sorted(nonzero, key=lambda x: (x[1], x[0]))]
        self.counts, self.offsets, self.firsts, self.syms = (
            counts, offsets, firsts, syms,
        )
        flat = [None] * 256
        for i, (s, l) in enumerate(
            sorted(nonzero, key=lambda x: (x[1], x[0]))
        ):
            if l > 8:
                break
            c = firsts[l] + (i - offsets[l])
            start = c << (8 - l)
            for j in range(start, start + (1 << (8 - l))):
                flat[j] = (s, l)
        self.flat = flat

    def decode(self, bits: _Bits) -> int:
        if self.single is not None:
            return self.single
        hit = self.flat[_REV8[bits.peek8()]]
        if hit is not None:
            s, l = hit
            if bits.pos + l > bits.n:
                raise BrotliError("bitstream exhausted")
            bits.pos += l
            return s
        code = 0
        for l in range(1, len(self.counts)):
            code = (code << 1) | bits.read1()
            idx = code - self.firsts[l]
            if 0 <= idx < self.counts[l]:
                return self.syms[self.offsets[l] + idx]
        raise BrotliError("invalid prefix code")


_CLC_ORDER = (1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)
# the fixed code over code-length-code lengths 0..5 (RFC 7932 §3.5):
# lengths (2,4,3,2,2,4) → canonical codes below, read bit by bit
_CLC_FIXED = _Tree({0: 2, 1: 4, 2: 3, 3: 2, 4: 2, 5: 4})


def _read_prefix_code(bits: _Bits, alphabet_size: int) -> _Tree:
    kind = bits.read(2)
    if kind == 1:  # simple
        nsym = bits.read(2) + 1
        abits = max((alphabet_size - 1).bit_length(), 1)
        syms = [bits.read(abits) for _ in range(nsym)]
        if len(set(syms)) != nsym or any(
            s >= alphabet_size for s in syms
        ):
            raise BrotliError("bad simple-code symbols")
        if nsym == 1:
            return _Tree({syms[0]: 1})  # degenerate: zero-bit symbol
        if nsym == 2:
            syms.sort()
            return _Tree({syms[0]: 1, syms[1]: 1})
        if nsym == 3:
            if syms[1] > syms[2]:
                syms[1], syms[2] = syms[2], syms[1]
            return _Tree({syms[0]: 1, syms[1]: 2, syms[2]: 2})
        if bits.read1():  # (1,2,3,3)
            if syms[2] > syms[3]:
                syms[2], syms[3] = syms[3], syms[2]
            return _Tree(
                {syms[0]: 1, syms[1]: 2, syms[2]: 3, syms[3]: 3}
            )
        syms.sort()
        return _Tree({s: 2 for s in syms})
    # complex: kind is HSKIP (0, 2 or 3)
    clc_lens = {}
    space = 32
    num = 0
    for i in range(kind, 18):
        ln = _CLC_FIXED.decode(bits)
        if ln:
            clc_lens[_CLC_ORDER[i]] = ln
            space -= 32 >> ln
            num += 1
            if space <= 0:
                break
    if num == 1:
        clc_tree = _Tree(clc_lens)  # degenerate: zero-bit symbol
    elif space != 0:
        raise BrotliError("code-length code does not fill")
    else:
        clc_tree = _Tree(clc_lens)
    lengths: dict = {}
    space = 32768
    sym = 0
    prev_nonzero = 8
    last_rep_sym = 0
    rep_count = 0
    while space > 0 and sym < alphabet_size + 1:
        if sym >= alphabet_size:
            raise BrotliError("symbol lengths overrun alphabet")
        c = clc_tree.decode(bits)
        if c < 16:
            if c:
                lengths[sym] = c
                space -= 32768 >> c
                prev_nonzero = c
            sym += 1
            last_rep_sym = 0
        elif c == 16:
            extra = bits.read(2)
            if last_rep_sym == 16:
                new = 4 * (rep_count - 2) + 3 + extra
                delta = new - rep_count
            else:
                new = 3 + extra
                delta = new
            rep_count = new
            last_rep_sym = 16
            for _ in range(delta):
                if sym >= alphabet_size:
                    raise BrotliError("repeat overruns alphabet")
                lengths[sym] = prev_nonzero
                space -= 32768 >> prev_nonzero
                sym += 1
        else:  # 17: repeat zero
            extra = bits.read(3)
            if last_rep_sym == 17:
                new = 8 * (rep_count - 2) + 3 + extra
                delta = new - rep_count
            else:
                new = 3 + extra
                delta = new
            rep_count = new
            last_rep_sym = 17
            sym += delta
            if sym > alphabet_size:
                raise BrotliError("zero-repeat overruns alphabet")
        if space < 0:
            raise BrotliError("symbol lengths overfill")
    if space != 0:
        # the code space must fill EXACTLY; exiting with space left
        # (e.g. a repeat run jumping past the alphabet) would build an
        # under-subscribed tree that decodes wrong-but-plausible
        # symbols instead of declining
        raise BrotliError("prefix code does not fill")
    if len([1 for l in lengths.values() if l]) == 0:
        raise BrotliError("empty prefix code")
    return _Tree(lengths)


def _read_varlen_u8(bits: _Bits) -> int:
    """NBLTYPES-style variable length value (1..256)."""
    if not bits.read1():
        return 1
    n = bits.read(3)
    if n == 0:
        return 2
    return (1 << n) + 1 + bits.read(n)


_BC_BASE = [
    1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145, 177, 209,
    241, 305, 369, 497, 753, 1265, 2289, 4337, 8433, 16625,
]
_BC_EXTRA = [
    2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 7, 8, 9,
    10, 11, 12, 13, 24,
]
_INS_BASE = [
    0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194,
    322, 578, 1090, 2114, 6210, 22594,
]
_INS_EXTRA = [
    0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10,
    12, 14, 24,
]
_CPY_BASE = [
    2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70, 102,
    134, 198, 326, 582, 1094, 2118,
]
_CPY_EXTRA = [
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9,
    10, 24,
]
_INS_RANGE = (0, 0, 8, 8, 0, 16, 8, 16, 16)
_CPY_RANGE = (0, 8, 0, 8, 16, 0, 16, 8, 16)


def _read_context_map(bits: _Bits, n_trees: int, size: int) -> bytes:
    if n_trees == 1:
        return bytes(size)
    rlemax = (bits.read(4) + 1) if bits.read1() else 0
    tree = _read_prefix_code(bits, n_trees + rlemax)
    cmap = bytearray()
    while len(cmap) < size:
        s = tree.decode(bits)
        if s == 0:
            cmap.append(0)
        elif s <= rlemax:
            cmap.extend(bytes((1 << s) + bits.read(s)))
        else:
            cmap.append(s - rlemax)
    if len(cmap) != size:
        raise BrotliError("context map overrun")
    if bits.read1():  # inverse move-to-front
        mtf = list(range(256))
        for i, v in enumerate(cmap):
            val = mtf[v]
            cmap[i] = val
            if v:
                del mtf[v]
                mtf.insert(0, val)
    if any(v >= n_trees for v in cmap):
        raise BrotliError("context map index out of range")
    return bytes(cmap)


class _Blocks:
    """Block-type/count machinery for one category."""

    __slots__ = ("n", "type_tree", "count_tree", "btype", "prev", "left")

    def __init__(self, bits: _Bits):
        self.n = _read_varlen_u8(bits)
        self.btype = 0
        self.prev = 1
        if self.n >= 2:
            self.type_tree = _read_prefix_code(bits, self.n + 2)
            self.count_tree = _read_prefix_code(bits, 26)
            c = self.count_tree.decode(bits)
            self.left = _BC_BASE[c] + bits.read(_BC_EXTRA[c])
        else:
            self.type_tree = None
            self.count_tree = None
            self.left = 1 << 60

    def tick(self, bits: _Bits):
        if self.left == 0:
            s = self.type_tree.decode(bits)
            if s == 0:
                new = self.prev
            elif s == 1:
                new = (self.btype + 1) % self.n
            else:
                new = s - 2
            self.prev = self.btype
            self.btype = new
            c = self.count_tree.decode(bits)
            self.left = _BC_BASE[c] + bits.read(_BC_EXTRA[c])
        self.left -= 1


def _transform_word(word: bytes, tid: int) -> bytes:
    prefix, op, suffix = TRANSFORMS[tid]
    if op == "identity":
        body = word
    elif op.startswith("omit_first_"):
        body = word[int(op[11:]):]
    elif op.startswith("omit_last_"):
        body = word[: len(word) - int(op[10:])]
    else:
        w = bytearray(word)
        i = 0
        while i < len(w):
            c = w[i]
            if c < 192:
                if 97 <= c <= 122:
                    w[i] ^= 32
                i += 1
            elif c < 224:
                if i + 1 < len(w):
                    w[i + 1] ^= 32
                i += 2
            else:
                if i + 2 < len(w):
                    w[i + 2] ^= 5
                i += 3
            if op == "uppercase_first":
                break
        body = bytes(w)
    return prefix + body + suffix


def brotli_decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    """Decompress one brotli stream.  Raises :class:`BrotliError` on
    malformed input.

    Fast path: routes through the system ``libbrotlidec`` ctypes
    bindings (:mod:`._native_codecs`) when the library loads.  Pure
    Python is the fallback and the cross-check oracle (both paths
    pinned to the same encoder goldens in
    tests/test_native_codecs.py)."""
    from clickhouse_table_copier_spark.sources._codec_gate import (
        native_codecs_or_none,
    )

    native = native_codecs_or_none()
    if native is not None and native.brotli_available():
        try:
            return native.brotli_decompress_native(data, max_output)
        except native.NativeDecodeError as e:
            raise BrotliError(str(e)) from None
    return brotli_decompress_pure(data, max_output)


def brotli_decompress_pure(
    data: bytes, max_output: int = 1 << 31
) -> bytes:
    """The pure-Python RFC 7932 decoder — portable fallback and the
    cross-check oracle for the native fast path."""
    bits = _Bits(data)
    try:
        return _decompress(bits, max_output)
    except (IndexError, KeyError) as e:
        raise BrotliError(f"corrupt brotli stream: {e}") from None


def _decompress(bits: _Bits, max_output: int) -> bytes:
    # window bits
    if bits.read1() == 0:
        wbits = 16
    else:
        n = bits.read(3)
        if n != 0:
            wbits = 17 + n
        else:
            m = bits.read(3)
            if m == 0:
                wbits = 17
            elif m == 1:
                raise BrotliError("reserved window-bits code")
            else:
                wbits = 8 + m
    window_size = (1 << wbits) - 16
    out = bytearray()
    # ring[0] = most recent; the spec's initial ring yields last=4,
    # second=11, third=15, fourth=16
    ring = [4, 11, 15, 16]
    while True:
        islast = bits.read1()
        if islast and bits.read1():  # ISLASTEMPTY
            break
        mnib_code = bits.read(2)
        if mnib_code == 3:  # metadata block
            if bits.read1():
                raise BrotliError("reserved metadata bit set")
            skip_bytes = bits.read(2)
            skip_len = bits.read(8 * skip_bytes)
            if skip_bytes:
                skip_len += 1
                if skip_bytes > 1 and skip_len <= (
                    1 << (8 * (skip_bytes - 1))
                ):
                    raise BrotliError("non-minimal metadata length")
            bits.byte_align()
            # advance, don't materialize: MSKIPBYTES=3 allows 16 MiB
            # of metadata — read() would build it as one giant bignum
            if bits.pos + 8 * skip_len > bits.n:
                raise BrotliError("metadata skip overruns input")
            bits.pos += 8 * skip_len
            if islast:
                raise BrotliError("metadata block cannot be last")
            continue
        mlen = bits.read(4 * (mnib_code + 4)) + 1
        if not islast and bits.read1():  # ISUNCOMPRESSED
            bits.byte_align()
            start = bits.pos >> 3
            chunk = bits.b[start : start + mlen]
            if len(chunk) < mlen:
                raise BrotliError("uncompressed block overruns input")
            bits.pos += 8 * mlen
            out += chunk
            if len(out) > max_output:
                raise BrotliError("output exceeds bound")
            continue
        # --- compressed metablock header
        bl_l = _Blocks(bits)
        bl_i = _Blocks(bits)
        bl_d = _Blocks(bits)
        npostfix = bits.read(2)
        ndirect = bits.read(4) << npostfix
        cmodes = [bits.read(2) for _ in range(bl_l.n)]
        ntrees_l = _read_varlen_u8(bits)
        cmap_l = _read_context_map(bits, ntrees_l, 64 * bl_l.n)
        ntrees_d = _read_varlen_u8(bits)
        cmap_d = _read_context_map(bits, ntrees_d, 4 * bl_d.n)
        lit_trees = [
            _read_prefix_code(bits, 256) for _ in range(ntrees_l)
        ]
        cmd_trees = [
            _read_prefix_code(bits, 704) for _ in range(bl_i.n)
        ]
        dist_alpha = 16 + ndirect + (48 << npostfix)
        dist_trees = [
            _read_prefix_code(bits, dist_alpha)
            for _ in range(ntrees_d)
        ]
        # --- data (globals bound to locals: this loop runs once per
        # command, and attribute/global lookups dominate pure-Python
        # decode time)
        read = bits.read
        ins_base, ins_extra = _INS_BASE, _INS_EXTRA
        cpy_base, cpy_extra = _CPY_BASE, _CPY_EXTRA
        ins_range, cpy_range = _INS_RANGE, _CPY_RANGE
        single_lit = ntrees_l == 1 and bl_l.n == 1
        while mlen > 0:
            bl_i.tick(bits)
            cmd = cmd_trees[bl_i.btype].decode(bits)
            cell = cmd >> 6
            dist0 = cell < 2
            lut = cell if cell < 2 else cell - 2
            ic = ins_range[lut] + ((cmd >> 3) & 7)
            cc = cpy_range[lut] + (cmd & 7)
            ins_len = ins_base[ic] + read(ins_extra[ic])
            cpy_len = cpy_base[cc] + read(cpy_extra[cc])
            if ins_len > mlen:
                # the reference decoder rejects commands whose insert
                # part alone exceeds the declared MLEN — emitting the
                # overflow would fabricate bytes past the metablock
                raise BrotliError(
                    "insert length exceeds metablock length"
                )
            if ins_len:
                if single_lit:
                    # single literal tree: the context map is all-zero,
                    # so skip context computation — inlined fast loop
                    tree = lit_trees[0]
                    flat = tree.flat if tree.single is None else None
                    buf = bits.b
                    append = out.append
                    n_bits = bits.n
                    for _ in range(ins_len):
                        if flat is None:
                            append(tree.single)
                            continue
                        pos = bits.pos
                        window = int.from_bytes(
                            buf[pos >> 3 : (pos >> 3) + 2], "little"
                        )
                        hit = flat[_REV8[(window >> (pos & 7)) & 0xFF]]
                        if hit is not None:
                            if pos + hit[1] > n_bits:
                                raise BrotliError("bitstream exhausted")
                            bits.pos = pos + hit[1]
                            append(hit[0])
                        else:
                            append(tree.decode(bits))
                else:
                    for _ in range(ins_len):
                        bl_l.tick(bits)
                        p1 = out[-1] if out else 0
                        p2 = out[-2] if len(out) >= 2 else 0
                        mode = cmodes[bl_l.btype]
                        ctx = (
                            CONTEXT_LUT[(mode << 9) + p1]
                            | CONTEXT_LUT[(mode << 9) + 256 + p2]
                        )
                        tree = lit_trees[
                            cmap_l[(bl_l.btype << 6) + ctx]
                        ]
                        out.append(tree.decode(bits))
            mlen -= ins_len
            if mlen <= 0:
                break
            max_dist = min(len(out), window_size)
            if dist0:
                distance = ring[0]
                dcode = 0
            else:
                bl_d.tick(bits)
                dctx = min(cpy_len, 5) - 2
                tree = dist_trees[cmap_d[(bl_d.btype << 2) + dctx]]
                dcode = tree.decode(bits)
                if dcode < 16:
                    base, delta = (
                        (0, 0), (1, 0), (2, 0), (3, 0),
                        (0, -1), (0, 1), (0, -2), (0, 2),
                        (0, -3), (0, 3), (1, -1), (1, 1),
                        (1, -2), (1, 2), (1, -3), (1, 3),
                    )[dcode]
                    distance = ring[base] + delta
                    if distance <= 0:
                        raise BrotliError("non-positive distance")
                elif dcode < 16 + ndirect:
                    distance = dcode - 15
                else:
                    x = dcode - ndirect - 16
                    hcode = x >> npostfix
                    lcode = x & ((1 << npostfix) - 1)
                    ndistbits = 1 + (hcode >> 1)
                    offset = ((2 + (hcode & 1)) << ndistbits) - 4
                    distance = (
                        ((offset + bits.read(ndistbits)) << npostfix)
                        + lcode + ndirect + 1
                    )
            if distance <= max_dist:
                if cpy_len > mlen:
                    raise BrotliError(
                        "copy length exceeds metablock length"
                    )
                if dcode != 0:
                    ring[3] = ring[2]
                    ring[2] = ring[1]
                    ring[1] = ring[0]
                    ring[0] = distance
                copied = 0
                p0 = len(out) - distance
                while copied < cpy_len:
                    avail = min(cpy_len - copied, len(out) - (p0 + copied))
                    out += out[p0 + copied : p0 + copied + avail]
                    copied += avail
                mlen -= cpy_len
            else:
                # static dictionary reference
                if not 4 <= cpy_len <= 24 or not DICT_SIZE_BITS_BY_LENGTH[
                    cpy_len
                ]:
                    raise BrotliError("invalid dictionary length")
                address = distance - max_dist - 1
                nbits = DICT_SIZE_BITS_BY_LENGTH[cpy_len]
                word_idx = address & ((1 << nbits) - 1)
                tid = address >> nbits
                if tid >= len(TRANSFORMS):
                    raise BrotliError("transform id out of range")
                off = DICT_OFFSETS_BY_LENGTH[cpy_len] + word_idx * cpy_len
                word = DICTIONARY[off : off + cpy_len]
                piece = _transform_word(word, tid)
                if len(piece) > mlen:
                    raise BrotliError(
                        "dictionary word exceeds metablock length"
                    )
                out += piece
                mlen -= len(piece)
            if len(out) > max_output:
                raise BrotliError("output exceeds bound")
        if islast:
            break
    return bytes(out)
