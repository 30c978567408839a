"""LZ4 frame decompression (and frame egress) — zero dependencies.

``.jsonl.lz4`` corpus shards and lz4-framed intermediate artifacts
show up in LLM-data tooling next to zstd; this container has no lz4
module.  Implements the LZ4 FRAME format (the public spec at
lz4.github.io): magic 0x184D2204, FLG/BD descriptor (version,
block-independence, checksum flags, content size), data blocks
(compressed or stored, 4-byte size with the high-bit stored flag),
linked-block history, skippable frames, and the LZ4 BLOCK format
(token nibbles, 255-extension lengths, 2-byte little-endian offsets,
minimum match 4, overlap-extending copies).  Checksums (xxhash32) are
skipped, not verified — same trade as the zstd decoder.

Pinned against the reference CLI (lz4 v1.9.4) in
tests/test_lz4_golden.py across shapes that force stored blocks,
linked history and long matches.

The COMPRESS side (r13, VERDICT r12 item 7): :func:`lz4_compress`
routes through liblz4's ``LZ4F_compressFrame`` (checksummed, real
compression) with :func:`lz4_store_frame` — spec-correct
uncompressed-block frames with real XXH32 header/content checksums —
as the library-absent fallback; both pinned against the reference
CLI and the pure decoder in tests/test_native_codecs.py.

Scale shape: runs inside the Arrow-batched corpus-shard edges
(:func:`sources.jsonl.read_jsonl`); compressed bytes never shuffle.

Reference parity: none — north-star LLM-pipeline surface (SURVEY.md
§2.8); the reference engine reads SQL tables only.
"""

from __future__ import annotations

_MAGIC = 0x184D2204
_SKIP_LO = 0x184D2A50


class Lz4Error(ValueError):
    """Malformed lz4 data."""


def _lz4_decode_block(
    src: bytes, history: bytearray, max_output: int, floor: int = 0
):
    """One LZ4 block into ``history`` (appended in place).  ``floor``
    bounds how far back matches may reach — the current FRAME's start,
    so a corrupt offset cannot source bytes from a previous frame's
    output (decline, never fabricate)."""
    i = 0
    n = len(src)
    base = len(history)
    while i < n:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if i >= n:
                    raise Lz4Error("truncated literal length")
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if i + lit_len > n:
            raise Lz4Error("literal run overruns block")
        history += src[i : i + lit_len]
        i += lit_len
        if len(history) - base > max_output:
            raise Lz4Error("output exceeds bound")
        if i >= n:
            break  # last sequence has no match part
        if i + 2 > n:
            raise Lz4Error("truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise Lz4Error("zero match offset")
        match_len = (token & 15) + 4
        if (token & 15) == 15:
            while True:
                if i >= n:
                    raise Lz4Error("truncated match length")
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        p0 = len(history) - offset
        if p0 < floor:
            raise Lz4Error("match offset before frame start")
        copied = 0
        while copied < match_len:
            avail = min(match_len - copied, len(history) - (p0 + copied))
            history += history[p0 + copied : p0 + copied + avail]
            copied += avail
        if len(history) - base > max_output:
            raise Lz4Error("output exceeds bound")


def lz4_decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    """Decompress a complete lz4-frame input (frames may be
    concatenated; skippable frames allowed).

    Fast path: routes through the system ``liblz4`` ctypes bindings
    (:mod:`._native_codecs`) when the library loads — the native path
    additionally verifies block/content checksums (strictly safer
    than the pure decoder, which skips them).  Pure Python is the
    fallback and the cross-check oracle (both paths pinned to the
    same CLI goldens in tests/test_native_codecs.py)."""
    from clickhouse_table_copier_spark.sources._codec_gate import (
        native_codecs_or_none,
    )

    native = native_codecs_or_none()
    if native is not None and native.lz4_available():
        try:
            return native.lz4_decompress_native(data, max_output)
        except native.NativeDecodeError as e:
            msg = str(e)
            # Salvageable = CHECKSUM-mismatch defects only, matched by
            # EXACT LZ4F_getErrorName suffix (ADVICE r12; the old
            # substring 'hecksum' also caught contentChecksumFlag_
            # invalid — a header FLAG-structure defect, not a checksum
            # mismatch).  content/block checksums the pure decoder
            # SKIPS by design; the header-checksum BYTE it likewise
            # ignores ("HC not verified"), so an HC-corrupted but
            # otherwise-intact frame still recovers — same contract as
            # the zstd shard salvage retry (round-12 review: enforcing
            # the library's checksum here silently lost shards the
            # pure decoder used to recover).
            if (
                msg.endswith("contentChecksum_invalid")
                or msg.endswith("blockChecksum_invalid")
                or msg.endswith("headerChecksum_invalid")
            ):
                return lz4_decompress_pure(data, max_output)
            raise Lz4Error(msg) from None
    return lz4_decompress_pure(data, max_output)


def lz4_decompress_pure(data: bytes, max_output: int = 1 << 31) -> bytes:
    """The pure-Python LZ4 frame decoder — portable fallback and the
    cross-check oracle for the native fast path."""
    pos = 0
    out = bytearray()
    try:
        while pos < len(data):
            magic = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
            if (magic & 0xFFFFFFF0) == _SKIP_LO:
                size = int.from_bytes(data[pos : pos + 4], "little")
                pos += 4 + size
                continue
            if magic != _MAGIC:
                raise Lz4Error("bad lz4 frame magic")
            flg = data[pos]
            bd = data[pos + 1]
            pos += 2
            if (flg >> 6) != 1:
                raise Lz4Error("unsupported lz4 frame version")
            block_indep = (flg >> 5) & 1
            block_checksum = (flg >> 4) & 1
            content_size = (flg >> 3) & 1
            content_checksum = (flg >> 2) & 1
            dict_id = flg & 1
            if bd & 0x8F:
                raise Lz4Error("reserved BD bits set")
            if content_size:
                pos += 8
            if dict_id:
                raise Lz4Error("lz4 dictionaries not supported")
            pos += 1  # header checksum (xxh32 byte) — not verified
            frame_out_start = len(out)
            while True:
                if pos + 4 > len(data):
                    # int.from_bytes(b"") == 0 would masquerade as a
                    # clean EndMark on a boundary-truncated shard
                    raise Lz4Error("truncated block size")
                bsize = int.from_bytes(data[pos : pos + 4], "little")
                pos += 4
                if bsize == 0:  # EndMark
                    break
                stored = bsize >> 31
                bsize &= 0x7FFFFFFF
                block = data[pos : pos + bsize]
                if len(block) < bsize:
                    raise Lz4Error("block overruns input")
                pos += bsize
                if stored:
                    out += block
                else:
                    if block_indep:
                        tmp = bytearray()
                        _lz4_decode_block(block, tmp, max_output)
                        out += tmp
                    else:
                        # linked blocks reference earlier output of
                        # THIS frame only
                        _lz4_decode_block(
                            block, out, max_output, frame_out_start
                        )
                if len(out) > max_output:
                    raise Lz4Error("output exceeds bound")
                if block_checksum:
                    pos += 4
            if content_checksum:
                pos += 4
        return bytes(out)
    except IndexError:
        raise Lz4Error("truncated lz4 input") from None


def _xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 (public algorithm; the LZ4 frame header/content checksum
    primitive).  Pure Python — used only by the stored-frame WRITER,
    which emits a handful of frames per egress shard."""
    p1, p2, p3, p4, p5 = (
        2654435761, 2246822519, 3266489917, 668265263, 374761393,
    )
    mask = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & mask

    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + p1 + p2) & mask
        v2 = (seed + p2) & mask
        v3 = seed & mask
        v4 = (seed - p1) & mask
        while i + 16 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 4 * j : i + 4 * j + 4], "little")
                v = (v + lane * p2) & mask
                v = (rotl(v, 13) * p1) & mask
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & mask
    else:
        h = (seed + p5) & mask
    h = (h + n) & mask
    while i + 4 <= n:
        h = (h + int.from_bytes(data[i : i + 4], "little") * p3) & mask
        h = (rotl(h, 17) * p4) & mask
        i += 4
    while i < n:
        h = (h + data[i] * p5) & mask
        h = (rotl(h, 11) * p1) & mask
        i += 1
    h ^= h >> 15
    h = (h * p2) & mask
    h ^= h >> 13
    h = (h * p3) & mask
    h ^= h >> 16
    return h


# Above this payload size the stored-frame writer OMITS the optional
# content checksum (clears FLG bit 2): _xxh32 is pure Python (~MB/s),
# so hashing a multi-hundred-MB shard would dominate the write on the
# library-absent egress path (advisor r13).  8 MiB keeps the checksum
# on every test/metadata-sized frame at a bounded ~2 s worst case;
# the pure decoder skips content-checksum VERIFICATION by design, and
# liblz4 accepts either FLG form, so readers are unaffected.
_CONTENT_CKSUM_MAX = 8 << 20


def lz4_store_frame(data: bytes) -> bytes:
    """An LZ4 frame of UNCOMPRESSED blocks per the frame-format spec —
    block-independent, content size recorded, XXH32 header checksum,
    and (for payloads <= ``_CONTENT_CKSUM_MAX``) the optional XXH32
    content checksum.  Pure Python, no compression: the portable
    fallback for :func:`lz4_compress` when liblz4 is absent (same
    policy as :func:`zstd.zstd_store_frame`)."""
    with_cksum = len(data) <= _CONTENT_CKSUM_MAX
    # version 01, block-indep, content size (+ content cksum if small)
    flg = 0x6C if with_cksum else 0x68
    bd = 0x70  # 4 MiB block max
    desc = bytes([flg, bd]) + len(data).to_bytes(8, "little")
    out = bytearray(_MAGIC.to_bytes(4, "little"))
    out += desc
    out.append((_xxh32(desc) >> 8) & 0xFF)
    for i in range(0, len(data), 1 << 22):
        chunk = data[i : i + (1 << 22)]
        out += (0x80000000 | len(chunk)).to_bytes(4, "little")
        out += chunk
    out += (0).to_bytes(4, "little")  # EndMark
    if with_cksum:
        out += _xxh32(data).to_bytes(4, "little")
    return bytes(out)


def lz4_compress(data: bytes, level: int = 0) -> bytes:
    """One complete LZ4 frame.  Native liblz4 (checksummed, real
    compression at ``level``) when the library loads; otherwise the
    spec-correct STORED frame from :func:`lz4_store_frame`.  The
    ``.jsonl.lz4`` egress seam; frames concatenate.

    Failure policy (matches :func:`zstd.zstd_compress`, round-12
    review): the stored-frame writer is the LIBRARY-ABSENT fallback
    only — if liblz4 loaded but compression fails, that raises
    Lz4Error rather than silently shipping uncompressed frames."""
    from clickhouse_table_copier_spark.sources._codec_gate import (
        native_codecs_or_none,
    )

    native = native_codecs_or_none()
    if native is not None and native.lz4_available():
        try:
            return native.lz4_compress_native(data, level)
        except native.NativeDecodeError as e:
            if "not available" in str(e):
                # decompress-only liblz4 (pre-frame-compress API):
                # stored frames, same as the library-absent path
                return lz4_store_frame(data)
            raise Lz4Error(str(e)) from None
    return lz4_store_frame(data)
