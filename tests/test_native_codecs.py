"""Native/pure codec parity: the ctypes fast path and the pure-Python
reference decoder must be byte-identical on every committed golden.

The trust model (VERDICT r11 "What's wrong #2" remediation): the pure
decoders are spec-pinned against offline CLI/encoder goldens; the
native fast path (``sources/_native_codecs.py``) binds the system
shared libraries through the exact same one-function-per-module seam.
These tests are the cross-check oracle — any divergence between the
system library and the spec-pinned decoder (either direction) fails
here, so swapping the hot path can never silently redefine semantics.

Also pinned: the decline contract THROUGH the native path (corrupt /
truncated inputs raise the module's own error type, never a foreign
exception), and the max_output bound on both paths.
"""

from __future__ import annotations

import pytest

from clickhouse_table_copier_spark.sources import _native_codecs as nc
from clickhouse_table_copier_spark.sources.brotli import (
    BrotliError,
    brotli_decompress,
    brotli_decompress_pure,
)
from clickhouse_table_copier_spark.sources.lz4 import (
    Lz4Error,
    lz4_decompress,
    lz4_decompress_pure,
)
from clickhouse_table_copier_spark.sources.zstd import (
    ZstdDict,
    ZstdError,
    zstd_decompress,
    zstd_decompress_pure,
)

from tests import test_brotli_golden as bg
from tests import test_lz4_golden as lg
from tests import test_zstd_golden as zg

native_zstd = pytest.mark.skipif(
    not nc.zstd_available(), reason="libzstd not loadable"
)
native_lz4 = pytest.mark.skipif(
    not nc.lz4_available(), reason="liblz4 not loadable"
)
native_brotli = pytest.mark.skipif(
    not nc.brotli_available(), reason="libbrotlidec not loadable"
)


_ZSTD_GOLDENS = [
    "TEXT_L3", "TEXT_L19", "JSONL_L22", "JSONL_L1_NOCHK", "RLE_L9",
    "RANDOM_L3", "EMPTY_L3", "MULTIFRAME", "WARC_ZST",
]


@native_zstd
@pytest.mark.parametrize("name", _ZSTD_GOLDENS)
def test_zstd_parity_on_goldens(name):
    blob = getattr(zg, name)
    assert nc.zstd_decompress_native(
        blob, 1 << 31
    ) == zstd_decompress_pure(blob)


@native_zstd
def test_zstd_parity_dictionary_frame():
    zd = ZstdDict(zg.DICT_BYTES)
    want = zstd_decompress_pure(zg.DICT_FRAME_L19, zdict=zd)
    assert nc.zstd_decompress_native(
        zg.DICT_FRAME_L19, 1 << 31, zg.DICT_BYTES
    ) == want


@native_zstd
def test_zstd_native_declines_cleanly():
    """Decline contract through the PUBLIC seam (native engaged):
    ZstdError only, never a foreign exception."""
    for bad in (
        b"\x00" * 8,
        b"\x28\xb5\x2f\xfd",
        b"\x28\xb5\x2f\xfd" + b"\xff" * 16,
        zg.TEXT_L3[: len(zg.TEXT_L3) // 2],
        zg.TEXT_L3[:-3],  # truncated checksum
        zg.DICT_FRAME_L19,  # needs a dictionary
    ):
        with pytest.raises(ZstdError):
            zstd_decompress(bad)


@native_zstd
def test_zstd_native_max_output_bound():
    with pytest.raises(ZstdError):
        zstd_decompress(zg.TEXT_L3, max_output=10)


@native_zstd
def test_zstd_native_mutation_sweep_declines_or_matches():
    """Byte flips through the native path: every outcome is either a
    ZstdError decline or (flip landed in bytes that cannot change the
    content, e.g. a skippable-frame body) output identical to the
    pure decoder on the same mutant — never a foreign exception,
    never divergence between the two paths."""
    blob = zg.JSONL_L22
    for i in range(4, len(blob), 53):
        mangled = bytes(
            blob[:i] + bytes([blob[i] ^ 0xFF]) + blob[i + 1 :]
        )
        try:
            got = nc.zstd_decompress_native(mangled, 1 << 24)
        except nc.NativeDecodeError:
            continue
        try:
            pure = zstd_decompress_pure(mangled, 1 << 24)
        except ZstdError:
            # the library salvaged something the strict pure decoder
            # declines — acceptable only if the library's answer is
            # the ORIGINAL payload (flip landed in dead bytes)
            pure = zstd_decompress_pure(blob, 1 << 24)
        assert got == pure


_LZ4_GOLDENS = [
    "TEXT_L1", "TEXT_L9_LINKED", "JSONL_L9", "RANDOM_L1", "EMPTY_L9",
]


@native_lz4
@pytest.mark.parametrize("name", _LZ4_GOLDENS)
def test_lz4_parity_on_goldens(name):
    blob = getattr(lg, name)
    assert nc.lz4_decompress_native(
        blob, 1 << 31
    ) == lz4_decompress_pure(blob)


@native_lz4
def test_lz4_native_declines_cleanly():
    for bad in (
        b"\x00" * 8,
        b"\x04\x22\x4d\x18",  # magic then nothing
        lg.TEXT_L1[: len(lg.TEXT_L1) // 2],
    ):
        with pytest.raises(Lz4Error):
            lz4_decompress(bad)


@native_lz4
def test_lz4_native_max_output_bound():
    with pytest.raises(Lz4Error):
        lz4_decompress(lg.TEXT_L1, max_output=10)


_BROTLI_GOLDENS = [
    "TEXT_Q1", "TEXT_Q5", "TEXT_Q11", "HTML_Q9", "HTML_Q11_W10",
    "UTF8_Q11", "JSONL_Q5", "RANDOM_Q5", "EMPTY_Q11", "TINY_Q11",
]


@native_brotli
@pytest.mark.parametrize("name", _BROTLI_GOLDENS)
def test_brotli_parity_on_goldens(name):
    blob = getattr(bg, name)
    assert nc.brotli_decompress_native(
        blob, 1 << 31
    ) == brotli_decompress_pure(blob)


@native_brotli
def test_brotli_native_declines_cleanly():
    for bad in (
        bg.TEXT_Q5[: len(bg.TEXT_Q5) // 2],
        b"\xff" * 32,
    ):
        with pytest.raises(BrotliError):
            brotli_decompress(bad)


@native_brotli
def test_brotli_native_max_output_bound():
    with pytest.raises(BrotliError):
        brotli_decompress(bg.TEXT_Q5, max_output=16)


def test_public_seam_uses_native_when_available():
    """On this container the libraries ship — the public functions
    must take the fast path (sanity that the wiring is live, not
    silently falling back)."""
    if not (
        nc.zstd_available()
        and nc.lz4_available()
        and nc.brotli_available()
    ):
        pytest.skip("container without native libs")
    # byte-for-byte equal on a golden via the public seam
    assert zstd_decompress(zg.TEXT_L3) == zstd_decompress_pure(
        zg.TEXT_L3
    )
    assert lz4_decompress(lg.TEXT_L1) == lz4_decompress_pure(
        lg.TEXT_L1
    )
    assert brotli_decompress(bg.TEXT_Q5) == brotli_decompress_pure(
        bg.TEXT_Q5
    )


def test_verify_false_routes_pure():
    """verify_checksums=False exists to salvage checksum-damaged
    shards; the native library always verifies, so that flag must
    reach the pure decoder (which can skip the check)."""
    blob = bytearray(zg.RLE_L9)
    blob[-1] ^= 0xFF  # damage the trailing XXH64 checksum byte
    with pytest.raises(ZstdError):
        zstd_decompress(bytes(blob))
    assert zstd_decompress(
        bytes(blob), verify_checksums=False
    ) == b"A" * 10000


# --------------------------------------------------- compress egress


import shutil
import subprocess


def test_store_frame_roundtrips_pure():
    """The stored-block fallback writer must produce frames the
    spec-pinned pure decoder reads back exactly — every FCS size
    shape plus the multi-block path."""
    from clickhouse_table_copier_spark.sources.zstd import (
        zstd_store_frame,
    )

    for n in (0, 1, 255, 256, 65791, 65792, 200_000):
        payload = bytes(i * 31 % 256 for i in range(n))
        frame = zstd_store_frame(payload)
        assert zstd_decompress_pure(frame) == payload


@native_zstd
def test_native_compress_pure_decode_parity():
    """Frames from libzstd must decode identically through BOTH
    paths (incl. checksum verification), at several levels."""
    payload = (b"warc record payload " * 400) + bytes(range(256))
    for level in (1, 3, 19):
        frame = nc.zstd_compress_native(payload, level)
        assert zstd_decompress_pure(frame) == payload
        assert nc.zstd_decompress_native(frame, 1 << 31) == payload


@native_zstd
def test_compressed_frames_concatenate():
    """The .warc.zst layout: one frame per record, frames
    concatenated — both decoders must walk the whole stream."""
    from clickhouse_table_copier_spark.sources.zstd import (
        zstd_compress,
        zstd_store_frame,
    )

    a, b, c = b"alpha" * 100, b"", b"gamma" * 3
    stream = zstd_compress(a) + zstd_store_frame(b) + zstd_compress(c)
    assert zstd_decompress_pure(stream) == a + b + c
    assert zstd_decompress(stream) == a + b + c


@pytest.mark.skipif(
    shutil.which("zstd") is None, reason="no zstd CLI in PATH"
)
def test_written_frames_decode_with_reference_cli(tmp_path):
    """Independent cross-check: the reference zstd CLI must accept
    both the stored-frame fallback and (when available) the native
    frames."""
    from clickhouse_table_copier_spark.sources.zstd import (
        zstd_compress,
        zstd_store_frame,
    )

    payload = b"reference-cli cross check " * 123
    blobs = [zstd_store_frame(payload)]
    if nc.zstd_available():
        blobs.append(zstd_compress(payload))
    for blob in blobs:
        got = subprocess.run(
            ["zstd", "-d", "-c"], input=blob, capture_output=True
        )
        assert got.returncode == 0
        assert got.stdout == payload


@native_lz4
def test_lz4_native_mutation_sweep_declines_or_agrees():
    """Byte flips through the native lz4 path: decline or agree with
    the pure decoder — never a foreign exception.  (Native verifies
    checksums the pure decoder skips, so native may decline strictly
    more mutants; it must never ACCEPT one the pure decoder maps to
    different bytes.)"""
    blob = lg.JSONL_L9
    for i in range(4, len(blob), 41):
        mangled = bytes(
            blob[:i] + bytes([blob[i] ^ 0xFF]) + blob[i + 1 :]
        )
        try:
            got = nc.lz4_decompress_native(mangled, 1 << 24)
        except nc.NativeDecodeError:
            continue
        try:
            pure = lz4_decompress_pure(mangled, 1 << 24)
        except Lz4Error:
            pure = lz4_decompress_pure(blob, 1 << 24)
        assert got == pure


@native_brotli
def test_brotli_native_mutation_sweep_declines_or_agrees():
    """Byte flips through the native brotli path: decline, or agree
    with the pure decoder on the same mutant (brotli has no checksum,
    so some flips decode validly on both paths — they must then
    decode IDENTICALLY)."""
    blob = bg.JSONL_Q5
    for i in range(2, len(blob), 29):
        mangled = bytes(
            blob[:i] + bytes([blob[i] ^ 0xFF]) + blob[i + 1 :]
        )
        try:
            got = nc.brotli_decompress_native(mangled, 1 << 24)
        except nc.NativeDecodeError:
            continue
        try:
            pure = brotli_decompress_pure(mangled, 1 << 24)
        except BrotliError:
            continue  # pure is stricter on this mutant: acceptable
        assert got == pure


@native_zstd
def test_exact_chunk_multiple_outputs_roundtrip():
    """Round-12 review regression (reproduced): outputs that are
    exact multiples of the native decoder's 1 MiB chunk used to raise
    a false 'truncated zstd input' — completion must come from the
    library's own ret==0 signal, not a non-full output buffer."""
    for n in (1 << 20, 2 << 20):
        payload = bytes(i & 0xFF for i in range(n))
        frame = nc.zstd_compress_native(payload)
        assert nc.zstd_decompress_native(frame, 1 << 31) == payload
        # and through the public seam (no silent pure fallback)
        assert zstd_decompress(frame) == payload
        # the stored-frame writer at the same sizes
        from clickhouse_table_copier_spark.sources.zstd import (
            zstd_store_frame,
        )

        assert zstd_decompress(zstd_store_frame(payload)) == payload


def test_egress_gzip_members_are_deterministic():
    """Round-12 review: gzip members embed mtime — the shared egress
    codec pins mtime=0 so identical inputs give identical shard
    bytes (reproducible re-publish)."""
    from clickhouse_table_copier_spark.sources.shard_io import (
        egress_codec,
    )

    _, pack = egress_codec("gzip")
    blob = pack(b"reproducible")
    # gzip header: magic(2) method(1) flags(1) mtime(4 LE) == 0
    assert blob[4:8] == b"\x00\x00\x00\x00"
    import gzip as _gzip

    assert _gzip.decompress(blob) == b"reproducible"


def test_egress_codec_rejects_unknown():
    from clickhouse_table_copier_spark.sources.shard_io import (
        egress_codec,
    )

    with pytest.raises(ValueError):
        egress_codec("xz")


@native_lz4
def test_lz4_checksum_damage_salvages_through_pure():
    """Round-12 review regression (reproduced): the native path
    enforces content checksums the pure decoder deliberately skips —
    a checksum-damaged but payload-intact shard must salvage through
    the pure decoder (zero rows lost), not decline wholesale."""
    blob = lg.TEXT_L1
    flg = blob[4]
    if not (flg >> 2) & 1:
        pytest.skip("golden has no content checksum to damage")
    want = lz4_decompress_pure(blob)
    mangled = blob[:-1] + bytes([blob[-1] ^ 0xFF])  # checksum tail
    # native alone declines it ...
    with pytest.raises(nc.NativeDecodeError):
        nc.lz4_decompress_native(mangled, 1 << 31)
    # ... but the public seam salvages byte-identical content
    assert lz4_decompress(mangled) == want


# ------------------------------------------------- property tests


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.binary(max_size=300_000))
@settings(max_examples=40, deadline=None)
def test_store_frame_property_roundtrip(payload):
    """Any byte string survives zstd_store_frame through BOTH
    decoders byte-identically (the stored-frame writer is the
    zero-dependency egress fallback — it must never corrupt)."""
    from clickhouse_table_copier_spark.sources.zstd import (
        zstd_store_frame,
    )

    frame = zstd_store_frame(payload)
    assert zstd_decompress_pure(frame) == payload
    if nc.zstd_available():
        assert nc.zstd_decompress_native(frame, 1 << 31) == payload


@given(st.binary(max_size=100_000))
@settings(max_examples=30, deadline=None)
def test_native_compress_property_roundtrip(payload):
    """compress → decompress is identity through every path pair."""
    if not nc.zstd_available():
        return
    frame = nc.zstd_compress_native(payload, 3)
    assert nc.zstd_decompress_native(frame, 1 << 31) == payload
    assert zstd_decompress_pure(frame) == payload


@native_lz4
def test_lz4_header_checksum_damage_still_salvages():
    """ADVICE r12 follow-up: the salvage gate matches EXACT
    LZ4F_getErrorName suffixes now — and headerChecksum_invalid stays
    IN the salvageable set, because the pure decoder deliberately
    ignores the HC byte ('header checksum ... not verified'), so an
    HC-corrupted but otherwise-intact frame recovers byte-identical
    content instead of hard-failing."""
    blob = bytearray(lg.TEXT_L1)
    flg = blob[4]
    hc_idx = 6 + (8 if (flg >> 3) & 1 else 0) + (4 if flg & 1 else 0)
    blob[hc_idx] ^= 0xFF
    with pytest.raises(nc.NativeDecodeError, match="headerChecksum"):
        nc.lz4_decompress_native(bytes(blob), 1 << 31)
    assert lz4_decompress(bytes(blob)) == lz4_decompress_pure(
        lg.TEXT_L1
    )


@native_lz4
def test_lz4_non_checksum_errors_raise_without_salvage():
    """A structural defect (bad magic past a valid first frame) must
    raise Lz4Error from the native path without a pure re-decode
    succeeding behind it."""
    blob = lg.TEXT_L1 + b"\x00\x11\x22\x33garbage-frame"
    with pytest.raises(Lz4Error):
        lz4_decompress(blob)


def test_xxh32_published_vectors():
    """The stored-frame writer's checksum primitive against published
    XXH32 vectors."""
    from clickhouse_table_copier_spark.sources.lz4 import _xxh32

    assert _xxh32(b"") == 0x02CC5D05
    assert _xxh32(b"a") == 0x550D7456
    assert _xxh32(b"abc") == 0x32D153FF


def test_lz4_store_frame_roundtrips_both_decoders():
    from clickhouse_table_copier_spark.sources.lz4 import (
        lz4_store_frame,
    )

    for n in (0, 1, 100, (1 << 22) + 17):
        payload = bytes(i * 37 % 256 for i in range(n))
        frame = lz4_store_frame(payload)
        assert lz4_decompress_pure(frame) == payload
        # native verifies the REAL xxh32 header/content checksums the
        # writer computed — a checksum bug would decline here
        if nc.lz4_available():
            assert nc.lz4_decompress_native(frame, 1 << 31) == payload


def test_lz4_store_frame_large_payload_omits_content_checksum():
    """Advisor r13: above _CONTENT_CKSUM_MAX the stored-frame writer
    clears the content-checksum FLG bit (pure-Python XXH32 over a
    multi-hundred-MB shard would dominate the library-absent egress
    write).  Both decoders must still accept the frame."""
    from clickhouse_table_copier_spark.sources import lz4 as lz4mod

    payload = bytes(1024) * ((lz4mod._CONTENT_CKSUM_MAX >> 10) + 1)
    assert len(payload) > lz4mod._CONTENT_CKSUM_MAX
    frame = lz4mod.lz4_store_frame(payload)
    assert frame[4] == 0x68  # FLG: content-size set, content-cksum clear
    # no 4-byte checksum after EndMark
    assert frame[-4:] == (0).to_bytes(4, "little")
    assert lz4_decompress_pure(frame) == payload
    if nc.lz4_available():
        assert nc.lz4_decompress_native(frame, 1 << 31) == payload
    # at/below the bound the checksum stays on
    small = lz4mod.lz4_store_frame(b"x" * 100)
    assert small[4] == 0x6C


@native_lz4
def test_lz4_native_compress_pure_decode_parity():
    from clickhouse_table_copier_spark.sources.lz4 import lz4_compress

    payload = (b"jsonl corpus line " * 400) + bytes(range(256))
    for level in (0, 1, 9):
        frame = nc.lz4_compress_native(payload, level)
        assert lz4_decompress_pure(frame) == payload
        assert nc.lz4_decompress_native(frame, 1 << 31) == payload
    # frames concatenate (the shard layout)
    s = lz4_compress(b"alpha" * 50) + lz4_compress(b"") + lz4_compress(b"g")
    assert lz4_decompress(s) == b"alpha" * 50 + b"g"


@pytest.mark.skipif(
    shutil.which("lz4") is None, reason="no lz4 CLI in PATH"
)
def test_lz4_written_frames_decode_with_reference_cli():
    """Independent cross-check: the reference lz4 CLI must accept both
    the stored-frame fallback and (when available) the native
    frames."""
    from clickhouse_table_copier_spark.sources.lz4 import (
        lz4_compress,
        lz4_store_frame,
    )

    payload = b"reference-cli cross check " * 123
    blobs = [lz4_store_frame(payload)]
    if nc.lz4_available():
        blobs.append(lz4_compress(payload))
    for blob in blobs:
        got = subprocess.run(
            ["lz4", "-d", "-c"], input=blob, capture_output=True
        )
        assert got.returncode == 0, got.stderr
        assert got.stdout == payload


def test_egress_codec_lz4_symmetry(tmp_path):
    """write_jsonl(compression='lz4') shards must ingest back through
    read_jsonl's magic sniff byte-identically."""
    from clickhouse_table_copier_spark.sources.shard_io import (
        egress_codec,
    )

    ext, pack = egress_codec("lz4")
    assert ext == ".lz4"
    member = pack(b'{"doc_id": 1}\n') + pack(b'{"doc_id": 2}\n')
    assert (
        lz4_decompress(member) == b'{"doc_id": 1}\n{"doc_id": 2}\n'
    )


@native_lz4
def test_lz4_compress_degrades_to_stored_frame_without_compress_api():
    """Second r13 review pass: a decompress-only liblz4 (pre frame-
    compress API) must keep the decompress fast path AND degrade
    lz4_compress to the stored-frame writer, not raise."""
    from clickhouse_table_copier_spark.sources.lz4 import lz4_compress

    lib = nc._lz4_lib()
    assert getattr(lib, "_lz4_compress_ok", False)
    payload = b"decompress-only library " * 40
    try:
        lib._lz4_compress_ok = False
        with pytest.raises(nc.NativeDecodeError):
            nc.lz4_compress_native(payload, 0)
        frame = lz4_compress(payload)  # stored-frame degradation
        assert lz4_decompress_pure(frame) == payload
        assert nc.lz4_decompress_native(frame, 1 << 31) == payload
    finally:
        lib._lz4_compress_ok = True
    assert lz4_decompress(lz4_compress(payload)) == payload
