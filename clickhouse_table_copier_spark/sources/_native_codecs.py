"""ctypes fast path for the crawl-ingest codecs (zstd / lz4 / brotli).

The pure-Python decoders in :mod:`.zstd`, :mod:`.lz4` and
:mod:`.brotli` are the portable reference implementations — complete,
spec-pinned, zero dependencies.  But pure-Python zstd self-measures
~49 MB/s/core while the system ``libzstd`` does ~20-40x that, and at
100 TB of ``.warc.zst`` / ``Content-Encoding: br`` bodies the decode
CPU is the single biggest line-item in the whole ingest path.  This
module binds the system shared libraries through ctypes — **zero new
pip dependencies** — behind the exact same one-function-per-module
seam (``zstd_decompress`` / ``lz4_decompress`` / ``brotli_decompress``
in their home modules call in here when the library loads, and fall
back to pure Python when it doesn't).

Trust contract: the pure-Python decoders stay the cross-check oracle.
``tests/test_native_codecs.py`` decodes every committed CLI golden
through BOTH paths and asserts byte-identical output, so a divergence
between the system library and the spec-pinned decoder fails CI — the
native path never silently redefines the semantics.

Error mapping: every native failure raises :class:`NativeDecodeError`
here; the home modules re-raise it as their own decline type
(``ZstdError`` / ``Lz4Error`` / ``BrotliError``), preserving the
decline-never-fail salvage contract at the WARC/jsonl edges.

All libraries are dlopened lazily and cached; a missing or broken
library makes ``*_available()`` return False and costs one failed
probe per process, never an exception to the caller.

Reference parity: none — north-star LLM-pipeline surface (SURVEY.md
§2.8); the reference engine reads SQL tables only.
"""

from __future__ import annotations

import ctypes
import ctypes.util


class NativeDecodeError(Exception):
    """A native library rejected the input (corrupt / truncated /
    over-bound).  Callers re-raise as their module's decline type."""


_LIB_CACHE: dict = {}  # name -> configured CDLL, or False after a failed probe


def _load(key: str, sonames: tuple, configure) -> "ctypes.CDLL | None":
    got = _LIB_CACHE.get(key)
    if got is False:
        return None
    if got is not None:
        return got
    for name in sonames:
        try:
            lib = ctypes.CDLL(name)
            configure(lib)
            _LIB_CACHE[key] = lib
            return lib
        except Exception:
            continue
    _LIB_CACHE[key] = False
    return None


# ------------------------------------------------------------------ zstd

class _ZBuf(ctypes.Structure):
    """ZSTD_inBuffer / ZSTD_outBuffer share this layout."""

    _fields_ = [
        ("ptr", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


_ZSTD_D_WINDOWLOGMAX = 100  # ZSTD_d_windowLogMax (stable API enum)


_ZSTD_C_LEVEL = 100  # ZSTD_c_compressionLevel
_ZSTD_C_CHECKSUM = 201  # ZSTD_c_checksumFlag


def _cfg_zstd(z):
    z.ZSTD_createDCtx.restype = ctypes.c_void_p
    z.ZSTD_freeDCtx.argtypes = [ctypes.c_void_p]
    z.ZSTD_createCCtx.restype = ctypes.c_void_p
    z.ZSTD_freeCCtx.argtypes = [ctypes.c_void_p]
    z.ZSTD_CCtx_setParameter.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int
    ]
    z.ZSTD_CCtx_setParameter.restype = ctypes.c_size_t
    z.ZSTD_compress2.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    z.ZSTD_compress2.restype = ctypes.c_size_t
    z.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    z.ZSTD_compressBound.restype = ctypes.c_size_t
    z.ZSTD_CCtx_loadDictionary.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t
    ]
    z.ZSTD_CCtx_loadDictionary.restype = ctypes.c_size_t
    z.ZSTD_DCtx_setParameter.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int
    ]
    z.ZSTD_DCtx_setParameter.restype = ctypes.c_size_t
    z.ZSTD_DCtx_loadDictionary.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t
    ]
    z.ZSTD_DCtx_loadDictionary.restype = ctypes.c_size_t
    z.ZSTD_decompressStream.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(_ZBuf), ctypes.POINTER(_ZBuf)
    ]
    z.ZSTD_decompressStream.restype = ctypes.c_size_t
    z.ZSTD_isError.argtypes = [ctypes.c_size_t]
    z.ZSTD_isError.restype = ctypes.c_uint
    z.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
    z.ZSTD_getErrorName.restype = ctypes.c_char_p
    # probe: a context must be creatable
    dctx = z.ZSTD_createDCtx()
    if not dctx:
        raise OSError("ZSTD_createDCtx returned NULL")
    z.ZSTD_freeDCtx(dctx)


def _zstd_lib():
    return _load("zstd", ("libzstd.so.1", "libzstd.so"), _cfg_zstd)


def zstd_available() -> bool:
    return _zstd_lib() is not None


_CHUNK = 1 << 20  # 1 MiB output granule per native call


def zstd_decompress_native(
    data: bytes, max_output: int, dict_raw: "bytes | None" = None,
) -> bytes:
    """Streaming multi-frame decode via libzstd.  Handles skippable
    frames, frame concatenation and §5 dictionaries (auto-detected
    structured vs raw-content, same as the pure decoder); content
    checksums are always verified (the library default — callers
    route ``verify_checksums=False`` to the pure path instead)."""
    z = _zstd_lib()
    if z is None:
        raise NativeDecodeError("libzstd not available")
    if not data:
        return b""
    dctx = z.ZSTD_createDCtx()
    if not dctx:
        raise NativeDecodeError("ZSTD_createDCtx failed")
    try:
        # lift the 27-bit default window cap to the format maximum so
        # long-range frames decode like the (uncapped) pure decoder.
        # rc CHECKED: a 32-bit libzstd caps windowLogMax at 30 — fall
        # back a step rather than silently keeping the 27-bit default
        for wlog in (31, 30):
            rc = z.ZSTD_DCtx_setParameter(
                dctx, _ZSTD_D_WINDOWLOGMAX, wlog
            )
            if not z.ZSTD_isError(rc):
                break
        if dict_raw is not None:
            rc = z.ZSTD_DCtx_loadDictionary(
                dctx, dict_raw, len(dict_raw)
            )
            if z.ZSTD_isError(rc):
                raise NativeDecodeError(
                    "bad dictionary: "
                    + z.ZSTD_getErrorName(rc).decode()
                )
        # pointer INTO the immutable bytes (library only reads) —
        # create_string_buffer would copy the whole input first
        inb = _ZBuf(
            ctypes.cast(ctypes.c_char_p(data), ctypes.c_void_p),
            len(data), 0,
        )
        outbuf = ctypes.create_string_buffer(_CHUNK)
        outb = _ZBuf(ctypes.cast(outbuf, ctypes.c_void_p), _CHUNK, 0)
        chunks = []
        total = 0
        while True:
            outb.pos = 0
            ret = z.ZSTD_decompressStream(
                dctx, ctypes.byref(outb), ctypes.byref(inb)
            )
            if z.ZSTD_isError(ret):
                raise NativeDecodeError(
                    z.ZSTD_getErrorName(ret).decode()
                )
            if outb.pos:
                # string_at copies exactly pos bytes; .raw would
                # materialize the whole 1 MiB buffer first
                chunks.append(ctypes.string_at(outbuf, outb.pos))
                total += outb.pos
                if total > max_output:
                    raise NativeDecodeError(
                        "output exceeds max_output bound"
                    )
            # done ONLY on the library's own frame-complete signal
            # (ret == 0) with all input consumed — inferring
            # completion from a non-full output buffer falsely
            # truncated outputs that are exact _CHUNK multiples
            # (round-12 review finding, reproduced at 1 MiB)
            if ret == 0 and inb.pos >= inb.size:
                return b"".join(chunks)
            if (
                ret != 0
                and inb.pos >= inb.size
                and outb.pos < outb.size
            ):
                # input drained mid-frame and nothing left to flush:
                # the library still expects ~ret more bytes — same
                # decline as the pure decoder's "truncated zstd input"
                raise NativeDecodeError("truncated zstd input")
    finally:
        z.ZSTD_freeDCtx(dctx)


def zstd_compress_native(
    data: bytes, level: int = 3, dict_raw: "bytes | None" = None,
) -> bytes:
    """One complete zstd frame via libzstd (content checksum ON, so
    the read side's verification has something to verify).  Used by
    the ``.warc.zst`` egress — decode-side parity tests pin that the
    pure decoder reads these frames back byte-identically.
    ``dict_raw`` compresses against a §5 dictionary (structured or
    raw-content, auto-detected) — the IIPC shared-dictionary shard
    layout."""
    z = _zstd_lib()
    if z is None:
        raise NativeDecodeError("libzstd not available")
    cctx = z.ZSTD_createCCtx()
    if not cctx:
        raise NativeDecodeError("ZSTD_createCCtx failed")
    try:
        rc = z.ZSTD_CCtx_setParameter(cctx, _ZSTD_C_LEVEL, int(level))
        if z.ZSTD_isError(rc):
            raise NativeDecodeError(
                "bad compression level: "
                + z.ZSTD_getErrorName(rc).decode()
            )
        rc = z.ZSTD_CCtx_setParameter(cctx, _ZSTD_C_CHECKSUM, 1)
        if z.ZSTD_isError(rc):
            # the docstring PROMISES checksummed frames — fail loudly
            # (callers fall back to the stored-frame writer) rather
            # than silently emitting unverifiable output
            raise NativeDecodeError("checksum flag rejected")
        if dict_raw is not None:
            rc = z.ZSTD_CCtx_loadDictionary(
                cctx, dict_raw, len(dict_raw)
            )
            if z.ZSTD_isError(rc):
                raise NativeDecodeError(
                    "bad dictionary: "
                    + z.ZSTD_getErrorName(rc).decode()
                )
        bound = z.ZSTD_compressBound(len(data))
        dst = ctypes.create_string_buffer(bound)
        ret = z.ZSTD_compress2(cctx, dst, bound, data, len(data))
        if z.ZSTD_isError(ret):
            raise NativeDecodeError(
                z.ZSTD_getErrorName(ret).decode()
            )
        return ctypes.string_at(dst, ret)
    finally:
        z.ZSTD_freeCCtx(cctx)


# ------------------------------------------------------------------- lz4

_LZ4F_VERSION = 100


def _cfg_lz4(l):
    l.LZ4F_createDecompressionContext.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint
    ]
    l.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
    l.LZ4F_freeDecompressionContext.argtypes = [ctypes.c_void_p]
    l.LZ4F_decompress.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_void_p,
    ]
    l.LZ4F_decompress.restype = ctypes.c_size_t
    l.LZ4F_isError.argtypes = [ctypes.c_size_t]
    l.LZ4F_isError.restype = ctypes.c_uint
    l.LZ4F_getErrorName.argtypes = [ctypes.c_size_t]
    l.LZ4F_getErrorName.restype = ctypes.c_char_p
    try:
        # OPTIONAL (second r13 review pass): a liblz4 predating the
        # stable frame-compression API must not lose the decompress
        # fast path — compress-side absence degrades lz4_compress to
        # the stored-frame fallback instead.
        l.LZ4F_compressFrameBound.argtypes = [
            ctypes.c_size_t, ctypes.c_void_p
        ]
        l.LZ4F_compressFrameBound.restype = ctypes.c_size_t
        l.LZ4F_compressFrame.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p,
        ]
        l.LZ4F_compressFrame.restype = ctypes.c_size_t
        l._lz4_compress_ok = True
    except AttributeError:
        l._lz4_compress_ok = False
    ctx = ctypes.c_void_p()
    rc = l.LZ4F_createDecompressionContext(
        ctypes.byref(ctx), _LZ4F_VERSION
    )
    if rc != 0:
        raise OSError("LZ4F context probe failed")
    l.LZ4F_freeDecompressionContext(ctx)


def _lz4_lib():
    return _load("lz4", ("liblz4.so.1", "liblz4.so"), _cfg_lz4)


def lz4_available() -> bool:
    return _lz4_lib() is not None


def lz4_decompress_native(data: bytes, max_output: int) -> bytes:
    """Multi-frame LZ4F decode (skippable frames handled by the
    library; checksums verified — stricter than the pure decoder,
    which skips them)."""
    l = _lz4_lib()
    if l is None:
        raise NativeDecodeError("liblz4 not available")
    if not data:
        return b""
    ctx = ctypes.c_void_p()
    rc = l.LZ4F_createDecompressionContext(
        ctypes.byref(ctx), _LZ4F_VERSION
    )
    if rc != 0:
        raise NativeDecodeError("LZ4F context creation failed")
    try:
        src_addr = ctypes.cast(
            ctypes.c_char_p(data), ctypes.c_void_p
        ).value
        outbuf = ctypes.create_string_buffer(_CHUNK)
        chunks = []
        total = 0
        src_pos = 0
        ret = 0
        while src_pos < len(data):
            dst_size = ctypes.c_size_t(_CHUNK)
            src_size = ctypes.c_size_t(len(data) - src_pos)
            ret = l.LZ4F_decompress(
                ctx,
                outbuf, ctypes.byref(dst_size),
                ctypes.c_void_p(src_addr + src_pos),
                ctypes.byref(src_size),
                None,
            )
            if l.LZ4F_isError(ret):
                raise NativeDecodeError(
                    l.LZ4F_getErrorName(ret).decode()
                )
            if dst_size.value:
                chunks.append(
                    ctypes.string_at(outbuf, dst_size.value)
                )
                total += dst_size.value
                if total > max_output:
                    raise NativeDecodeError("output exceeds bound")
            if src_size.value == 0 and dst_size.value == 0:
                raise NativeDecodeError("lz4 decode made no progress")
            src_pos += src_size.value
        if ret != 0:
            raise NativeDecodeError("truncated lz4 input")
        return b"".join(chunks)
    finally:
        l.LZ4F_freeDecompressionContext(ctx)


class _LZ4FFrameInfo(ctypes.Structure):
    # lz4frame.h LZ4F_frameInfo_t (public ABI, stable since v1.8)
    _fields_ = [
        ("blockSizeID", ctypes.c_uint),
        ("blockMode", ctypes.c_uint),
        ("contentChecksumFlag", ctypes.c_uint),
        ("frameType", ctypes.c_uint),
        ("contentSize", ctypes.c_ulonglong),
        ("dictID", ctypes.c_uint),
        ("blockChecksumFlag", ctypes.c_uint),
    ]


class _LZ4FPreferences(ctypes.Structure):
    _fields_ = [
        ("frameInfo", _LZ4FFrameInfo),
        ("compressionLevel", ctypes.c_int),
        ("autoFlush", ctypes.c_uint),
        ("favorDecSpeed", ctypes.c_uint),
        ("reserved", ctypes.c_uint * 3),
    ]


def lz4_compress_native(data: bytes, level: int = 0) -> bytes:
    """One complete LZ4 frame via liblz4's LZ4F_compressFrame —
    content checksum ON (the read side's verification has something
    to verify), content size recorded.  The ``.jsonl.lz4`` egress
    seam; decode-side parity tests pin that the pure decoder reads
    these frames back byte-identically."""
    l = _lz4_lib()
    if l is None or not getattr(l, "_lz4_compress_ok", False):
        raise NativeDecodeError("liblz4 frame-compress API not available")
    prefs = _LZ4FPreferences()
    prefs.frameInfo.contentChecksumFlag = 1
    prefs.frameInfo.contentSize = len(data)
    prefs.compressionLevel = int(level)
    bound = l.LZ4F_compressFrameBound(
        len(data), ctypes.byref(prefs)
    )
    dst = ctypes.create_string_buffer(bound)
    n = l.LZ4F_compressFrame(
        dst, bound, data, len(data), ctypes.byref(prefs)
    )
    if l.LZ4F_isError(n):
        raise NativeDecodeError(l.LZ4F_getErrorName(n).decode())
    return ctypes.string_at(dst, n)


# ---------------------------------------------------------------- brotli

_BROTLI_RESULT_ERROR = 0
_BROTLI_RESULT_SUCCESS = 1
_BROTLI_RESULT_NEEDS_MORE_INPUT = 2
_BROTLI_RESULT_NEEDS_MORE_OUTPUT = 3


def _cfg_brotli(b):
    b.BrotliDecoderCreateInstance.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p
    ]
    b.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    b.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    b.BrotliDecoderDecompressStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(u8p),
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(u8p),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    b.BrotliDecoderDecompressStream.restype = ctypes.c_int
    b.BrotliDecoderGetErrorCode.argtypes = [ctypes.c_void_p]
    b.BrotliDecoderGetErrorCode.restype = ctypes.c_int
    b.BrotliDecoderErrorString.argtypes = [ctypes.c_int]
    b.BrotliDecoderErrorString.restype = ctypes.c_char_p
    st = b.BrotliDecoderCreateInstance(None, None, None)
    if not st:
        raise OSError("BrotliDecoderCreateInstance returned NULL")
    b.BrotliDecoderDestroyInstance(st)


def _brotli_lib():
    return _load(
        "brotli", ("libbrotlidec.so.1", "libbrotlidec.so"), _cfg_brotli
    )


def brotli_available() -> bool:
    return _brotli_lib() is not None


def brotli_decompress_native(data: bytes, max_output: int) -> bytes:
    """One brotli stream via libbrotlidec.  Trailing bytes after the
    last metablock are ignored, matching the pure decoder (a _Bits
    reader that simply stops at ISLAST)."""
    b = _brotli_lib()
    if b is None:
        raise NativeDecodeError("libbrotlidec not available")
    st = b.BrotliDecoderCreateInstance(None, None, None)
    if not st:
        raise NativeDecodeError("brotli decoder creation failed")
    try:
        u8p = ctypes.POINTER(ctypes.c_uint8)
        next_in = ctypes.cast(ctypes.c_char_p(data), u8p)
        avail_in = ctypes.c_size_t(len(data))
        outbuf = ctypes.create_string_buffer(_CHUNK)
        chunks = []
        total = 0
        while True:
            next_out = ctypes.cast(outbuf, u8p)
            avail_out = ctypes.c_size_t(_CHUNK)
            res = b.BrotliDecoderDecompressStream(
                st,
                ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out),
                None,
            )
            produced = _CHUNK - avail_out.value
            if produced:
                chunks.append(ctypes.string_at(outbuf, produced))
                total += produced
                if total > max_output:
                    raise NativeDecodeError("output exceeds bound")
            if res == _BROTLI_RESULT_NEEDS_MORE_OUTPUT:
                continue
            if res == _BROTLI_RESULT_SUCCESS:
                return b"".join(chunks)
            if res == _BROTLI_RESULT_NEEDS_MORE_INPUT:
                raise NativeDecodeError("truncated brotli stream")
            code = b.BrotliDecoderGetErrorCode(st)
            raise NativeDecodeError(
                "corrupt brotli stream: "
                + b.BrotliDecoderErrorString(code).decode()
            )
    finally:
        b.BrotliDecoderDestroyInstance(st)
