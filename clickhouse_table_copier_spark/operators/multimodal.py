"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque ``binary`` columns plus typed metadata — the
only layout that scales: Spark shuffles/stores bytes without interpreting
them, and decode happens exactly once, inside an Arrow-batched
``mapInPandas`` stage at the edge of the pipeline.

IMAGE decode kernels are partially STUBBED (no image libraries in this
container): ``decode_image_meta`` parses real header bytes for PNG/JPEG
(pure Python, deterministic); ``extract_features`` produces a
deterministic md5-derived fake feature vector with the REAL Spark-side
contract — schema, Arrow batching, partition preservation — so swapping in
PIL/ffmpeg later changes one inner function, not the pipeline.

AUDIO is fully REAL: WAV (RIFF/PCM) needs no media libraries, so
``synthesize_audio_table`` writes genuine PCM WAV bytes,
``decode_audio_meta`` parses the actual chunks, and ``audio_features``
computes real windowed DSP (RMS + zero-crossing rate) with numpy —
verified against the stdlib ``wave`` module in tests.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta_json", T.StringType()),
    ]
)


def synthesize_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture: tiny byte blobs with REAL container headers
    (PNG IHDR, JPEG APP0+SOF0 segments, GIF logical screen, BMP info
    header) so the decoders parse genuine structures, not magic alone.

    Stands in for a real binary ingest (tar/webdataset reader) so the
    decode plumbing is testable inside this container.
    """
    rows = []
    for i in range(n):
        w, h = 16 + (i % 8) * 4, 16 + (i % 5) * 8
        pad = hashlib.md5(str(i).encode()).digest() * 8
        if i % 4 == 0:
            content = (
                b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
                + struct.pack(">II", w, h) + pad
            )
            fmt = "png"
        elif i % 4 == 1:
            # SOI + APP0 (JFIF, declared size 16 = 2 + 14 payload bytes)
            # + SOF0 (size 11 = 2 + precision + dims + 1 component spec)
            app0 = (
                b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
                + b"\x01\x01\x00\x00\x01\x00\x01\x00\x00"
            )
            sof0 = (
                b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
                + struct.pack(">HH", h, w) + b"\x01\x11\x00"
            )
            content = b"\xff\xd8" + app0 + sof0 + pad
            fmt = "jpeg"
        elif i % 4 == 2:
            content = b"GIF89a" + struct.pack("<HH", w, h) + pad
            fmt = "gif"
        else:
            content = (
                b"BM" + struct.pack("<IHHI", 0, 0, 0, 54)
                + struct.pack("<IiiHH", 40, w, -h, 1, 24) + pad
            )
            fmt = "bmp"
        rows.append((i, "image", bytearray(content), f'{{"fmt":"{fmt}"}}'))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _make_decode_one():
    """Header decoder built as a CLOSURE: nested functions pickle by
    value (cloudpickle), so executors don't need this package importable.
    PNG/JPEG/GIF/BMP dimensions are parsed for REAL (IHDR; SOF-segment
    scan; logical screen descriptor; BITMAPINFOHEADER) — pure Python,
    no image libraries. Pixel DECODE (not needed for metadata) is where
    a real deployment plugs PIL/libvips; the signature
    (bytes → (fmt, w, h)) and everything around it stay as-is.
    """
    import struct as _struct

    def decode_one(content: bytes):
        if content[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = _struct.unpack(">II", content[16:24])
            return "png", int(w), int(h)
        if content[:2] == b"\xff\xd8":
            # scan JPEG segments for a start-of-frame marker (C0-CF minus
            # the non-frame C4/C8/CC): payload = precision, height, width
            pos = 2
            while pos + 4 <= len(content) and content[pos] == 0xFF:
                marker = content[pos + 1]
                size = _struct.unpack(">H", content[pos + 2 : pos + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = _struct.unpack(">HH", content[pos + 5 : pos + 9])
                    return "jpeg", int(w), int(h)
                pos += 2 + size
            return "jpeg", -1, -1  # truncated stream: no frame header found
        if content[:6] in (b"GIF87a", b"GIF89a"):
            w, h = _struct.unpack("<HH", content[6:10])
            return "gif", int(w), int(h)
        if content[:2] == b"BM":
            w, h = _struct.unpack("<ii", content[18:26])
            return "bmp", int(w), abs(int(h))  # negative h = top-down rows
        raise NotImplementedError("unsupported media container")

    return decode_one


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched decode: binary column → typed metadata.

    mapInPandas keeps partitioning (no shuffle) and streams Arrow batches;
    at 100 TB this is the canonical decode stage shape.
    """

    decode_one = _make_decode_one()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    fmt, w, h = decode_one(bytes(content))
                except NotImplementedError:
                    fmt, w, h = "unknown", -1, -1
                out.append((mid, fmt, w, h, len(content)))
            yield pd.DataFrame(
                out, columns=["media_id", "fmt", "width", "height", "n_bytes"]
            )

    return df.select("media_id", "content").mapInPandas(fn, IMAGE_META_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake feature extractor with the real pipeline shape.

    md5(content) expanded to ``dim`` floats in [0,1). Replace the inner
    loop with a model forward pass; schema/batching/partitioning stand.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                h = hashlib.md5(bytes(content)).digest()
                vec = [
                    int.from_bytes(h[(2 * j) % 16 : (2 * j) % 16 + 2], "big") / 65536.0
                    for j in range(dim)
                ]
                ids.append(mid)
                feats.append(vec)
            yield pd.DataFrame({"media_id": ids, "feature": feats})

    return df.select("media_id", "content").mapInPandas(fn, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
    ]
)


def resize_images(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize stage with the real pipeline shape, decode kernel stubbed.

    The Spark side is complete: Arrow-batched mapInPandas, binary in /
    binary out, partition-preserving. The stub "resize" re-headers PNG
    bytes with the target dimensions (deterministic, testable); a real
    deployment swaps the inner function for PIL/libvips resampling.
    """

    def make_fn(tw: int, th: int):
        import struct as _struct

        def fn(batches):
            for pdf in batches:
                ids, outs = [], []
                for mid, content in zip(pdf["media_id"], pdf["content"]):
                    b = bytes(content)
                    if b[:8] == b"\x89PNG\r\n\x1a\n":
                        out = b[:16] + _struct.pack(">II", tw, th) + b[24:]
                    else:
                        out = b  # unknown container: pass through unchanged
                    ids.append(mid)
                    outs.append(bytearray(out))
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "content": outs,
                        "target_w": [tw] * len(ids),
                        "target_h": [th] * len(ids),
                    }
                )

        return fn

    return df.select("media_id", "content").mapInPandas(
        make_fn(target_w, target_h), RESIZED_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index,
    without decoding (expression-only). The decode of selected frames
    would chain through ``mapInPandas`` like ``extract_features``."""
    n_frames = (F.length("content") / 100 + 1).cast("int")  # stub: bytes→frames
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


# ---------------------------------------------------------------------------
# Audio: REAL, not stubbed — WAV (RIFF/PCM) needs no media libraries.
# Synthesis writes genuine PCM WAV bytes; decode parses the actual RIFF
# chunks; features are real DSP (RMS energy + zero-crossing rate per
# window, numpy over the PCM payload). The stdlib `wave` module verifies
# the bytes independently in tests.
# ---------------------------------------------------------------------------
AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
    ]
)


def synthesize_audio_table(spark, n: int = 32) -> DataFrame:
    """Deterministic fixture: genuine 16-bit PCM WAV blobs (mono), varying
    sample rate, length and tone frequency per id."""
    import math

    rows = []
    for i in range(n):
        sr = 8000 if i % 2 == 0 else 16000
        n_samples = 400 + (i % 7) * 100
        freq = 100.0 + (i % 5) * 50.0
        amp = 8000 + (i % 3) * 4000
        pcm = b"".join(
            struct.pack(
                "<h", int(amp * math.sin(2 * math.pi * freq * t / sr))
            )
            for t in range(n_samples)
        )
        data_size = len(pcm)
        hdr = (
            b"RIFF"
            + struct.pack("<I", 36 + data_size)
            + b"WAVE"
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
            + b"data"
            + struct.pack("<I", data_size)
        )
        rows.append((i, "audio", bytearray(hdr + pcm), '{"fmt":"wav"}'))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _make_wav_parser():
    """RIFF/PCM parser as a closure (pickles by value — executors don't
    import this package). Returns (sample_rate, channels, bits, pcm_bytes)."""
    import struct as _struct

    def parse_wav(b: bytes):
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE container")
        pos, sr, ch, bits, pcm = 12, None, None, None, None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            size = _struct.unpack("<I", b[pos + 4 : pos + 8])[0]
            body = b[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                _, ch, sr, _, _, bits = _struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                pcm = body
            pos += 8 + size + (size % 2)  # chunks are word-aligned
        if sr is None or pcm is None:
            raise ValueError("missing fmt/data chunk")
        return sr, ch, bits, pcm

    return parse_wav


def decode_audio_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode: RIFF chunks → typed audio metadata."""
    parse_wav = _make_wav_parser()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                sr, ch, bits, pcm = parse_wav(bytes(content))
                n = len(pcm) // (ch * bits // 8)
                out.append((mid, sr, ch, bits, n, n / sr))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "channels", "bits",
                    "n_samples", "duration_s",
                ],
            )

    return df.select("media_id", "content").mapInPandas(fn, AUDIO_META_SCHEMA)


def audio_features(df: DataFrame, window: int = 256) -> DataFrame:
    """REAL windowed DSP over the PCM payload: RMS energy and
    zero-crossing rate per ``window`` samples (numpy, Arrow-batched,
    partition-preserving). The standard front-end of audio quality
    filtering / VAD in a training-data pipeline."""
    parse_wav = _make_wav_parser()

    def make_fn(win: int):
        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            for pdf in batches:
                rows = []
                for mid, content in zip(pdf["media_id"], pdf["content"]):
                    sr, ch, bits, pcm = parse_wav(bytes(content))
                    x = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
                    if ch > 1:
                        x = x.reshape(-1, ch).mean(axis=1)
                    x = x / 32768.0
                    for w in range(0, len(x), win):
                        seg = x[w : w + win]
                        rms = float(np.sqrt(np.mean(seg * seg)))
                        zc = (
                            float(np.mean(np.abs(np.diff(np.signbit(seg).astype(np.int8)))))
                            if len(seg) > 1
                            else 0.0
                        )
                        rows.append((mid, w // win, rms, zc))
                yield pd.DataFrame(
                    rows, columns=["media_id", "window_idx", "rms", "zcr"]
                )

        return fn

    return df.select("media_id", "content").mapInPandas(
        make_fn(window), AUDIO_FEATURE_SCHEMA
    )
