"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque ``binary`` columns plus typed metadata — the
only layout that scales: Spark shuffles/stores bytes without interpreting
them, and decode happens exactly once, inside an Arrow-batched
``mapInPandas`` stage at the edge of the pipeline.

The decode kernels themselves are STUBBED (no image/audio libraries in
this container): ``decode_image_meta`` parses real header bytes for
PNG/JPEG (pure Python, deterministic); ``extract_features`` produces a
deterministic md5-derived fake feature vector with the REAL Spark-side
contract — schema, Arrow batching, partition preservation — so swapping in
PIL/ffmpeg later changes one inner function, not the pipeline.
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
    """Deterministic fixture: tiny valid PNG/JPEG-headered byte blobs.

    Stands in for a real binary ingest (tar/webdataset reader) so the
    decode plumbing is testable inside this container.
    """
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 16 + (i % 8) * 4, 16 + (i % 5) * 8
            content = (
                b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
                + struct.pack(">II", w, h)
                + hashlib.md5(str(i).encode()).digest() * 4
            )
            rows.append((i, "image", bytearray(content), '{"fmt":"png"}'))
        else:
            content = b"\xff\xd8\xff\xe0" + hashlib.md5(str(i).encode()).digest() * 8
            rows.append((i, "image", bytearray(content), '{"fmt":"jpeg"}'))
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
    """Header-only decoder built as a CLOSURE: nested functions pickle by
    value (cloudpickle), so executors don't need this package importable.
    A real deployment replaces the body with PIL/libvips; the signature
    (bytes → (fmt, w, h)) and everything around it stay as-is.
    """
    import struct as _struct

    def decode_one(content: bytes):
        if content[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = _struct.unpack(">II", content[16:24])
            return "png", int(w), int(h)
        if content[:3] == b"\xff\xd8\xff":
            return "jpeg", -1, -1  # dims need a full scan — stubbed
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
