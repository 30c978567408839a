"""JSON-Lines corpus source — the format public LLM corpora ship in.

Dolma, RedPajama, SlimPajama, The Pile and most HuggingFace text
datasets distribute as ``*.jsonl`` shards compressed with zstd (and
sometimes gzip/xz/bz2).  :func:`read_jsonl` reads a directory of such
shards into one row per line:

    (source_file, line_idx, value)

``value`` stays a STRING column — callers pick fields with
``get_json_object``/``from_json`` so Spark prunes the JSON parse to
the requested paths (the same discipline as the WAT reader); a typical
corpus line carries a dozen metadata fields next to ``text``, and
eagerly parsing all of them for every row is the classic ingest
mistake.  :func:`jsonl_to_documents` is the one-liner projection onto
the engine's ``documents`` shape.

Compression is detected by MAGIC, not filename: zstd (pure-Python RFC
8878 decoder, :mod:`sources.zstd` — nothing else in this container
reads zstd), gzip / xz / bz2 (stdlib), plain text otherwise.  A shard
that fails to decompress yields zero rows (decline per shard, never
fail the task — mirrors the WARC readers' salvage contract).

Scale shape (100 TB): one shard per task via ``binaryFile``,
decompress + line-split inside the Arrow-batched ``mapInPandas`` edge;
compressed bytes never shuffle, and downstream sees only the projected
columns.  Whole-shard residency is the documented floor (corpus shards
are sized ~100-500 MB compressed for exactly this access pattern).

Reference parity: none — north-star LLM-pipeline surface (SURVEY.md
§2.8); the reference engine reads SQL tables only.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

JSONL_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("line_idx", T.LongType()),
        T.StructField("value", T.StringType()),
    ]
)


def _decompress_shard(raw: bytes):
    """Shard bytes → text bytes by magic; None = undecodable shard."""
    try:
        from clickhouse_table_copier_spark.sources.zstd import (
            decompress_auto_dict,
            looks_like_zstd,
        )

        if looks_like_zstd(raw):
            try:
                return decompress_auto_dict(raw)
            except Exception:
                # checksum-only defects salvage unverified; anything
                # else raises again -> the shard declines below
                return decompress_auto_dict(raw, verify_checksums=False)
        if raw[:4] == b"\x04\x22\x4d\x18":
            from clickhouse_table_copier_spark.sources.lz4 import (
                lz4_decompress,
            )

            return lz4_decompress(raw)
        if raw[:2] == b"\x1f\x8b":
            import gzip

            return gzip.decompress(raw)
        if raw[:6] == b"\xfd7zXZ\x00":
            import lzma

            return lzma.decompress(raw)
        if raw[:3] == b"BZh":
            import bz2

            return bz2.decompress(raw)
        return raw
    except Exception:
        return None


def _make_line_expander(batch_lines: int = 4096):
    """The (path, content) → line-row expander shared by the batch
    reader and the streaming ingest
    (:func:`streaming.incremental.incremental_jsonl_documents`), so
    both paths decompress and split identically."""

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                raw = _decompress_shard(bytes(content))
                if raw is None:
                    continue  # undecodable shard: zero rows, not a fail
                text = raw.decode("utf-8", "replace")
                if text[:1] == "\ufeff":
                    text = text[1:]
                buf_f, buf_i, buf_v = [], [], []
                for i, line in enumerate(text.split("\n")):
                    if not line or line.isspace():
                        continue
                    buf_f.append(path_)
                    buf_i.append(i)
                    buf_v.append(line)
                    if len(buf_v) >= batch_lines:
                        yield pd.DataFrame(
                            {
                                "source_file": buf_f,
                                "line_idx": buf_i,
                                "value": buf_v,
                            }
                        )
                        buf_f, buf_i, buf_v = [], [], []
                if buf_v:
                    yield pd.DataFrame(
                        {
                            "source_file": buf_f,
                            "line_idx": buf_i,
                            "value": buf_v,
                        }
                    )

    return expand


def read_jsonl(
    spark: SparkSession, path: str, batch_lines: int = 4096
) -> DataFrame:
    """JSONL shards under ``path`` (plain / .gz / .zst / .xz / .bz2 /
    .lz4, detected by magic) → one row per non-empty line."""
    shards = spark.read.format("binaryFile").load(path)
    return shards.select("path", "content").mapInPandas(
        _make_line_expander(batch_lines), JSONL_SCHEMA
    )


def jsonl_to_documents(
    df: DataFrame, text_field: str = "text", id_field: str | None = None
) -> DataFrame:
    """JSONL rows → the engine's ``documents`` shape: ``(doc_id, text,
    source)``.  doc_id comes from ``id_field`` when the corpus carries
    one (hashed to int64), else deterministically from (source_file,
    line_idx).  Pure-Column: the JSON parse is pruned to the requested
    paths by ``get_json_object``."""
    if id_field is not None:
        # lines MISSING the id field fall back to positional identity —
        # hashing the NULL would collapse all of them onto one doc_id
        corpus_id = F.get_json_object("value", f"$.{id_field}")
        doc_id = F.when(
            corpus_id.isNotNull(), F.xxhash64(corpus_id)
        ).otherwise(F.xxhash64("source_file", "line_idx"))
    else:
        doc_id = F.xxhash64("source_file", "line_idx")
    return df.select(
        doc_id.alias("doc_id"),
        F.get_json_object("value", f"$.{text_field}").alias("text"),
        F.col("source_file").alias("source"),
    )


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """Common Crawl INDEX shards (CDXJ: ``SURT timestamp {json}`` per
    line, usually ``.gz``) → ``(source_file, line_idx, surt,
    timestamp, meta_json)``.  The index is how a real CC workflow
    SELECTS records (by domain, mime, status) before fetching WARC
    byte ranges — reading it distributed makes that selection a plain
    DataFrame filter.  Malformed lines (fewer than three fields)
    decline row-wise.  Pure-Column split; the JSON stays a string for
    path-pruned access (:func:`cdxj_records` projects the usual
    fields)."""
    lines = read_jsonl(spark, path)
    parts = F.split("value", " ", 3)
    return lines.where(F.size(parts) >= 3).select(
        "source_file",
        "line_idx",
        parts.getItem(0).alias("surt"),
        parts.getItem(1).alias("timestamp"),
        parts.getItem(2).alias("meta_json"),
    )


def cdxj_records(df: DataFrame) -> DataFrame:
    """The standard CDXJ envelope fields as typed columns: url, mime,
    status, digest, and the WARC fetch coordinates (filename, offset,
    length) a range-fetch stage consumes."""
    j = "meta_json"
    return df.select(
        "surt",
        "timestamp",
        F.get_json_object(j, "$.url").alias("url"),
        F.get_json_object(j, "$.mime").alias("mime"),
        F.get_json_object(j, "$.status").cast("int").alias("status"),
        F.get_json_object(j, "$.digest").alias("digest"),
        F.get_json_object(j, "$.filename").alias("warc_filename"),
        F.get_json_object(j, "$.offset").cast("long").alias(
            "warc_offset"
        ),
        F.get_json_object(j, "$.length").cast("long").alias(
            "warc_length"
        ),
    )

def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    compression: str = "zstd",
    zstd_level: int = 3,
) -> list:
    """Re-publish a (filtered, deduped, quality-gated) corpus as
    ``.jsonl.zst`` shards — the write half of the corpus round trip,
    in the exact format public LLM corpora ship (Dolma/RedPajama
    style): one JSON object per line, zstd-compressed shards
    (``compression='gzip'``/``'lz4'``/``'none'`` write ``.jsonl.gz`` /
    ``.jsonl.lz4`` / plain ``.jsonl`` through the same
    :func:`shard_io.egress_codec` dispatch).

    Serialization stays JVM-side: every row becomes ONE JSON line via
    ``to_json(struct(*))`` inside whole-stage codegen — the Arrow
    edge only joins lines and compresses, no Python JSON in the hot
    path.  Shards compress as CONCATENATED zstd frames (one frame per
    Arrow batch, so writer memory stays bounded by the batch, not the
    shard) — every zstd decoder, including :func:`read_jsonl`'s
    decline-per-shard expander, reads multi-frame streams.  Native
    libzstd (checksummed) when the library loads, the stored-frame
    fallback otherwise.  ``compression='gzip'`` writes multi-member
    ``.jsonl.gz``; ``'none'`` writes plain ``.jsonl``.

    Atomic publish per shard via :func:`sources.shard_io.write_shards`
    (attempt-unique temp + ``os.replace``), same as every writer here.
    Returns the sorted shard paths."""
    from pyspark.sql import functions as _F

    from clickhouse_table_copier_spark.sources.shard_io import (
        egress_codec,
        write_shards,
    )

    suffix, _pack = egress_codec(compression, zstd_level)
    ext = ".jsonl" + suffix

    lines = df.select(
        _F.to_json(_F.struct(*df.columns)).alias("line")
    ).repartition(n_shards)

    def write_fn(batches: Iterator[pd.DataFrame], tmp: str) -> int:
        n = 0
        with open(tmp, "wb") as f:
            for pdf in batches:
                vals = [v for v in pdf["line"] if v is not None]
                if not vals:
                    continue
                chunk = ("\n".join(vals) + "\n").encode("utf-8")
                f.write(_pack(chunk))
                n += len(vals)
        return n

    return write_shards(lines, path, ext, write_fn)
