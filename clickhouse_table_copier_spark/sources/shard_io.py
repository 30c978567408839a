"""Shared atomic shard-writer scaffold for the egress sinks
(:func:`sources.webdataset.write_webdataset`,
:func:`sources.warc.write_warc`).

The atomicity-critical choreography lives ONCE here: per-task
directory creation, partition-id shard naming, an attempt-UNIQUE
temp name (a retried or speculative attempt never interleaves with a
sibling), BaseException temp cleanup, empty-partition removal, and the
``os.replace`` publish — readers observe either the previous complete
shard or the new complete shard, never a partial one.  Each sink
supplies only its serializer: ``write_fn(batches, tmp_path) -> n``.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SHARD_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("n_members", T.LongType()),
    ]
)


def egress_codec(compression: str, zstd_level: int = 3):
    """Shared member/chunk compression dispatch for the egress
    writers (``write_warc``, ``write_jsonl``): ``(extension suffix,
    pack(bytes) -> bytes)``.  One place to add a codec or change
    frame policy, so the writers cannot silently diverge (round-12
    review finding).

    - ``zstd``: one checksummed frame per call — native libzstd when
      it loads, the spec-correct stored-frame writer otherwise.
    - ``gzip``: one member per call, ``mtime=0`` so identical inputs
      produce identical shard BYTES across runs (reproducible
      re-publish; the wall-clock default broke bytewise dedup).
    - ``none``: pass-through (plain concatenated members)."""
    if compression == "zstd":
        from clickhouse_table_copier_spark.sources.zstd import (
            zstd_compress,
        )

        return ".zst", lambda b: zstd_compress(b, zstd_level)
    if compression == "gzip":
        import gzip as _gzip

        return ".gz", lambda b: _gzip.compress(b, mtime=0)
    if compression == "lz4":
        # native liblz4 frame when it loads, stored-block frame
        # otherwise — read side sniffs the frame magic
        # (sources/jsonl._decompress_shard), so .jsonl.lz4 shards
        # ingest back symmetrically.  Brotli egress stays OUT of
        # scope: RFC 7932 streams carry no magic number, so a
        # .jsonl.br shard could not be sniffed back by the reader.
        from clickhouse_table_copier_spark.sources.lz4 import (
            lz4_compress,
        )

        return ".lz4", lambda b: lz4_compress(b)
    if compression == "none":
        return "", lambda b: b
    raise ValueError(
        f"unsupported compression {compression!r} "
        "(zstd, gzip, lz4 or none)"
    )


def write_shards(
    parted: DataFrame,
    path: str,
    ext: str,
    write_fn: Callable,
) -> list:
    """Run ``write_fn(batches, tmp_path) -> member count`` once per
    partition of ``parted`` with the atomic-publish choreography;
    returns the sorted shard file names written."""
    import os

    os.makedirs(path, exist_ok=True)

    def write_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(path, exist_ok=True)
        fname = os.path.join(path, f"shard-{pid:05d}{ext}")
        tmp = os.path.join(
            path,
            f".shard-{pid:05d}{ext}.inprogress-{ctx.taskAttemptId()}",
        )
        try:
            n = write_fn(batches, tmp)
        except BaseException:
            # failed attempt: leave no temp litter; the retry gets its
            # own attempt-unique name either way
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise
        if n == 0:
            try:
                os.remove(tmp)  # empty partition: no empty-shard litter
            except OSError:
                pass
            yield pd.DataFrame({"shard": [], "n_members": []})
        else:
            os.replace(tmp, fname)  # atomic publish on POSIX
            yield pd.DataFrame({"shard": [fname], "n_members": [n]})

    out = parted.mapInPandas(write_partition, SHARD_RESULT_SCHEMA)
    return sorted(r["shard"] for r in out.collect())
