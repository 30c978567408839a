"""The one lazy import guard for the native codec fast path.

Each codec home module (zstd / lz4 / brotli) asks this tiny neutral
module for :mod:`._native_codecs` instead of carrying its own
try/except copy (they drifted in round 12's first cut) or importing
it from a sibling codec (which would couple lz4/brotli startup to the
900-line zstd module).  A broken native environment costs one failed
import per process and returns None — the pure decoders then carry
the load."""

from __future__ import annotations


def native_codecs_or_none():
    try:
        from clickhouse_table_copier_spark.sources import _native_codecs

        return _native_codecs
    except Exception:
        return None
