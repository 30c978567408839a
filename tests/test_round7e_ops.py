"""Property tests for round-7e: perceptual-hash image dedup (binary
input — no DuckDB oracle possible, same as the rest of the multimodal
surface) plus skew/seasonality query semantics the oracle can't see."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    encode_png,
    image_ahash,
    near_duplicate_images,
    synthesize_media_table,
)
from tests.conftest import SF_ORACLE


def _png_row(media_id: int, arr: np.ndarray):
    h, w, _ = arr.shape
    return (
        media_id,
        "image",
        bytearray(encode_png(arr.astype(np.uint8).tobytes(), w, h, 3)),
        '{"fmt":"png"}',
    )


def _gradient(seed: int, w: int = 32, h: int = 32) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 7 + seed) % 256
    g = (y * 5 + 2 * seed) % 256
    b = (x + y + 3 * seed) % 256
    return np.stack([r, g, b], axis=-1)


def test_ahash_deterministic_and_structure_sensitive(spark):
    """Identical pixels → identical hash; a light/dark half-split image
    and its inverse → maximally different hashes."""
    bright = np.zeros((32, 32, 3), dtype=np.int64)
    bright[:, 16:, :] = 255  # right half bright
    dark = 255 - bright
    rows = [
        _png_row(1, bright),
        _png_row(2, bright.copy()),
        _png_row(3, dark),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert got[1] == got[2]
    assert bin((got[1] ^ got[3]) & ((1 << 64) - 1)).count("1") == 64


def test_ahash_null_for_uncovered_formats(spark):
    """Non-PNG containers yield NULL (the documented decoder seam) and
    drop out of dedup rather than fabricate a hash."""
    media = synthesize_media_table(spark, n=16)
    got = image_ahash(media).collect()
    by_id = {r["media_id"]: r["ahash"] for r in got}
    # ids ≡ 0 (mod 4) are real PNGs in the fixture; others are seams
    for mid, h in by_id.items():
        if mid % 4 == 0:
            assert h is not None
        else:
            assert h is None


def test_near_duplicate_images_planted_pair(spark):
    """A copy with a tiny local perturbation pairs with its original at
    small Hamming distance; structurally different images don't pair.
    max_hamming=3 with 4 bands is EXACT by pigeonhole, so the planted
    pair MUST appear (no LSH recall excuse)."""
    base = _gradient(1)
    near = base.copy()
    near[0, 0] = [255, 255, 255]  # one pixel — hash moves ≤ 1 bit
    other = _gradient(40)[::-1]  # different structure
    df = spark.createDataFrame(
        [_png_row(1, base), _png_row(2, near), _png_row(3, other)],
        MEDIA_SCHEMA,
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in near_duplicate_images(df, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_near_duplicate_banding_matches_bruteforce(spark):
    """On the synthesized PNG fixture, the banded join finds EXACTLY the
    brute-force ≤3-Hamming pairs (the pigeonhole guarantee, verified)."""
    media = synthesize_media_table(spark, n=64)
    hashes = {
        r["media_id"]: r["ahash"]
        for r in image_ahash(media).collect()
        if r["ahash"] is not None
    }
    want = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in near_duplicate_images(media, max_hamming=3).collect()
    }
    assert got == want


def _bmp_bytes(arr: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP from an RGB top-down array —
    stored bottom-up (positive height), BGR, 4-byte row padding."""
    import struct

    h, w, _ = arr.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            r, g, b = arr[y, x]
            row += bytes((int(b), int(g), int(r)))
        row += b"\x00" * (stride - w * 3)
        rows.append(bytes(row))
    raster = b"".join(rows)
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    )
    return header + raster


def test_ahash_cross_format_png_bmp_identical(spark):
    """THE SAME image stored as PNG and as (bottom-up, BGR, padded) BMP
    must produce the identical aHash — the raster normalization that
    makes cross-format image dedup work — and the pair must surface in
    near_duplicate_images at Hamming 0."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        near_duplicate_images,
    )

    arr = _gradient(5, w=30, h=22)
    rows = [
        _png_row(1, arr),
        (2, "image", bytearray(_bmp_bytes(arr)), '{"fmt":"bmp"}'),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert got[1] is not None and got[1] == got[2]
    pairs = near_duplicate_images(df, max_hamming=3).collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [(1, 2, 0)]


def test_near_duplicate_rejects_wide_threshold(spark):
    with pytest.raises(ValueError):
        near_duplicate_images(synthesize_media_table(spark, 4), max_hamming=4)


def test_skew_report_flags_constructed_hot_key(spark, tmp_path):
    """A planted 10×-uniform hot key trips the integer verdict; uniform
    keys don't."""
    from clickhouse_table_copier_spark.queries_round7e import q_key_skew_report

    rows = [(k, i) for k in range(1, 21) for i in range(10)]
    rows += [(99, i) for i in range(100)]  # hot key: 100 vs uniform ~14
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows, "l_suppkey long, l_orderkey long").write.parquet(
        f"{sf}/lineitem.parquet"
    )
    got = {r["key"]: r["is_skewed"] for r in q_key_skew_report(spark, sf).collect()}
    assert got[99] is True
    assert all(v is False for k, v in got.items() if k != 99)


def test_seasonal_anomaly_zscores_match_reference(spark):
    """Driver-side recomputation of the per-(type, dow) z-scores equals
    the distributed result, including the σ=0 guard."""
    import math

    from clickhouse_table_copier_spark.queries_round7e import (
        q_weekly_seasonal_anomalies,
    )

    rows = q_weekly_seasonal_anomalies(spark, SF_ORACLE).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault((r["event_type"], r["dow"]), []).append(r["n_events"])
    for r in rows:
        xs = groups[(r["event_type"], r["dow"])]
        n = len(xs)
        mean = sum(xs) / n
        var = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * n)
        assert r["expected"] == pytest.approx(mean)
        if var > 0:
            assert r["z"] == pytest.approx(
                (r["n_events"] - mean) / math.sqrt(var)
            )
            assert r["is_anomaly"] == (abs(r["z"]) > 2.0)
        else:
            assert r["z"] is None and r["is_anomaly"] is False
