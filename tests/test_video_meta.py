"""Video container parsing: the real ISO-BMFF box walk against the
synthesized (genuinely structured) MP4 fixtures, plus malformed-input
seams and the duration-driven frame plan."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from clickhouse_table_copier_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_video_meta,
    synthesize_video_table,
    video_frame_plan,
)


def test_mp4_meta_matches_synthesis_params(spark):
    """Every synthesized field round-trips: timescale, duration (whole
    seconds by construction), track count, 16.16 fixed-point dims."""
    df = synthesize_video_table(spark, n=16)
    got = {r["media_id"]: r for r in decode_video_meta(df).collect()}
    assert len(got) == 16
    for i in range(16):
        r = got[i]
        timescale = 600 + 100 * (i % 4)
        secs = 2 + i % 7
        assert r["brand"] == "isom"
        assert r["timescale"] == timescale
        assert r["duration_units"] == timescale * secs
        assert r["duration_s"] == float(secs)
        assert r["n_tracks"] == 1
        assert r["width"] == 320 + 16 * (i % 5)
        assert r["height"] == 240 + 16 * (i % 3)


def test_mp4_malformed_inputs_yield_nulls(spark):
    """Truncated boxes, missing moov, and non-MP4 bytes all yield NULL
    metadata — the never-fabricate seam rule."""
    good = synthesize_video_table(spark, n=1).collect()[0]["content"]
    rows = [
        (1, "video", bytearray(b"not an mp4 at all"), "{}"),
        (2, "video", bytearray(bytes(good)[:20]), "{}"),  # truncated
        # ftyp only, no moov
        (3, "video", bytearray(struct.pack(">I", 16) + b"ftypisom\x00\x00\x02\x00"), "{}"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    for r in decode_video_meta(df).collect():
        assert r["timescale"] is None and r["duration_s"] is None


def test_mp4_largesize_and_v1_mvhd(spark):
    """A 64-bit largesize moov wrapping a version-1 mvhd still parses
    (the two spec variants a naive parser breaks on)."""
    mvhd_v1 = (
        struct.pack(">I", 8 + 4 + 8 + 8 + 4 + 8) + b"mvhd"
        + b"\x01\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 1000)
        + struct.pack(">Q", 5000)
    )
    moov_payload = mvhd_v1
    moov = (
        struct.pack(">I", 1) + b"moov"
        + struct.pack(">Q", 16 + len(moov_payload))
        + moov_payload
    )
    ftyp = struct.pack(">I", 16) + b"ftypmp42\x00\x00\x00\x00"
    df = spark.createDataFrame(
        [(7, "video", bytearray(ftyp + moov), "{}")], MEDIA_SCHEMA
    )
    r = decode_video_meta(df).collect()[0]
    assert r["brand"] == "mp42"
    assert r["timescale"] == 1000 and r["duration_units"] == 5000
    assert r["duration_s"] == 5.0 and r["n_tracks"] == 0


def test_video_frame_plan_uses_real_duration(spark):
    """Sampled frame indices derive from parsed duration × fps, not byte
    length: a (2+i%7)-second clip at 30 fps sampled every 30 frames gives
    exactly duration-in-seconds rows."""
    df = synthesize_video_table(spark, n=8)
    plan = video_frame_plan(df, fps=30, every_n=30)
    counts = {
        r["media_id"]: r["n"]
        for r in plan.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for i in range(8):
        assert counts[i] == 2 + i % 7
