"""Round-16 registration batch, pre-written at round 15 — the r15
seams driven INSIDE the correctness gate: the JP2 container-spelling
matrix (raw codestream / JP2 box / XLBox 64-bit box / lossy 9/7 /
multi-tile / COC override / truncated) through decode_image_meta +
image_ahash, the JBIG2
out-of-scope-segment decline ledger (the ADVICE r13 branch), and a
full WARC egress→ingest media round trip (write_warc .warc.zst →
read_warc → responses_to_media → image_ahash) — implemented +
DuckDB-hash-verified NOW (tests/test_round16_prep.py runs the exact
compare() harness every CI run) but NOT registered: the r15 window is
booked by the age-6 r09 cohort + the 4-query r15 flip, so these names
register at round 16 through the same flip the round12-15 prep
batches used.

Oracle strategy — identical to the prior prep batches: every query
PLANTS its input from ``documents`` doc_id arithmetic (payload bytes
are GOLDEN streams from the independent encoder transcriptions in
scripts/, embedded here as constants, plus single-byte segment-header
patches whose decline the decoder contract pins), the Spark side runs
the REAL operator stack, and the oracle derives the expected answer
CONSTRUCTIVELY from the planting parameters — never a SQL
re-implementation of the operator.

Reference parity: none — north-star LLM-pipeline surface (SURVEY.md
§2.8); the reference engine (noperformance/clickhouse-table-copier)
reads SQL tables only.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t

# name -> spark fn / oracle sql; consumed by tests/test_round16_prep.py
# and mirrored into the main registry AT ROUND 16, not before.
PREP16_QUERIES: dict = {}
PREP16_ORACLES: dict[str, str] = {}


def _prep16(name: str, oracle: str):
    def deco(fn):
        PREP16_QUERIES[name] = fn
        PREP16_ORACLES[name] = oracle
        return fn

    return deco


# ------------------------------------------------------------ goldens
# JPEG 2000 codestream of the 8x8 gradient, reversible 5/3
# (scripts/make_jpeg2000_golden.py, pinned in tests/test_jpeg2000.py)
_J2K_53 = bytes.fromhex(
    "ff4fff510029000000000008000000080000000000000000000000080000000800000000"
    "000000000001070101ff52000c00000001000100000001ff5c00074040484850ff90000a"
    "0000000000440001ff93df808811f708b52ec99d9ea937d2146191ba9447cfc02a1f504c"
    "7e00c0230f80ba296a5926e0bf1e83aebdc4e4733ae91e86fc52597fffd9"
)
# The SAME 8x8 gradient through the irreversible 9/7 + scalar-
# expounded quantization path (fine steps — decodes byte-exactly;
# scripts/make_jpeg2000_golden.py r15)
_J2K_97 = bytes.fromhex(
    "ff4fff510029000000000008000000080000000000000000000000080000000800000000"
    "000000000001070101ff52000c00000001000100000000ff5c000b426000680068007000"
    "ff90000a0000000000760001ff93cfe46c10f4e31df6f52d426430e0790bdb7137f62c36"
    "12dc2ae0b0acf15fcff02f0fd85a3fc0a0230dfdc52bfde5910adf553e85bdb932a23c1d"
    "b97439c61e82aa0c0eb4cd783687b9adf6dd63d923dca4bf8baf1e86fc4c21bc9a3ad2b2"
    "faec6bbc5add4cf70df6ffd9"
)
# JBIG2 embedded stream of the 38x29 cell-3 checker (scripts/
# make_jbig2_golden.py, pinned in tests/test_jbig2.py); segments:
# page-info (type 48) + immediate generic region (type 38)
_JBIG2_T0 = bytes.fromhex(
    "0000000130000100000013000000260000001d0000000000000000000000000000022600"
    "0100000038000000260000001d0000000000000000000003fffdff02fefefe42867a6997"
    "a12edc5560c8950dc8ed42b7b139d49ba46e6c4da0acffffac"
)


def _jp2_box(codestream: bytes) -> bytes:
    """Minimal JP2 box container (I.5) around a gray 8x8 codestream —
    restated here (not imported from scripts/) so the prep module is
    self-contained like the prior batches."""
    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    sig = box(b"jP  ", b"\x0d\x0a\x87\x0a")
    ftyp = box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    ihdr = box(b"ihdr", struct.pack(">IIHBBBB", 8, 8, 1, 7, 7, 0, 0))
    colr = box(b"colr", b"\x01\x00\x00" + struct.pack(">I", 17))
    jp2h = box(b"jp2h", ihdr + colr)
    return sig + ftyp + jp2h + box(b"jp2c", codestream)


def _xlbox_spelling(jp2: bytes) -> bytes:
    """Rewrite the jp2h box in XLBox form (size field == 1, 64-bit
    length after the type) — the extended-length spelling large .jp2
    files use, which decode_image_meta handles since r15."""
    at = jp2.index(b"jp2h") - 4
    size = struct.unpack(">I", jp2[at : at + 4])[0]
    xl = (
        b"\x00\x00\x00\x01" + b"jp2h"
        + struct.pack(">Q", size + 8) + jp2[at + 8 : at + size]
    )
    return jp2[:at] + xl + jp2[at + size :]


_JP2_BOXED = _jp2_box(_J2K_53)
_JP2_XLBOX = _xlbox_spelling(_JP2_BOXED)
_J2K_TRUNC = _J2K_53[:40]  # SIZ survives (meta dims parse), body gone
# The SAME 8x8 gradient as a 2x2 MULTI-TILE grid (4x4 tiles, four
# SOT/SOD tile-parts — the layout large scanned images use; decodes
# tile-by-tile + stitches since r15)
_J2K_TILED = bytes.fromhex(
    "ff4fff51002900000000000800000008000000000000000000000004000000040000"
    "0000000000000001070101ff52000c00000001000100000001ff5c00074040484850"
    "ff90000a0000000000220001ff93df8028078ae07c13c1f38283e7080cf70b3dff7f"
    "ff90000a0001000000290001ff93cfb4140cee97b2e7c3ea0487d4073f3030109124"
    "9f1046c71084bfff90000a0002000000220001ff93c7d40a06b907151fc1f38283e7"
    "080cf70b3dff7fff90000a00030000002f0001ff93df80380fef671330ff7fcfc01a"
    "3ed068fc00800e1512cff15f04ef2cdfff7f033fffd9"
)
# The SAME 8x8 gradient with a main-header COC override: COD says
# levels=1 / 4x4 code-blocks, the COC raises the component to
# levels=2 / 8x8 code-blocks, and a style-0 QCC covers the larger
# subband list (the per-component coding-style spelling, r15 tail)
_J2K_COC = bytes.fromhex(
    "ff4fff510029000000000008000000080000000000000000000000080000000800000000"
    "000000000001070101ff52000c00000001000100000001ff53000900000201010001ff5c"
    "00074040484850ff5d000b004040484850484850ff90000a00000000004e0001ff93cfb4"
    "1407948dbee3c7da090fa8123f00500d93d6c10b10ea25107ca579bccfc02a1f504c7e00"
    "c0230f80ba296a5926e0bf1e83aebdc4e4733ae91e86fc52597fffd9"
)


def _patch(blob: bytes, idx: int, val: int) -> bytes:
    b = bytearray(blob)
    b[idx] = val
    return bytes(b)


# out-of-scope JBIG2 spellings, each a single-byte patch of the valid
# stream's FIRST segment header (number at 0-3, flags at 4, referred-
# to count in the top 3 bits of byte 5):
#   type 16 (pattern dictionary) / type 40 (refinement region) —
#   known-but-out-of-scope CONTENT-BEARING segments, decline not skip
#   (ADVICE r13); top-3-bits 5 at byte 5 — reserved referred-to
#   count, §7.2.4 short form allows 0-4 only
_JBIG2_T16 = _patch(_JBIG2_T0, 4, (_JBIG2_T0[4] & 0xC0) | 16)
_JBIG2_T40 = _patch(_JBIG2_T0, 4, (_JBIG2_T0[4] & 0xC0) | 40)
_JBIG2_RES5 = _patch(_JBIG2_T0, 5, (5 << 5) | (_JBIG2_T0[5] & 0x1F))


def _wrap_image_pdf(stream: bytes, w: int, h: int, filt: bytes) -> bytes:
    """One-image PDF wrapping ``stream`` under ``filt``."""
    body = (
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/BitsPerComponent 8 /ColorSpace /DeviceGray " % (w, h)
        + filt
        + b" /Length %d >>\nstream\n" % len(stream)
        + stream
        + b"\nendstream"
    )
    return b"%PDF-1.5\n1 0 obj\n" + body + b"\nendobj\n%%EOF\n"


# ---------------------------------------------- jp2 spelling histogram
# Planted docs (doc_id % 17 = 5) carry one standalone JP2 media blob;
# class = doc_id % 7: 0 -> raw 5/3 codestream, 1 -> JP2 box, 2 ->
# XLBox-form box, 3 -> raw lossy 9/7, 4 -> 2x2 multi-tile grid, 5 ->
# COC per-component coding-style override, 6 -> truncated codestream.
# decode_image_meta reports 8x8 dims for every class (the truncated
# blob keeps its SIZ header — header metadata is not a decode);
# image_ahash (a REAL decode) lifts classes 0-5 and declines 6.

_SPELLING_ORACLE = """
WITH d AS (
  SELECT doc_id % 7 AS cls FROM documents WHERE doc_id % 17 = 5
),
a AS (SELECT cls, count(*) AS n FROM d GROUP BY cls)
SELECT CASE cls WHEN 0 THEN 'raw_53' WHEN 1 THEN 'jp2_box'
                WHEN 2 THEN 'xlbox' WHEN 3 THEN 'raw_97'
                WHEN 4 THEN 'multitile' WHEN 5 THEN 'coc_override'
                ELSE 'truncated' END
         AS jp2_spelling,
       n::BIGINT AS n_docs,
       n::BIGINT AS n_meta_dims,
       (CASE WHEN cls < 6 THEN n ELSE 0 END)::BIGINT AS n_lifted
FROM a
"""


@_prep16("jp2_spelling_histogram", _SPELLING_ORACLE)
def q_jp2_spelling_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Container-spelling matrix through the REAL raster chain:
    decode_image_meta (header walk, incl. the r15 XLBox branch) and
    image_ahash (full decode, incl. the r15 lossy 9/7, multi-tile
    and COC per-component-override paths) must agree with the
    constructive plant — a box-walk or decoder regression drops
    n_meta_dims / n_lifted below the planted count."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        decode_image_meta,
        image_ahash,
    )

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    cls = d % 7
    blobs = [
        _J2K_53, _JP2_BOXED, _JP2_XLBOX, _J2K_97, _J2K_TILED,
        _J2K_COC, _J2K_TRUNC,
    ]
    media = docs.filter(d % 17 == 5).select(
        d.alias("media_id"),
        F.lit("image").alias("kind"),
        F.when(cls == 0, F.lit(bytearray(blobs[0])))
        .when(cls == 1, F.lit(bytearray(blobs[1])))
        .when(cls == 2, F.lit(bytearray(blobs[2])))
        .when(cls == 3, F.lit(bytearray(blobs[3])))
        .when(cls == 4, F.lit(bytearray(blobs[4])))
        .when(cls == 5, F.lit(bytearray(blobs[5])))
        .otherwise(F.lit(bytearray(blobs[6])))
        .alias("content"),
        F.lit("{}").alias("meta_json"),
    )
    spelling = (
        F.when(d % 7 == 0, F.lit("raw_53"))
        .when(d % 7 == 1, F.lit("jp2_box"))
        .when(d % 7 == 2, F.lit("xlbox"))
        .when(d % 7 == 3, F.lit("raw_97"))
        .when(d % 7 == 4, F.lit("multitile"))
        .when(d % 7 == 5, F.lit("coc_override"))
        .otherwise(F.lit("truncated"))
    )
    meta = decode_image_meta(media).select(
        F.col("media_id").alias("doc_id"),
        ((F.col("width") == 8) & (F.col("height") == 8)).cast("int")
        .alias("dims_ok"),
    )
    hashed = image_ahash(media).select(
        F.col("media_id").alias("doc_id"),
        F.col("ahash").isNotNull().cast("int").alias("lifted"),
    )
    return (
        media.select(F.col("media_id").alias("doc_id"))
        .join(meta, "doc_id", "left")
        .join(hashed, "doc_id", "left")
        .select(
            spelling.alias("jp2_spelling"),
            F.coalesce("dims_ok", F.lit(0)).alias("dims_ok"),
            F.coalesce("lifted", F.lit(0)).alias("lifted"),
        )
        .groupBy("jp2_spelling")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("dims_ok").cast("bigint").alias("n_meta_dims"),
            F.sum("lifted").cast("bigint").alias("n_lifted"),
        )
    )


# ---------------------------------------------- jbig2 segment ledger
# Planted docs (doc_id % 29 = 6) carry a /JBIG2Decode PDF; class =
# doc_id % 4: 0 -> the valid checker stream (must lift), 1 -> first
# segment type patched to 16 (pattern dictionary), 2 -> patched to 40
# (refinement region), 3 -> reserved referred-to count 5.  Classes
# 1-3 are the content-bearing out-of-scope spellings the ADVICE r13
# branch declines BY NAME — zero lifts, zero task failures.

_JBIG2_ORACLE = """
WITH d AS (
  SELECT doc_id % 4 AS cls FROM documents WHERE doc_id % 29 = 6
),
a AS (SELECT cls, count(*) AS n FROM d GROUP BY cls)
SELECT CASE cls WHEN 0 THEN 'generic_valid'
                WHEN 1 THEN 'pattern_dict_16'
                WHEN 2 THEN 'refinement_40'
                ELSE 'reserved_refcount' END AS seg_class,
       n::BIGINT AS n_docs,
       (CASE WHEN cls = 0 THEN n ELSE 0 END)::BIGINT AS n_lifted
FROM a
"""


@_prep16("jbig2_segment_ledger", _JBIG2_ORACLE)
def q_jbig2_segment_ledger(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The jbig2 out-of-scope-segment decline contract inside the
    correctness gate: valid generic-region streams lift; pattern-
    dictionary / refinement-region / reserved-referred-count
    spellings produce ZERO media rows and ZERO task failures."""
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        extract_pdf_images,
    )

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    cls = d % 4
    filt = b"/Filter /JBIG2Decode"
    pdfs = [
        _wrap_image_pdf(s, 38, 29, filt)
        for s in (_JBIG2_T0, _JBIG2_T16, _JBIG2_T40, _JBIG2_RES5)
    ]
    planted = docs.filter(d % 29 == 6).select(
        d.alias("doc_id"),
        F.when(cls == 0, F.lit(bytearray(pdfs[0])))
        .when(cls == 1, F.lit(bytearray(pdfs[1])))
        .when(cls == 2, F.lit(bytearray(pdfs[2])))
        .otherwise(F.lit(bytearray(pdfs[3])))
        .alias("content"),
    )
    lifted = extract_pdf_images(planted, "content", "doc_id").select(
        F.get_json_object("meta_json", "$.pdf_doc_id").cast("long")
        .alias("doc_id")
    )
    cls_name = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("generic_valid"))
        .when(F.col("doc_id") % 4 == 1, F.lit("pattern_dict_16"))
        .when(F.col("doc_id") % 4 == 2, F.lit("refinement_40"))
        .otherwise(F.lit("reserved_refcount"))
    )
    n_lifted = (
        lifted.select(cls_name.alias("seg_class"))
        .groupBy("seg_class")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lifted"))
    )
    n_docs = (
        planted.select(
            F.when(d % 4 == 0, F.lit("generic_valid"))
            .when(d % 4 == 1, F.lit("pattern_dict_16"))
            .when(d % 4 == 2, F.lit("refinement_40"))
            .otherwise(F.lit("reserved_refcount"))
            .alias("seg_class")
        )
        .groupBy("seg_class")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    return n_docs.join(n_lifted, "seg_class", "left").select(
        "seg_class",
        "n_docs",
        F.coalesce("n_lifted", F.lit(0)).cast("bigint")
        .alias("n_lifted"),
    )


# ---------------------------------------------- warc media round trip
# Planted docs (doc_id % 31 = 7) republish as WARC response records
# (class = doc_id % 3: 0 -> image/jp2 boxed 5/3, 1 -> image/jp2 raw
# lossy 9/7, 2 -> text/html — which must NOT reach the media table)
# through the REAL egress writer (write_warc, member-per-record
# .warc.zst) and back through read_warc → responses_to_media →
# image_ahash.  Counts are eagerly materialized so the temp dir
# cleans up before the DataFrame returns (the lz4-ledger pattern).

_WARC_ORACLE = """
WITH d AS (
  SELECT count(*) AS n,
         sum(CASE WHEN doc_id % 3 IN (0, 1) THEN 1 ELSE 0 END) AS nm
  FROM documents WHERE doc_id % 31 = 7
)
SELECT n::BIGINT AS n_responses,
       nm::BIGINT AS n_media,
       nm::BIGINT AS n_hashed
FROM d
"""


@_prep16("warc_jp2_roundtrip", _WARC_ORACLE)
def q_warc_jp2_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Egress → ingest symmetry of the crawl media path: planted JP2
    payloads (both wavelet paths) written as .warc.zst shards by the
    real writer, read back by the real reader, projected by
    responses_to_media, and decoded by image_ahash — a regression
    anywhere in the chain (zstd frames, WARC envelopes, HTTP
    re-wrapping, content-type projection, either decoder) drops a
    count below the constructive plant."""
    import shutil
    import tempfile

    from clickhouse_table_copier_spark.operators.multimodal import (
        image_ahash,
    )
    from clickhouse_table_copier_spark.sources.warc import (
        read_warc,
        responses_to_media,
        write_warc,
    )

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    cls = d % 3
    html = b"<html><body>not media</body></html>"
    records = docs.filter(d % 31 == 7).select(
        F.lit("prep16").alias("warc_file"),
        d.cast("int").alias("record_idx"),
        F.lit("response").alias("warc_type"),
        F.concat(F.lit("https://example.org/doc/"), d.cast("string"))
        .alias("target_uri"),
        F.lit("2026-08-16T00:00:00Z").alias("warc_date"),
        F.lit(200).alias("http_status"),
        F.when(cls == 2, F.lit("text/html"))
        .otherwise(F.lit("image/jp2")).alias("content_type"),
        F.when(cls == 0, F.lit(bytearray(_JP2_BOXED)))
        .when(cls == 1, F.lit(bytearray(_J2K_97)))
        .otherwise(F.lit(bytearray(html)))
        .alias("payload"),
    )
    work = tempfile.mkdtemp(prefix="ctc_warc_jp2_")
    try:
        write_warc(records, work, n_shards=2, compression="zstd")
        back = read_warc(spark, work)
        n_responses = back.where(
            F.col("warc_type") == "response"
        ).count()
        media = responses_to_media(back)
        n_media = media.count()
        n_hashed = (
            image_ahash(media)
            .where(F.col("ahash").isNotNull())
            .count()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(n_responses, n_media, n_hashed)],
        "n_responses BIGINT, n_media BIGINT, n_hashed BIGINT",
    )
