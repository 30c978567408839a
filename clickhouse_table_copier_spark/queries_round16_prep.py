"""Round-16 registration batch, pre-written at round 15 — the r15
seams driven INSIDE the correctness gate: the JP2 container-spelling
matrix (raw codestream / JP2 box / XLBox 64-bit box / lossy 9/7 /
multi-tile / COC override / truncated) through decode_image_meta +
image_ahash, the JBIG2
out-of-scope-segment decline ledger (the ADVICE r13 branch), a
full WARC egress→ingest media round trip (write_warc .warc.zst →
read_warc → responses_to_media → image_ahash), and the raster-chain
cross-format near-dup rate (the same raster in six containers must
share ONE ahash bucket — the r14 verdict's suggested slice) —
implemented +
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
# The 8x8 gradient as the LUMA of a 4:2:0-SUBSAMPLED RGB stream
# through the irreversible 9/7 + scalar-expounded quantization path
# (fine steps — luma decodes byte-exactly and chroma replicates
# over its cells; upgraded r15 tail from the plain gray 9/7 blob so
# the driver row covers lossy + subsampling in one class;
# scripts/make_jpeg2000_golden.py)
_J2K_97 = bytes.fromhex(
    "ff4fff51002f000000000008000000080000000000000000000000080000000800000000"
    "000000000003070101070202070202ff52000c00000001000100000000ff5c000b428000"
    "880088009000ff90000a0000000000f70001ff93cffc308c10f4e31df6f52d444b796e8d"
    "38dcd2ae84965241f8b77046bb27db5cdd8a246ed7d21fcffc302406624008201379f662"
    "c3ff0004000b9c5e5003d08085cffc48821ff830fc7fe24360230dfdc52bfde5910adf55"
    "3e85bdb932a23c1db9e75135b9596f6da9bca8193f1e82aa0c0eb4cd783687b9adf6dd63"
    "d923dcae9bf72759a1df25cf85f4a37f1e86fc4c21bc9a3ad2b2faec6bbf0100e94e5356"
    "3b396145f2594bc0ff00787fe0c1200d002a7d0d02aa0b3c973e84c1502b7fc7fe18153f"
    "f120a9ff4602800e432682ddc599cdae7f04e2c423f5f07530452f0e70b1af64a1da47f9"
    "47ffd9"
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
# The SAME 8x8 gradient as a 2x2 MULTI-TILE grid — upgraded (r15
# tail) to the hardest grid spelling in scope: image area offset to
# (3, 1), tile grid anchored at (1, 0) with 6x6 tiles, so tile
# origins are ODD at the DWT split (absolute-parity anchoring) and
# band origins are misaligned to the code-block grid (narrow first
# code-blocks) — the driver row covers the full absolute-coordinate
# machinery, not just even power-of-two stitching
_J2K_TILED = bytes.fromhex(
    "ff4fff51002900000000000b000000090000000300000001000000060000000600000001"
    "000000000001070101ff52000c00000001000100000001ff5c00074040484850ff90000a"
    "0000000000220001ff93cfb414078a651e2fc1f38283e70809230569aaa6ff90000a0001"
    "0000002f0001ff93cfb4140ab19b120be27ce0bf681c7da0d61f6810085f0af10711f6c4"
    "b8657f0c5bff90000a0002000000240001ff93e5f501fed0300a48cf0b5f7fe0fce0bf38"
    "2006cf06cfff90000a0003000000390001ff93efe0077da0600c24df06136fe8fa80a7da"
    "03fcc0a3ea018fb40f1fc006fb4040049f080453040592df0404ffd9"
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


# ------------------------------------- raster cross-format identity
# Planted docs (doc_id % 19 = 3) carry the SAME 8x8 gradient raster
# in one of SIX containers (class = doc_id % 6): PNG, BMP (24-bit
# bottom-up), GIF (256-entry palette, LZW), TIFF (gray8,
# uncompressed, little-endian), raw JPEG 2000 (reversible 5/3) and
# LOSSLESS JPEG (SOF3, predictor 1).  Every leg is bit-exact by
# construction, so image_ahash — the raster-chain near-dup key —
# must put all six formats in ONE bucket: each format's bucket size
# equals the TOTAL planted count, and any decoder drift separates
# that format's bucket (the r14 verdict's "raster-chain
# cross-format near-dup rate" slice).

# BMP / GIF / TIFF / SOF3 blobs minted offline from the same pixel
# formula as the goldens (encode_png mints the PNG leg at runtime;
# the JP2 leg reuses _J2K_53); each decodes byte-identically to the
# gradient — pinned in tests/test_round16_prep.py.
_BMP_GRAD = bytes.fromhex(
    "424df600000000000000360000002800000008000000080000000100180000000000c000"
    "0000130b0000130b00000000000000000000777777969696b5b5b5d4d4d4f3f3f3121212"
    "313131505050666666858585a4a4a4c3c3c3e2e2e20101012020203f3f3f555555747474"
    "939393b2b2b2d1d1d1f0f0f00f0f0f2e2e2e444444636363828282a1a1a1c0c0c0dfdfdf"
    "fefefe1d1d1d333333525252717171909090afafafcececeededed0c0c0c222222414141"
    "6060607f7f7f9e9e9ebdbdbddcdcdcfbfbfb1111113030304f4f4f6e6e6e8d8d8dacacac"
    "cbcbcbeaeaea0000001f1f1f3e3e3e5d5d5d7c7c7c9b9b9bbababad9d9d9"
)
_GIF_GRAD = bytes.fromhex(
    "474946383961080008008700000000000101010202020303030404040505050606060707"
    "070808080909090a0a0a0b0b0b0c0c0c0d0d0d0e0e0e0f0f0f1010101111111212121313"
    "131414141515151616161717171818181919191a1a1a1b1b1b1c1c1c1d1d1d1e1e1e1f1f"
    "1f2020202121212222222323232424242525252626262727272828282929292a2a2a2b2b"
    "2b2c2c2c2d2d2d2e2e2e2f2f2f3030303131313232323333333434343535353636363737"
    "373838383939393a3a3a3b3b3b3c3c3c3d3d3d3e3e3e3f3f3f4040404141414242424343"
    "434444444545454646464747474848484949494a4a4a4b4b4b4c4c4c4d4d4d4e4e4e4f4f"
    "4f5050505151515252525353535454545555555656565757575858585959595a5a5a5b5b"
    "5b5c5c5c5d5d5d5e5e5e5f5f5f6060606161616262626363636464646565656666666767"
    "676868686969696a6a6a6b6b6b6c6c6c6d6d6d6e6e6e6f6f6f7070707171717272727373"
    "737474747575757676767777777878787979797a7a7a7b7b7b7c7c7c7d7d7d7e7e7e7f7f"
    "7f8080808181818282828383838484848585858686868787878888888989898a8a8a8b8b"
    "8b8c8c8c8d8d8d8e8e8e8f8f8f9090909191919292929393939494949595959696969797"
    "979898989999999a9a9a9b9b9b9c9c9c9d9d9d9e9e9e9f9f9fa0a0a0a1a1a1a2a2a2a3a3"
    "a3a4a4a4a5a5a5a6a6a6a7a7a7a8a8a8a9a9a9aaaaaaabababacacacadadadaeaeaeafaf"
    "afb0b0b0b1b1b1b2b2b2b3b3b3b4b4b4b5b5b5b6b6b6b7b7b7b8b8b8b9b9b9babababbbb"
    "bbbcbcbcbdbdbdbebebebfbfbfc0c0c0c1c1c1c2c2c2c3c3c3c4c4c4c5c5c5c6c6c6c7c7"
    "c7c8c8c8c9c9c9cacacacbcbcbcccccccdcdcdcecececfcfcfd0d0d0d1d1d1d2d2d2d3d3"
    "d3d4d4d4d5d5d5d6d6d6d7d7d7d8d8d8d9d9d9dadadadbdbdbdcdcdcdddddddedededfdf"
    "dfe0e0e0e1e1e1e2e2e2e3e3e3e4e4e4e5e5e5e6e6e6e7e7e7e8e8e8e9e9e9eaeaeaebeb"
    "ebecececedededeeeeeeefefeff0f0f0f1f1f1f2f2f2f3f3f3f4f4f4f5f5f5f6f6f6f7f7"
    "f7f8f8f8f9f9f9fafafafbfbfbfcfcfcfdfdfdfefefeffffff2c00000000080008000008"
    "4b00017cf0d185cf265dd922c078e2a611ab65ea440401f3c7532f6efb66488903e995b3"
    "760c888c11140ad8377f1daad099242b1abc072ecc1422354c5c00103fee58aa456d9e84"
    "18500202003b"
)
_TIFF_GRAD = bytes.fromhex(
    "49492a0048000000001f3e5d7c9bbad911304f6e8daccbea2241607f9ebddcfb33527190"
    "afceed0c446382a1c0dffe1d557493b2d1f00f2e6685a4c3e201203f7796b5d4f3123150"
    "090000010300010000000800000001010300010000000800000002010300010000000800"
    "000003010300010000000100000006010300010000000100000011010400010000000800"
    "000015010300010000000100000016010300010000000800000017010400010000004000"
    "000000000000"
)
_SOF3_GRAD = bytes.fromhex(
    "ffd8ffc4001500000200000000000000000000000000000508ffc3000b08000800080101"
    "1100ffda00080101000100005fcf9f3e7cf9f3e44f9f3e7cf9f3e44f9f3e7cf9f3e44f9f"
    "3e7cf9f47889f3e7cf9f3e8f113e7cf9f3e8f1f227cf9f3e8f1f3e44f9f3e7d1e3e7ff00"
    "ffd9"
)


def _png_grad() -> bytes:
    """PNG leg of the gradient, minted at runtime by the repo's own
    encoder (the _twin_pngs pattern from the r15 batch)."""
    import numpy as np

    from clickhouse_table_copier_spark.operators.multimodal import (
        encode_png,
    )

    grad = np.fromfunction(
        lambda y, x: (x * 31 + y * 17) % 256, (8, 8), dtype=np.int64
    ).astype(np.uint8)
    return encode_png(grad.tobytes(), 8, 8, channels=1)


_FORMATS_ORACLE = """
WITH d AS (
  SELECT doc_id % 6 AS cls FROM documents WHERE doc_id % 19 = 3
),
a AS (SELECT cls, count(*) AS n FROM d GROUP BY cls),
t AS (SELECT sum(n) AS total FROM a)
SELECT CASE cls WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
                WHEN 2 THEN 'gif' WHEN 3 THEN 'tiff'
                WHEN 4 THEN 'jp2' ELSE 'jpeg_sof3' END AS img_format,
       n::BIGINT AS n_docs,
       n::BIGINT AS n_lifted,
       total::BIGINT AS n_bucket
FROM a, t
"""


@_prep16("raster_format_identity", _FORMATS_ORACLE)
def q_raster_format_identity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-format near-dup rate through the full raster decoder
    cascade: the same raster planted in six containers must land in
    ONE image_ahash bucket, so every format's bucket size equals the
    total planted count — a drift in ANY of the six decoders (or in
    the hash normalization that makes them comparable) separates
    that format's bucket and drops n_bucket below the plant."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        image_ahash,
    )

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    cls = d % 6
    blobs = [
        _png_grad(), _BMP_GRAD, _GIF_GRAD, _TIFF_GRAD, _J2K_53,
        _SOF3_GRAD,
    ]
    media = docs.filter(d % 19 == 3).select(
        d.alias("media_id"),
        F.lit("image").alias("kind"),
        F.when(cls == 0, F.lit(bytearray(blobs[0])))
        .when(cls == 1, F.lit(bytearray(blobs[1])))
        .when(cls == 2, F.lit(bytearray(blobs[2])))
        .when(cls == 3, F.lit(bytearray(blobs[3])))
        .when(cls == 4, F.lit(bytearray(blobs[4])))
        .otherwise(F.lit(bytearray(blobs[5])))
        .alias("content"),
        F.lit("{}").alias("meta_json"),
    )
    fmt = (
        F.when(F.col("media_id") % 6 == 0, F.lit("png"))
        .when(F.col("media_id") % 6 == 1, F.lit("bmp"))
        .when(F.col("media_id") % 6 == 2, F.lit("gif"))
        .when(F.col("media_id") % 6 == 3, F.lit("tiff"))
        .when(F.col("media_id") % 6 == 4, F.lit("jp2"))
        .otherwise(F.lit("jpeg_sof3"))
    )
    from pyspark.sql.window import Window

    # bucket size via a window partitioned by ahash (NOT a self-join
    # against an aggregate of the same lineage, which would run the
    # pure-Python decode chain twice — review r15); count("ahash")
    # is non-null-counting, so undecoded rows report bucket 0
    hashed = image_ahash(media).select("media_id", "ahash")
    per = hashed.select(
        fmt.alias("img_format"),
        "ahash",
        F.count("ahash").over(Window.partitionBy("ahash"))
        .alias("n_bucket"),
    )
    return (
        per.groupBy("img_format")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("ahash").isNotNull().cast("int"))
            .cast("bigint").alias("n_lifted"),
            F.max(
                F.when(F.col("ahash").isNotNull(), F.col("n_bucket"))
                .otherwise(F.lit(0))
            ).cast("bigint").alias("n_bucket"),
        )
    )
