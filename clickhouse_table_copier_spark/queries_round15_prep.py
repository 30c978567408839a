"""Round-15 registration batch, pre-written at round 14 — the
scanned-PDF media surface and the round-trip seams shipped in rounds
13-14, driven INSIDE the correctness gate: cross-codec aHash identity
over planted JPX/JBIG2/CCITT page images, the ``.jsonl.lz4`` egress
round trip, PDF-crypt extraction coverage, and the JPX decline
taxonomy — implemented + DuckDB-hash-verified NOW
(tests/test_round15_prep.py runs the exact compare() harness every CI
run) but NOT registered: the r14 window is booked by the age-6 r08
cohort + the 4-query r14 flip, so these names register at round 15
through the same flip the round12/13/14 prep batches used.

Oracle strategy — identical to the prior prep batches: every query
PLANTS its input from ``documents`` doc_id arithmetic (thin planted
subsets; the payload bytes are GOLDEN streams minted by the
independent encoder transcriptions in scripts/ and embedded here as
constants), the Spark side runs the REAL operator stack
(``extract_pdf_images`` → jpeg2000/jbig2/ccitt decode → ``image_ahash``
→ ``near_duplicate_images``; ``write_jsonl``/``read_jsonl`` through
the lz4 frame codec; ``extract_pdf_text`` through pdf_crypt), and the
oracle derives the expected answer CONSTRUCTIVELY from the planting
parameters — never a SQL re-implementation of the operator, so a
Spark-side semantics bug cannot cancel out of both sides.

Reference parity: none — north-star LLM-pipeline surface (SURVEY.md
§2.8); the reference engine (noperformance/clickhouse-table-copier)
reads SQL tables only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register

# name -> spark fn / oracle sql; consumed by tests/test_round15_prep.py
# and mirrored into the main registry (flipped at round 15).
PREP15_QUERIES: dict = {}
PREP15_ORACLES: dict[str, str] = {}


def _prep15(name: str, oracle: str):
    def deco(fn):
        PREP15_QUERIES[name] = fn
        PREP15_ORACLES[name] = oracle
        return register(name, oracle)(fn)

    return deco


# ------------------------------------------------------------ goldens
# JPEG 2000 codestream of the 8x8 gradient (scripts/
# make_jpeg2000_golden.py, also pinned in tests/test_jpeg2000.py)
_J2K_GRAY8 = bytes.fromhex(
    "ff4fff510029000000000008000000080000000000000000000000080000000800000000"
    "000000000001070101ff52000c00000001000100000001ff5c00074040484850ff90000a"
    "0000000000440001ff93df808811f708b52ec99d9ea937d2146191ba9447cfc02a1f504c"
    "7e00c0230f80ba296a5926e0bf1e83aebdc4e4733ae91e86fc52597fffd9"
)
# JBIG2 embedded stream of the 38x29 cell-3 checker (scripts/
# make_jbig2_golden.py, also pinned in tests/test_jbig2.py)
_JBIG2_T0 = bytes.fromhex(
    "0000000130000100000013000000260000001d0000000000000000000000000000022600"
    "0100000038000000260000001d0000000000000000000003fffdff02fefefe42867a6997"
    "a12edc5560c8950dc8ed42b7b139d49ba46e6c4da0acffffac"
)
# Group 4 strip of the SAME 38x29 checker, minted by libtiff (the
# independent T.6 encoder the ccitt goldens use) — the cross-codec
# identity leg: its raster is bit-identical to _JBIG2_T0's
_G4_CHECKER = bytes.fromhex(
    "31188c4623118bffffff82040810204081020408105fffffff060810204081020408105f"
    "fffffc1020408102040810204082fffffff830408102040810204082ffffffe081020408"
    "10204081020417ffffffc182040810204081020417ffffff0408102040810204081020bf"
    "fffffe0c102040810204081020bffffff82040810204081020408105fffc004004"
)
# Encrypted twins of one fixture PDF (tests' Annex-G encryptor run
# OFFLINE; text: 'Crypt coverage fixture r15.'): R2/RC4-40 and
# R6/AES-256 open with the empty user password; the R4/AESV2 twin is
# locked (user AND owner passwords set) and must DECLINE
_PDF_R2_OPEN = bytes.fromhex(
    "255044462d312e360a312030206f626a0a3c3c202f54797065202f436174616c6f67"
    "202f5061676573203220302052203e3e0a656e646f626a0a322030206f626a0a3c3c"
    "202f54797065202f5061676573202f4b696473205b34203020525d202f436f756e74"
    "2031203e3e0a656e646f626a0a332030206f626a0a3c3c202f54797065202f466f6e"
    "74202f53756274797065202f5479706531202f42617365466f6e74202f48656c7665"
    "74696361203e3e0a656e646f626a0a342030206f626a0a3c3c202f54797065202f50"
    "616765202f506172656e74203220302052202f4d65646961426f78205b3020302036"
    "3132203739325d202f5265736f7572636573203c3c202f466f6e74203c3c202f4631"
    "203320302052203e3e203e3e202f436f6e74656e7473203520302052203e3e0a656e"
    "646f626a0a352030206f626a0a3c3c202f46696c746572202f466c6174654465636f"
    "6465202f4c656e677468203634203e3e73747265616d0a9cf114abf754aea391bafc"
    "9ad097a7955198e8e7ba6fbca7f6c096c1b3c1e863697c9e69ca6d5a58e98ab248e0"
    "42ce2a91259c8c8a5c2e107f342288388b93cd0a656e6473747265616d0a656e646f"
    "626a0a362030206f626a0a3c3c202f46696c746572202f5374616e64617264202f56"
    "2031202f522032202f4c656e677468203430202f50202d3434202f4f203c32303535"
    "63373536633732653161643730323630386538313936616361643434376164333264"
    "31376366663538333233356636646431356665643764616236373e202f55203c3666"
    "61356535663166353161313361376166643366613663626337316563613832303636"
    "313163626539656263363830653565303134323838343532356164613e203e3e0a65"
    "6e646f626a0a747261696c65720a3c3c202f53697a652037202f526f6f7420312030"
    "2052202f456e6372797074203620302052202f4944205b3c64656164626565666465"
    "616462656566646561646265656664656164626565663e203c646561646265656664"
    "65616462656566646561646265656664656164626565663e5d203e3e0a2525454f46"
    "0a"
)
_PDF_R6_OPEN = bytes.fromhex(
    "255044462d312e360a312030206f626a0a3c3c202f54797065202f436174616c6f67"
    "202f5061676573203220302052203e3e0a656e646f626a0a322030206f626a0a3c3c"
    "202f54797065202f5061676573202f4b696473205b34203020525d202f436f756e74"
    "2031203e3e0a656e646f626a0a332030206f626a0a3c3c202f54797065202f466f6e"
    "74202f53756274797065202f5479706531202f42617365466f6e74202f48656c7665"
    "74696361203e3e0a656e646f626a0a342030206f626a0a3c3c202f54797065202f50"
    "616765202f506172656e74203220302052202f4d65646961426f78205b3020302036"
    "3132203739325d202f5265736f7572636573203c3c202f466f6e74203c3c202f4631"
    "203320302052203e3e203e3e202f436f6e74656e7473203520302052203e3e0a656e"
    "646f626a0a352030206f626a0a3c3c202f46696c746572202f466c6174654465636f"
    "6465202f4c656e677468203936203e3e73747265616d0a232425262728292a2b2c2d"
    "2e2f3031326dc896ec451f64126d88f499fd8132948452254602b45f7ba1832fcf65"
    "740f63b36d70c225b2612ad801c32466c8eec1f9cd89174990ef809d9c3ebaab0f15"
    "a4e76d6ff910ebd1f8874d5d99644071110a656e6473747265616d0a656e646f626a"
    "0a362030206f626a0a3c3c202f46696c746572202f5374616e64617264202f562035"
    "202f522036202f4c656e67746820323536202f50202d3434202f4346203c3c202f53"
    "74644346203c3c202f43464d202f4145535633203e3e203e3e202f53746d46202f53"
    "74644346202f53747246202f5374644346202f4f203c643334663932353336313832"
    "38626134626530636632346638396636623761663135336233613237333166343934"
    "63313133653937396633633135643834626234663536343134633533343134633534"
    "346634623435353935333431346335343e202f55203c666534623465336263373063"
    "39366265656239653562323462343561303832333839666363383663383761626432"
    "32383838323137376632613833383662343135353536343134633533343134633534"
    "353534623435353935333431346335343e202f4f45203c3866393137613362643031"
    "62666636373530656364623165633631656333653766333264336461306637636163"
    "356132653039396232616461656135633661663e202f5545203c3034396333646433"
    "66323735333334323130393133643666666166376362613631343064306233396662"
    "663230616333323638323161373035646666323539663e203e3e0a656e646f626a0a"
    "747261696c65720a3c3c202f53697a652037202f526f6f74203120302052202f456e"
    "6372797074203620302052202f4944205b3c64656164626565666465616462656566"
    "646561646265656664656164626565663e203c646561646265656664656164626565"
    "66646561646265656664656164626565663e5d203e3e0a2525454f460a"
)
_PDF_R4_LOCKED = bytes.fromhex(
    "255044462d312e360a312030206f626a0a3c3c202f54797065202f436174616c6f67"
    "202f5061676573203220302052203e3e0a656e646f626a0a322030206f626a0a3c3c"
    "202f54797065202f5061676573202f4b696473205b34203020525d202f436f756e74"
    "2031203e3e0a656e646f626a0a332030206f626a0a3c3c202f54797065202f466f6e"
    "74202f53756274797065202f5479706531202f42617365466f6e74202f48656c7665"
    "74696361203e3e0a656e646f626a0a342030206f626a0a3c3c202f54797065202f50"
    "616765202f506172656e74203220302052202f4d65646961426f78205b3020302036"
    "3132203739325d202f5265736f7572636573203c3c202f466f6e74203c3c202f4631"
    "203320302052203e3e203e3e202f436f6e74656e7473203520302052203e3e0a656e"
    "646f626a0a352030206f626a0a3c3c202f46696c746572202f466c6174654465636f"
    "6465202f4c656e677468203936203e3e73747265616d0a232425262728292a2b2c2d"
    "2e2f30313239be660db5b80eb53d6b22a72dec5d57884c511d62daab0d37a6231ec1"
    "07189e2c04a1a3bc615ecc9c23b30178d509ef2c6c952799cf653cfc0477ed853b62"
    "0ca04751b1cf5dc696715a0cd607c0284d0a656e6473747265616d0a656e646f626a"
    "0a362030206f626a0a3c3c202f46696c746572202f5374616e64617264202f562034"
    "202f522034202f4c656e67746820313238202f50202d3434202f4f203c3665663337"
    "36346164323663666533636162363837303666633236633934313364383064343762"
    "303533333734353239613332653134303565656261343263313e202f55203c386164"
    "34393834666631306263333731346338386535643565393466326464393030303030"
    "3030303030303030303030303030303030303030303030303030303e202f4346203c"
    "3c202f5374644346203c3c202f43464d202f4145535632202f417574684576656e74"
    "202f446f634f70656e203e3e203e3e202f53746d46202f5374644346202f53747246"
    "202f5374644346203e3e0a656e646f626a0a747261696c65720a3c3c202f53697a65"
    "2037202f526f6f74203120302052202f456e6372797074203620302052202f494420"
    "5b3c6465616462656566646561646265656664656164626565666465616462656566"
    "3e203c64656164626565666465616462656566646561646265656664656164626565"
    "663e5d203e3e0a2525454f460a"
)
_CRYPT_TEXT = "Crypt coverage fixture r15."


def _image_pdf(stream: bytes, w: int, h: int, filt: bytes) -> bytes:
    """One-image PDF wrapping ``stream`` under ``filt`` (the image-
    XObject shape the lift path consumes)."""
    body = (
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/BitsPerComponent 8 /ColorSpace /DeviceGray " % (w, h)
        + filt
        + b" /Length %d >>\nstream\n" % len(stream)
        + stream
        + b"\nendstream"
    )
    return b"%PDF-1.5\n1 0 obj\n" + body + b"\nendobj\n%%EOF\n"


_PDF_JPX = _image_pdf(_J2K_GRAY8, 8, 8, b"/Filter /JPXDecode")
_PDF_JBIG2 = _image_pdf(_JBIG2_T0, 38, 29, b"/Filter /JBIG2Decode")
_PDF_CCITT = _image_pdf(
    _G4_CHECKER, 38, 29,
    b"/Filter /CCITTFaxDecode "
    b"/DecodeParms << /K -1 /Columns 38 /Rows 29 >>",
)
# JPX decline taxonomy inputs: truncated golden; out-of-scope 9/7
# transform (COD SPcod transform byte patched to 0); non-JPX bytes
_J2K_TRUNC = _J2K_GRAY8[:40]
# lossy 9/7 golden of the same 8x8 gradient (fine quantization,
# decodes byte-exactly — scripts/make_jpeg2000_golden.py r15)
_J2K_97 = bytes.fromhex(
    "ff4fff51002900000000000800000008000000000000000000000008000000080000"
    "0000000000000001070101ff52000c00000001000100000000ff5c000b4260006800"
    "68007000ff90000a0000000000760001ff93cfe46c10f4e31df6f52d426430e0790b"
    "db7137f62c3612dc2ae0b0acf15fcff02f0fd85a3fc0a0230dfdc52bfde5910adf55"
    "3e85bdb932a23c1db97439c61e82aa0c0eb4cd783687b9adf6dd63d923dca4bf8baf"
    "1e86fc4c21bc9a3ad2b2faec6bbc5add4cf70df6ffd9"
)


def _twin_pngs():
    """Standalone PNG twins of the two planted rasters (driver-side
    constants; same formulas as the golden scripts/tests)."""
    import numpy as np

    from clickhouse_table_copier_spark.operators.multimodal import (
        encode_png,
    )

    yy, xx = np.mgrid[0:29, 0:38]
    checker = (((yy // 3) + (xx // 3)) % 2).astype(np.uint8)
    checker_png = encode_png(
        ((1 - checker) * np.uint8(255)).tobytes(), 38, 29, channels=1
    )
    grad = np.fromfunction(
        lambda y, x: (x * 31 + y * 17) % 256, (8, 8), dtype=np.int64
    ).astype(np.uint8)
    grad_png = encode_png(grad.tobytes(), 8, 8, channels=1)
    return checker_png, grad_png


# ------------------------------------------- cross-codec ahash pairs
# Planted docs (doc_id % 23 = 1) carry one scanned-page PDF each:
# doc_id % 3 = 0 -> JPX gradient, 1 -> JBIG2 checker, 2 -> CCITT-G4
# checker (the SAME raster as the JBIG2 leg — cross-codec identity).
# The media pipeline lifts every image, and near_duplicate_images at
# hamming 0 must bucket each raster group with its standalone PNG
# twin: a group of n lifted images + 1 twin yields n*(n+1)/2 pairs.

_PAIRS_ORACLE = """
WITH d AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'gradient' ELSE 'checker' END
           AS raster_grp
  FROM documents WHERE doc_id % 23 = 1
),
a AS (SELECT raster_grp, count(*) AS n FROM d GROUP BY raster_grp)
SELECT raster_grp,
       n::BIGINT AS n_docs,
       n::BIGINT AS n_lifted,
       (n * (n + 1) / 2)::BIGINT AS n_pairs
FROM a
"""


@_prep15("scanned_codec_ahash_pairs", _PAIRS_ORACLE)
def q_scanned_codec_ahash_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-codec scanned-page identity through the REAL media stack:
    extract_pdf_images (jpeg2000 + jbig2 + ccitt decoders inside the
    Arrow edge) → image_ahash → near_duplicate_images (banded LSH,
    exact at hamming 0).  The JBIG2 and CCITT legs decode the SAME
    checker raster from DIFFERENT codecs, so their bucket merging is
    the cross-codec assertion; a decoder regression drops n_lifted
    and collapses n_pairs below the constructive count."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        near_duplicate_images,
    )
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        extract_pdf_images,
    )

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    planted = docs.filter(d % 23 == 1).select(
        d.alias("doc_id"),
        F.when(d % 3 == 0, F.lit(bytearray(_PDF_JPX)))
        .when(d % 3 == 1, F.lit(bytearray(_PDF_JBIG2)))
        .otherwise(F.lit(bytearray(_PDF_CCITT)))
        .alias("content"),
    )
    embedded = extract_pdf_images(planted, "content", "doc_id")
    checker_png, grad_png = _twin_pngs()
    twins = spark.createDataFrame(
        [
            (-1, "image", bytearray(checker_png), '{"grp":"checker"}'),
            (-2, "image", bytearray(grad_png), '{"grp":"gradient"}'),
        ],
        MEDIA_SCHEMA,
    )
    media = twins.unionByName(embedded)
    # media_id -> raster group (twins by fixed id; embedded via the
    # provenance doc id in meta_json)
    src_doc = F.get_json_object("meta_json", "$.pdf_doc_id").cast(
        "long"
    )
    grp = media.select(
        F.col("media_id"),
        # embedded media carry pdf_doc_id provenance; twins carry grp
        src_doc.isNotNull().alias("is_embedded"),
        F.when(src_doc.isNotNull() & (src_doc % 3 == 0),
               F.lit("gradient"))
        .when(src_doc.isNotNull(), F.lit("checker"))
        .otherwise(F.get_json_object("meta_json", "$.grp"))
        .alias("raster_grp"),
    )
    pairs = near_duplicate_images(media, max_hamming=0)
    n_pairs = (
        pairs.join(grp, pairs["id_a"] == grp["media_id"])
        .groupBy("raster_grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    counts = (
        planted.select(
            F.when(d % 3 == 0, F.lit("gradient"))
            .otherwise(F.lit("checker"))
            .alias("raster_grp")
        )
        .groupBy("raster_grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    lifted = (
        grp.filter(F.col("is_embedded"))
        .groupBy("raster_grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lifted"))
    )
    return (
        counts.join(lifted, "raster_grp", "left")
        .join(n_pairs, "raster_grp", "left")
        .select(
            "raster_grp",
            "n_docs",
            F.coalesce("n_lifted", F.lit(0)).cast("bigint")
            .alias("n_lifted"),
            F.coalesce("n_pairs", F.lit(0)).cast("bigint")
            .alias("n_pairs"),
        )
    )


# ------------------------------------------------- lz4 egress ledger
# The .jsonl.lz4 round trip (r13 egress seam): planted docs republish
# as TWO lz4-framed shards through the real writer (JVM-side to_json,
# Arrow-edge LZ4F compress / stored-frame fallback), read back through
# the magic-sniffing expander, and every line must reproduce its
# (doc_id, text) exactly.

_LZ4_ORACLE = """
WITH d AS (SELECT count(*) AS n FROM documents WHERE doc_id % 7 = 2)
SELECT (CASE WHEN n >= 2 THEN 2 ELSE n END)::BIGINT AS n_shards,
       n::BIGINT AS n_lines,
       n::BIGINT AS n_exact
FROM d
"""


@_prep15("lz4_egress_ledger", _LZ4_ORACLE)
def q_lz4_egress_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write → read symmetry of the ``.jsonl.lz4`` shard path
    (sources/jsonl.write_jsonl with compression='lz4' →
    sources/jsonl.read_jsonl): shard count, line count, and per-line
    byte-exact text round trip, all eagerly materialized so the temp
    dir cleans up before the DataFrame returns (the r6c streaming-
    query discipline)."""
    import shutil
    import tempfile

    from clickhouse_table_copier_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    docs = _t(spark, sf_dir, "documents")
    sub = docs.filter(F.col("doc_id") % 7 == 2).select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="ctc_lz4_ledger_")
    try:
        shards = write_jsonl(sub, work, n_shards=2, compression="lz4")
        back = read_jsonl(spark, work).select(
            F.get_json_object("value", "$.doc_id").cast("long")
            .alias("doc_id"),
            F.get_json_object("value", "$.text").alias("text_back"),
        )
        joined = back.join(
            sub.withColumnRenamed("text", "text_orig"), "doc_id"
        )
        row = joined.agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (F.col("text_back") == F.col("text_orig")).cast("int")
            ).alias("n_exact"),
        ).collect()[0]
        n_lines = int(row["n_lines"])
        n_exact = int(row["n_exact"] or 0)
        n_shards = len(shards)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(n_shards, n_lines, n_exact)],
        "n_shards BIGINT, n_lines BIGINT, n_exact BIGINT",
    )


# ------------------------------------------------ pdf crypt coverage
# Planted docs (doc_id % 19 = 3) carry one encrypted PDF each:
# doc_id % 3 = 0 -> R2/RC4-40, 1 -> R6/AES-256 (both open with the
# empty user password and must extract the fixture text), 2 ->
# R4/AESV2 with REAL user+owner passwords (must decline to NULL,
# never raise, never emit ciphertext garbage).

_CRYPT_ORACLE = """
WITH d AS (
  SELECT doc_id % 3 AS cls FROM documents WHERE doc_id % 19 = 3
),
a AS (SELECT cls, count(*) AS n FROM d GROUP BY cls)
SELECT CASE cls WHEN 0 THEN 'r2_open' WHEN 1 THEN 'r6_open'
                ELSE 'r4_locked' END AS crypt_class,
       n::BIGINT AS n_docs,
       (CASE WHEN cls IN (0, 1) THEN n ELSE 0 END)::BIGINT AS n_text,
       (CASE WHEN cls = 2 THEN n ELSE 0 END)::BIGINT AS n_declined
FROM a
"""


@_prep15("pdf_crypt_coverage", _CRYPT_ORACLE)
def q_pdf_crypt_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encrypted-PDF coverage through the REAL text extractor
    (operators/pdf_extract.extract_pdf_text → operators/pdf_crypt):
    n_text counts docs whose extracted text EQUALS the fixture string
    (a cipher regression mojibakes it to a mismatch), n_declined
    counts NULL-text declines — the locked class must decline 100%."""
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        extract_pdf_text,
    )

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    planted = docs.filter(d % 19 == 3).select(
        d.alias("doc_id"),
        F.when(d % 3 == 0, F.lit(bytearray(_PDF_R2_OPEN)))
        .when(d % 3 == 1, F.lit(bytearray(_PDF_R6_OPEN)))
        .otherwise(F.lit(bytearray(_PDF_R4_LOCKED)))
        .alias("content"),
    )
    extracted = extract_pdf_text(planted, "content", "doc_id")
    cls = F.col("doc_id") % 3
    return (
        extracted.select(
            F.when(cls == 0, F.lit("r2_open"))
            .when(cls == 1, F.lit("r6_open"))
            .otherwise(F.lit("r4_locked"))
            .alias("crypt_class"),
            F.coalesce(
                F.col("text") == F.lit(_CRYPT_TEXT), F.lit(False)
            ).cast("int").alias("ok"),
            F.col("text").isNull().cast("int").alias("declined"),
        )
        .groupBy("crypt_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ok").cast("bigint").alias("n_text"),
            F.sum("declined").cast("bigint").alias("n_declined"),
        )
    )


# ---------------------------------------------- jpx decline taxonomy
# Planted docs (doc_id % 13 = 4) carry a /JPXDecode PDF whose payload
# class is doc_id % 4: 0 -> the reversible 5/3 golden (must lift),
# 1 -> a truncated codestream, 2 -> a LOSSY 9/7 + scalar-quantization
# golden (must lift since the r15 9/7 decoder), 3 -> non-JPX bytes.
# Classes 1 and 3 must DECLINE per image (zero lifts) without raising
# — a raise anywhere fails the whole Arrow batch and the driver row
# with it, which is exactly what this query pins.

_JPX_ORACLE = """
WITH d AS (
  SELECT doc_id % 4 AS cls FROM documents WHERE doc_id % 13 = 4
),
a AS (SELECT cls, count(*) AS n FROM d GROUP BY cls)
SELECT CASE cls WHEN 0 THEN 'valid' WHEN 1 THEN 'truncated'
                WHEN 2 THEN 'irreversible_97' ELSE 'garbage' END
         AS jpx_class,
       n::BIGINT AS n_docs,
       (CASE WHEN cls IN (0, 2) THEN n ELSE 0 END)::BIGINT AS n_lifted
FROM a
"""


@_prep15("jpx_decline_taxonomy", _JPX_ORACLE)
def q_jpx_decline_taxonomy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The jpeg2000 decode + decline contract inside the correctness
    gate: reversible 5/3 AND lossy 9/7 streams lift, truncated /
    garbage streams produce ZERO media rows and ZERO task
    failures."""
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        extract_pdf_images,
    )

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    pdfs = [
        _image_pdf(s, 8, 8, b"/Filter /JPXDecode")
        for s in (_J2K_GRAY8, _J2K_TRUNC, _J2K_97, b"not a codestream")
    ]
    cls = d % 4
    planted = docs.filter(d % 13 == 4).select(
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
        F.when(F.col("doc_id") % 4 == 0, F.lit("valid"))
        .when(F.col("doc_id") % 4 == 1, F.lit("truncated"))
        .when(F.col("doc_id") % 4 == 2, F.lit("irreversible_97"))
        .otherwise(F.lit("garbage"))
    )
    n_lifted = (
        lifted.select(cls_name.alias("jpx_class"))
        .groupBy("jpx_class")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lifted"))
    )
    n_docs = (
        planted.select(
            F.when(d % 4 == 0, F.lit("valid"))
            .when(d % 4 == 1, F.lit("truncated"))
            .when(d % 4 == 2, F.lit("irreversible_97"))
            .otherwise(F.lit("garbage"))
            .alias("jpx_class")
        )
        .groupBy("jpx_class")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    return n_docs.join(n_lifted, "jpx_class", "left").select(
        "jpx_class",
        "n_docs",
        F.coalesce("n_lifted", F.lit(0)).cast("bigint")
        .alias("n_lifted"),
    )
