"""Scanned-PDF image lift → media table → cross-codec near-dup pairs,
end to end on synthesized fixtures (no network, no image libraries):

  1. build three PDFs carrying the SAME page raster under different
     codecs — ``/CCITTFaxDecode`` (Group 4), ``/JBIG2Decode``
     (arithmetic generic region, encoded by the repo's offline golden
     encoder transcription), and a JBIG2 stream whose symbol
     dictionary lives in a shared ``/JBIG2Globals`` object
  2. → ``extract_pdf_images`` lifts every page image into the
     multimodal media contract (grayscale PNG re-emission) inside the
     Arrow batch edge                         (operators.pdf_extract)
  3. → ``image_ahash`` + ``near_duplicate_images`` pair all three
     copies with a standalone PNG twin of the same raster — the
     cross-codec dedup a crawl corpus needs   (operators.multimodal)

Run: python examples/scanned_pdf_dedup.py
Prints the media rows and the near-dup pairs; exits non-zero if the
three codec spellings fail to bucket together.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pdf_image(dict_extra: bytes, blob: bytes, extra_objs: bytes = b"") -> bytes:
    body = (
        b"<< " + dict_extra + f" /Length {len(blob)} >>".encode()
        + b"\nstream\n" + blob + b"\nendstream"
    )
    return (
        b"%PDF-1.5\n1 0 obj\n" + body + b"\nendobj\n" + extra_objs
        + b"%%EOF\n"
    )


def main() -> int:
    import importlib.util

    import numpy as np
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("scanned-pdf-dedup")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from clickhouse_table_copier_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        image_ahash,
        near_duplicate_images,
    )
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        extract_pdf_images,
    )

    # the shared page raster: text-line pattern, 1 = black
    h, w = 33, 40
    img = np.zeros((h, w), np.uint8)
    for y0 in range(2, h - 3, 7):
        img[y0 : y0 + 3, 3 : w - 3] = 1
        img[y0 + 1, 5 : w : 9] = 0

    # --- codec spellings of the same raster -------------------------
    # JBIG2: the offline golden-encoder transcription (scripts/) is an
    # ENCODER, so the example can mint real arithmetic streams
    spec = importlib.util.spec_from_file_location(
        "mkg",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "make_jbig2_golden.py",
        ),
    )
    mkg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mkg)
    jb2 = mkg.segment(1, 48, [], 1, mkg.page_info(w, h)) + mkg.segment(
        2, 38, [], 1, mkg.generic_region_data(img, 0, True)
    )
    pdf_jbig2 = _pdf_image(
        b"/Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/BitsPerComponent 1 /ColorSpace /DeviceGray "
        b"/Filter /JBIG2Decode" % (w, h),
        jb2,
    )
    # CCITT G4 via the offline libtiff golden writer (independent
    # encoder), strip bytes = the /CCITTFaxDecode payload
    g4 = mkg.g4_strip_bytes(img)
    pdf_ccitt = _pdf_image(
        b"/Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/BitsPerComponent 1 /ColorSpace /DeviceGray "
        b"/Filter /CCITTFaxDecode /DecodeParms << /K -1 /Columns %d "
        b"/Rows %d /BlackIs1 false >>" % (w, h, w, h),
        g4,
    )
    # JBIG2 with the dictionary in a /JBIG2Globals stream
    syms = mkg.SYMS
    sd, order = mkg.symbol_dict_data(syms)
    glob_blob = mkg.segment(1, 0, [], 0, sd)
    exp_id = {orig: k for k, orig in enumerate(order)}
    exported = [syms[o] for o in order]
    placements = [(2, 3, 0), (9, 5, 1), (17, 9, 2)]
    tr = mkg.text_region_data(
        w, 24, [(x, y, exp_id[s]) for x, y, s in placements], exported
    )
    body = mkg.segment(2, 48, [], 1, mkg.page_info(w, 24)) + mkg.segment(
        3, 6, [1], 1, tr
    )
    pdf_globals = _pdf_image(
        b"/Type /XObject /Subtype /Image /Width %d /Height 24 "
        b"/BitsPerComponent 1 /ColorSpace /DeviceGray "
        b"/Filter /JBIG2Decode "
        b"/DecodeParms << /JBIG2Globals 7 0 R >>" % w,
        body,
        extra_objs=(
            b"7 0 obj\n<< /Length %d >>\nstream\n" % len(glob_blob)
            + glob_blob + b"\nendstream\nendobj\n"
        ),
    )

    pdf_df = spark.createDataFrame(
        [
            (1, bytearray(pdf_jbig2)),
            (2, bytearray(pdf_ccitt)),
            (3, bytearray(pdf_globals)),
        ],
        "doc_id long, content binary",
    )
    media = extract_pdf_images(pdf_df, "content", "doc_id")
    n_lifted = media.count()
    print(f"page images lifted from 3 PDFs: {n_lifted}")

    # standalone PNG twin of the text-line raster joins the table
    twin = encode_png(
        ((1 - img) * np.uint8(255)).tobytes(), w, h, channels=1
    )
    standalone = spark.createDataFrame(
        [(100, "image", bytearray(twin), "{}")], MEDIA_SCHEMA
    )
    table = standalone.unionByName(media)
    hashes = image_ahash(table)
    for r in hashes.collect():
        print("  media", r["media_id"], "ahash", r["ahash"])
    pairs = near_duplicate_images(table, max_hamming=3).collect()
    print(f"near-dup pairs: {len(pairs)}")
    for p in pairs:
        print("  ", p["id_a"], "<->", p["id_b"],
              "hamming", p["hamming"])
    # jbig2-generic, ccitt and the png twin carry the SAME raster —
    # they must fully pair (3 choose 2 = 3 pairs); the globals page is
    # a different raster and must NOT pair with them
    if n_lifted != 3 or len(pairs) != 3:
        print("FAIL: expected 3 lifted images and 3 pairs")
        return 1
    print("OK: three codec spellings of one page bucket together")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
