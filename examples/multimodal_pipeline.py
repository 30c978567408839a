"""End-to-end multimodal curation: tar shards → deduped media table.

A runnable demonstration of the media path through this engine, on
self-synthesized fixtures (no network, no image/audio libraries — the
encoders live in tests/, the decoders are the engine's own pure-Python
ones):

  1. WebDataset tar shards carrying JPEGs in THREE entropy modes
     (baseline, arithmetic-sequential, arithmetic-progressive), one
     EXIF-rotated re-export, and WAV audio clips (one trimmed copy)
  2. → sample table                         (sources.webdataset)
  3. → image metadata + EXIF provenance     (operators.multimodal)
  4. → orientation-normalized aHash dedup   (image_ahash_oriented:
       entropy mode AND storage rotation never split a bucket)
  5. → audio fingerprint near-dup pairs     (near_duplicate_audio)

Run: python examples/multimodal_pipeline.py
Prints each stage's row counts and the dedup verdicts.
"""

import os
import sys
import tarfile
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)


def main() -> None:
    import numpy as np

    from clickhouse_table_copier_spark.operators.multimodal import (
        decode_image_exif,
        decode_image_meta,
        image_ahash_oriented,
        near_duplicate_audio,
    )
    from clickhouse_table_copier_spark.session import get_spark
    from clickhouse_table_copier_spark.sources.webdataset import (
        group_samples,
        read_webdataset,
        to_media_table,
    )
    from test_audio_fingerprint import _wav
    from test_exif import make_exif_app1, with_exif
    from test_jpeg_arith import (
        encode_arith_progressive,
        encode_arith_sequential,
    )
    from test_jpeg_decode import encode_baseline_jpeg

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="multimodal_")

    rng = np.random.default_rng(42)
    hero = rng.integers(0, 256, (16, 32, 3), dtype=np.uint8)
    other = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    rotated = np.ascontiguousarray(np.rot90(hero, k=1))
    clip = rng.normal(0, 0.3, 16000)
    trimmed = clip[:8000]

    samples = {
        "img-baseline": {"jpg": encode_baseline_jpeg(hero)},
        "img-arith": {"jpg": encode_arith_sequential(hero)},
        "img-arith-prog": {"jpg": encode_arith_progressive(hero)},
        "img-rotated": {
            "jpg": with_exif(
                encode_baseline_jpeg(rotated), make_exif_app1(orientation=6)
            )
        },
        "img-other": {"jpg": encode_baseline_jpeg(other)},
        "aud-full": {"wav": _wav(clip)},
        "aud-trimmed": {"wav": _wav(trimmed)},
        "aud-other": {"wav": _wav(rng.normal(0, 0.3, 16000))},
    }
    shard = os.path.join(work, "shard-0.tar")
    import io

    with tarfile.open(shard, "w") as tf:
        for key, parts in samples.items():
            for field, blob in parts.items():
                info = tarfile.TarInfo(f"{key}.{field}")
                info.size = len(blob)
                tf.addfile(info, io.BytesIO(blob))

    grouped = group_samples(read_webdataset(spark, work))
    print(f"samples ingested: {grouped.count()}")

    images = to_media_table(grouped)  # jpg-priority fields
    print(f"image rows: {images.count()}")
    meta = decode_image_meta(images)
    print("image meta (fmt, w, h):")
    for r in meta.orderBy("media_id").collect():
        print(f"  {r['fmt']} {r['width']}x{r['height']}")
    exif = decode_image_exif(images).where("orientation is not null")
    print(f"EXIF-tagged images: {exif.count()} (orientation "
          f"{[r['orientation'] for r in exif.collect()]})")

    hashes = image_ahash_oriented(images)
    buckets = (
        hashes.groupBy("ahash").count().orderBy("count", ascending=False)
    )
    top = buckets.collect()
    print(
        "aHash buckets (oriented): "
        + ", ".join(str(r["count"]) for r in top)
        + "  <- 3 entropy modes + 1 rotated re-export collapse to ONE"
    )

    audio = to_media_table(grouped, fields=("wav",), kind="audio")
    pairs = near_duplicate_audio(
        audio, window=512, hop=256, min_shared_ppm=900_000
    ).collect()
    print(
        f"audio near-dup pairs: {len(pairs)} "
        f"(containment {[r['containment_ppm'] for r in pairs]})"
    )

    # round-11 path: a PDF embedding the hero image as a /DCTDecode
    # XObject — extract_pdf_images lifts it into the SAME media table,
    # where it buckets with the crawled copies
    from clickhouse_table_copier_spark.operators.multimodal import (
        image_ahash,
        near_duplicate_images,
    )
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        extract_pdf_images,
    )
    from test_pdf_extract import _pdf_with_stream

    hero_jpeg = encode_baseline_jpeg(hero)
    pdf = _pdf_with_stream(
        b"/Type /XObject /Subtype /Image /Width 32 /Height 16 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode",
        hero_jpeg,
    )
    pdfs = spark.createDataFrame(
        [(900, bytearray(pdf))], "doc_id long, content binary"
    )
    media_all = images.unionByName(
        extract_pdf_images(pdfs, "content", "doc_id")
    )
    pdf_pairs = near_duplicate_images(
        media_all, hash_op=image_ahash, max_hamming=3
    ).count()
    print(
        f"near-dup pairs after adding the PDF-embedded figure: {pdf_pairs} "
        "<- the PDF figure pairs with every crawled copy of the hero image"
    )
    spark.stop()


if __name__ == "__main__":
    main()
