"""EXIF: the writer lives test-side — a real APP1/TIFF structure
(both byte orders, inline + offset values, Exif and GPS sub-IFDs)
spliced into the test JPEG encoder's output, so parsing is pinned
against known bytes; orientation-aware hashing buckets a rotated
re-export with its upright original."""

import struct

import numpy as np

from clickhouse_table_copier_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_exif,
    image_ahash,
    image_ahash_oriented,
)
from tests.test_jpeg_decode import encode_baseline_jpeg


def make_exif_app1(
    byte_order: str = "II",
    make: str = "TestCam",
    model: str = "T-1000",
    orientation: int = 1,
    dto: str = "2026:08:15 12:00:00",
    gps=(48.8584, 2.2945),  # +lat N, +lon E
) -> bytes:
    bo = "<" if byte_order == "II" else ">"
    # layout: IFD0 at 8; Exif IFD and GPS IFD after it; data area last
    data = bytearray()

    def entry(tag, typ, cnt, value_bytes):
        if len(value_bytes) <= 4:
            return struct.pack(bo + "HHI", tag, typ, cnt) + value_bytes.ljust(
                4, b"\x00"
            )
        off = tiff_len + len(data)
        data.extend(value_bytes)
        return struct.pack(bo + "HHII", tag, typ, cnt, off)

    def rat(v):
        return struct.pack(bo + "II", int(round(v * 10000)), 10000)

    make_b = make.encode() + b"\x00"
    model_b = model.encode() + b"\x00"
    dto_b = dto.encode() + b"\x00"
    lat, lon = abs(gps[0]), abs(gps[1])
    lat_b = rat(int(lat)) + rat(int(lat * 60) % 60) + rat((lat * 3600) % 60)
    lon_b = rat(int(lon)) + rat(int(lon * 60) % 60) + rat((lon * 3600) % 60)

    n0, ne, ng = 6, 1, 4
    ifd0_at = 8
    exif_at = ifd0_at + 2 + 12 * n0 + 4
    gps_at = exif_at + 2 + 12 * ne + 4
    tiff_len = gps_at + 2 + 12 * ng + 4  # data area starts here

    ifd0 = struct.pack(bo + "H", n0)
    ifd0 += entry(0x010F, 2, len(make_b), make_b)
    ifd0 += entry(0x0110, 2, len(model_b), model_b)
    ifd0 += entry(0x0112, 3, 1, struct.pack(bo + "H", orientation))
    ifd0 += entry(0x0132, 2, len(dto_b), dto_b)
    ifd0 += entry(0x8769, 4, 1, struct.pack(bo + "I", exif_at))
    ifd0 += entry(0x8825, 4, 1, struct.pack(bo + "I", gps_at))
    ifd0 += struct.pack(bo + "I", 0)

    exif_ifd = struct.pack(bo + "H", ne)
    exif_ifd += entry(0x9003, 2, len(dto_b), dto_b)
    exif_ifd += struct.pack(bo + "I", 0)

    gps_ifd = struct.pack(bo + "H", ng)
    gps_ifd += entry(0x0001, 2, 2, (b"N" if gps[0] >= 0 else b"S") + b"\x00")
    gps_ifd += entry(0x0002, 5, 3, lat_b)
    gps_ifd += entry(0x0003, 2, 2, (b"E" if gps[1] >= 0 else b"W") + b"\x00")
    gps_ifd += entry(0x0004, 5, 3, lon_b)
    gps_ifd += struct.pack(bo + "I", 0)

    tiff = (
        byte_order.encode() + struct.pack(bo + "H", 42)
        + struct.pack(bo + "I", 8) + ifd0 + exif_ifd + gps_ifd + bytes(data)
    )
    assert len(ifd0) == 2 + 12 * n0 + 4
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def with_exif(jpeg: bytes, app1: bytes) -> bytes:
    assert jpeg[:2] == b"\xff\xd8"
    return jpeg[:2] + app1 + jpeg[2:]


def _img(seed, h=16, w=16):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_exif_fields_both_byte_orders(spark):
    img = _img(1)
    rows = []
    for i, bo in enumerate(("II", "MM")):
        blob = with_exif(
            encode_baseline_jpeg(img),
            make_exif_app1(byte_order=bo, orientation=6, gps=(48.8584, -2.5)),
        )
        rows.append((i, "image", bytearray(blob), "{}"))
    rows.append((9, "image", bytearray(encode_baseline_jpeg(img)), "{}"))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_image_exif(df).collect()}
    for i in (0, 1):
        r = got[i]
        assert r["make"] == "TestCam" and r["model"] == "T-1000"
        assert r["orientation"] == 6
        assert r["datetime_original"] == "2026:08:15 12:00:00"
        assert abs(r["gps_lat"] - 48.8584) < 1e-3
        assert abs(r["gps_lon"] + 2.5) < 1e-3  # W = negative
    assert got[9]["make"] is None and got[9]["orientation"] is None


def test_orientation_aware_hash_buckets_rotated_duplicate(spark):
    """An image stored rotated 90° CCW with orientation tag 6 ('rotate
    CW to display') must hash EQUAL to the upright original under
    image_ahash_oriented — and UNEQUAL under plain image_ahash (the
    gap this operator closes)."""
    upright = _img(2, h=16, w=32)  # non-square so rotation matters
    stored = np.rot90(upright, k=1)  # 90° CCW: display needs CW
    rows = [
        (1, "image", bytearray(encode_baseline_jpeg(upright)), "{}"),
        (
            2,
            "image",
            bytearray(
                with_exif(
                    encode_baseline_jpeg(np.ascontiguousarray(stored)),
                    make_exif_app1(orientation=6),
                )
            ),
            "{}",
        ),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    oriented = {r["media_id"]: r["ahash"] for r in image_ahash_oriented(df).collect()}
    assert oriented[1] == oriented[2]
    plain = {r["media_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert plain[1] != plain[2]


def test_untagged_images_hash_identically_in_both_ops(spark):
    img = _img(3)
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_baseline_jpeg(img)), "{}")],
        MEDIA_SCHEMA,
    )
    a = image_ahash(df).collect()[0]["ahash"]
    b = image_ahash_oriented(df).collect()[0]["ahash"]
    assert a == b


def test_exif_junk_never_raises(spark):
    base = with_exif(encode_baseline_jpeg(_img(4)), make_exif_app1())
    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        bad = bytearray(base)
        for _ in range(4):
            bad[rng.integers(2, 200)] = rng.integers(0, 256)
        rows.append((i, "image", bytearray(bytes(bad)), "{}"))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    assert len(decode_image_exif(df).collect()) == 40  # no task failures


def _textured(seed, h=64, w=64):
    """Photo-like fixture: random texture softened by two box-blur
    passes (pure numpy) — the content class pHash is built for."""
    rng = np.random.default_rng(seed)
    b = rng.integers(0, 256, (h, w, 3)).astype(float)
    for _ in range(2):
        b = (
            b + np.roll(b, 1, 0) + np.roll(b, 1, 1)
            + np.roll(b, -1, 0) + np.roll(b, -1, 1)
        ) / 5
    return np.clip(b, 0, 255).astype(np.uint8)


def test_phash_brightness_contrast_noise_robustness(spark):
    """Measured pHash contract on textured content: a brightness+20 /
    contrast×1.2 / ±3-noise re-export stays inside the hamming-3
    near-dup radius through the banded join (hash_op parameter); an
    unrelated image never pairs."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        image_phash,
        near_duplicate_images,
    )
    from tests.test_png_variants import encode_png

    base = _textured(9)
    rng = np.random.default_rng(10)
    bright = np.clip(base.astype(int) + 20, 0, 255).astype(np.uint8)
    contrast = np.clip(
        (base.astype(float) - 128) * 1.2 + 128, 0, 255
    ).astype(np.uint8)
    noisy = np.clip(
        base.astype(int) + rng.integers(-3, 4, base.shape), 0, 255
    ).astype(np.uint8)
    other = _textured(99)
    imgs = {1: base, 2: bright, 3: contrast, 4: noisy, 5: other}
    rows = [
        (i, "image", bytearray(encode_png(im.tobytes(), 64, 64, 3)), "{}")
        for i, im in imgs.items()
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in near_duplicate_images(df, hash_op=image_phash).collect()
    }
    assert {(1, 2), (1, 3), (1, 4)} <= pairs
    assert not any(5 in p for p in pairs)
    # determinism: duplicated input rows produce identical hashes
    h1 = sorted(
        (r["media_id"], r["ahash"]) for r in image_phash(df).collect()
    )
    h2 = sorted(
        (r["media_id"], r["ahash"]) for r in image_phash(df).collect()
    )
    assert h1 == h2


def test_webp_and_tiff_dims(spark):
    """decode_image_meta covers the modern web's containers: all three
    WebP layouts (VP8 lossy, VP8L lossless, VP8X extended) and both
    TIFF byte orders — dims byte-exact from hand-built headers."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        decode_image_meta,
    )

    def webp(fourcc, payload):
        chunk = fourcc + struct.pack("<I", len(payload)) + payload
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    vp8 = webp(
        b"VP8 ",
        b"\x00" * 3 + b"\x9d\x01\x2a"
        + struct.pack("<HH", 320, 240) + b"\x00" * 8,
    )
    vp8l = webp(
        b"VP8L",
        b"\x2f" + struct.pack("<I", (199 | (99 << 14))) + b"\x00" * 4,
    )  # (w-1)=199, (h-1)=99 → 200×100
    vp8x = webp(
        b"VP8X",
        b"\x00" * 4
        + (639).to_bytes(3, "little") + (479).to_bytes(3, "little"),
    )  # 640×480
    tiff_le = (
        b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 2)
        + struct.pack("<HHII", 0x0100, 3, 1, 123)
        + struct.pack("<HHII", 0x0101, 4, 1, 45)
        + struct.pack("<I", 0)
    )
    tiff_be = (
        b"MM\x00*" + struct.pack(">I", 8) + struct.pack(">H", 2)
        + struct.pack(">HHI", 0x0100, 4, 1) + struct.pack(">I", 77)
        + struct.pack(">HHI", 0x0101, 3, 1) + struct.pack(">HH", 88, 0)
        + struct.pack(">I", 0)
    )
    rows = [
        (1, "image", bytearray(vp8), "{}"),
        (2, "image", bytearray(vp8l), "{}"),
        (3, "image", bytearray(vp8x), "{}"),
        (4, "image", bytearray(tiff_le), "{}"),
        (5, "image", bytearray(tiff_be), "{}"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: (r["fmt"], r["width"], r["height"])
        for r in decode_image_meta(df).collect()
    }
    assert got[1] == ("webp", 320, 240)
    assert got[2] == ("webp", 200, 100)
    assert got[3] == ("webp", 640, 480)
    assert got[4] == ("tiff", 123, 45)
    assert got[5] == ("tiff", 77, 88)


def test_avif_heic_dims(spark):
    """AVIF/HEIC dims from the ispe property inside
    meta(full)→iprp→ipco — hand-built ISO-BMFF structure."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        decode_image_meta,
    )

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    def image(brand, w, h):
        ispe = box(b"ispe", struct.pack(">III", 0, w, h))
        ipco = box(b"ipco", ispe)
        iprp = box(b"iprp", ipco)
        meta = box(b"meta", b"\x00\x00\x00\x00" + iprp)  # full box
        ftyp = box(b"ftyp", brand + b"\x00\x00\x00\x00" + brand)
        return ftyp + meta

    rows = [
        (1, "image", bytearray(image(b"avif", 800, 600)), "{}"),
        (2, "image", bytearray(image(b"heic", 4032, 3024)), "{}"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: (r["fmt"], r["width"], r["height"])
        for r in decode_image_meta(df).collect()
    }
    assert got[1] == ("avif", 800, 600)
    assert got[2] == ("heic", 4032, 3024)


def test_truncated_tiff_declines_not_raises(spark):
    """Review finding (r10): a truncated/corrupt TIFF must degrade to
    -1 dims, never raise struct.error out of the task."""
    from clickhouse_table_copier_spark.operators.multimodal import (
        decode_image_meta,
    )

    rows = [
        (1, "image", bytearray(b"II*\x00"), "{}"),  # header only
        (2, "image", bytearray(b"II*\x00" + struct.pack("<I", 9999)), "{}"),
        (3, "image", bytearray(b"MM\x00*" + struct.pack(">I", 8)
                               + struct.pack(">H", 50)), "{}"),  # IFD cut
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: (r["fmt"], r["width"]) for r in
           decode_image_meta(df).collect()}
    assert all(v[0] == "tiff" and v[1] == -1 for v in got.values())
