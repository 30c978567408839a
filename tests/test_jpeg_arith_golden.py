"""GOLDEN arithmetic-JPEG fixtures from an INDEPENDENT encoder
(ADVICE r10): the arithmetic decoder was previously validated only
against the test-side encoder in test_jpeg_arith.py, which shares the
QM state tables and mirrored Annex-D interval conventions — a
symmetric misreading of T.81 would pass every roundtrip yet fail on
real-world files.  These bytes were produced ONCE by libjpeg-turbo
2.1.5 (the system libjpeg.so.62, built WITH_ARITH_ENC) via
scripts/make_arith_golden.py and checked in, so the test needs no
image library at runtime: sequential (SOF9) and progressive (SOF10)
arithmetic scans of a block-aligned color pattern, a grayscale
gradient, plus the HUFFMAN (SOF0) encoding of the SAME pixels at the
same quality — whose decoded raster must be BIT-IDENTICAL to the
arithmetic decodes (identical quantized coefficients, two entropy
codings; any QM-coder deviation shows as a raster diff here long
before it would show against source pixels)."""

import numpy as np

from clickhouse_table_copier_spark.operators.multimodal import (
    _make_jpeg_raster_decoder,
)

SEQ_RGB = bytes.fromhex(
    "ffd8ffe000104a46494600010100000100010000ffdb0043000201010101010201010102020202020403020202020504"
    "040304060506060605060606070908060709070606080b08090a0a0a0a0a06080b0c0b0a0c090a0a0affdb0043010202"
    "02020202050303050a0706070a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a"
    "0a0a0a0a0a0a0a0a0a0a0a0a0a0affc90011080010001003012200021101031101ffcc000a0010100501101105ffda00"
    "0c03010002110311003f00ff00d9957ac1dabb30b5b48595d7a698a8aac2875431b0355a76080384321c66f788fc3c55"
    "6e08050e0b04771fdc363101c4f4bd983f5fcee7844df34af1025cffd9"
)
PROG_RGB = bytes.fromhex(
    "ffd8ffe000104a46494600010100000100010000ffdb0043000201010101010201010102020202020403020202020504"
    "040304060506060605060606070908060709070606080b08090a0a0a0a0a06080b0c0b0a0c090a0a0affdb0043010202"
    "02020202050303050a0706070a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a"
    "0a0a0a0a0a0a0a0a0a0a0a0a0a0affca0011080010001003012200021101031101ffcc000600100110ffda000c030100"
    "02100310000001ff00b3a8bce98a63f7bb8e12c0ffcc00041005ffda0008010100010502c0ffcc00041105ffda000801"
    "0301013f013b756e90e374554380b0a0fad9f74f344fa347d2c440ffcc00041105ffda0008010201013f013b8cf61958"
    "c6449a81602b17bd53f29b777cfb92d8063cffcc00041005ffda0008010100063f02c0ffcc00041005ffda0008010100"
    "013f21c0ffda000c0301000200030000001054ffcc00041105ffda0008010301013f10516aba6d36800023f8ffcc0004"
    "1105ffda0008010201013f10d30db8112aa761d6e2ffcc00041005ffda0008010100013f10c0ffd9"
)
SEQ_GRAY = bytes.fromhex(
    "ffd8ffe000104a46494600010100000100010000ffdb0043000201010101010201010102020202020403020202020504"
    "040304060506060605060606070908060709070606080b08090a0a0a0a0a06080b0c0b0a0c090a0a0affc9000b080010"
    "001001011100ffcc000600101005ffda0008010100003f00ff00e91e558b88999c60ed4f9f5196aede8e05394074322f"
    "395bf5ffd9"
)
HUFF_RGB = bytes.fromhex(
    "ffd8ffe000104a46494600010100000100010000ffdb0043000201010101010201010102020202020403020202020504"
    "040304060506060605060606070908060709070606080b08090a0a0a0a0a06080b0c0b0a0c090a0a0affdb0043010202"
    "02020202050303050a0706070a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a"
    "0a0a0a0a0a0a0a0a0a0a0a0a0a0affc00011080010001003012200021101031101ffc4001f0000010501010101010100"
    "000000000000000102030405060708090a0bffc400b5100002010303020403050504040000017d010203000411051221"
    "31410613516107227114328191a1082342b1c11552d1f02433627282090a161718191a25262728292a3435363738393a"
    "434445464748494a535455565758595a636465666768696a737475767778797a838485868788898a9293949596979899"
    "9aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1"
    "f2f3f4f5f6f7f8f9faffc4001f0100030101010101010101010000000000000102030405060708090a0bffc400b51100"
    "020102040403040705040400010277000102031104052131061241510761711322328108144291a1b1c109233352f015"
    "6272d10a162434e125f11718191a262728292a35363738393a434445464748494a535455565758595a63646566676869"
    "6a737475767778797a82838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4"
    "c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9faffda000c03010002110311003f00f9"
    "7ebeb8afccfafe902bf2ff00a54f86dff1047fb1ff00dabeb7f5bfac7d8f65c9ecbd87f7ea73737b4feedb97adf4edf1"
    "bb19ff00131df50f77ea3f51f6bd7dbfb4f6fecffebcf2f2fb1fef737374b6bfffd9"
)


def _block_pattern() -> np.ndarray:
    img = np.zeros((16, 16, 3), np.uint8)
    img[:8, :8] = [200, 40, 40]
    img[:8, 8:] = [40, 200, 40]
    img[8:, :8] = [40, 40, 200]
    img[8:, 8:] = [220, 220, 60]
    return img


def _decode(blob: bytes) -> np.ndarray:
    got = _make_jpeg_raster_decoder()(blob)
    assert got is not None
    w, h, c, raster = got
    return np.frombuffer(raster, np.uint8).reshape(h, w, c).astype(int)


def test_goldens_are_really_arithmetic():
    assert b"\xff\xc9" in SEQ_RGB[:400]  # SOF9
    assert b"\xff\xca" in PROG_RGB[:400]  # SOF10
    assert b"\xff\xc9" in SEQ_GRAY[:400]
    assert b"\xff\xc0" in HUFF_RGB[:400]  # SOF0 (the control)
    for blob in (SEQ_RGB, PROG_RGB, SEQ_GRAY):
        assert b"\xff\xc4" not in blob  # no DHT in arithmetic files


def test_sequential_golden_decodes_close_to_source():
    r = _decode(SEQ_RGB)
    assert r.shape == (16, 16, 3)
    # block-aligned solid colors: residual is encoder quantization +
    # 4:2:0 chroma, bounded small (measured 8 at mint time)
    assert np.abs(r - _block_pattern().astype(int)).max() <= 10


def test_progressive_golden_decodes_close_to_source():
    r = _decode(PROG_RGB)
    assert np.abs(r - _block_pattern().astype(int)).max() <= 10


def test_grayscale_golden_decodes_close_to_source():
    r = _decode(SEQ_GRAY)
    gimg = np.tile(np.linspace(30, 220, 16, dtype=np.uint8), (16, 1))
    assert r.shape[2] == 1
    assert np.abs(r[..., 0] - gimg.astype(int)).max() <= 10


def test_arithmetic_rasters_bit_identical_to_huffman_control():
    """The decisive pin: same pixels, same quality, two entropy
    codings by the independent encoder — the decoded rasters must be
    EXACTLY equal, because entropy coding is lossless over the same
    quantized coefficients.  Any asymmetry in the QM-coder reading of
    T.81 breaks this equality."""
    rh = _decode(HUFF_RGB)
    assert np.array_equal(_decode(SEQ_RGB), rh)
    assert np.array_equal(_decode(PROG_RGB), rh)
