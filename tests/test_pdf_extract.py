"""PDF text extraction: the writer lives test-side — real PDF files
assembled byte-exactly (xref, object tree, Flate and plain content
streams, literal/hex strings, TJ kerning, escapes) so extraction is
pinned against known documents, plus the decline contract on junk."""

import zlib

import numpy as np

from clickhouse_table_copier_spark.operators.pdf_extract import (
    _extract_pdf,
    _extract_pdf_jpegs,
    extract_pdf_text,
)


def make_pdf(page_streams: list, compress: bool = True) -> bytes:
    """Minimal but REAL PDF: catalog → pages → one page per content
    stream, correct xref offsets and trailer."""
    objs: list[bytes] = []
    n_pages = len(page_streams)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, content in enumerate(page_streams):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {5 + 2 * i} 0 R >>"
            ).encode()
        )
        data = zlib.compress(content) if compress else content
        filt = b"/Filter /FlateDecode " if compress else b""
        objs.append(
            b"<< " + filt + f"/Length {len(data)} >>".encode()
            + b"\nstream\n" + data + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs):
        offsets.append(len(out))
        out += f"{i + 1} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


_SIMPLE = (
    b"BT /F1 12 Tf 72 720 Td (Hello crawl world.) Tj "
    b"0 -14 Td (Second line of prose.) Tj ET"
)


def test_simple_flate_pdf_extracts():
    got = _extract_pdf(make_pdf([_SIMPLE]))
    assert got is not None
    n_pages, text = got
    assert n_pages == 1
    assert "Hello crawl world." in text
    assert "Second line of prose." in text
    # Td produced a line break between them
    assert text.index("Hello") < text.index("Second")
    assert "\n" in text


def test_plain_stream_and_multipage():
    p2 = b"BT /F1 12 Tf 72 720 Td (Page two content.) Tj ET"
    got = _extract_pdf(make_pdf([_SIMPLE, p2], compress=False))
    assert got is not None
    n_pages, text = got
    assert n_pages == 2
    assert "Hello crawl world." in text and "Page two content." in text


def test_tj_array_kerning_and_hex_strings():
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(Ker) 20 (ned) -300 (words)] TJ "
        b"0 -14 Td <48656C6C6F> Tj ET"
    )
    got = _extract_pdf(make_pdf([content]))
    assert got is not None
    _, text = got
    # small kern joins, large negative offset becomes a space
    assert "Kerned words" in text
    assert "Hello" in text  # hex string decodes


def test_escapes_and_nested_parens():
    content = (
        rb"BT /F1 12 Tf 72 720 Td "
        rb"(Escaped \(parens\) and \\ backslash \101 octal) Tj "
        rb"(nested (inner) text) Tj ET"
    )
    got = _extract_pdf(make_pdf([content]))
    assert got is not None
    _, text = got
    assert "Escaped (parens) and \\ backslash A octal" in text
    assert "nested (inner) text" in text


def test_quote_operators_break_lines():
    content = (
        b"BT /F1 12 Tf 72 720 Td (first) Tj (second) ' ET"
    )
    got = _extract_pdf(make_pdf([content]))
    assert got is not None
    _, text = got
    assert text.splitlines()[0].endswith("first")
    assert "second" in text.splitlines()[1]


def test_decline_contract():
    assert _extract_pdf(b"not a pdf") is None
    assert _extract_pdf(b"") is None
    # corrupt flate stream: skipped, not fatal
    blob = bytearray(make_pdf([_SIMPLE]))
    at = blob.find(b"stream\n") + 7
    blob[at : at + 4] = b"\x00\x00\x00\x00"
    got = _extract_pdf(bytes(blob))
    assert got is not None  # still a PDF; damaged stream yields no text
    # random corruption anywhere must never raise
    rng = np.random.default_rng(3)
    base = make_pdf([_SIMPLE])
    for _ in range(60):
        bad = bytearray(base)
        for _ in range(4):
            bad[rng.integers(0, len(bad))] = rng.integers(0, 256)
        _extract_pdf(bytes(bad))


def test_spark_surface(spark):
    rows = [
        (1, bytearray(make_pdf([_SIMPLE]))),
        (2, bytearray(b"junk bytes")),
        (3, bytearray(make_pdf(
            [b"BT /F1 10 Tf 10 10 Td (Doc three.) Tj ET"], compress=False
        ))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in
           extract_pdf_text(df, "content", "doc_id").collect()}
    assert "Hello crawl world." in got[1]["text"]
    assert got[1]["n_pages"] == 1
    assert got[2]["text"] is None and got[2]["n_pages"] is None
    assert "Doc three." in got[3]["text"]


def test_warc_to_pdf_text_end_to_end(spark, tmp_path):
    """The crawl's PDF path: WARC shard → application/pdf responses →
    extract_pdf_text — the exact mirror of the HTML path."""
    from clickhouse_table_copier_spark.sources.warc import (
        read_warc,
        responses_to_pdfs,
    )
    from tests.test_warc import _record

    pdf_bytes = make_pdf([_SIMPLE])
    recs = [
        _record(
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "https://example.com/paper.pdf",
                "WARC-Date": "2026-08-15T00:00:00Z",
            },
            b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n"
            + pdf_bytes,
        ),
        _record(
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "https://example.com/page.html",
                "WARC-Date": "2026-08-15T00:00:00Z",
            },
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>html</p>",
        ),
    ]
    p = tmp_path / "mix.warc"
    with open(p, "wb") as f:
        f.write(b"".join(recs))
    pdfs = responses_to_pdfs(read_warc(spark, str(p)))
    rows = pdfs.collect()
    assert len(rows) == 1 and rows[0]["url"] == "https://example.com/paper.pdf"
    text = extract_pdf_text(pdfs, "pdf_bytes", "doc_id").collect()[0]
    assert "Hello crawl world." in text["text"]


def _pdf_with_stream(dict_extra: bytes, data: bytes) -> bytes:
    """One-object PDF wrapping a prepared stream body verbatim."""
    body = (
        b"<< " + dict_extra + f" /Length {len(data)} >>".encode()
        + b"\nstream\n" + data + b"\nendstream"
    )
    return b"%PDF-1.5\n1 0 obj\n" + body + b"\nendobj\n%%EOF\n"


def _lzw_encode_pdf(data: bytes) -> bytes:
    """Reference PDF LZW encoder (MSB-first, early change) for the
    roundtrip pin."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits = []

    def put(code):
        out_bits.extend((code >> (width - 1 - k)) & 1 for k in range(width))

    put(256)  # clear
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        put(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        w = bytes([ch])
    if w:
        put(table[w])
    put(257)  # EOD
    while len(out_bits) % 8:
        out_bits.append(0)
    return bytes(
        int("".join(map(str, out_bits[i : i + 8])), 2)
        for i in range(0, len(out_bits), 8)
    )


def test_lzw_ascii85_asciihex_and_chains():
    content = b"BT /F1 12 Tf 10 10 Td (Filtered text survives.) Tj ET"
    # LZW
    lzw = _pdf_with_stream(b"/Filter /LZWDecode", _lzw_encode_pdf(content))
    got = _extract_pdf(lzw)
    assert got is not None and "Filtered text survives." in (got[1] or "")
    # ASCIIHex
    ahx = _pdf_with_stream(
        b"/Filter /ASCIIHexDecode", content.hex().encode() + b">"
    )
    got = _extract_pdf(ahx)
    assert got is not None and "Filtered text survives." in (got[1] or "")
    # ASCII85
    import base64

    a85 = _pdf_with_stream(
        b"/Filter /ASCII85Decode", base64.a85encode(content) + b"~>"
    )
    got = _extract_pdf(a85)
    assert got is not None and "Filtered text survives." in (got[1] or "")
    # chain: A85 around Flate
    chain = _pdf_with_stream(
        b"/Filter [/ASCII85Decode /FlateDecode]",
        base64.a85encode(zlib.compress(content)) + b"~>",
    )
    got = _extract_pdf(chain)
    assert got is not None and "Filtered text survives." in (got[1] or "")
    # uncovered filter: stream skipped, document survives
    dct = _pdf_with_stream(b"/Filter /DCTDecode", b"\xff\xd8 pretend jpeg")
    got = _extract_pdf(dct)
    assert got is not None and got[1] is None


def test_objstm_pages_counted():
    """PDF 1.5 object streams hold the page dicts: the count must look
    inside the inflated ObjStm, not just the raw bytes."""
    objstm_payload = (
        b"4 0 5 20\n<< /Type /Page >>\n<< /Type /Page >>"
    )
    blob = (
        b"%PDF-1.5\n"
        b"1 0 obj\n<< /Type /ObjStm /N 2 /First 10 "
        + f"/Filter /FlateDecode /Length {len(zlib.compress(objstm_payload))} >>".encode()
        + b"\nstream\n" + zlib.compress(objstm_payload) + b"\nendstream\nendobj\n"
        b"%%EOF\n"
    )
    got = _extract_pdf(blob)
    assert got is not None and got[0] == 2


def test_non_octal_escapes_do_not_nuke_document():
    """Review finding (r10): \\8 and \\9 are NOT octal — they must not
    raise into the blanket except and NULL the whole document."""
    content = rb"BT /F1 12 Tf 10 10 Td (backslash-eight \8 nine \9 ok) Tj ET"
    got = _extract_pdf(make_pdf([content]))
    assert got is not None
    assert "backslash-eight 8 nine 9 ok" in (got[1] or "")


def test_earlier_dict_does_not_leak_into_stream_dict():
    """Review finding (r10): a stream-less dict mentioning /Filter
    before a Flate content stream must not be swept into the stream's
    dict (the lazy-regex failure mode): the stream still inflates."""
    content = b"BT /F1 12 Tf 10 10 Td (Bounded dict.) Tj ET"
    data = zlib.compress(content)
    blob = (
        b"%PDF-1.4\n"
        b"9 0 obj\n<< /Type /SomeDict /Filter /Standard >>\nendobj\n"
        b"1 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(data)).encode()
        + b" >>\nstream\n" + data + b"\nendstream\nendobj\n%%EOF\n"
    )
    got = _extract_pdf(blob)
    assert got is not None
    assert "Bounded dict." in (got[1] or "")


def test_literal_string_escape_roundtrip_property():
    """Property: ANY Latin-1 text, escaped into a PDF literal string by
    a reference escaper, parses back exactly — parens, backslashes,
    control bytes, the lot."""
    from hypothesis import given, settings
    from hypothesis import strategies as st_

    from clickhouse_table_copier_spark.operators.pdf_extract import (
        _literal_string,
    )

    def escape(text: str) -> bytes:
        out = bytearray(b"(")
        for ch in text:
            o = ord(ch)
            if ch in "()\\":
                out += b"\\" + ch.encode("latin-1")
            elif o < 32 or o > 126:
                out += f"\\{o:03o}".encode()
            else:
                out += ch.encode("latin-1")
        out += b")"
        return bytes(out)

    @settings(max_examples=200, deadline=None)
    @given(st_.text(st_.characters(min_codepoint=0, max_codepoint=255),
                    max_size=64))
    def run(text):
        data = escape(text)
        got, end = _literal_string(data, 0)
        assert got == text
        assert end == len(data)

    run()


def test_form_xobject_text_extracts():
    """Text living in a /Subtype /Form XObject stream (referenced by a
    Do operator from the page) extracts too: the tolerant scan decodes
    EVERY stream carrying BT…ET, not just page /Contents."""
    form = (
        b"%PDF-1.4\n"
        b"7 0 obj\n<< /Type /XObject /Subtype /Form /Filter /FlateDecode "
        b"/Length 999 >>\nstream\n"
    )
    content = b"BT /F1 9 Tf 5 5 Td (Text inside a Form XObject.) Tj ET"
    data = zlib.compress(content)
    blob = (
        b"%PDF-1.4\n7 0 obj\n<< /Type /XObject /Subtype /Form "
        b"/Filter /FlateDecode /Length " + str(len(data)).encode()
        + b" >>\nstream\n" + data + b"\nendstream\nendobj\n%%EOF\n"
    )
    got = _extract_pdf(blob)
    assert got is not None
    assert "Text inside a Form XObject." in (got[1] or "")


def test_length_bounds_data_containing_endstream():
    """ADVICE r10: stream DATA can contain the literal bytes
    'endstream' (compressed output frequently does); with an inline
    /Length the scan must not truncate there."""
    content = (
        b"BT /F1 9 Tf 5 5 Td (before endstream marker) Tj "
        b"0 -12 Td (after the marker too) Tj ET"
    )
    blob = _pdf_with_stream(b"", content)
    got = _extract_pdf(blob)
    assert got is not None
    text = got[1] or ""
    assert "before endstream marker" in text
    assert "after the marker too" in text  # scan-only would drop this


def test_indirect_or_lying_length_falls_back_to_scan():
    """An indirect /Length (N 0 R) or a wrong inline /Length must fall
    back to the byte scan, not break extraction."""
    content = b"BT /F1 9 Tf 5 5 Td (fallback path text) Tj ET"
    data = zlib.compress(content)
    indirect = (
        b"%PDF-1.5\n1 0 obj\n<< /Filter /FlateDecode /Length 9 0 R >>"
        b"\nstream\n" + data + b"\nendstream\nendobj\n%%EOF\n"
    )
    got = _extract_pdf(indirect)
    assert got is not None and "fallback path text" in (got[1] or "")
    lying = (
        b"%PDF-1.5\n1 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(data) + 7777).encode()
        + b" >>\nstream\n" + data + b"\nendstream\nendobj\n%%EOF\n"
    )
    got = _extract_pdf(lying)
    assert got is not None and "fallback path text" in (got[1] or "")


def _png_predict(data: bytes, columns: int, ftype: int) -> bytes:
    """Test-side PNG row-filter ENCODER (colors=1, bpc=8): prefix each
    row with its filter byte; Up subtracts the previous row, Sub the
    previous byte."""
    if len(data) % columns:
        data += b" " * (columns - len(data) % columns)
    prev = bytes(columns)
    out = bytearray()
    for r0 in range(0, len(data), columns):
        row = data[r0 : r0 + columns]
        out.append(ftype)
        for i, v in enumerate(row):
            if ftype == 0:
                out.append(v)
            elif ftype == 1:  # Sub
                left = row[i - 1] if i else 0
                out.append((v - left) & 0xFF)
            elif ftype == 2:  # Up
                out.append((v - prev[i]) & 0xFF)
            elif ftype == 4:  # Paeth (predictor = Paeth(left, up, ul))
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else b if pb <= pc else c
                out.append((v - pr) & 0xFF)
        prev = row
    return bytes(out)


def test_png_predictor_flate_streams_extract():
    """PNG Predictor 12 (Up) is what real xref/object streams use;
    Sub and Paeth rows must also undo (VERDICT r10 item 5)."""
    content = (
        b"BT /F1 9 Tf 5 5 Td (Predicted stream text survives.) Tj ET"
    )
    for ftype in (0, 1, 2, 4):
        data = zlib.compress(_png_predict(content, 16, ftype))
        blob = _pdf_with_stream(
            b"/Filter /FlateDecode /DecodeParms << /Predictor 12 "
            b"/Columns 16 >>",
            data,
        )
        got = _extract_pdf(blob)
        assert got is not None, ftype
        assert "Predicted stream text survives." in (got[1] or ""), ftype


def test_tiff_predictor_2_extracts():
    content = b"BT /F1 9 Tf 5 5 Td (TIFF differenced text.) Tj ET"
    cols = 8
    data = bytearray(content)
    if len(data) % cols:
        data += b" " * (cols - len(data) % cols)
    enc = bytearray()
    for r0 in range(0, len(data), cols):
        row = data[r0 : r0 + cols]
        enc.append(row[0])
        for i in range(1, cols):
            enc.append((row[i] - row[i - 1]) & 0xFF)
    blob = _pdf_with_stream(
        b"/Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns 8 >>",
        zlib.compress(bytes(enc)),
    )
    got = _extract_pdf(blob)
    assert got is not None
    assert "TIFF differenced text." in (got[1] or "")


def test_objstm_with_png_predictor_counts_pages():
    """The real-world motivation: modern PDFs keep page dicts in
    Flate+Predictor-12 object streams; skipping them silently
    under-counted pages."""
    objstm = b"<< /Type /Page >> << /Type /Page >> << /Type /Page >>"
    data = zlib.compress(_png_predict(objstm, 12, 2))
    blob = _pdf_with_stream(
        b"/Type /ObjStm /N 3 /First 0 /Filter /FlateDecode "
        b"/DecodeParms << /Predictor 12 /Columns 12 >>",
        data,
    )
    got = _extract_pdf(blob)
    assert got is not None
    assert got[0] == 3


def _jpeg_image_xobject_pdf(jpeg: bytes) -> bytes:
    return _pdf_with_stream(
        b"/Type /XObject /Subtype /Image /Width 16 /Height 16 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode",
        jpeg,
    )


def test_dct_image_xobject_extracts_exact_jpeg_bytes():
    from test_jpeg_decode import encode_baseline_jpeg

    img = np.zeros((16, 16, 3), np.uint8)
    img[:8] = [200, 40, 40]
    img[8:] = [40, 40, 200]
    jpeg = encode_baseline_jpeg(img)
    got = _extract_pdf_jpegs(_jpeg_image_xobject_pdf(jpeg))
    assert got == [jpeg]
    # non-PDF declines; PDF without images gives []
    assert _extract_pdf_jpegs(b"GIF89a junk") is None
    assert _extract_pdf_jpegs(make_pdf([_SIMPLE])) == []


def test_pdf_embedded_jpeg_pairs_with_standalone_twin(spark):
    """VERDICT r10 item 5 done-check: a PDF-embedded JPEG pairs with
    its standalone twin in near_duplicate_images, exactly like a
    WARC-crawled copy would."""
    from test_jpeg_decode import encode_baseline_jpeg

    from clickhouse_table_copier_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_ahash,
        near_duplicate_images,
    )
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        extract_pdf_images,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    jpeg = encode_baseline_jpeg(img)
    pdf_df = spark.createDataFrame(
        [(100, bytearray(_jpeg_image_xobject_pdf(jpeg)))],
        "doc_id long, content binary",
    )
    embedded = extract_pdf_images(pdf_df, "content", "doc_id")
    assert embedded.columns == ["media_id", "kind", "content", "meta_json"]
    standalone = spark.createDataFrame(
        [(1, "image", bytearray(jpeg), "{}")], MEDIA_SCHEMA
    )
    media = standalone.unionByName(embedded)
    hashes = [r["ahash"] for r in image_ahash(media).collect()]
    assert len(hashes) == 2 and hashes[0] == hashes[1] is not None
    pairs = near_duplicate_images(media, max_hamming=3).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0


def _cid_pdf(
    content: bytes, cmap_body: bytes, compress_cmap: bool = True
) -> bytes:
    """PDF with a Type0/Identity-H font whose /ToUnicode CMap drives
    text decode (the CJK shape), plus a plain Type1 font."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        + cmap_body
        + b"\nendcmap\nCMapName currentdict /CMap defineresource pop\n"
        b"end\nend\n"
    )
    cdata = zlib.compress(cmap) if compress_cmap else cmap
    cfilt = b"/Filter /FlateDecode " if compress_cmap else b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R /F2 7 0 R >> >> /Contents 6 0 R >>",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /TestCJK "
        b"/Encoding /Identity-H /DescendantFonts [8 0 R] /ToUnicode 5 0 R >>",
        b"<< " + cfilt + f"/Length {len(cdata)} >>".encode()
        + b"\nstream\n" + cdata + b"\nendstream",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /TestCJK >>",
    ]
    out = bytearray(b"%PDF-1.5\n")
    for i, body in enumerate(objs):
        out += f"{i + 1} 0 obj\n".encode() + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 9 /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


_CJK_CMAP = (
    b"2 beginbfchar\n<0001> <65E5>\n<0002> <672C>\nendbfchar\n"
    b"1 beginbfrange\n<0010> <0012> <8A9E>\nendbfrange\n"
    b"1 beginbfrange\n<0020> <0021> [<3042> <3044>]\nendbfrange"
)


def test_cid_font_text_via_tounicode():
    """VERDICT r10 item 7: a Type0/Identity-H font's 2-byte codes
    decode through its ToUnicode CMap — bfchar pairs, an incrementing
    bfrange, and the array-form bfrange."""
    content = b"BT /F1 12 Tf <00010002> Tj 0 -14 Td <001000110012> Tj ET"
    got = _extract_pdf(_cid_pdf(content, _CJK_CMAP))
    assert got is not None
    text = got[1] or ""
    assert "日本" in text          # bfchar: 日本
    assert "語誟誠" in text    # bfrange increment: 語 +1 +2


def test_cid_array_bfrange_and_literal_strings():
    """Array-form bfrange decodes; CID codes arriving as a LITERAL
    string (bytes 0x20 0x00 0x01 → pairs 0x2000 unmapped-skipped,
    trailing lone byte ignored) exercise the skip path without ever
    fabricating text."""
    content = b"BT /F1 12 Tf <00200021> Tj ( \x00\x01) Tj ET"
    got = _extract_pdf(_cid_pdf(content, _CJK_CMAP))
    assert got is not None
    text = got[1] or ""
    assert "あい" in text          # array bfrange: あい


def test_simple_font_in_same_doc_stays_latin1():
    """Selecting the Type1 font (no ToUnicode) must restore the
    Latin-1 path — per-font state, not per-document."""
    content = (
        b"BT /F1 12 Tf <00010002> Tj ET "
        b"BT /F2 12 Tf (Latin text after CJK.) Tj ET"
    )
    got = _extract_pdf(_cid_pdf(content, _CJK_CMAP))
    assert got is not None
    text = got[1] or ""
    assert "日本" in text
    assert "Latin text after CJK." in text


def test_uncompressed_cmap_and_unmapped_codes():
    content = b"BT /F1 12 Tf <0001FFFF0002> Tj ET"
    got = _extract_pdf(_cid_pdf(content, _CJK_CMAP, compress_cmap=False))
    assert got is not None
    # FFFF is unmapped: skipped, never fabricated
    assert "日本" in (got[1] or "")


def test_tounicode_on_simple_fonts_untouched_docs():
    """Documents with no /ToUnicode take the zero-cost path: behavior
    byte-identical to before (regression pin on the classic corpus)."""
    got = _extract_pdf(make_pdf([_SIMPLE]))
    assert got is not None
    assert "Hello crawl world." in (got[1] or "")


def test_warc_pdf_figure_pairs_with_crawled_image(spark, tmp_path):
    """The full crawl integration: one WARC shard carries a PDF whose
    embedded figure is ALSO served directly as image/jpeg.  The two
    projections (responses_to_media and responses_to_pdfs →
    extract_pdf_images) land in ONE media table and the figure pairs
    with its crawled twin in near_duplicate_images — the r10 WARC image
    path and the r11 PDF image path meet in the same dedup join."""
    from test_jpeg_decode import encode_baseline_jpeg

    from clickhouse_table_copier_spark.operators.multimodal import (
        near_duplicate_images,
    )
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        extract_pdf_images,
    )
    from clickhouse_table_copier_spark.sources.warc import (
        read_warc,
        responses_to_media,
        responses_to_pdfs,
    )
    from tests.test_warc import _record

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    jpeg = encode_baseline_jpeg(img)
    pdf_bytes = _pdf_with_stream(
        b"/Type /XObject /Subtype /Image /Width 16 /Height 16 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode",
        jpeg,
    )
    recs = [
        _record(
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "https://example.com/figure.jpg",
                "WARC-Date": "2026-08-15T00:00:00Z",
            },
            b"HTTP/1.1 200 OK\r\nContent-Type: image/jpeg\r\n\r\n" + jpeg,
        ),
        _record(
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "https://example.com/paper.pdf",
                "WARC-Date": "2026-08-15T00:00:00Z",
            },
            b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n"
            + pdf_bytes,
        ),
    ]
    p = tmp_path / "crawl.warc"
    with open(p, "wb") as f:
        f.write(b"".join(recs))
    warc = read_warc(spark, str(p))
    media = responses_to_media(warc).unionByName(
        extract_pdf_images(responses_to_pdfs(warc), "pdf_bytes", "doc_id")
    )
    assert media.count() == 2
    pairs = near_duplicate_images(media, max_hamming=3).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0


def test_inline_image_data_never_fabricates_text():
    """Inline image payloads are raw binary that can contain
    BT/(…)-shaped byte runs; the token walker must jump BI…ID…EI so a
    scanned page can't inject garbage into the corpus."""
    evil = b"\x01\x02 BT (INJECTED GARBAGE) Tj ET \x03\x04"
    content = (
        b"BT /F1 12 Tf (real text before) Tj ET "
        b"BI /W 2 /H 2 /CS /RGB /BPC 8 /L " + str(len(evil)).encode()
        + b" ID " + evil + b" EI "
        b"BT /F1 12 Tf (real text after) Tj ET"
    )
    got = _extract_pdf(make_pdf([content]))
    assert got is not None
    text = got[1] or ""
    assert "real text before" in text
    assert "real text after" in text
    assert "INJECTED" not in text
    # the no-/L delimiter-scan path must skip too
    content2 = (
        b"BT /F1 12 Tf (keep me) Tj ET "
        b"BI /W 2 /H 2 ID \x00\x01(BAD) Tj\x02 EI "
        b"BT /F1 12 Tf (and me) Tj ET"
    )
    got = _extract_pdf(make_pdf([content2]))
    text = got[1] or ""
    assert "keep me" in text and "and me" in text and "BAD" not in text


def test_inline_dct_image_extracts_jpeg():
    from test_jpeg_decode import encode_baseline_jpeg

    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :8] = [250, 10, 10]
    jpeg = encode_baseline_jpeg(img)
    content = (
        b"q BI /W 16 /H 16 /BPC 8 /CS /RGB /F /DCT /L "
        + str(len(jpeg)).encode() + b" ID " + jpeg + b" EI Q "
        b"BT /F1 12 Tf (caption text) Tj ET"
    )
    blob = make_pdf([content])
    got = _extract_pdf_jpegs(blob)
    assert got == [jpeg]
    # and the text around it still extracts
    assert "caption text" in (_extract_pdf(blob)[1] or "")
    # array-form filter + full name spelling
    content2 = (
        b"BI /Filter [/DCTDecode] /L " + str(len(jpeg)).encode()
        + b" ID " + jpeg + b" EI"
    )
    assert _extract_pdf_jpegs(make_pdf([content2])) == [jpeg]


def test_runlength_filter_decodes():
    """/RunLengthDecode (PackBits byte coding) content streams extract
    their text, alone and chained behind ASCIIHex."""
    from clickhouse_table_copier_spark.operators.pdf_extract import (
        _runlength_decode,
    )

    content = b"BT /F1 12 Tf (Run length prose.) Tj ET"
    # encode: literal runs only (length-1 prefix)
    rl = b""
    for i in range(0, len(content), 100):
        chunk = content[i : i + 100]
        rl += bytes([len(chunk) - 1]) + chunk
    rl += b"\x80"  # EOD
    assert _runlength_decode(rl) == content
    # repeat-run form
    assert _runlength_decode(bytes([257 - 5, ord("x"), 0x80])) == b"xxxxx"
    pdf = _pdf_with_stream(b"/Filter /RunLengthDecode", rl)
    got = _extract_pdf(pdf)
    assert got is not None and "Run length prose." in (got[1] or "")
    hexed = rl.hex().encode()
    pdf2 = _pdf_with_stream(
        b"/Filter [/ASCIIHexDecode /RunLengthDecode]", hexed + b">"
    )
    got2 = _extract_pdf(pdf2)
    assert got2 is not None and "Run length prose." in (got2[1] or "")
