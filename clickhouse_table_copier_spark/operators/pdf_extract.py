"""PDF text extraction — the other container documents arrive in.

Crawled corpora carry enormous PDF volume; the text pipeline needs
``binary → text`` for them just as :mod:`operators.html_extract` covers
HTML.  This module implements a zero-dependency extractor for the
COMMON case — classic xref PDFs whose content streams are plain or
FlateDecode (zlib ships with Python) and whose fonts are
ASCII/WinAnsi-coded simple fonts:

- object scan: ``N G obj … endobj`` pairs found directly (tolerant —
  no xref walk, so mildly damaged files still extract; real crawls are
  full of truncated PDFs);
- stream decode: ``/FlateDecode`` (zlib), ``/LZWDecode`` (the PDF/TIFF
  MSB-first variant with early code-width change), ``/ASCIIHexDecode``
  and ``/ASCII85Decode`` — including filter CHAINS in array form
  (``/Filter [/ASCII85Decode /FlateDecode]``); stream data is bounded
  by an inline integer ``/Length`` when the dict carries one (decoded
  Flate output can legitimately contain the bytes ``endstream``, so a
  byte scan alone truncates — ADVICE r10), with the byte scan kept as
  the fallback for missing/indirect lengths; ``/Predictor`` 2 (TIFF
  horizontal) and 10–15 (the PNG row filters — ubiquitous on xref and
  object streams, Predictor 12 especially) undo after Flate/LZW; raw
  streams pass through; the remaining text-stream filter (JPX) is
  skipped, not fatal.  ``/DCTDecode`` image XObjects are not text but
  ARE baseline JPEGs — :func:`extract_pdf_images` lifts them into the
  multimodal media contract so PDF-embedded images join the same
  near-dup table WARC images do — ``/CCITTFaxDecode`` images (the
  scanned-fax population) decode through :mod:`operators.ccitt` and
  lift as grayscale PNG, and ``/JBIG2Decode`` images (the other
  scanned-page codec, r13) decode through :mod:`operators.jbig2` —
  generic + symbol/text regions, ``/JBIG2Globals`` resolved by the
  same tolerant object scan — and ``/JPXDecode`` images (JPEG 2000,
  the last scanned-PDF codec, r14) decode through
  :mod:`operators.jpeg2000` as grayscale or RGB PNG;
- text operators: ``BT…ET`` blocks, ``Tj``/``'``/``"`` literal shows,
  ``TJ`` arrays (kerning offsets beyond a threshold become spaces),
  ``Td``/``TD``/``T*``/``Tm`` line moves become newlines, literal
  ``(…)`` strings with the full escape set (``\\n \\t \\( \\) \\\\``,
  octal, line continuations) and ``<…>`` hex strings (single-byte
  Latin-1 interpretation).

Composite (Type0/Identity-H) fonts — the CJK case, the most common
real-crawl PDF text gap — decode through their embedded ``/ToUnicode``
CMaps (round 11): the tolerant scan indexes objects, resolves each
``/Font`` resource name to its font object, decodes the CMap stream
(bfchar + bfrange, incl. array-form ranges), and show operators map
2-byte CIDs through it; fonts without a ToUnicode keep the single-byte
Latin-1 interpretation.  ENCRYPTED documents whose user or owner
password is empty — the DRM-only restriction case that dominates real
crawls — decrypt through :mod:`operators.pdf_crypt` (Standard security
handler R2–R6: RC4, AESV2, AESV3; streams unwrap before filters, CMap
and image streams included).  Genuinely passworded documents, fonts
whose ToUnicode is absent (Identity-H with CIDSystemInfo lookup needs
external CID tables) and exotic filters remain the documented seam (a
real deployment hands those to pdfminer/poppler — this extractor is
the reference semantics and NEVER raises on arbitrary bytes:
undecodable inputs yield NULL text, the decline contract every decoder
here follows).

Scale shape (100 TB): pure per-row map work in an Arrow-batched
``mapInPandas`` stage at the pipeline edge — PDF bytes never shuffle;
downstream sees only the extracted text column.

Reference parity: none — north-star LLM-pipeline surface (SURVEY.md
§2.8); the reference engine reads SQL tables only.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from clickhouse_table_copier_spark.operators import pdf_crypt

PDF_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)

_STREAM_END_RE = re.compile(rb">>\s*stream\r?\n")
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")


def _iter_streams(b: bytes):
    """Yield ``(dict_bytes, data_start)`` per stream: anchor on
    ``>> stream`` and walk BACKWARD to the balanced matching ``<<`` —
    a lazy ``<<.*?>>`` regex would start at the first ``<<`` after the
    previous stream and sweep unrelated dicts (an /Encrypt dict's
    /Filter, a stray /ObjStm) into this stream's dict."""
    for sm in _STREAM_END_RE.finditer(b):
        j = sm.start()  # at the closing '>>'
        depth = 0
        k = j
        while k >= 0:
            two = b[k : k + 2]
            if two == b">>":
                depth += 1
                k -= 2
            elif two == b"<<":
                depth -= 1
                if depth == 0:
                    break
                k -= 2
            else:
                k -= 1
        if depth != 0:
            continue  # unbalanced: skip this pseudo-stream
        yield b[k + 2 : j], sm.end()
_FILTER_RE = re.compile(rb"/Filter\s*(?:\[(?P<arr>[^\]]*)\]|(?P<one>/[A-Za-z0-9]+))")
_NAME_RE = re.compile(rb"/[A-Za-z0-9]+")
# inline integer /Length only: the negative lookahead rejects the
# indirect-reference form '/Length 15 0 R' (next non-space is a digit)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s*\d)")
_PRED_RE = re.compile(rb"/Predictor\s+(\d+)")
_COLUMNS_RE = re.compile(rb"/Columns\s+(\d+)")
_COLORS_RE = re.compile(rb"/Colors\s+(\d+)")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)")


def _stream_raw(b: bytes, d: bytes, start: int):
    """Raw (still-encoded) data of the stream starting at ``start``.

    An inline integer ``/Length`` bounds the data exactly — required
    for correctness, not just speed: FlateDecode OUTPUT bytes can
    contain the literal ``endstream``, and compressed input can too,
    so the first-match byte scan truncates real streams (ADVICE r10).
    The scan stays as the fallback for missing or indirect
    (``N 0 R``) lengths, and a lying ``/Length`` (damaged file) falls
    back too — trust it only when ``endstream`` actually follows."""
    lm = _LENGTH_RE.search(d)
    if lm:
        end = start + int(lm.group(1))
        if end <= len(b) and re.match(rb"\s{0,4}endstream", b[end : end + 13]):
            return b[start:end]
    end = b.find(b"endstream", start)
    if end == -1:
        return None
    raw = b[start:end]
    # strip the EOL PDF writers put before 'endstream' (the /Length
    # path needs no strip: the spec excludes that EOL from the count)
    if raw.endswith(b"\n"):
        raw = raw[:-1]
    if raw.endswith(b"\r"):
        raw = raw[:-1]
    return raw


def _undo_predictor(data: bytes, d: bytes):
    """Undo the stream dict's ``/Predictor`` over Flate/LZW output:
    2 = TIFF horizontal differencing, 10–15 = the PNG row filters
    (every row prefixed by its filter-type byte; Predictor 12 = Up is
    what xref/object streams in the wild use).  Parameters are read
    from the dict text — the common case is one filter with one parms
    dict; exotic per-filter parms ARRAYS with differing predictors are
    out of scope and decline.  Returns None on malformed geometry."""
    pm = _PRED_RE.search(d)
    if pm is None:
        return data
    pred = int(pm.group(1))
    if pred <= 1:
        return data
    m = _COLUMNS_RE.search(d)
    columns = int(m.group(1)) if m else 1
    m = _COLORS_RE.search(d)
    colors = int(m.group(1)) if m else 1
    m = _BPC_RE.search(d)
    bpc = int(m.group(1)) if m else 8
    if columns <= 0 or colors <= 0 or bpc <= 0:
        return None
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if pred == 2:  # TIFF: per-sample left-delta (8-bit samples only)
        if bpc != 8:
            return None
        out = bytearray(data)
        for r0 in range(0, len(out) - rowlen + 1, rowlen):
            for i in range(r0 + bpp, r0 + rowlen):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    stride = rowlen + 1  # PNG: filter-type byte leads each row
    out = bytearray()
    prev = bytearray(rowlen)
    for r0 in range(0, len(data) - stride + 1, stride):
        ft = data[r0]
        row = bytearray(data[r0 + 1 : r0 + 1 + rowlen])
        if ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                up = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                row[i] = (
                    row[i] + (a if pa <= pb and pa <= pc else up if pb <= pc else c)
                ) & 0xFF
        elif ft != 0:
            return None
        out += row
        prev = row
    return bytes(out)


def _lzw_decode(data: bytes):
    """PDF/TIFF LZWDecode: MSB-first packed codes, 8-bit data, clear =
    256, EOD = 257, code width grows 9→12 bits one code EARLY (the
    PDF spec's EarlyChange=1 default).  Returns None on malformed
    input (decline, don't fabricate)."""
    try:
        clear, eod = 256, 257
        width = 9
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        out = bytearray()
        prev = None
        acc = bits = 0
        for byte in data:
            acc = (acc << 8) | byte
            bits += 8
            while bits >= width:
                code = (acc >> (bits - width)) & ((1 << width) - 1)
                bits -= width
                if code == eod:
                    return bytes(out)
                if code == clear:
                    table = table[:258]
                    width = 9
                    prev = None
                    continue
                if prev is None:
                    entry = table[code]
                elif code < len(table):
                    entry = table[code]
                    table.append(prev + entry[:1])
                elif code == len(table):
                    entry = prev + prev[:1]
                    table.append(entry)
                else:
                    return None
                out += entry
                prev = entry
                # EarlyChange: width bumps one code before the table
                # index actually needs the extra bit
                if len(table) + 1 >= (1 << width) and width < 12:
                    width += 1
        return bytes(out)
    except Exception:
        return None


def _ascii85_decode(data: bytes):
    """ASCII85Decode (Adobe variant: ``z`` shorthand, ``~>`` EOD)."""
    try:
        data = re.sub(rb"\s", b"", data)
        if data.endswith(b"~>"):
            data = data[:-2]
        if data.startswith(b"<~"):
            data = data[2:]
        out = bytearray()
        group = []
        for c in data:
            if c == 0x7A:  # 'z' = four zero bytes, only between groups
                if group:
                    return None
                out += b"\x00\x00\x00\x00"
                continue
            if not (33 <= c <= 117):
                return None
            group.append(c - 33)
            if len(group) == 5:
                v = 0
                for g in group:
                    v = v * 85 + g
                out += v.to_bytes(4, "big")
                group = []
        if group:  # partial final group: pad with 'u' (84)
            k = len(group)
            if k == 1:
                return None
            v = 0
            for g in group + [84] * (5 - k):
                v = v * 85 + g
            out += v.to_bytes(4, "big")[: k - 1]
        return bytes(out)
    except Exception:
        return None


def _apply_filters(raw: bytes, d: bytes):
    """Run the stream dict's filter (or filter chain) over ``raw``.
    Returns the decoded bytes, or None when any stage is a filter this
    extractor doesn't cover (skip the stream, not the document)."""
    m = _FILTER_RE.search(d)
    if m is None:
        return raw
    names = (
        _NAME_RE.findall(m.group("arr"))
        if m.group("arr") is not None
        else [m.group("one")]
    )
    for name in names:
        if name in (b"/FlateDecode", b"/Fl"):
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                return None
            raw = _undo_predictor(raw, d)
        elif name in (b"/LZWDecode", b"/LZW"):
            raw = _lzw_decode(raw)
            if raw is not None:
                raw = _undo_predictor(raw, d)
        elif name in (b"/ASCIIHexDecode", b"/AHx"):
            try:
                h = re.sub(rb"[\s>]", b"", raw)
                if len(h) % 2:
                    h += b"0"
                raw = bytes.fromhex(h.decode("ascii"))
            except ValueError:
                return None
        elif name in (b"/ASCII85Decode", b"/A85"):
            raw = _ascii85_decode(raw)
        elif name in (b"/RunLengthDecode", b"/RL"):
            raw = _runlength_decode(raw)
        else:
            return None  # DCT/JPX-filtered TEXT streams: decline
            # (DCT/JPX/JBIG2/CCITT are image codecs — they lift via
            # _extract_pdf_jpegs, not the text path)
        if raw is None:
            return None
    return raw


def _runlength_decode(data: bytes):
    """RunLengthDecode (the PackBits byte coding): length byte 0-127 =
    literal run of length+1, 129-255 = repeat next byte 257-length
    times, 128 = EOD.  Returns None on malformed input."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c == 128:
            return bytes(out)
        if c < 128:
            if i + c + 1 > n:
                return None
            out += data[i : i + c + 1]
            i += c + 1
        else:
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - c)
            i += 1
    return bytes(out)

_XREF_TYPE_RE = re.compile(rb"/Type\s*/XRef(?![A-Za-z])")


def _decryptor_for(b: bytes):
    """Per-stream decrypt callable for an encrypted document whose user
    or owner password is EMPTY (the DRM-only case that dominates real
    crawls — :mod:`operators.pdf_crypt`), or None for unencrypted /
    out-of-scope documents.  The callable takes (dict_bytes,
    absolute_data_start, raw) and returns plaintext bytes or None
    (malformed ciphertext: skip the stream, keep the document)."""
    if b[:5] != b"%PDF-" or b"/Encrypt" not in b:
        return None
    try:
        found = pdf_crypt.find_decryptor(b)
    except Exception:
        found = None
    if not found:
        return None
    dec, enc_num = found
    spans = pdf_crypt.object_spans(b)

    def decrypt(d: bytes, start: int, raw: bytes):
        if _XREF_TYPE_RE.search(d):
            return raw  # cross-reference streams are never encrypted
        ng = pdf_crypt.span_for(spans, start)
        if ng is None:
            return None
        num, gen = ng
        if enc_num is not None and num == enc_num:
            return raw  # the /Encrypt dict itself is plaintext
        return dec.decrypt(num, gen, raw)

    return decrypt


_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _literal_string(data: bytes, start: int):
    """Parse a ``(…)`` literal from ``start`` (at the open paren):
    returns (text, position after the close paren).  Handles nesting,
    the escape set, octal escapes, and backslash line continuations."""
    out = []
    depth = 1
    i = start + 1
    n = len(data)
    while i < n and depth:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
            elif nxt and nxt in b"01234567":  # octal, 1-3 OCTAL digits
                # (\8 / \9 are not octal: the spec drops the backslash
                # and keeps the digit — isdigit() here once nuked the
                # whole document via int(..., 8) ValueError)
                j = i + 1
                while j < min(i + 4, n) and data[j : j + 1] in b"01234567":
                    j += 1
                out.append(chr(int(data[i + 1 : j], 8) & 0xFF))
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
            else:
                i += 1  # lone backslash: drop it
        elif c == b"(":
            depth += 1
            out.append("(")
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(c.decode("latin-1"))
            i += 1
    return "".join(out), i


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>|(\[)|(\])")
_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_FONTRES_RE = re.compile(rb"/Font\s*<<")
_FONTREF_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")
_MAX_CMAP_ENTRIES = 100_000  # fuzz guard: a lying bfrange can't balloon


def _utf16be(hexs: bytes):
    try:
        return bytes.fromhex(hexs.decode("ascii")).decode(
            "utf-16-be", "ignore"
        )
    except ValueError:
        return None


def _parse_tounicode(data: bytes):
    """ToUnicode CMap → ({code: text}, src byte length).  Handles
    ``bfchar`` pairs and ``bfrange`` triples including the array form;
    range increments apply to the last UTF-16 code unit (the spec's
    BMP-increment rule).  Returns None when nothing parses."""
    cmap: dict[int, str] = {}
    srclens: set[int] = set()

    def add(src_hex: bytes, text):
        if text is None or len(cmap) >= _MAX_CMAP_ENTRIES:
            return
        try:
            cmap[int(src_hex, 16)] = text
            srclens.add(len(src_hex) // 2)
        except ValueError:
            pass

    for body in _BFCHAR_RE.findall(data):
        toks = [
            re.sub(rb"\s", b"", m.group(1))
            for m in _HEXTOK_RE.finditer(body)
            if m.group(1) is not None
        ]
        for i in range(0, len(toks) - 1, 2):
            add(toks[i], _utf16be(toks[i + 1]))
    for body in _BFRANGE_RE.findall(data):
        toks = list(_HEXTOK_RE.finditer(body))
        i = 0
        while i + 2 < len(toks):
            lo_m, hi_m, d_m = toks[i], toks[i + 1], toks[i + 2]
            if lo_m.group(1) is None or hi_m.group(1) is None:
                i += 1
                continue
            lo_h = re.sub(rb"\s", b"", lo_m.group(1))
            hi_h = re.sub(rb"\s", b"", hi_m.group(1))
            try:
                lo, hi = int(lo_h, 16), int(hi_h, 16)
            except ValueError:
                i += 3
                continue
            if hi < lo or hi - lo > 0xFFFF:
                i += 3
                continue
            if d_m.group(2) is not None:  # '[' — array form
                j = i + 3
                code = lo
                while j < len(toks) and toks[j].group(3) is None:
                    if toks[j].group(1) is not None and code <= hi:
                        add(
                            b"%0*X" % (len(lo_h), code),
                            _utf16be(re.sub(rb"\s", b"", toks[j].group(1))),
                        )
                        code += 1
                    j += 1
                i = j + 1
            else:
                d_h = re.sub(rb"\s", b"", d_m.group(1))
                try:
                    base = int(d_h, 16) if d_h else None
                except ValueError:
                    base = None
                if base is not None:
                    width = max(len(d_h), 4)
                    for off in range(hi - lo + 1):
                        add(
                            b"%0*X" % (len(lo_h), lo + off),
                            _utf16be(b"%0*X" % (width, base + off)),
                        )
                i += 3
    if not cmap:
        return None
    srclen = 2 if 2 in srclens else (min(srclens) if srclens else 2)
    return cmap, srclen


def _document_fonts(b: bytes, decrypt=None):
    """Resource-name → (cmap, srclen) for every font object carrying a
    ``/ToUnicode`` CMap stream (Type0/Identity-H composite fonts, and
    any simple font that ships one).  Tolerant-scan style: objects are
    indexed by number, ``/Font << /F1 12 0 R >>`` resource dicts are
    unioned across the whole document (a cross-page resource-name
    collision onto DIFFERENT fonts is the accepted seam).  ``decrypt``
    (from :func:`_decryptor_for`) unwraps CMap streams in encrypted
    documents."""
    if b"/ToUnicode" not in b:
        return {}
    spans: dict[int, tuple[int, int]] = {}
    for m in _OBJ_RE.finditer(b):
        e = b.find(b"endobj", m.end())
        spans[int(m.group(1))] = (m.end(), e if e != -1 else len(b))
    tounicode: dict[int, tuple[dict, int]] = {}
    for num, (s0, e0) in spans.items():
        tm = _TOUNICODE_RE.search(b, s0, e0)
        if tm is None:
            continue
        cm_num = int(tm.group(1))
        if cm_num not in spans:
            continue
        cs, ce = spans[cm_num]
        seg = b[cs:ce]
        for d, start in _iter_streams(seg):
            raw = _stream_raw(seg, d, start)
            if raw is None:
                continue
            if decrypt is not None:
                # stream offsets here are segment-relative; the crypt
                # key needs the ABSOLUTE object position
                raw = decrypt(d, cs + start, raw)
                if raw is None:
                    continue
            data = _apply_filters(raw, d)
            if data is None:
                continue
            parsed = _parse_tounicode(data)
            if parsed:
                tounicode[num] = parsed
            break
    if not tounicode:
        return {}
    fonts: dict[bytes, tuple[dict, int]] = {}
    for m in _FONTRES_RE.finditer(b):
        # balanced forward scan over the /Font resource dict
        depth, k = 1, m.end()
        while k < len(b) and depth:
            two = b[k : k + 2]
            if two == b"<<":
                depth += 1
                k += 2
            elif two == b">>":
                depth -= 1
                k += 2
            else:
                k += 1
        for fm in _FONTREF_RE.finditer(b, m.end(), k):
            onum = int(fm.group(2))
            if onum in tounicode:
                fonts[b"/" + fm.group(1)] = tounicode[onum]
    return fonts


class _Name:
    """A /Name operand on the content-stream stack — distinct from
    shown-text strings so a malformed stream can never emit it."""

    __slots__ = ("val",)

    def __init__(self, val: bytes):
        self.val = val


class _Shown(str):
    """A string operand that remembers its RAW bytes, so a composite
    font's show operator can re-decode it through the CMap."""

    __slots__ = ("raw",)


def _shown(text: str) -> "_Shown":
    s = _Shown(text)
    s.raw = text.encode("latin-1", "ignore")
    return s


_INLINE_BI_RE = re.compile(rb"\bBI\b")
_INLINE_ID_RE = re.compile(rb"ID[\x00\t\n\f\r ]")
_INLINE_EI_RE = re.compile(rb"[\x00\t\n\f\r ]EI(?![0-9A-Za-z])")
_INLINE_LEN_RE = re.compile(rb"/L\s+(\d+)(?!\s*\d)")


def _skip_inline_image(stream: bytes, pos: int):
    """Position just past the ``EI`` of an inline image whose ``BI``
    operator was consumed at ``pos``, or None when malformed.  The
    binary payload is raw bytes — left in the token walk it can
    contain ``BT``/``(…)``-shaped byte runs that flip text state and
    fabricate garbage text, so the walker must jump it.  An inline
    ``/L`` length bounds the data exactly; otherwise the delimiter
    scan applies (a payload containing ``<ws>EI`` truncates — the
    downstream JPEG decoder declines truncated payloads, never
    fabricates)."""
    m_id = _INLINE_ID_RE.search(stream, pos, pos + 4096)
    if m_id is None:
        return None
    lm = _INLINE_LEN_RE.search(stream, pos, m_id.start())
    if lm:
        end = m_id.end() + int(lm.group(1))
        m_ei = _INLINE_EI_RE.search(stream, end, end + 16)
        if m_ei:
            return m_ei.end()
    m_ei = _INLINE_EI_RE.search(stream, m_id.end())
    return m_ei.end() if m_ei else None


def _inline_jpegs(data: bytes):
    """DCT-filtered inline images (``BI … /F /DCT … ID <jpeg> EI``) in
    one decoded content stream — scanned PDFs carry page images this
    way.  Returns raw JPEG payloads."""
    out = []
    pos = 0
    while True:
        m = _INLINE_BI_RE.search(data, pos)
        if m is None:
            return out
        m_id = _INLINE_ID_RE.search(data, m.end(), m.end() + 4096)
        if m_id is None:
            pos = m.end()
            continue
        params = data[m.end() : m_id.start()]
        payload_start = m_id.end()
        lm = _INLINE_LEN_RE.search(params)
        if lm:
            payload_end = payload_start + int(lm.group(1))
            m_ei = _INLINE_EI_RE.search(data, payload_end, payload_end + 16)
            pos = m_ei.end() if m_ei else payload_end
        else:
            m_ei = _INLINE_EI_RE.search(data, payload_start)
            if m_ei is None:
                return out
            payload_end = m_ei.start()
            pos = m_ei.end()
        payload = data[payload_start:payload_end]
        if (
            re.search(rb"/F(?:ilter)?\s*\[?\s*/DCT", params)
            and payload[:2] == b"\xff\xd8"
        ):
            out.append(payload)


_TOKEN_RE = re.compile(
    rb"\("  # literal string start — _literal_string consumes the rest
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|\[|\]"
    rb"|/[^\s/\[\]()<>]*"  # name
    rb"|[-+]?[0-9]*\.?[0-9]+"  # number
    rb"|[A-Za-z'\"*]+"  # operator
)


def _content_text(stream: bytes, fonts=None) -> str:
    """Text shown by one content stream: walk tokens inside BT…ET,
    track the pending operands, and emit on the show operators.
    ``fonts`` maps resource names (``b"/F1"``) to (ToUnicode cmap,
    src byte length); while such a font is selected via ``Tf``, shown
    strings decode CID-by-CID through the cmap instead of Latin-1."""
    parts: list[str] = []
    in_text = False
    operands: list = []
    cur = None  # selected font's (cmap, srclen), None = Latin-1

    def flush_show(val):
        if not isinstance(val, str) or not val:
            return
        if cur is not None and isinstance(val, _Shown):
            cmap, srclen = cur
            raw = val.raw
            shown = "".join(
                ch
                for i in range(0, len(raw) - srclen + 1, srclen)
                if (ch := cmap.get(int.from_bytes(raw[i : i + srclen], "big")))
            )
            if shown:
                parts.append(shown)
            return
        parts.append(val)

    pos = 0
    n = len(stream)
    while pos < n:
        m = _TOKEN_RE.search(stream, pos)
        if m is None:
            break
        tok = m.group(0)
        if tok.startswith(b"("):
            # re-parse from the true paren position to honor nesting
            text, endpos = _literal_string(stream, m.start())
            operands.append(_shown(text))
            pos = endpos
            continue
        pos = m.end()
        if tok.startswith(b"<"):
            hexstr = re.sub(rb"\s", b"", tok[1:-1])
            if len(hexstr) % 2:
                hexstr += b"0"
            try:
                operands.append(
                    _shown(bytes.fromhex(hexstr.decode()).decode("latin-1"))
                )
            except ValueError:
                operands.append("")
        elif tok in (b"[", b"]"):
            operands.append(tok.decode())
        elif tok.startswith(b"/"):
            operands.append(_Name(tok))  # names are never shown text
        elif re.fullmatch(rb"[-+]?[0-9]*\.?[0-9]+", tok):
            try:
                operands.append(float(tok))
            except ValueError:
                operands.append(0.0)
        else:  # operator
            op = tok
            if op == b"BT":
                in_text = True
                operands = []
            elif op == b"ET":
                in_text = False
                parts.append("\n")
                operands = []
            elif op == b"Tf":
                # font selection persists across text blocks (graphics
                # state); only consulted when the document HAS
                # ToUnicode fonts
                if fonts:
                    for o in reversed(operands):
                        if isinstance(o, _Name):
                            cur = fonts.get(o.val)
                            break
                operands = []
            elif op == b"BI":
                # inline image: jump the binary payload — its bytes
                # must never re-enter the token walk as pseudo-text
                nxt = _skip_inline_image(stream, pos)
                if nxt is None:
                    break
                pos = nxt
                operands = []
            elif not in_text:
                operands = []
            elif op == b"Tj":
                if operands and isinstance(operands[-1], str):
                    flush_show(operands[-1])
                operands = []
            elif op in (b"'", b'"'):
                # ' and " move to the next line then show
                parts.append("\n")
                if operands and isinstance(operands[-1], str):
                    flush_show(operands[-1])
                operands = []
            elif op == b"TJ":
                # array of strings and kerning offsets; a large
                # negative offset is an inter-word gap
                for item in operands:
                    if isinstance(item, str) and item not in ("[", "]"):
                        flush_show(item)
                    elif isinstance(item, float) and item < -150:
                        parts.append(" ")
                operands = []
            elif op in (b"Td", b"TD", b"T*", b"Tm"):
                parts.append("\n")
                operands = []
            else:
                operands = []
    text = "".join(parts)
    text = re.sub(r"[ \t]*\n[ \t]*", "\n", text)
    text = re.sub(r"\n{2,}", "\n", text)
    return text.strip()


def _extract_pdf(b: bytes):
    """(n_pages, text) for one PDF, or None when the bytes aren't a
    PDF.  Never raises — corrupt structures yield whatever extracted."""
    try:
        if b[:5] != b"%PDF-":
            return None
        n_pages = len(_PAGE_RE.findall(b))
        decrypt = _decryptor_for(b)
        try:
            fonts = _document_fonts(b, decrypt)
        except Exception:
            fonts = {}
        texts = []
        for d, start in _iter_streams(b):
            raw = _stream_raw(b, d, start)
            if raw is None:
                continue
            if decrypt is not None:
                raw = decrypt(d, start, raw)
                if raw is None:
                    continue
            raw = _apply_filters(raw, d)
            if raw is None:
                continue  # damaged stream / uncovered filter: skip
            if b"/ObjStm" in d:
                # PDF 1.5+ object streams carry page DICTS (not
                # content); count their /Type /Page markers so modern
                # files report real page counts
                n_pages += len(_PAGE_RE.findall(raw))
                continue
            if b"BT" not in raw:
                continue  # no text operators (images, fonts, …)
            t = _content_text(raw, fonts)
            if t:
                texts.append(t)
        text = "\n".join(texts) if texts else None
        return n_pages, text
    except Exception:
        return None


def extract_pdf_text(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """``(doc_id, n_pages, text)`` per input row — NULL text when the
    bytes aren't a PDF or carry no extractable simple-font text (the
    decline contract).  Arrow-batched ``mapInPandas``; PDF bytes never
    leave their task."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, content in zip(pdf[id_col], pdf[content_col]):
                got = _extract_pdf(bytes(content))
                if got is None:
                    out.append((did, None, None))
                else:
                    out.append((did, got[0], got[1]))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_pages", "text"]
            )

    return df.select(id_col, content_col).mapInPandas(fn, PDF_TEXT_SCHEMA)


_IMAGE_RE = re.compile(rb"/Subtype\s*/Image(?![A-Za-z])")
_K_RE = re.compile(rb"/K\s+(-?\d+)")
_ROWS_RE = re.compile(rb"/Rows\s+(\d+)")
_HEIGHT_RE = re.compile(rb"/Height\s+(\d+)")
_WIDTH_RE = re.compile(rb"/Width\s+(\d+)")
_BALIGN_RE = re.compile(rb"/EncodedByteAlign\s+true")
_JBIG2_GLOBALS_RE = re.compile(rb"/JBIG2Globals\s+(\d+)\s+\d+\s+R")


def _ccitt_to_png(raw: bytes, d: bytes):
    """Decode a ``/CCITTFaxDecode`` image stream (scanned-PDF pages)
    to a grayscale PNG via :mod:`operators.ccitt` — /K selects G4/G3,
    /Columns defaults to 1728, /Rows falls back to the XObject's
    /Height.  None on malformed data (decline)."""
    from clickhouse_table_copier_spark.operators import ccitt as _cc
    from clickhouse_table_copier_spark.operators.multimodal import (
        encode_png,
    )

    m = _K_RE.search(d)
    k = int(m.group(1)) if m else 0
    m = _COLUMNS_RE.search(d)
    cols = int(m.group(1)) if m else 1728
    m = _ROWS_RE.search(d) or _HEIGHT_RE.search(d)
    rows = int(m.group(1)) if m else None
    gray = _cc.decode_ccitt_pdf(
        raw, k, cols, rows, byte_align=_BALIGN_RE.search(d) is not None
    )
    if gray is None:
        return None
    h, w = gray.shape
    return encode_png(gray.tobytes(), w, h, channels=1)


def _jbig2_globals(b: bytes, d: bytes, decrypt):
    """Resolve the stream referenced by ``/JBIG2Globals N G R`` in the
    image dict ``d`` (the shared-symbol-dictionary stream) and return
    its decoded bytes, or None.  Same tolerant object-scan idiom as
    :func:`_document_fonts` — no xref walk."""
    gm = _JBIG2_GLOBALS_RE.search(d)
    if gm is None:
        return None
    num = int(gm.group(1))
    for m in _OBJ_RE.finditer(b):
        if int(m.group(1)) != num:
            continue
        e = b.find(b"endobj", m.end())
        seg = b[m.end() : e if e != -1 else len(b)]
        for gd, gstart in _iter_streams(seg):
            raw = _stream_raw(seg, gd, gstart)
            if raw is None:
                continue
            if decrypt is not None:
                raw = decrypt(gd, m.end() + gstart, raw)
                if raw is None:
                    continue
            if _FILTER_RE.search(gd) is not None:
                return _apply_filters(raw, gd)
            return raw
    return None


def _jbig2_to_png(raw: bytes, d: bytes, b: bytes, decrypt):
    """Decode a ``/JBIG2Decode`` image stream (the OTHER scanned-PDF
    codec besides CCITT) to a grayscale PNG via
    :mod:`operators.jbig2`; resolves ``/JBIG2Globals``.  None on
    malformed or out-of-scope data (decline)."""
    from clickhouse_table_copier_spark.operators.jbig2 import (
        decode_jbig2_pdf,
    )
    from clickhouse_table_copier_spark.operators.multimodal import (
        encode_png,
    )

    wm = _WIDTH_RE.search(d)
    hm = _HEIGHT_RE.search(d)
    gray = decode_jbig2_pdf(
        raw,
        globals_data=_jbig2_globals(b, d, decrypt),
        width=int(wm.group(1)) if wm else None,
        height=int(hm.group(1)) if hm else None,
    )
    if gray is None:
        return None
    h, w = gray.shape
    return encode_png(gray.tobytes(), w, h, channels=1)


def _jpx_to_png(raw: bytes):
    """Decode a ``/JPXDecode`` image stream (JP2 container or raw
    codestream — the THIRD scanned-PDF codec besides CCITT/JBIG2,
    closed r14) to PNG via :mod:`operators.jpeg2000`.  None on
    malformed or out-of-scope data (decline)."""
    from clickhouse_table_copier_spark.operators.jpeg2000 import (
        decode_jp2_pdf,
    )
    from clickhouse_table_copier_spark.operators.multimodal import (
        encode_png,
    )

    px = decode_jp2_pdf(raw)
    if px is None:
        return None
    if px.ndim == 2:
        h, w = px.shape
        return encode_png(px.tobytes(), w, h, channels=1)
    h, w, _ = px.shape
    return encode_png(px.tobytes(), w, h, channels=3)


def _extract_pdf_jpegs(b: bytes):
    """Image payloads of the ``/Subtype /Image`` XObjects: streams
    whose FINAL filter is ``/DCTDecode`` yield their raw bytes (the
    stored data IS a baseline JPEG; ASCII transport wrappers before it
    are unwound), and ``/CCITTFaxDecode`` streams — scanned fax pages —
    decode through :mod:`operators.ccitt` and re-emit as grayscale PNG
    so they enter the same media contract.  Returns a list (possibly
    empty); None when the bytes aren't a PDF.  Never raises."""
    try:
        if b[:5] != b"%PDF-":
            return None
        decrypt = _decryptor_for(b)
        out = []
        for d, start in _iter_streams(b):
            if not _IMAGE_RE.search(d):
                # content-like stream: scanned PDFs carry page images
                # INLINE (BI … /F /DCT … ID <jpeg> EI)
                raw = _stream_raw(b, d, start)
                if raw is None:
                    continue
                if decrypt is not None:
                    raw = decrypt(d, start, raw)
                    if raw is None:
                        continue
                data = _apply_filters(raw, d)
                if data is not None and b"BI" in data:
                    out.extend(_inline_jpegs(data))
                continue
            m = _FILTER_RE.search(d)
            if m is None:
                continue
            names = (
                _NAME_RE.findall(m.group("arr"))
                if m.group("arr") is not None
                else [m.group("one")]
            )
            is_dct = names and names[-1] in (b"/DCTDecode", b"/DCT")
            is_ccitt = names and names[-1] in (
                b"/CCITTFaxDecode", b"/CCF"
            )
            is_jbig2 = names and names[-1] == b"/JBIG2Decode"
            is_jpx = names and names[-1] == b"/JPXDecode"
            if not (is_dct or is_ccitt or is_jbig2 or is_jpx):
                continue
            raw = _stream_raw(b, d, start)
            if decrypt is not None and raw is not None:
                raw = decrypt(d, start, raw)
            for name in names[:-1]:  # transport wrappers ahead
                if raw is None:
                    break
                if name in (b"/ASCIIHexDecode", b"/AHx"):
                    try:
                        h = re.sub(rb"[\s>]", b"", raw)
                        if len(h) % 2:
                            h += b"0"
                        raw = bytes.fromhex(h.decode("ascii"))
                    except ValueError:
                        raw = None
                elif name in (b"/ASCII85Decode", b"/A85"):
                    raw = _ascii85_decode(raw)
                elif name in (b"/FlateDecode", b"/Fl") and (
                    is_ccitt or is_jbig2 or is_jpx
                ):
                    try:
                        raw = zlib.decompress(raw)
                    except zlib.error:
                        raw = None
                else:
                    raw = None  # Flate-of-DCT etc.: not JPEG transport
            if raw is None:
                continue
            if is_dct:
                if raw[:2] != b"\xff\xd8":
                    continue  # decline: not actually JPEG data
                out.append(raw)
            elif is_jbig2:
                png = _jbig2_to_png(raw, d, b, decrypt)
                if png is not None:
                    out.append(png)
            elif is_jpx:
                png = _jpx_to_png(raw)
                if png is not None:
                    out.append(png)
            else:
                png = _ccitt_to_png(raw, d)
                if png is not None:
                    out.append(png)
        return out
    except Exception:
        return None


PDF_IMAGE_STAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("img_idx", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def extract_pdf_images(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """PDF-embedded JPEGs → the multimodal ``(media_id, kind, content,
    meta_json)`` media contract (VERDICT r10 item 5): ``/DCTDecode``
    image XObjects are baseline JPEGs the engine already decodes, so a
    figure embedded in a PDF pairs with its standalone twin in
    ``near_duplicate_images`` exactly like a WARC-crawled image does
    (:func:`sources.warc.responses_to_media` is the sibling
    projection).  media_id = deterministic xxhash64 of (source doc_id,
    image index); provenance in meta_json.

    Scale shape: per-row map work in the Arrow-batched edge — PDF
    bytes never shuffle; only the (usually far smaller) extracted
    JPEGs flow on."""
    from pyspark.sql import functions as F

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, content in zip(pdf[id_col], pdf[content_col]):
                jpegs = _extract_pdf_jpegs(bytes(content)) or []
                for i, jb in enumerate(jpegs):
                    rows.append((did, i, jb))
            yield pd.DataFrame(
                rows, columns=["doc_id", "img_idx", "content"]
            )

    staged = df.select(id_col, content_col).mapInPandas(
        fn, PDF_IMAGE_STAGE_SCHEMA
    )
    return staged.select(
        F.xxhash64("doc_id", "img_idx").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("content"),
        F.to_json(
            F.struct(
                F.col("doc_id").alias("pdf_doc_id"),
                F.col("img_idx").alias("img_idx"),
            )
        ).alias("meta_json"),
    )
