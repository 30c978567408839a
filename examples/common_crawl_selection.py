"""Index-driven Common Crawl selection: CDX → range fetch → text.

The way a real CC consumer works — and the round-11 surface end to
end, on self-synthesized fixtures (no network):

  1. a ``.warc.gz`` shard (member-per-record) with brotli-coded HTML
     bodies and a zstd-coded plain-text body        (sources.warc)
  2. + its CDXJ index shard                          (sources.jsonl)
  3. → SELECT in the index: status 200, text/html — a plain
     DataFrame filter over ``cdxj_records``
  4. → range-fetch ONLY the selected members         (read_warc_ranges)
  5. → Content-Encoding undone (br / zstd / gzip)    (sources.brotli,
     sources.zstd)
  6. → extracted prose                               (html_extract)

Run: python examples/common_crawl_selection.py
Prints the index, the selection, and the fetched+decoded pages.
"""

import ctypes
import gzip
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _brotli_compress(data: bytes, quality: int = 9) -> bytes:
    """Fixture-side only: the system encoder codes the bodies the
    DECODER under demonstration has to undo (same one used for the
    committed goldens)."""
    import ctypes.util

    lib = ctypes.util.find_library("brotlienc")
    if lib is None:
        print("SKIP: no libbrotlienc on this system — fixture encoder "
              "unavailable (the repo DECODER needs no system libs)")
        sys.exit(0)
    enc = ctypes.CDLL(lib)
    fn = enc.BrotliEncoderCompress
    fn.restype = ctypes.c_int
    out_len = ctypes.c_size_t(len(data) * 2 + 1024)
    out = ctypes.create_string_buffer(out_len.value)
    assert fn(
        ctypes.c_int(quality), ctypes.c_int(22), ctypes.c_int(0),
        ctypes.c_size_t(len(data)), data, ctypes.byref(out_len), out,
    ) == 1
    return out.raw[: out_len.value]


def _zstd_compress(data: bytes) -> bytes:
    return subprocess.run(
        ["zstd", "-9", "-c"], input=data, capture_output=True,
        check=True,
    ).stdout


def _record(headers: dict, block: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers.items()
    )
    head += f"Content-Length: {len(block)}\r\n".encode()
    return head + b"\r\n" + block + b"\r\n\r\n"


def _make_fixtures(d: str) -> None:
    pages = []
    for i in range(8):
        prose = " ".join(
            f"Paragraph {j} of page {i}, long enough to clear the "
            "extractor's block threshold, discussing harbors and "
            "orchards at length."
            for j in range(5)
        )
        html = (
            f"<html><head><title>Page {i}</title></head><body>"
            f"<p>{prose}</p></body></html>"
        ).encode()
        enc = "br" if i % 2 == 0 else "gzip"
        body = _brotli_compress(html) if enc == "br" else gzip.compress(html)
        status = b"404 Not Found" if i == 5 else b"200 OK"
        http = (
            b"HTTP/1.1 " + status + b"\r\nContent-Type: text/html\r\n"
            b"Content-Encoding: " + enc.encode() + b"\r\n\r\n" + body
        )
        pages.append((f"https://site{i % 3}.org/p{i}", http, status))
    # one zstd-coded plain-text response (selected out by mime)
    pages.append(
        (
            "https://site0.org/robots.txt",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            b"Content-Encoding: zstd\r\n\r\n"
            + _zstd_compress(b"User-agent: *\nAllow: /\n"),
            b"200 OK",
        )
    )
    index_lines = []
    with open(os.path.join(d, "crawl.warc.gz"), "wb") as f:
        for i, (uri, http, status) in enumerate(pages):
            rec = _record(
                {
                    "WARC-Type": "response",
                    "WARC-Target-URI": uri,
                    "WARC-Date": f"2026-08-16T00:00:{i:02d}Z",
                    "Content-Type": "application/http; msgtype=response",
                },
                http,
            )
            off = f.tell()
            member = gzip.compress(rec)
            f.write(member)
            mime = (
                "text/plain" if uri.endswith("robots.txt") else "text/html"
            )
            index_lines.append(
                f"org,site{i % 3})/p{i} 2026081600{i:04d} "
                + json.dumps(
                    {
                        "url": uri,
                        "mime": mime,
                        "status": "404" if b"404" in status else "200",
                        "filename": "crawl.warc.gz",
                        "offset": str(off),
                        "length": str(len(member)),
                    }
                )
            )
    idx_dir = os.path.join(d, "index")
    os.makedirs(idx_dir)
    with open(os.path.join(idx_dir, "cdx-00000.gz"), "wb") as f:
        f.write(gzip.compress(("\n".join(index_lines) + "\n").encode()))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from clickhouse_table_copier_spark.operators.html_extract import (
        extract_html_text,
    )
    from clickhouse_table_copier_spark.sources.jsonl import (
        cdxj_records,
        read_cdxj,
    )
    from clickhouse_table_copier_spark.sources.warc import (
        read_warc_ranges,
    )

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("common-crawl-selection")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as d:
        _make_fixtures(d)
        idx = cdxj_records(read_cdxj(spark, os.path.join(d, "index")))
        total = idx.count()
        picked = idx.where(
            (F.col("status") == 200) & (F.col("mime") == "text/html")
        )
        n_picked = picked.count()
        print(f"index rows: {total}  selected (200 + text/html): {n_picked}")
        fetched = read_warc_ranges(picked, d)
        docs = fetched.select(
            F.xxhash64("warc_file", "record_idx").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("payload").cast("string").alias("raw_html"),
        )
        docs = docs.cache()  # one fetch pass feeds both branches
        texts = extract_html_text(docs, "raw_html", "doc_id")
        joined = texts.join(docs.select("doc_id", "url"), "doc_id")
        rows = joined.select("url", "text").collect()
        print(f"fetched + decoded pages: {len(rows)}")
        for r in sorted(rows, key=lambda r: r["url"])[:3]:
            print(f"  {r['url']}: {r['text'][:60]!r}…")
        assert len(rows) == n_picked, "every selected range must decode"
        assert all("Paragraph" in (r["text"] or "") for r in rows), (
            "brotli/gzip bodies must have been undone before extraction"
        )
        print("OK: selection → range fetch → decode → text, end to end")
    spark.stop()


if __name__ == "__main__":
    main()
