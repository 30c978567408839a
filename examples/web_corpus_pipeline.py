"""End-to-end web-corpus curation: WARC → training shards.

A runnable demonstration of the full path a crawl takes through this
engine, on self-synthesized fixtures (no network, no external data):

  1. WARC shards (the Common Crawl layout, one gzip member per record)
  2. → 200 text/html responses            (sources.warc)
  3. → boilerplate-stripped prose         (operators.html_extract)
  4. → URL blocklist + canonical dedup    (operators.urls)
  5. → quality gate                       (operators.text)
  6. → cross-document paragraph dedup     (operators.dedup)
  7. → WebDataset tar shards for training (sources.webdataset)

Run: python examples/web_corpus_pipeline.py
Prints the funnel (rows surviving each stage) and the output shards.
"""

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_warc_shards(d: str, n_pages: int = 12) -> None:
    def record(headers: dict, block: bytes) -> bytes:
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode() for k, v in headers.items()
        )
        head += f"Content-Length: {len(block)}\r\n".encode()
        return head + b"\r\n" + block + b"\r\n\r\n"

    boiler = (
        "<nav><a href=/>Home</a> <a href=/a>About</a></nav>"
        "<footer>Copyright 2026 Example Corp, all rights reserved.</footer>"
    )
    disclaimer = (
        "<p>This page is provided for informational purposes only and "
        "carries no warranty of any kind, express or implied.</p>"
    )
    recs = []
    for i in range(n_pages):
        host = "spam.example.com" if i % 4 == 3 else f"site{i % 3}.org"
        prose = " ".join(
            f"Sentence {j} of document {i} discussing rivers, orchards "
            "and the patience of long-form prose."
            for j in range(6)
        )
        html = (
            f"<html><head><title>Doc {i}</title></head><body>{boiler}"
            f"<p>{prose}</p>{disclaimer}</body></html>"
        )
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + html.encode()
        )
        recs.append(
            record(
                {
                    "WARC-Type": "response",
                    "WARC-Target-URI": f"https://{host}/page/{i}?utm_source=x",
                    "WARC-Date": "2026-08-15T00:00:00Z",
                },
                http,
            )
        )
    # each host's robots.txt travels IN the crawl; site2.org keeps its
    # pages out of corpora (the increasingly common AI-crawl opt-out)
    for host, body in (
        ("site0.org", b"User-agent: *\nAllow: /\n"),
        ("site2.org", b"User-agent: *\nDisallow: /page/\n"),
    ):
        recs.append(
            record(
                {
                    "WARC-Type": "response",
                    "WARC-Target-URI": f"https://{host}/robots.txt",
                    "WARC-Date": "2026-08-15T00:00:00Z",
                },
                b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
                + body,
            )
        )
    half = len(recs) // 2
    for name, part in (("shard-0.warc.gz", recs[:half]),
                       ("shard-1.warc.gz", recs[half:])):
        with open(os.path.join(d, name), "wb") as f:
            for r in part:
                f.write(gzip.compress(r))


def main() -> None:
    from pyspark.sql import functions as F

    from clickhouse_table_copier_spark.operators.dedup import (
        drop_duplicate_paragraphs,
    )
    from clickhouse_table_copier_spark.operators.html_extract import (
        extract_html_text,
    )
    from clickhouse_table_copier_spark.operators.text import quality_score
    from clickhouse_table_copier_spark.operators.urls import (
        canonical_url,
        filter_blocklisted,
    )
    from clickhouse_table_copier_spark.session import get_spark
    from clickhouse_table_copier_spark.sources.warc import (
        read_warc,
        responses_to_documents,
    )
    from clickhouse_table_copier_spark.sources.webdataset import (
        group_samples,
        read_webdataset,
        write_webdataset,
    )

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="web_corpus_")
    warc_dir = os.path.join(work, "warc")
    out_dir = os.path.join(work, "shards")
    os.makedirs(warc_dir)
    _make_warc_shards(warc_dir)

    funnel = []
    records = read_warc(spark, warc_dir)
    funnel.append(("warc records", records.count()))

    docs = responses_to_documents(records)
    funnel.append(("200 text/html responses", docs.count()))

    blocklist = spark.createDataFrame([("example.com",)], "domain string")
    allowed = filter_blocklisted(docs, "url", blocklist)
    funnel.append(("after domain blocklist", allowed.count()))

    # robots gate: the crawl's own robots.txt fetches decide which of
    # its pages a corpus may keep (RFC 9309 — round 11)
    from clickhouse_table_copier_spark.operators.robots import (
        filter_robots_allowed,
        parse_robots,
    )
    from clickhouse_table_copier_spark.sources.warc import (
        responses_to_robots,
    )

    rules = parse_robots(responses_to_robots(records), "host", "body")
    allowed = filter_robots_allowed(allowed, "url", rules).where(
        "robots_allowed"
    ).drop("robots_allowed")
    funnel.append(("after robots.txt gate", allowed.count()))

    # canonical-URL dedup: one row per page identity
    allowed = allowed.withColumn("curl", canonical_url("url"))
    uniq = allowed.groupBy("curl").agg(
        F.min_by(F.struct("doc_id", "url", "raw_html"), "doc_id").alias("s")
    ).select("s.doc_id", "s.url", "s.raw_html")
    funnel.append(("after canonical-URL dedup", uniq.count()))

    text = extract_html_text(uniq, "raw_html", id_col="doc_id")
    # quality_score is a 0-100 composite (length band + charset +
    # stopwords); 50 is a meaningful prose bar
    good = text.where(
        (F.col("n_blocks_kept") > 0)
        & (quality_score("text") >= F.lit(50))
    )
    funnel.append(("after extraction + quality gate", good.count()))

    deduped = drop_duplicate_paragraphs(good, "doc_id", "text")
    deduped = deduped.where(F.length("text") > 0)
    funnel.append(("after paragraph dedup (non-empty)", deduped.count()))

    samples = deduped.select(
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("key"),
        F.create_map(
            F.lit("txt"), F.encode(F.col("text"), "UTF-8")
        ).alias("parts"),
    )
    shards = write_webdataset(samples, out_dir, n_shards=2)
    back = group_samples(read_webdataset(spark, out_dir))
    funnel.append(("samples in output shards", back.count()))

    width = max(len(n) for n, _ in funnel)
    print("\n== web-corpus funnel ==")
    for name, n in funnel:
        print(f"  {name:<{width}}  {n}")
    print("== output shards ==")
    for s in shards:
        print(f"  {s}  ({os.path.getsize(s)} bytes)")


if __name__ == "__main__":
    main()
