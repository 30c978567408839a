"""Corpus curation round trip: parquet → filter/dedup → `.jsonl.zst`
→ read back — the re-publish workflow a training-data pipeline runs
after curation, end to end on the repo's own fixtures (no network):

  1. the ``documents`` fixture table                    (parquet)
  2. → quality gate (length + alpha ratio) and exact
     dedup over normalized text                (operators.dedup)
  3. → re-publish as ``.jsonl.zst`` shards — one JSON object per
     line, JVM-side serialization, one zstd frame per Arrow batch,
     native libzstd when it loads               (sources.jsonl)
  4. → read the shards back (magic-sniffed decode) and verify the
     survivor set is exactly what was written   (read_jsonl)
  5. → and the same records as ``.warc.zst`` resource records via
     ``write_warc(compression='zstd')``, range-fetched back by
     offset                                     (sources.warc)

Run: python examples/corpus_republish.py [sf_dir]
Prints counts at each stage and verifies both round trips.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("corpus-republish")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from clickhouse_table_copier_spark.operators.dedup import (
        exact_dedup,
    )
    from clickhouse_table_copier_spark.sources.jsonl import (
        jsonl_to_documents,
        read_jsonl,
        write_jsonl,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # 2. quality gate: non-trivial length, mostly-alphabetic
    alpha = F.length(F.regexp_replace("text", r"[^\p{L} ]", ""))
    gated = docs.where(
        (F.length("text") >= 40)
        & (alpha * 100 >= F.length("text") * 50)
    )
    n1 = gated.count()

    # exact dedup on normalized text: keep the minimum doc_id of
    # each content group, then join the survivors' rows back
    from pyspark.sql import functions as _F

    groups = exact_dedup(gated, "doc_id", "text")
    keep = groups.select(_F.col("keep_id").alias("doc_id"))
    survivors = gated.join(keep, "doc_id")
    n2 = survivors.count()
    print(f"documents: {n0} -> quality-gated {n1} -> deduped {n2}")

    out = tempfile.mkdtemp(prefix="republish-")
    jl_dir = os.path.join(out, "jsonl")
    shards = write_jsonl(
        survivors.select("doc_id", "text"), jl_dir,
        n_shards=4, compression="zstd",
    )
    sizes = {s: os.path.getsize(s) for s in shards}
    print(f".jsonl.zst shards: {len(shards)}, "
          f"{sum(sizes.values())} bytes total")

    back = jsonl_to_documents(
        read_jsonl(spark, jl_dir), text_field="text", id_field="doc_id"
    )
    n3 = back.count()
    texts_match = (
        back.select("text").exceptAll(survivors.select("text")).count()
        == 0
        and survivors.select("text").exceptAll(back.select("text")).count()
        == 0
    )
    print(f"read back: {n3} rows; text sets identical: {texts_match}")
    assert n3 == n2 and texts_match

    # 5. the .warc.zst spelling of the same corpus + range fetch
    from clickhouse_table_copier_spark.sources.warc import (
        WARC_SCHEMA,
        read_warc,
        write_warc,
    )

    records = survivors.select(
        F.lit("republish").alias("warc_file"),
        F.col("doc_id").cast("long").alias("record_idx"),
        F.lit("resource").alias("warc_type"),
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("target_uri"),
        F.lit("2026-08-16T00:00:00Z").alias("warc_date"),
        F.lit(None).cast("int").alias("http_status"),
        F.lit("text/plain").alias("content_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    _ = WARC_SCHEMA  # documented shape of `records`
    wz_dir = os.path.join(out, "warc")
    wz = write_warc(records, wz_dir, n_shards=2, compression="zstd")
    n4 = read_warc(spark, wz_dir).count()
    print(f".warc.zst shards: {len(wz)}; records read back: {n4}")
    assert n4 == n2
    print("OK: both round trips verified")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
