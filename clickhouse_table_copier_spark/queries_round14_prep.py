"""Round-14 registration batch, pre-written at round 13 — the next
SQL-expressible crawl-ingest slices: the CDXJ index envelope
projection (range-fetch selectivity planning), the multi-script
language identifier, the WARC charset-sniff decode path, and the
robots scheduler directives (Crawl-delay group selection, Sitemap
counts) —
implemented + DuckDB-hash-verified NOW (tests/test_round14_prep.py
runs the exact compare() harness every CI run) but NOT registered:
the r13 window is booked by the r08-green DUE cohort + the 3-query
r13 flip, so these names register at round 14 through the same flip
the queries_round12_prep / round13_prep pattern used.

Oracle strategy — identical to the prior prep batches: every query
PLANTS its structured input from ``documents`` doc_id arithmetic
(both engines derive the identical raw input), the Spark side runs
the REAL operator (``cdxj_records`` JSON-path projection;
``lang_id_multiscript`` script-block argmax; the
``responses_to_documents`` Arrow-batched charset sniff), and the
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

# name -> spark fn / oracle sql; consumed by tests/test_round14_prep.py
# and mirrored into the main registry AT ROUND 14 (flipped: round 14).
PREP14_QUERIES: dict = {}
PREP14_ORACLES: dict[str, str] = {}


def _prep14(name: str, oracle: str):
    def deco(fn):
        PREP14_QUERIES[name] = fn
        PREP14_ORACLES[name] = oracle
        return register(name, oracle)(fn)

    return deco


# --------------------------------------------------- CDX selectivity
# Every doc plants one CDXJ line: shard seg-(doc_id%3), offset
# doc_id*1000, length 500+(doc_id%7)*100, status 404 when doc_id%4=1
# else 200, mime image/png when doc_id%6=2 else text/html.  The
# "selected" predicate (status 200 AND text/html) is what a real CC
# range-fetch plan filters on; selectivity = bytes the range fetch
# would read / bytes in the shard — the r12 VERDICT item-4 metric.

_CDX_ORACLE = """
WITH d AS (
  SELECT 'seg-' || (doc_id % 3) || '.warc.gz' AS warc_filename,
         500 + (doc_id % 7) * 100 AS len,
         CASE WHEN doc_id % 4 = 1 THEN 404 ELSE 200 END AS status,
         CASE WHEN doc_id % 6 = 2 THEN 'image/png'
              ELSE 'text/html' END AS mime
  FROM documents
)
SELECT warc_filename,
       count(*)::BIGINT AS n_records,
       sum(CASE WHEN status = 200 AND mime = 'text/html'
                THEN 1 ELSE 0 END)::BIGINT AS n_selected,
       sum(CASE WHEN status = 200 AND mime = 'text/html'
                THEN len ELSE 0 END)::BIGINT AS bytes_selected,
       sum(len)::BIGINT AS bytes_total,
       CAST(floor(sum(CASE WHEN status = 200 AND mime = 'text/html'
                           THEN len ELSE 0 END) * 1000000.0
                  / sum(len)) AS BIGINT) AS selectivity_ppm
FROM d GROUP BY warc_filename
"""


@_prep14("cdx_range_selectivity", _CDX_ORACLE)
def q_cdx_range_selectivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Range-fetch selectivity through the REAL CDXJ envelope
    projection (sources/jsonl.py::cdxj_records — get_json_object path
    pruning + the status/offset/length casts): the planted meta_json
    is built with to_json so the operator parses genuine JSON, and
    the oracle states the planted values directly from doc_id
    arithmetic without touching JSON."""
    from clickhouse_table_copier_spark.sources.jsonl import cdxj_records

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    lines = docs.select(
        F.concat(
            F.lit("test,ex)/p"), (d % 3).cast("string")
        ).alias("surt"),
        F.lit("20240101000000").alias("timestamp"),
        F.to_json(
            F.struct(
                F.concat(
                    F.lit("https://ex.test/p"), d.cast("string")
                ).alias("url"),
                F.when(d % 6 == 2, F.lit("image/png"))
                .otherwise(F.lit("text/html"))
                .alias("mime"),
                F.when(d % 4 == 1, F.lit("404"))
                .otherwise(F.lit("200"))
                .alias("status"),
                F.lit("sha1:0000").alias("digest"),
                F.concat(
                    F.lit("seg-"), (d % 3).cast("string"),
                    F.lit(".warc.gz"),
                ).alias("filename"),
                (d * 1000).cast("string").alias("offset"),
                (500 + (d % 7) * 100).cast("string").alias("length"),
            )
        ).alias("meta_json"),
    )
    recs = cdxj_records(lines)
    sel = (F.col("status") == 200) & (F.col("mime") == "text/html")
    sel_len = F.when(sel, F.col("warc_length")).otherwise(F.lit(0))
    return recs.groupBy("warc_filename").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records"),
        F.sum(sel.cast("int")).cast("bigint").alias("n_selected"),
        F.sum(sel_len).cast("bigint").alias("bytes_selected"),
        F.sum("warc_length").cast("bigint").alias("bytes_total"),
        F.floor(
            F.sum(sel_len) * F.lit(1000000.0) / F.sum("warc_length")
        ).cast("bigint").alias("selectivity_ppm"),
    )


# ------------------------------------------- multi-script language ID
# doc_id % 6 plants one exemplar per decision branch of
# operators/text.py::lang_id_multiscript: Latin marker argmax (en,
# de), script dominance (ru via Cyrillic, zh via Han), the kana ⇒ ja
# disambiguation over a Han-majority text, and the no-signal 'und'.

_SCRIPT_TEXTS = (
    "the cat and the dog is here to see",      # 0 -> en (markers)
    "der hund und die katze ist nicht da",     # 1 -> de (markers)
    "привет мир как дела сегодня",             # 2 -> ru (cyrillic)
    "日本語のテキストです",                      # 3 -> ja (kana present)
    "中文文本没有假名",                          # 4 -> zh (han only)
    "12345 67890 ...",                         # 5 -> und (no signal)
)

_SCRIPT_ORACLE = """
WITH d AS (
  SELECT CASE doc_id % 6
           WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'ru'
           WHEN 3 THEN 'ja' WHEN 4 THEN 'zh' ELSE 'und' END AS lang
  FROM documents
)
SELECT lang, count(*)::BIGINT AS n_docs
FROM d GROUP BY lang
"""


@_prep14("script_language_histogram", _SCRIPT_ORACLE)
def q_script_language_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Language histogram through the REAL multi-script identifier
    (operators/text.py::lang_id_multiscript): script-block codepoint
    counts, Latin-dominance gate, the han+kana ⇒ ja rule, marker-word
    fallback.  The oracle never inspects text — it states each
    planted exemplar's expected label."""
    from clickhouse_table_copier_spark.operators.text import (
        lang_id_multiscript,
    )

    docs = _t(spark, sf_dir, "documents")
    text = F.element_at(
        F.array(*[F.lit(t) for t in _SCRIPT_TEXTS]),
        (F.col("doc_id") % 6).cast("int") + 1,
    )
    return (
        docs.select(lang_id_multiscript(text).alias("lang"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


# ------------------------------------------------- charset coverage
# doc_id % 5 plants one response per charset-evidence branch of
# sources/warc.py::_sniff_decode: BOM (stripped by utf-8-sig),
# Content-Type charset parameter, the HTML5 1024-byte meta sniff,
# the UTF-8 default, and a bogus declared charset falling back to
# UTF-8-with-replacement (the Latin-1 é becomes exactly one U+FFFD).
# doc_id % 11 = 0 plants a 404 the response filter must drop.

_CS_TEXTS = (
    "Grüße aus Köln é",            # 0 BOM'd UTF-8
    "café señor ñ",                     # 1 header charset
    '<meta charset="ISO-8859-1"><p>naïve über</p>',  # 2 meta
    "plain utf-8 日本",                        # 3 default UTF-8
    "caf� only",                                  # 4 bogus -> replace
)

_CHARSET_ORACLE = """
WITH d AS (
  SELECT 'c' || (doc_id % 5) AS charset_class FROM documents
  WHERE doc_id % 11 <> 0
)
SELECT charset_class,
       count(*)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_exact
FROM d GROUP BY charset_class
"""


@_prep14("wet_charset_coverage", _CHARSET_ORACLE)
def q_wet_charset_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Charset-branch coverage through the REAL response decode path
    (sources/warc.py::responses_to_documents — the Arrow-batched
    _sniff_decode stage): payload BYTES are planted in the charset
    each branch declares (F.encode ISO-8859-1/UTF-8, a literal BOM
    prefix), and n_exact counts rows whose decoded text equals the
    branch's expected Unicode string — a decode bug (mojibake,
    unstripped BOM, wrong sniff precedence) drops n_exact below
    n_docs and hash-mismatches the constructive oracle."""
    from clickhouse_table_copier_spark.sources.warc import (
        responses_to_documents,
    )

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    cls = (d % 5).cast("int")
    latin1 = [None, _CS_TEXTS[1], _CS_TEXTS[2], None, "café only"]
    payload = (
        F.when(
            cls == 0,
            F.concat(
                F.lit(bytearray(b"\xef\xbb\xbf")),
                F.encode(F.lit(_CS_TEXTS[0]), "UTF-8"),
            ),
        )
        .when(cls == 1, F.encode(F.lit(latin1[1]), "ISO-8859-1"))
        .when(cls == 2, F.encode(F.lit(latin1[2]), "ISO-8859-1"))
        .when(cls == 3, F.encode(F.lit(_CS_TEXTS[3]), "UTF-8"))
        .otherwise(F.encode(F.lit(latin1[4]), "ISO-8859-1"))
    )
    ctype = (
        F.when(cls == 1, F.lit("text/html; charset=ISO-8859-1"))
        .when(cls == 3, F.lit("Text/HTML"))  # case-insensitive pick
        .when(cls == 4, F.lit("text/html; charset=bogus-enc"))
        .otherwise(F.lit("text/html"))
    )
    warc = docs.select(
        F.lit("response").alias("warc_type"),
        F.when(d % 11 == 0, F.lit(404))
        .otherwise(F.lit(200))
        .alias("http_status"),
        ctype.alias("content_type"),
        F.lit("planted.warc.gz").alias("warc_file"),
        d.alias("record_idx"),
        F.concat(
            F.lit("https://cs.test/c"), cls.cast("string"),
            F.lit("/"), d.cast("string"),
        ).alias("target_uri"),
        F.lit("2024-01-01T00:00:00Z").alias("warc_date"),
        payload.alias("payload"),
    )
    decoded = responses_to_documents(warc)
    cls_out = F.regexp_extract("url", r"/c([0-9])/", 1)
    expected = F.element_at(
        F.array(*[F.lit(t) for t in _CS_TEXTS]),
        cls_out.cast("int") + 1,
    )
    return (
        decoded.select(
            F.concat(F.lit("c"), cls_out).alias("charset_class"),
            (F.col("raw_html") == expected).cast("int").alias("ok"),
        )
        .groupBy("charset_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ok").cast("bigint").alias("n_exact"),
        )
    )


# ------------------------------------------------ scheduler directives
# Eight planted hosts in three robots shapes: (a) '*' group with a
# host-dependent Crawl-delay + one Sitemap, (b) no delay + two
# Sitemaps, (c) a ccbot-specific delay that must BEAT the '*' group's.
# The per-host URL mass comes from documents doc_id arithmetic.

_DIR_ORACLE = """
WITH u AS (
  SELECT doc_id % 8 AS hnum FROM documents
),
agg AS (
  SELECT hnum, count(*) AS n_urls FROM u GROUP BY hnum
)
SELECT 'h' || hnum || '.example' AS host,
       n_urls::BIGINT AS n_urls,
       (CASE hnum % 3 WHEN 0 THEN 1 + hnum
                      WHEN 1 THEN 0 ELSE 7 END)::BIGINT
         AS crawl_delay_s,
       (CASE hnum % 3 WHEN 0 THEN 1
                      WHEN 1 THEN 2 ELSE 0 END)::BIGINT AS n_sitemaps
FROM agg
"""


@_prep14("crawl_scheduler_directives", _DIR_ORACLE)
def q_crawl_scheduler_directives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Crawl-scheduler inputs through the REAL directive parser
    (operators/robots.py::robots_directives — the stateful group
    model in the Arrow edge): per host, the URL mass, the EFFECTIVE
    Crawl-delay for agent ``ccbot`` (its own group beats ``*``; no
    directive ⇒ 0) and the Sitemap count.  The oracle states each
    planted shape's outcome from host-number arithmetic — it never
    parses robots.txt."""
    from clickhouse_table_copier_spark.operators.robots import (
        robots_directives,
    )

    docs = _t(spark, sf_dir, "documents")
    hnum = F.col("id")
    body = (
        F.when(
            hnum % 3 == 0,
            F.concat(
                F.lit("User-agent: *\nCrawl-delay: "),
                (hnum + 1).cast("string"),
                F.lit("\nDisallow: /x\nSitemap: https://h"),
                hnum.cast("string"),
                F.lit(".example/sm.xml\n"),
            ),
        )
        .when(
            hnum % 3 == 1,
            F.concat(
                F.lit("User-agent: *\nDisallow: /y\nSitemap: https://h"),
                hnum.cast("string"),
                F.lit(".example/a.xml\nSitemap: https://h"),
                hnum.cast("string"),
                F.lit(".example/b.xml\n"),
            ),
        )
        .otherwise(
            F.lit(
                "User-agent: ccbot\nCrawl-delay: 7\nDisallow: /z\n"
                "User-agent: *\nCrawl-delay: 2\nDisallow: /w\n"
            )
        )
    )
    hosts = spark.range(8).select(
        F.concat(
            F.lit("h"), hnum.cast("string"), F.lit(".example")
        ).alias("host"),
        body.alias("body"),
    )
    dirs = robots_directives(hosts, "host", "body")
    delay_val = F.col("value").cast("bigint")
    delays = (
        dirs.where(F.col("directive") == "crawl_delay")
        .groupBy("host")
        .agg(
            F.max(
                F.when(F.col("agent") == "ccbot", delay_val)
            ).alias("spec_delay"),
            F.max(
                F.when(F.col("agent") == "*", delay_val)
            ).alias("star_delay"),
        )
    )
    sitemaps = (
        dirs.where(F.col("directive") == "sitemap")
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("sm"))
    )
    urls = (
        _t(spark, sf_dir, "documents")
        .select(
            F.concat(
                F.lit("h"), (F.col("doc_id") % 8).cast("string"),
                F.lit(".example"),
            ).alias("host")
        )
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_urls"))
    )
    return (
        urls.join(F.broadcast(delays), "host", "left")
        .join(F.broadcast(sitemaps), "host", "left")
        .select(
            "host",
            "n_urls",
            F.coalesce("spec_delay", "star_delay", F.lit(0))
            .cast("bigint")
            .alias("crawl_delay_s"),
            F.coalesce("sm", F.lit(0)).cast("bigint").alias(
                "n_sitemaps"
            ),
        )
    )
