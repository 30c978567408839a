"""Round-13 registration batch, pre-written at round 12 — the next
SQL-expressible slice of the crawl-ingest surface: RFC 9309 robots
filtering (including the round-12 percent-encoding normalization),
sitemap-frontier parsing, and the WAT metadata projection with
string-JSON path pruning — implemented + DuckDB-hash-verified NOW
(tests/test_round13_prep.py runs the exact compare() harness every CI
run) but NOT registered: the r12 window is fully booked (32 DUE + 18
FRESH drained the whole backlog — COVERAGE.md "Round-12 window"), so
these names register at round 13 through the same flip the
queries_round7_prep / queries_round12_prep pattern used.

Oracle strategy — identical to queries_round12_prep: every query
PLANTS its structured input from ``documents`` doc_id arithmetic
(both engines build the identical raw input), the Spark side runs the
REAL operator (robots.txt parsing → broadcast-join longest-match
filter; sitemap XML parsing in the Arrow edge), and the oracle
derives the expected answer CONSTRUCTIVELY from the planting
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

# name -> spark fn / oracle sql; consumed by tests/test_round13_prep.py
# and — SINCE ROUND 13 — mirrored into the main registry (the flip the
# module docstring priced; same pattern as queries_round12_prep).
PREP13_QUERIES: dict = {}
PREP13_ORACLES: dict[str, str] = {}


def _prep13(name: str, oracle: str):
    def deco(fn):
        PREP13_QUERIES[name] = fn
        PREP13_ORACLES[name] = oracle
        return register(name, oracle)(fn)

    return deco


# One robots policy planted on every host.  The Allow rule spells '='
# literally while the planted URL spells it %3D — equal only under
# the RFC 9309 §2.2.2 octet normalization, so this oracled query pins
# the round-12 normalization INSIDE the correctness gate:
#   /a/1/k%3Deep → Allow /a/1/k=eep (10 octets) beats Disallow /a/1/
#   (5 octets); /a/1/x and /a/2/x disallow; every other path allows.
_ROBOTS_BODY = (
    "User-agent: *\n"
    "Disallow: /a/1/\n"
    "Disallow: /a/2/\n"
    "Allow: /a/1/k=eep\n"
)

_ROBOTS_ORACLE = """
WITH u AS (
  SELECT 'h' || (doc_id % 16) || '.example' AS host,
         CASE WHEN doc_id % 5 = 0 THEN 1
              WHEN doc_id % 7 IN (1, 2) THEN 0
              ELSE 1 END AS ok
  FROM documents
)
SELECT host,
       count(*)::BIGINT AS n_urls,
       sum(ok)::BIGINT AS n_allowed,
       CAST(floor(sum(ok) * 1000000.0 / count(*)) AS BIGINT)
         AS allowed_ppm
FROM u GROUP BY host
"""


@_prep13("robots_allowed_rate", _ROBOTS_ORACLE)
def q_robots_allowed_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawlability rate through the FULL RFC 9309 pipeline:
    robots.txt BODIES parse in the Arrow edge (operators/robots.py::
    parse_robots), the URL stream filters through the broadcast-join
    longest-match with octet normalization (filter_robots_allowed),
    and the verdicts aggregate per host.  The oracle never parses
    robots.txt — it states each planted branch's RFC outcome
    (allow-wins-at-equal-or-longer-octets, the %3D ≡ '=' row) directly
    from doc_id arithmetic."""
    from clickhouse_table_copier_spark.operators.robots import (
        filter_robots_allowed,
        parse_robots,
    )

    docs = _t(spark, sf_dir, "documents")
    hnum = (F.col("doc_id") % 16).cast("string")
    d5 = F.col("doc_id") % 5
    d7 = (F.col("doc_id") % 7).cast("string")
    path = F.when(d5 == 0, F.lit("/a/1/k%3Deep")).otherwise(
        F.concat(F.lit("/a/"), d7, F.lit("/x"))
    )
    urls = docs.select(
        F.concat(F.lit("h"), hnum, F.lit(".example")).alias("host"),
        F.concat(
            F.lit("https://h"), hnum, F.lit(".example"), path
        ).alias("url"),
    )
    robots = spark.range(16).select(
        F.concat(
            F.lit("h"), F.col("id").cast("string"), F.lit(".example")
        ).alias("host"),
        F.lit(_ROBOTS_BODY).alias("body"),
    )
    rules = parse_robots(robots, "host", "body")
    flt = filter_robots_allowed(urls, "url", rules)
    ok = F.col("robots_allowed").cast("int")
    return flt.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_urls"),
        F.sum(ok).cast("bigint").alias("n_allowed"),
        F.floor(
            F.sum(ok) * F.lit(1000000.0) / F.count(F.lit(1))
        ).cast("bigint").alias("allowed_ppm"),
    )


_SITEMAP_ORACLE = """
WITH d AS (
  SELECT doc_id % 4 AS m4, doc_id % 3 AS m3 FROM documents
)
SELECT * FROM (
  SELECT 'sitemapindex' AS kind,
         (2 * sum(CASE WHEN m4 = 0 THEN 1 ELSE 0 END))::BIGINT
           AS n_entries,
         sum(CASE WHEN m4 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_hosts,
         0::BIGINT AS n_with_priority
  FROM d
  UNION ALL
  SELECT 'urlset' AS kind,
         sum(CASE WHEN m4 <> 0 THEN m3 + 1 ELSE 0 END)::BIGINT,
         sum(CASE WHEN m4 <> 0 THEN 1 ELSE 0 END)::BIGINT,
         sum(CASE WHEN m4 <> 0 THEN m3 + 1 ELSE 0 END)::BIGINT
  FROM d
)
"""


@_prep13("sitemap_frontier_stats", _SITEMAP_ORACLE)
def q_sitemap_frontier_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Frontier statistics through the REAL sitemap parser
    (operators/robots.py::parse_sitemaps — ElementTree in the Arrow
    edge): every 4th document plants a <sitemapindex> of two child
    sitemaps, the rest plant a <urlset> of 1-3 <url> entries with
    priorities; the query counts entries / hosts / priority coverage
    per kind.  The oracle derives the same counts from the planting
    arithmetic — it never touches XML."""
    from clickhouse_table_copier_spark.operators.robots import (
        parse_sitemaps,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    m4 = F.col("doc_id") % 4
    m3 = F.col("doc_id") % 3

    def _url_entry(i: int):
        return F.when(
            m3 + 1 >= i,
            F.concat(
                F.lit("<url><loc>https://u"),
                did,
                F.lit(
                    f".example/p{i}</loc>"
                    "<priority>0.5</priority></url>"
                ),
            ),
        ).otherwise(F.lit(""))

    index_body = F.concat(
        F.lit("<sitemapindex><sitemap><loc>https://s"),
        did,
        F.lit(".example/m1.xml</loc></sitemap><sitemap><loc>https://s"),
        did,
        F.lit(".example/m2.xml</loc></sitemap></sitemapindex>"),
    )
    urlset_body = F.concat(
        F.lit("<urlset>"),
        _url_entry(1),
        _url_entry(2),
        _url_entry(3),
        F.lit("</urlset>"),
    )
    planted = docs.select(
        F.concat(F.lit("d"), did).alias("host"),
        F.when(m4 == 0, index_body).otherwise(urlset_body).alias(
            "body"
        ),
    )
    rows = parse_sitemaps(planted, "host", "body")
    return rows.groupBy("kind").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_entries"),
        F.countDistinct("host").cast("bigint").alias("n_hosts"),
        F.count("priority").cast("bigint").alias("n_with_priority"),
    )


_WAT_ORACLE = """
SELECT (doc_id % 4)::BIGINT AS n_links,
       count(*)::BIGINT AS n_docs
FROM documents WHERE doc_id % 3 = 0 GROUP BY 1
"""


@_prep13("wat_link_histogram", _WAT_ORACLE)
def q_wat_link_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink-count histogram through the REAL WAT path
    (sources/warc.py::metadata_to_records → string-JSON path pruning):
    every 3rd document plants a ``WARC-Type: metadata`` record whose
    payload is a Common-Crawl-shaped WAT envelope with ``doc_id % 4``
    links (the rest plant ``conversion`` records the projection must
    FILTER OUT); the link count comes from ``get_json_object`` with
    the hyphenated-key bracket path + ``json_array_length`` — the
    JSON stays a string, Spark prunes the parse to one path.  The
    oracle derives the histogram from the planting arithmetic and
    never touches JSON."""
    from clickhouse_table_copier_spark.sources.warc import (
        metadata_to_records,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    m3 = F.col("doc_id") % 3
    m4 = F.col("doc_id") % 4

    def _link(i: int):
        return F.concat(
            F.lit('{"url":"https://l'), did, F.lit(f"-{i}.example\"}}"),
        )

    def _arr(n: int):
        if n == 0:
            return F.lit("[]")
        parts = [F.lit("[")]
        for i in range(1, n + 1):
            if i > 1:
                parts.append(F.lit(","))
            parts.append(_link(i))
        parts.append(F.lit("]"))
        return F.concat(*parts)

    links = (
        F.when(m4 == 0, _arr(0))
        .when(m4 == 1, _arr(1))
        .when(m4 == 2, _arr(2))
        .otherwise(_arr(3))
    )
    wat_json = F.concat(
        F.lit('{"Envelope":{"Payload-Metadata":'
              '{"HTTP-Response-Metadata":{"HTML-Metadata":{"Links":'),
        links,
        F.lit("}}}}}"),
    )
    payload = F.when(m3 == 0, wat_json).otherwise(
        F.concat(F.lit("plain wet text "), did)
    )
    warc_rows = docs.select(
        F.lit("wat").alias("warc_file"),
        (F.col("doc_id") % 1000000).cast("int").alias("record_idx"),
        F.when(m3 == 0, F.lit("metadata"))
        .otherwise(F.lit("conversion"))
        .alias("warc_type"),
        F.concat(F.lit("https://u"), did).alias("target_uri"),
        F.lit("2026-08-16T00:00:00Z").alias("warc_date"),
        F.lit(None).cast("int").alias("http_status"),
        F.lit("application/json").alias("content_type"),
        F.encode(payload, "utf-8").alias("payload"),
    )
    recs = metadata_to_records(warc_rows)
    n_links = F.json_array_length(
        F.get_json_object(
            "meta_json",
            "$.Envelope['Payload-Metadata']['HTTP-Response-Metadata']"
            "['HTML-Metadata'].Links",
        )
    )
    return recs.select(
        n_links.cast("bigint").alias("n_links")
    ).groupBy("n_links").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
