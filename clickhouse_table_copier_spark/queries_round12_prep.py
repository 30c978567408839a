"""Round-12 registration batch, pre-written at round 11 (VERDICT r10
item 4): the SQL-expressible slice of the round-9c/10 ingest surface —
paragraph dedup, PSL registrable domains, canonical-URL dedup, and the
HTML-extraction quality funnel — implemented + DuckDB-hash-verified
since round 11 (tests/test_round12_prep.py runs the exact compare()
harness every CI run) and REGISTERED since round 12, exactly as the
module priced at creation: the r11 driver window was fully booked by
the DUE cohorts + the FIFO backlog (COVERAGE.md "Round-11 window"), so
these four names waited one round — the queries_round7_prep pattern —
and joined the registry (250 → 254) + the FRESH FIFO backlog at the
r12 flip.

Oracle strategy — every query PLANTS its own structured input from the
``documents`` fixture columns inside the query (both engines build the
identical raw input from doc_id arithmetic), then the Spark side runs
the REAL operator (paragraph hashing / PSL broadcast algorithm /
try_parse_url canonicalization / the mapInPandas HTML extractor) while
the oracle derives the expected answer CONSTRUCTIVELY from the planting
parameters — an independent derivation, not a SQL re-implementation of
the operator, so a Spark-side semantics bug cannot cancel out of both
sides.

Reference parity: none — north-star LLM-pipeline surface (SURVEY.md
§2.8); the reference engine (noperformance/clickhouse-table-copier)
reads SQL tables only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register

# name -> spark fn / oracle sql; consumed by tests/test_round12_prep.py
# and — SINCE ROUND 12 — mirrored into the main registry (the flip the
# module docstring priced; same pattern as queries_round7_prep).
PREP12_QUERIES: dict = {}
PREP12_ORACLES: dict[str, str] = {}


def _prep12(name: str, oracle: str):
    def deco(fn):
        PREP12_QUERIES[name] = fn
        PREP12_ORACLES[name] = oracle
        return register(name, oracle)(fn)

    return deco


# A fixed boilerplate paragraph planted into EVERY document (≥ 40 chars
# after whitespace collapse, so it passes the operator's min_len gate).
_BOILER = (
    "Subscribe to our newsletter for updates and follow the project "
    "for release announcements."
)

_PARA_ORACLE = f"""
WITH src AS (
  SELECT doc_id,
         substr(text, 1, 120) || chr(10) || chr(10) ||
         '{_BOILER}' || chr(10) || chr(10) ||
         substr(text, 121, 4000) AS ptext
  FROM documents
), paras AS (
  SELECT doc_id, regexp_replace(trim(p), '\\s+', ' ', 'g') AS pkey
  FROM src, UNNEST(regexp_split_to_array(ptext, '\\n\\s*\\n')) AS u(p)
  WHERE trim(p) <> '' AND length(trim(p)) >= 40
), dh AS (
  SELECT pkey, count(DISTINCT doc_id) AS nd FROM paras GROUP BY pkey
), per AS (
  SELECT p.doc_id,
         count(*)::BIGINT AS n_paras,
         sum(CASE WHEN dh.nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_paras
  FROM paras p JOIN dh USING (pkey) GROUP BY p.doc_id
)
SELECT d.doc_id,
       coalesce(per.n_paras, 0)::BIGINT AS n_paras,
       coalesce(per.n_dup_paras, 0)::BIGINT AS n_dup_paras,
       CASE WHEN coalesce(per.n_paras, 0) > 0
            THEN CAST(floor(per.n_dup_paras * 1000000.0 / per.n_paras)
                      AS BIGINT)
            ELSE 0 END AS dup_ratio_ppm
FROM documents d LEFT JOIN per USING (doc_id)
"""


@_prep12("paragraph_dedup_stats", _PARA_ORACLE)
def q_paragraph_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus paragraph-duplication ratio per document
    (operators/dedup.py::paragraph_dedup_stats — the boilerplate signal
    document-level dedup can't see).  The fixture's documents are
    single-line, so the query plants paragraph structure both engines
    can build identically: prefix ¶ + shared boilerplate ¶ + suffix ¶.
    The boilerplate paragraph lands in every document → duplicated
    everywhere; prefixes/suffixes duplicate only across the fixture's
    planted exact-duplicate documents.  The oracle groups by the
    whitespace-collapsed paragraph STRING — an independent equality
    notion the operator's xxhash64 must agree with."""
    from clickhouse_table_copier_spark.operators.dedup import (
        paragraph_dedup_stats,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 120),
            F.lit("\n\n" + _BOILER + "\n\n"),
            F.substring("text", 121, 4000),
        ).alias("ptext"),
    )
    return paragraph_dedup_stats(docs, "doc_id", "ptext", min_len=40)


# Pinned rules fixture: real-PSL shapes — plain, second-level, the
# plain+wildcard pair at one key (the ADVICE-r10 case), wildcard with
# exception, private-section rule, comments.
_PSL_FIXTURE = [
    "// fixture rules (publicsuffix.org format)",
    "com",
    "uk",
    "co.uk",
    "jp",
    "kawasaki.jp",
    "*.kawasaki.jp",
    "!city.kawasaki.jp",
    "*.ck",
    "!www.ck",
    "blogspot.com",
]

_PSL_ORACLE = """
WITH hosts AS (
  SELECT doc_id % 5 AS g, doc_id % 8 AS m FROM documents
), expected AS (
  SELECT CASE m
    WHEN 0 THEN 'site' || g || '.com'
    WHEN 1 THEN 'site' || g || '.co.uk'
    WHEN 2 THEN 'a' || g || '.example.ck'
    WHEN 3 THEN 'www.ck'
    WHEN 4 THEN NULL
    WHEN 5 THEN NULL
    WHEN 6 THEN 'b.x' || g || '.kawasaki.jp'
    WHEN 7 THEN 'blog' || g || '.blogspot.com'
  END AS domain
  FROM hosts
)
SELECT domain, count(*)::BIGINT AS n_hosts
FROM expected GROUP BY domain
"""


@_prep12("psl_domain_histogram", _PSL_ORACLE)
def q_psl_domain_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain histogram through the FULL publicsuffix.org
    algorithm (operators/psl.py — per-depth broadcast joins, zero
    shuffles on the host stream) over hosts planted from doc_id
    arithmetic: plain suffixes, a second-level suffix, a wildcard with
    its exception, the plain+wildcard same-key pair ('kawasaki.jp' is
    itself a public suffix → NULL), and a private-section rule.  The
    oracle never runs the PSL algorithm — it states the expected
    registrable domain per planted branch."""
    from clickhouse_table_copier_spark.operators.psl import (
        psl_registrable_domain,
        rules_from_lines,
    )

    docs = _t(spark, sf_dir, "documents")
    g = (F.col("doc_id") % 5).cast("string")
    m = F.col("doc_id") % 8
    host = (
        F.when(m == 0, F.concat(F.lit("site"), g, F.lit(".com")))
        .when(m == 1, F.concat(F.lit("sub.site"), g, F.lit(".co.uk")))
        .when(m == 2, F.concat(F.lit("deep.a"), g, F.lit(".example.ck")))
        .when(m == 3, F.lit("www.ck"))
        .when(m == 4, F.lit("kawasaki.jp"))
        .when(m == 5, F.concat(F.lit("x"), g, F.lit(".kawasaki.jp")))
        .when(m == 6, F.concat(F.lit("b.x"), g, F.lit(".kawasaki.jp")))
        .otherwise(F.concat(F.lit("blog"), g, F.lit(".blogspot.com")))
    )
    hosts = docs.select(host.alias("host"))
    rules = rules_from_lines(spark, _PSL_FIXTURE)
    with_dom = psl_registrable_domain(hosts, "host", rules)
    return with_dom.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hosts")
    )


_CANON_ORACLE = """
WITH raw AS (
  SELECT doc_id,
    doc_id % 10 AS h, doc_id % 20 AS p, doc_id % 5 AS v,
    CASE doc_id % 5
      WHEN 0 THEN 'https://site' || (doc_id % 10) || '.example.com/path/'
                  || (doc_id % 20)
      WHEN 1 THEN 'HTTPS://SITE' || (doc_id % 10) || '.EXAMPLE.COM:443/path/'
                  || (doc_id % 20)
      WHEN 2 THEN 'https://site' || (doc_id % 10) || '.example.com/path/'
                  || (doc_id % 20) || '?utm_source=feed&gclid=abc123'
      WHEN 3 THEN 'https://site' || (doc_id % 10) || '.example.com/path/'
                  || (doc_id % 20) || '#section-2'
      WHEN 4 THEN 'https://site' || (doc_id % 10) || '.example.com/path/'
                  || (doc_id % 20) || '/'
    END AS url
  FROM documents
)
SELECT
  'https://site' || h || '.example.com/path/' || p AS canonical,
  count(*)::BIGINT AS n_urls,
  count(DISTINCT url)::BIGINT AS n_raw_variants
FROM raw GROUP BY 1
"""


@_prep12("canonical_url_dedup_stats", _CANON_ORACLE)
def q_canonical_url_dedup_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """URL canonicalization as a dedup key (operators/urls.py::
    canonical_url — try_parse_url based): five planted variants of each
    page URL — already-canonical, uppercase scheme/host + default :443,
    tracking-params-only query, fragment, trailing slash — must all
    collapse to ONE canonical form.  The Spark side PARSES; the oracle
    states the expected canonical constructively."""
    from clickhouse_table_copier_spark.operators.urls import canonical_url

    docs = _t(spark, sf_dir, "documents")
    h = (F.col("doc_id") % 10).cast("string")
    p = (F.col("doc_id") % 20).cast("string")
    v = F.col("doc_id") % 5
    base = F.concat(
        F.lit("https://site"), h, F.lit(".example.com/path/"), p
    )
    base_upper = F.concat(
        F.lit("HTTPS://SITE"), h, F.lit(".EXAMPLE.COM:443/path/"), p
    )
    url = (
        F.when(v == 0, base)
        .when(v == 1, base_upper)
        .when(v == 2, F.concat(base, F.lit("?utm_source=feed&gclid=abc123")))
        .when(v == 3, F.concat(base, F.lit("#section-2")))
        .otherwise(F.concat(base, F.lit("/")))
    )
    urls = docs.select(url.alias("url"))
    return (
        urls.select(canonical_url("url").alias("canonical"), "url")
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.count_distinct("url").cast("bigint").alias("n_raw_variants"),
        )
    )


_FUNNEL_ORACLE = """
WITH ext AS (
  SELECT doc_id, source,
         regexp_replace(trim(text), '\\s+', ' ', 'g') AS etext
  FROM documents
)
SELECT source,
  count(*)::BIGINT AS n_docs,
  sum(CASE WHEN etext <> '' THEN 1 ELSE 0 END)::BIGINT AS extracted,
  sum(CASE WHEN etext <> '' AND length(etext) >= 100
      THEN 1 ELSE 0 END)::BIGINT AS long_enough,
  sum(CASE WHEN etext <> '' AND length(etext) >= 100
            AND length(etext) - length(replace(etext, ' ', '')) + 1 >= 30
      THEN 1 ELSE 0 END)::BIGINT AS wordy,
  sum(2)::BIGINT AS n_chrome_blocks_dropped
FROM ext GROUP BY source
"""


@_prep12("extracted_text_funnel", _FUNNEL_ORACLE)
def q_extracted_text_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality funnel over text that went through the REAL HTML
    extractor (operators/html_extract.py, the mapInPandas
    block-segmentation path): each document is wrapped in a page with
    <nav> and <footer> chrome, extracted, then counted through
    cumulative stages (extracted non-empty → ≥100 chars → ≥30 words)
    per source.  The oracle derives the expected extracted text
    constructively (the planted page's only content block is the
    document text, whitespace-collapsed) and expects exactly 2 dropped
    chrome blocks per page — if the extractor kept the nav/footer or
    mangled the prose, every stage count shifts."""
    from clickhouse_table_copier_spark.operators.html_extract import (
        extract_html_text,
    )

    docs = _t(spark, sf_dir, "documents")
    html = docs.select(
        "doc_id",
        F.concat(
            F.lit(
                "<html><head><title>Doc</title></head><body>"
                "<nav>Home | About | Contact</nav><p>"
            ),
            F.col("text"),
            F.lit(
                "</p><footer>Copyright notice and footer boilerplate"
                " text for every page</footer></body></html>"
            ),
        ).alias("html"),
    )
    ext = extract_html_text(html, "html", "doc_id")
    joined = docs.select("doc_id", "source").join(ext, "doc_id")
    etext = F.coalesce(F.col("text"), F.lit(""))
    s_extracted = etext != ""
    s_long = s_extracted & (F.length(etext) >= 100)
    s_wordy = s_long & (F.size(F.split(etext, " ")) >= 30)
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(s_extracted.cast("int")).cast("bigint").alias("extracted"),
        F.sum(s_long.cast("int")).cast("bigint").alias("long_enough"),
        F.sum(s_wordy.cast("int")).cast("bigint").alias("wordy"),
        F.sum("n_blocks_dropped")
        .cast("bigint")
        .alias("n_chrome_blocks_dropped"),
    )
