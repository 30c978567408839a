"""robots.txt (RFC 9309): parsing, group selection, longest-match
precedence, wildcards/anchors, and the URL-stream filter's plan
shape."""

import pyspark.sql.functions as F
import pytest

from clickhouse_table_copier_spark.operators.robots import (
    filter_robots_allowed,
    parse_robots,
    robots_directives,
)

_ROBOTS_A = """\
# example.com policy
User-agent: *
Disallow: /private/
Allow: /private/press/
Disallow: /*.pdf$
Crawl-delay: 2

User-agent: researchbot
User-agent: otherbot
Disallow: /no-research/
Allow: /

Sitemap: https://a.example/sitemap.xml
"""

_ROBOTS_B = """\
User-agent: *
Disallow: /
Allow: /pub
"""


@pytest.fixture(scope="module")
def rules(spark):
    df = spark.createDataFrame(
        [("a.example", _ROBOTS_A), ("b.example", _ROBOTS_B)],
        "host string, body string",
    )
    return parse_robots(df, "host", "body").cache()


def _allowed(spark, rules, url, agent="*"):
    df = spark.createDataFrame([(url,)], "url string")
    out = filter_robots_allowed(df, "url", rules, agent=agent)
    return out.collect()[0]["robots_allowed"]


def test_parse_rules(rules):
    got = {
        (r["host"], r["agent"], r["pattern"]): (
            r["is_allow"],
            r["has_wildcard"],
        )
        for r in rules.collect()
    }
    assert got[("a.example", "*", "/private/")] == (False, False)
    assert got[("a.example", "*", "/private/press/")] == (True, False)
    assert got[("a.example", "*", "/*.pdf$")] == (False, True)
    # consecutive User-agent lines share the group's rules
    assert ("a.example", "researchbot", "/no-research/") in got
    assert ("a.example", "otherbot", "/no-research/") in got


def test_longest_match_and_allow_tie(spark, rules):
    # /private/press/ (15 octets, allow) beats /private/ (9, disallow)
    assert _allowed(spark, rules, "https://a.example/private/press/x") is True
    assert _allowed(spark, rules, "https://a.example/private/other") is False
    assert _allowed(spark, rules, "https://a.example/public/page") is True


def test_wildcard_and_anchor(spark, rules):
    assert _allowed(spark, rules, "https://a.example/docs/file.pdf") is False
    # $ anchors: .pdf mid-path does not match
    assert _allowed(spark, rules, "https://a.example/x.pdf/view") is True


def test_group_selection(spark, rules):
    # researchbot's own group: / allow (1 octet) vs /no-research/
    assert (
        _allowed(spark, rules, "https://a.example/no-research/x",
                 agent="researchbot") is False
    )
    # its Allow: / group overrides the *-group's /private/ disallow
    assert (
        _allowed(spark, rules, "https://a.example/private/x",
                 agent="researchbot") is True
    )
    # product-token substring match: researchbot/1.2 picks the group
    assert (
        _allowed(spark, rules, "https://a.example/no-research/x",
                 agent="researchbot/1.2") is False
    )
    # unknown agent falls back to *
    assert (
        _allowed(spark, rules, "https://a.example/private/x",
                 agent="unknownbot") is False
    )


def test_disallow_all_with_carveout(spark, rules):
    assert _allowed(spark, rules, "https://b.example/") is False
    assert _allowed(spark, rules, "https://b.example/pub/page") is True
    # query string is part of the match target
    assert _allowed(spark, rules, "https://b.example/pub?x=1") is True


def test_unknown_host_and_unparseable_urls_are_allowed(spark, rules):
    assert _allowed(spark, rules, "https://nothing.example/x") is True
    assert _allowed(spark, rules, "not a url at all") is True


def test_directives(spark):
    df = spark.createDataFrame(
        [("a.example", _ROBOTS_A)], "host string, body string"
    )
    got = {
        (r["directive"], r["agent"]): r["value"]
        for r in robots_directives(df, "host", "body").collect()
    }
    assert got[("crawl_delay", "*")] == "2"
    assert got[("sitemap", None)] == "https://a.example/sitemap.xml"


def test_original_columns_and_rowcount_preserved(spark, rules):
    df = spark.createDataFrame(
        [(i, f"https://b.example/{'pub/' if i % 2 else 'x/'}{i}")
         for i in range(50)],
        "id long, url string",
    )
    out = filter_robots_allowed(df, "url", rules)
    assert out.columns == ["id", "url", "robots_allowed"]
    rows = out.collect()
    assert len(rows) == 50  # one row per URL, no fan-out residue
    for r in rows:
        assert r["robots_allowed"] is (r["id"] % 2 == 1)


def test_rules_join_is_broadcast(spark, rules):
    df = spark.range(0, 100).select(
        F.concat(F.lit("https://a.example/p"), F.col("id")).alias("url")
    )
    plan = (
        filter_robots_allowed(df, "url", rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_warc_robots_end_to_end(spark, tmp_path):
    """The crawl integration: robots.txt fetched IN the crawl gates the
    crawl's own URLs — WARC shard → responses_to_robots →
    parse_robots → filter_robots_allowed."""
    from clickhouse_table_copier_spark.sources.warc import (
        read_warc,
        responses_to_robots,
    )
    from tests.test_warc import _record

    robots = b"User-agent: *\nDisallow: /secret/\n"
    recs = [
        _record(
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "https://c.example/robots.txt",
                "WARC-Date": "2026-08-15T00:00:00Z",
            },
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + robots,
        ),
        _record(
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "https://c.example/secret/page",
                "WARC-Date": "2026-08-15T00:00:01Z",
            },
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>x</p>",
        ),
        _record(
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "https://c.example/open/page",
                "WARC-Date": "2026-08-15T00:00:02Z",
            },
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>y</p>",
        ),
    ]
    p = tmp_path / "crawl.warc"
    p.write_bytes(b"".join(recs))
    warc = read_warc(spark, str(p))
    rules = parse_robots(responses_to_robots(warc), "host", "body")
    pages = warc.where(
        (F.col("warc_type") == "response")
        & F.lower(F.col("content_type")).startswith("text/html")
    ).select(F.col("target_uri").alias("url"))
    got = {
        r["url"]: r["robots_allowed"]
        for r in filter_robots_allowed(pages, "url", rules).collect()
    }
    assert got == {
        "https://c.example/secret/page": False,
        "https://c.example/open/page": True,
    }


_SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example/one</loc><lastmod>2026-01-01</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc> https://a.example/two </loc></url>
  <url><priority>broken</priority><loc>https://a.example/three</loc></url>
</urlset>
"""

_SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example/sitemap-1.xml.gz</loc></sitemap>
  <sitemap><loc>https://a.example/sitemap-2.xml.gz</loc></sitemap>
</sitemapindex>
"""


def test_parse_sitemaps(spark):
    import gzip

    from clickhouse_table_copier_spark.operators.robots import (
        parse_sitemaps,
    )

    malformed = b"<urlset><url><loc>https://m.example/x</loc></url>"  # no close
    df = spark.createDataFrame(
        [
            ("a.example", bytearray(_SITEMAP.encode())),
            ("a.example", bytearray(gzip.compress(_SITEMAP_INDEX.encode()))),
            ("m.example", bytearray(malformed)),
        ],
        "host string, body binary",
    )
    rows = parse_sitemaps(df, "host", "body").collect()
    by_loc = {r["loc"]: r for r in rows}
    assert by_loc["https://a.example/one"]["kind"] == "urlset"
    assert by_loc["https://a.example/one"]["lastmod"] == "2026-01-01"
    assert by_loc["https://a.example/one"]["priority"] == 0.8
    assert by_loc["https://a.example/two"]["lastmod"] is None  # trimmed loc
    assert by_loc["https://a.example/three"]["priority"] is None  # bad float
    # gzipped sitemapindex member
    assert by_loc["https://a.example/sitemap-1.xml.gz"]["kind"] == "sitemapindex"
    # malformed XML: regex salvage still yields the URL
    assert by_loc["https://m.example/x"]["kind"] == "urlset"
    assert len(rows) == 6


def test_bom_prefixed_robots_first_group_parses():
    """A UTF-8 BOM before the first User-agent line must not drop the
    group (review finding): a BOM'd full-site Disallow previously
    parsed to ZERO rules, classifying every URL allowed."""
    from clickhouse_table_copier_spark.operators.robots import _parse_one

    rules, _ = _parse_one("h", "﻿User-agent: *\nDisallow: /\n")
    assert len(rules) == 1
    host, agent, is_allow, pattern = rules[0][:4]
    assert (agent, is_allow, pattern) == ("*", False, "/")


def test_empty_user_agent_value_ignored():
    """'User-agent:' with an empty product token is invalid per RFC
    9309 — registering '' would match EVERY crawler and suppress the
    legitimate '*' group (review finding)."""
    from clickhouse_table_copier_spark.operators.robots import _parse_one

    rules, _ = _parse_one(
        "h", "User-agent:\nDisallow: /\nUser-agent: *\nAllow: /\n"
    )
    agents = {r[1] for r in rules}
    assert agents == {"*"}
    assert all(r[2] for r in rules)  # only the Allow survived


# ---------------------------------------------- RFC 9309 §2.2.2 octets


_ROBOTS_ENC = (
    "User-agent: *\n"
    "Disallow: /foo/bar?baz=https://foo.bar\n"   # literal reserved
    "Disallow: /tsu/ツ\n"                      # raw non-ASCII
    "Disallow: /enc/%E3%83%84\n"                  # encoded non-ASCII
    "Disallow: /low/%e3%83%84\n"                  # lowercase hex
    "Disallow: /unres/%62%61%7A\n"                # encoded unreserved
    "Disallow: /meta/%2A/\n"                      # encoded asterisk
)


@pytest.fixture(scope="module")
def enc_rules(spark):
    df = spark.createDataFrame(
        [("e.example", _ROBOTS_ENC)], "host string, body string"
    )
    return parse_robots(df, "host", "body").cache()


def test_rfc_9309_example_table(spark, enc_rules):
    """The normalization rows from RFC 9309 §2.2.2's own example
    table, both directions."""
    # literal reserved chars in the rule match the %-encoded URI
    assert _allowed(
        spark, enc_rules,
        "https://e.example/foo/bar?baz=https%3A%2F%2Ffoo.bar",
    ) is False
    # ... and the literal URI
    assert _allowed(
        spark, enc_rules,
        "https://e.example/foo/bar?baz=https://foo.bar",
    ) is False
    # raw ツ in the rule matches the %E3%83%84 URI and vice versa
    assert _allowed(
        spark, enc_rules, "https://e.example/tsu/%E3%83%84x"
    ) is False
    assert _allowed(
        spark, enc_rules, "https://e.example/enc/ツx"
    ) is False
    # lowercase hex canonicalizes
    assert _allowed(
        spark, enc_rules, "https://e.example/low/%E3%83%84"
    ) is False
    assert _allowed(
        spark, enc_rules, "https://e.example/enc/%e3%83%84"
    ) is False
    # %-encoded UNRESERVED octets do NOT decode: %62%61%7A is not baz
    assert _allowed(
        spark, enc_rules, "https://e.example/unres/baz"
    ) is True
    assert _allowed(
        spark, enc_rules, "https://e.example/unres/%62%61%7A"
    ) is False


def test_encoded_asterisk_is_not_a_wildcard(spark, enc_rules):
    """%2A in a rule is a literal asterisk octet — it must match a
    literal * in the target and must NOT wildcard-match arbitrary
    runs."""
    assert _allowed(
        spark, enc_rules, "https://e.example/meta/*/page"
    ) is False
    assert _allowed(
        spark, enc_rules, "https://e.example/meta/%2A/page"
    ) is False
    assert _allowed(
        spark, enc_rules, "https://e.example/meta/anything/page"
    ) is True


def test_equivalent_spellings_tie_in_precedence(enc_rules):
    """ツ and %E3%83%84 spell the same octets, so their canonical
    pattern_octets must be EQUAL (longest-match precedence cannot
    depend on the spelling the webmaster chose)."""
    rows = {r["pattern"]: r["pattern_octets"] for r in enc_rules.collect()}
    tsu = [v for k, v in rows.items() if k.startswith("/tsu/")]
    enc = [v for k, v in rows.items() if k.startswith("/enc/")]
    low = [v for k, v in rows.items() if k.startswith("/low/")]
    assert tsu and enc and low
    # identical suffix octets → per-pattern totals differ only by the
    # fixed prefix length difference (/tsu/ vs /enc/ vs /low/ are all
    # 5 chars) — so all three totals are equal
    assert tsu[0] == enc[0] == low[0]


def test_normalization_stage_adds_no_shuffle(spark, enc_rules):
    """The target-normalization Arrow stage must not introduce an
    Exchange on the URL stream — still one broadcast join + one
    grouped aggregate on the synthetic row id."""
    df = spark.range(0, 64).select(
        F.concat(F.lit("https://e.example/p%20"), F.col("id")).alias("url")
    )
    plan = (
        filter_robots_allowed(df, "url", enc_rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" in plan  # the vectorized normalize stage


def test_normalize_octets_properties():
    """RFC 9309 canonicalization invariants: idempotent, identity on
    plain ASCII paths, and spelling-independent (a string and its
    fully-%-encoded spelling normalize identically for reserved and
    non-ASCII octets)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from clickhouse_table_copier_spark.operators.robots import (
        _normalize_octets,
    )

    @given(st.text(max_size=60))
    @settings(max_examples=200, deadline=None)
    def idempotent(s):
        once = _normalize_octets(s)
        assert _normalize_octets(once) == once

    idempotent()

    @given(
        st.text(
            alphabet=(
                "abcdefghijklmnopqrstuvwxyz"
                "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-._~"
            ),
            max_size=60,
        )
    )
    @settings(max_examples=100, deadline=None)
    def ascii_unreserved_identity(s):
        assert _normalize_octets(s) == s

    ascii_unreserved_identity()

    # reserved + non-ASCII: literal vs encoded spellings converge
    @given(st.text(alphabet=":/?#[]@!&'()+,;=ツé中", max_size=30))
    @settings(max_examples=100, deadline=None)
    def spelling_independent(s):
        encoded = "".join(
            f"%{b:02x}" for b in s.encode("utf-8")
        )  # lowercase hex on purpose
        assert _normalize_octets(s) == _normalize_octets(encoded)

    spelling_independent()
