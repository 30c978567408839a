"""Public Suffix List registrable-domain split: the publicsuffix.org
algorithm's own canonical cases (exceptions, wildcards, longest-match,
default rule) against a crafted rules file in the real format, plus the
zero-shuffle plan shape."""

import pyspark.sql.functions as F
import pytest

from clickhouse_table_copier_spark.operators.psl import (
    load_psl_rules,
    psl_registrable_domain,
)

# Driver-gate lane split (r17): SLOW lane (see pytest.ini) so the
# default gate completes inside the driver's verify budget; run with
#   python -m pytest tests/ -m slow -q
pytestmark = pytest.mark.slow

_PSL = """\
// ===BEGIN ICANN DOMAINS===

// com : registry operated by VeriSign
com

// uk : and its second levels
uk
co.uk

// jp : with the kobe wildcard block
jp
*.kobe.jp
!city.kobe.jp

// kawasaki : the real PSL carries BOTH a plain and a wildcard rule
// at the same key (ADVICE r10 regression)
kawasaki.jp
*.kawasaki.jp
!city.kawasaki.jp

// ck : everything is second-level except www
*.ck
!www.ck

// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
blogspot.com
// ===END PRIVATE DOMAINS===
"""


@pytest.fixture(scope="module")
def rules(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("psl") / "public_suffix_list.dat"
    p.write_text(_PSL)
    return load_psl_rules(spark, str(p)).cache()


def _reg(spark, rules, host):
    df = spark.createDataFrame([(host,)], "host string")
    return psl_registrable_domain(df, "host", rules).collect()[0]["domain"]


def test_rules_parse(rules):
    got = {
        r["key"]: (r["key_labels"], r["ps_labels"], r["is_exception"])
        for r in rules.collect()
    }
    assert got["com"] == (1, 1, False)
    assert got["co.uk"] == (2, 2, False)
    assert got["kobe.jp"] == (2, 3, False)  # *.kobe.jp: wildcard adds one
    assert got["city.kobe.jp"] == (3, 2, True)  # exception drops one
    assert got["kawasaki.jp"] == (2, 3, False)  # wildcard prevails in ps_labels
    assert got["ck"] == (1, 2, False)
    assert got["www.ck"] == (2, 1, True)
    assert got["blogspot.com"] == (2, 2, False)  # private section loads
    assert "" not in got  # comments/blank lines never become rules


def test_plain_rules(spark, rules):
    assert _reg(spark, rules, "example.com") == "example.com"
    assert _reg(spark, rules, "b.example.com") == "example.com"
    assert _reg(spark, rules, "sub.example.co.uk") == "example.co.uk"
    # longest match prevails: co.uk (2 labels) over uk (1)
    assert _reg(spark, rules, "example.co.uk") == "example.co.uk"


def test_public_suffix_itself_is_not_registrable(spark, rules):
    assert _reg(spark, rules, "com") is None
    assert _reg(spark, rules, "co.uk") is None
    assert _reg(spark, rules, "blogspot.com") is None


def test_wildcard_rules(spark, rules):
    # *.ck: example.ck IS a public suffix, one more label registers
    assert _reg(spark, rules, "example.ck") is None
    assert _reg(spark, rules, "a.example.ck") == "a.example.ck"
    assert _reg(spark, rules, "deep.a.example.ck") == "a.example.ck"
    # the wildcard's bare parent has no applicable rule: default '*'
    assert _reg(spark, rules, "ck") is None
    # *.kobe.jp coexists with plain jp
    assert _reg(spark, rules, "bar.kobe.jp") is None
    assert _reg(spark, rules, "x.bar.kobe.jp") == "x.bar.kobe.jp"
    assert _reg(spark, rules, "example.jp") == "example.jp"


def test_plain_plus_wildcard_same_key(spark, rules):
    """ADVICE r10: 'kawasaki.jp' + '*.kawasaki.jp' share one key; the
    one-row-per-key collapse must not lose the plain rule.  The host
    'kawasaki.jp' IS a public suffix (plain rule) → NULL, while the
    wildcard still governs one level down."""
    assert _reg(spark, rules, "kawasaki.jp") is None
    assert _reg(spark, rules, "a.kawasaki.jp") is None  # wildcard suffix
    assert _reg(spark, rules, "b.a.kawasaki.jp") == "b.a.kawasaki.jp"
    assert _reg(spark, rules, "city.kawasaki.jp") == "city.kawasaki.jp"
    assert _reg(spark, rules, "x.city.kawasaki.jp") == "city.kawasaki.jp"
    # ps_plain bookkeeping: set only where a plain rule exists
    got = {r["key"]: r["ps_plain"] for r in rules.collect()}
    assert got["kawasaki.jp"] == 2
    assert got["kobe.jp"] is None  # wildcard-only key
    assert got["com"] == 1


def test_exception_rules(spark, rules):
    assert _reg(spark, rules, "www.ck") == "www.ck"
    assert _reg(spark, rules, "foo.www.ck") == "www.ck"
    assert _reg(spark, rules, "city.kobe.jp") == "city.kobe.jp"
    assert _reg(spark, rules, "foo.city.kobe.jp") == "city.kobe.jp"


def test_default_rule_and_private_section(spark, rules):
    # unlisted TLD: the spec's implicit '*' rule — bare TLD is the suffix
    assert _reg(spark, rules, "example.unlisted") == "example.unlisted"
    assert _reg(spark, rules, "a.b.example.unlisted") == "example.unlisted"
    assert _reg(spark, rules, "unlisted") is None
    # private-section rule applies like any other
    assert _reg(spark, rules, "foo.blogspot.com") == "foo.blogspot.com"
    assert _reg(spark, rules, "x.foo.blogspot.com") == "foo.blogspot.com"


def test_null_and_case(spark, rules):
    df = spark.createDataFrame([(None,), ("SUB.Example.CO.UK",)], "host string")
    vals = [
        r["domain"]
        for r in psl_registrable_domain(df, "host", rules)
        .orderBy(F.col("host").asc_nulls_first())
        .collect()
    ]
    assert vals == [None, "example.co.uk"]


def test_zero_shuffles_on_the_url_stream(spark, rules):
    """The whole split must be map-side: broadcast joins only, no
    Exchange over the host frame."""
    df = spark.range(0, 1000).select(
        F.concat(F.lit("h"), F.col("id"), F.lit(".example.co.uk")).alias("host")
    )
    out = psl_registrable_domain(df, "host", rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    import re

    # the URL stream must never repartition: any hash/range Exchange in
    # the plan may only partition RULES-side columns (the one-time 15k-row
    # dedup groupBy), never the host frame's working columns
    for m in re.finditer(r"Exchange (?:hash|range)partitioning\(([^)]*)\)", plan):
        cols = m.group(1)
        assert "host" not in cols and "__psl_cand" not in cols, plan


def test_working_columns_are_collision_safe(spark, rules):
    df = spark.createDataFrame(
        [("example.com", "keep")], "host string, __psl_parts string"
    )
    out = psl_registrable_domain(df, "host", rules).collect()[0]
    assert out["domain"] == "example.com"
    assert out["__psl_parts"] == "keep"


def test_blocklist_filter_with_psl_rules(spark, rules):
    """filter_blocklisted(psl_rules=...) blocks at the TRUE registrable
    domain: a blogspot subdomain-site blocks without taking down every
    other blogspot site (the last-two-labels approximation would)."""
    from clickhouse_table_copier_spark.operators.urls import (
        filter_blocklisted,
    )

    df = spark.createDataFrame(
        [
            (1, "https://spam.blogspot.com/post/1"),
            (2, "https://nice.blogspot.com/post/2"),
            (3, "https://sub.example.co.uk/x"),
            (4, "https://other.co.uk/y"),
        ],
        "id long, url string",
    )
    bl = spark.createDataFrame(
        [("spam.blogspot.com",), ("example.co.uk",)], "domain string"
    )
    kept = sorted(
        r["id"] for r in filter_blocklisted(df, "url", bl, psl_rules=rules).collect()
    )
    assert kept == [2, 4]
    # without PSL, the approximation maps both blogspot sites to
    # blogspot.com and neither matches the subdomain-level blocklist
    kept_approx = sorted(
        r["id"] for r in filter_blocklisted(df, "url", bl).collect()
    )
    assert kept_approx == [1, 2, 4]
