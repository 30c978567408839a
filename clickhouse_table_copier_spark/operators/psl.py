"""Public Suffix List registrable-domain split — the broadcast-table
swap-in :mod:`operators.urls` documents.

``url_domain`` approximates the registrable domain with last-two-labels
plus a small hardcoded second-level-suffix set; real crawls hit the
long tail (``*.ck`` wildcards, ``!www.ck`` exceptions, four-label
suffixes like ``pref.hokkaido.jp``).  This module implements the FULL
publicsuffix.org algorithm over a user-supplied rules file:

- :func:`load_psl_rules` — parse the public PSL file format (one rule
  per line, ``//`` comments, blank lines, ``*.`` wildcards, ``!``
  exceptions; the ICANN/PRIVATE section markers are ordinary comments)
  into a rules DataFrame.
- :func:`psl_registrable_domain` — append the registrable domain for a
  host column, exactly per the published algorithm: among matching
  rules an EXCEPTION wins outright (its public suffix is the rule minus
  its leftmost label), otherwise the rule with the most labels prevails
  (a ``*.`` wildcard counts one label more than its literal key), no
  match defaults to the bare TLD; the registrable domain is the public
  suffix plus one preceding label, NULL when the host IS a public
  suffix (nothing is registrable at ``co.uk`` itself).

Scale shape (100 TB): the PSL is ~15k rules — broadcast-sized.  For
each rule-key depth k (1..max label count over rules, collected once as
metadata) the host's last-k-labels string LEFT-BROADCAST-joins the
depth-k rule slice; every join is map-side, so the whole split is ZERO
shuffles over the URL stream — one codegen'd projection sandwiched by
broadcast hash joins, the same plan family as ``filter_blocklisted``.
No explode (a 5-way row fan-out would quintuple the stream before a
regrouping shuffle), no Python.

Reference parity: none — north-star LLM-pipeline surface (SURVEY.md
§2.8); the reference engine (noperformance/clickhouse-table-copier)
reads SQL tables only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RULES_SCHEMA = T.StructType(
    [
        # join key: the rule text without any '!' / '*.' marker
        T.StructField("key", T.StringType()),
        # labels in the key (the join depth bucket)
        T.StructField("key_labels", T.IntegerType()),
        # labels in the PUBLIC SUFFIX this rule implies when it prevails
        # (wildcard: key_labels + 1; exception: key_labels - 1)
        T.StructField("ps_labels", T.IntegerType()),
        # the PLAIN rule's implied suffix size when the key carries BOTH
        # a plain and a wildcard rule (real PSL: 'kawasaki.jp' AND
        # '*.kawasaki.jp'); NULL when no plain rule exists at this key.
        # Kept separately so the one-row-per-key broadcast invariant
        # holds without losing the plain rule (ADVICE r10)
        T.StructField("ps_plain", T.IntegerType()),
        T.StructField("is_exception", T.BooleanType()),
    ]
)


def load_psl_rules(spark: SparkSession, path: str) -> DataFrame:
    """Parse a Public Suffix List file (the exact format published at
    publicsuffix.org/list) into the rules frame
    :func:`psl_registrable_domain` consumes.

    Format handled: one rule per line; everything from ``//`` is
    comment (the ICANN/PRIVATE DOMAINS section markers are comments
    too — both sections load; pre-filter the file if only ICANN rules
    are wanted); blank lines skipped; rules lowercased; a leading
    ``*.`` marks a wildcard (matches exactly ONE extra label), a
    leading ``!`` an exception to a wildcard.  Parsing is a Spark text
    scan + Column ops — the file may itself live on the cluster store.
    """
    lines = spark.read.text(path).select(
        F.lower(F.trim(F.col("value"))).alias("raw")
    )
    return _parse_rule_lines(lines)


def rules_from_lines(spark: SparkSession, rules: list[str]) -> DataFrame:
    """Rules frame from an in-memory list (one PSL-format rule or
    comment per element) — the fixture path for self-contained oracled
    queries and tests; identical parse/collapse semantics to
    :func:`load_psl_rules`."""
    lines = spark.createDataFrame(
        [(r,) for r in rules], "value string"
    ).select(F.lower(F.trim(F.col("value"))).alias("raw"))
    return _parse_rule_lines(lines)


def _parse_rule_lines(lines: DataFrame) -> DataFrame:
    rules = lines.where(
        (F.col("raw") != "") & ~F.col("raw").startswith("//")
    ).select(
        # the spec: anything after whitespace is ignorable
        F.split(F.col("raw"), "\\s+").getItem(0).alias("rule")
    )
    is_exc = F.col("rule").startswith("!")
    is_wild = F.col("rule").startswith("*.")
    key = F.when(is_exc, F.expr("substring(rule, 2)")).when(
        is_wild, F.expr("substring(rule, 3)")
    ).otherwise(F.col("rule"))
    key_labels = F.size(F.split(key, "\\."))
    ps_labels = (
        F.when(is_exc, key_labels - 1)
        .when(is_wild, key_labels + 1)
        .otherwise(key_labels)
    )
    parsed = rules.select(
        key.alias("key"),
        key_labels.cast("int").alias("key_labels"),
        ps_labels.cast("int").alias("ps_labels"),
        is_exc.alias("is_exception"),
    )
    # ONE row per key, so the per-depth broadcast joins can never fan
    # out the URL stream: a duplicated rule collapses; a key that is
    # both a plain rule and (pathologically) an exception keeps the
    # exception's semantics (spec: exception outranks everything); a
    # plain/wildcard key collision keeps the larger implied suffix in
    # ps_labels (spec: most labels prevails) AND the plain rule's size
    # in ps_plain — the real PSL carries pairs like 'kawasaki.jp' +
    # '*.kawasaki.jp', and dropping the plain row made the host
    # 'kawasaki.jp' registrable when the spec says it is itself a
    # public suffix (ADVICE r10); psl_registrable_domain falls back to
    # ps_plain when the wildcard's extra label isn't there
    return parsed.groupBy("key", "key_labels").agg(
        F.max("is_exception").alias("is_exception"),
        F.coalesce(
            F.max(F.when(F.col("is_exception"), F.col("ps_labels"))),
            F.max(F.when(~F.col("is_exception"), F.col("ps_labels"))),
        ).alias("ps_labels"),
        F.max(
            F.when(
                ~F.col("is_exception")
                & (F.col("ps_labels") == F.col("key_labels")),
                F.col("ps_labels"),
            )
        ).cast("int").alias("ps_plain"),
    ).select("key", "key_labels", "ps_labels", "ps_plain", "is_exception")


def _last_k_labels(parts: Column, n: Column, k: int) -> Column:
    """Dot-joined last ``k`` labels of a split host, NULL when the host
    has fewer than ``k`` labels (no candidate at that depth)."""
    return F.when(n >= k, F.concat_ws(".", F.slice(parts, -k, k)))


def psl_registrable_domain(
    df: DataFrame,
    host_col: str,
    rules: DataFrame,
    out_col: str = "domain",
) -> DataFrame:
    """Append ``out_col`` = the PSL registrable domain of ``host_col``.

    One LEFT broadcast join per rule-key depth (depth count collected
    once from the broadcast-sized rules frame — metadata, not data),
    then a pure-Column precedence fold: exception beats all (public
    suffix = exception key minus its leftmost label), else the largest
    implied ``ps_labels`` among matches, else 1 (the spec's ``*``
    default rule).  Registrable = last ``ps_labels + 1`` labels; NULL
    when the host is itself a public suffix or NULL.  Zero shuffles on
    ``df``; working columns are collision-safe generated names."""
    depths = [
        int(r["key_labels"])
        for r in rules.select("key_labels").distinct().collect()
    ]
    if not depths:
        raise ValueError("psl_registrable_domain: empty rules frame")

    pfx = "__psl"
    while any(c.startswith(pfx) for c in df.columns):
        pfx += "_"

    host = F.lower(F.col(host_col))
    parts = F.split(host, "\\.")
    n = F.size(parts)
    out = df.withColumn(f"{pfx}_parts", parts).withColumn(f"{pfx}_n", n)

    match_cols = []
    for k in sorted(depths):
        cand = _last_k_labels(F.col(f"{pfx}_parts"), F.col(f"{pfx}_n"), k)
        out = out.withColumn(f"{pfx}_cand{k}", cand)
        slice_k = (
            rules.where(F.col("key_labels") == k)
            .select(
                F.col("key").alias(f"{pfx}_cand{k}"),
                F.col("ps_labels").alias(f"{pfx}_ps{k}"),
                F.col("ps_plain").alias(f"{pfx}_psp{k}"),
                F.col("is_exception").alias(f"{pfx}_exc{k}"),
            )
        )
        out = out.join(F.broadcast(slice_k), on=f"{pfx}_cand{k}", how="left")
        match_cols.append(k)

    # precedence fold: any exception match wins; a wildcard rule only
    # applies when the host actually HAS the extra label it consumes
    # (key match at depth k with ps k+1 needs n >= k+1 to name a public
    # suffix of the host; with n == k the host sits UNDER the wildcard's
    # literal key, which the spec still treats as matching the wildcard
    # — e.g. host "ck" under "*.ck" — public suffix then falls back to
    # the longest plain candidate, here the default rule)
    nn = F.col(f"{pfx}_n")
    exc_ps = F.coalesce(
        *[
            F.when(F.col(f"{pfx}_exc{k}"), F.col(f"{pfx}_ps{k}"))
            for k in match_cols
        ],
        F.lit(None).cast("int"),
    )
    # per depth, two candidates: the prevailing (possibly wildcard)
    # suffix size when the host is deep enough to supply the wildcard's
    # extra label, else the key's PLAIN rule size when one exists — a
    # 'kawasaki.jp'/'*.kawasaki.jp' pair must answer ps=2 for the host
    # 'kawasaki.jp' itself (a matched key always has key_labels <= n,
    # so ps_plain needs no depth guard)
    plain_ps = F.greatest(
        *[
            F.coalesce(
                F.when(
                    ~F.col(f"{pfx}_exc{k}")
                    & (F.col(f"{pfx}_ps{k}") <= nn),
                    F.col(f"{pfx}_ps{k}"),
                ),
                F.when(~F.col(f"{pfx}_exc{k}"), F.col(f"{pfx}_psp{k}")),
                F.lit(0),
            )
            for k in match_cols
        ],
        F.lit(1),  # the spec's implicit '*' default: bare TLD
    )
    ps = F.coalesce(exc_ps, plain_ps)
    # registrable = last (ps + 1) labels = slice(parts, n − ps, ps + 1);
    # F.slice takes Column start/length since Spark 3.1
    reg = F.when(
        nn >= ps + 1,
        F.array_join(F.slice(F.col(f"{pfx}_parts"), nn - ps, ps + 1), "."),
    )
    out = out.withColumn(out_col, reg)
    drop = [f"{pfx}_parts", f"{pfx}_n"] + [
        c
        for k in match_cols
        for c in (
            f"{pfx}_cand{k}",
            f"{pfx}_ps{k}",
            f"{pfx}_psp{k}",
            f"{pfx}_exc{k}",
        )
    ]
    return out.drop(*drop)
