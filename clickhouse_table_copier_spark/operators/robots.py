"""robots.txt parsing + URL filtering (RFC 9309, the Robots Exclusion
Protocol) — the crawl-curation gate that sits beside the WARC ingest
and URL operators: a corpus pipeline that republishes or re-crawls
needs "was this URL disallowed?" as a first-class column.

Two stages, mirroring the PSL design:

- :func:`parse_robots` — robots.txt BODIES → a rules frame
  ``(host, agent, is_allow, pattern, pattern_octets, regex,
  has_wildcard)``.  Line grouping is stateful (consecutive
  ``User-agent`` lines share the following rules), so parsing runs in
  the Arrow-batched ``mapInPandas`` edge like every bytes→rows stage
  here; robots bodies are KB-sized, one pass each.  ``Crawl-delay``
  and ``Sitemap`` lines surface via :func:`robots_directives`.
- :func:`filter_robots_allowed` — URL stream × rules: RFC 9309 group
  selection (a group for the product token beats the ``*`` group;
  no group ⇒ allowed), longest-match precedence in PATTERN OCTETS,
  allow wins ties, no matching rule ⇒ allowed.

  Precedence-length divergence from google/robotstxt (DELIBERATE,
  ADVICE r12): this module counts octets of the §2.2.2 CANONICAL
  form (``pattern_octets = len(norm)``, where non-ASCII octets are
  %XX triples), so equivalent spellings always score identically —
  ``ツ`` and ``%E3%83%84`` tie EXACTLY (a property the registered
  ``robots_allowed_rate`` oracle pins).  Google's robots.cc counts
  the pattern bytes AS GIVEN, so there ``ツ`` scores 3 and
  ``%E3%83%84`` scores 9: mixed ASCII/non-ASCII rule sets can rank
  differently here than under the de-facto reference matcher.
  Canonical-space counting is kept because spelling-invariance is
  the stronger RFC-faithful property (the RFC compares both sides
  in the same normalized octet space).  ``*`` wildcards and
  the ``$`` end anchor translate to anchored Java regexes ONCE in the
  (small) rules frame; literal prefix rules — the overwhelming
  majority — take a ``startswith`` fast path so the per-URL work
  stays codegen-friendly.

Scale shape (100 TB of URLs): the rules frame is per-HOST metadata —
a few dozen rows per host — joined on the host key.  The URL stream
fans out only to that host's candidate rules and aggregates straight
back to one row per URL (max over a (octets, is_allow) struct — the
RFC's precedence as one lexicographic max, no window).  Broadcast the
rules when they fit; a million-host rules frame shuffle-joins on host
with the same bounded fan-out.  Percent-encoding normalization
(RFC 9309 §2.2.2, the round-11 documented seam) is closed in r12:
patterns canonicalize at parse time, targets through a vectorized
Arrow stage whose slow path touches only URLs that actually contain
``%``/``*``/``$``/non-ASCII octets.

Reference parity: none — north-star LLM-pipeline surface (SURVEY.md
§2.8); the reference engine reads SQL tables only.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("agent", T.StringType()),
        T.StructField("is_allow", T.BooleanType()),
        T.StructField("pattern", T.StringType()),
        T.StructField("pattern_octets", T.IntegerType()),
        T.StructField("regex", T.StringType()),
        T.StructField("has_wildcard", T.BooleanType()),
    ]
)

DIRECTIVES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("agent", T.StringType()),  # NULL for sitemap rows
        T.StructField("directive", T.StringType()),  # crawl_delay | sitemap
        T.StructField("value", T.StringType()),
    ]
)

_LINE_RE = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$")

# RFC 9309 §2.2.2 octet normalization (rule and path sides must agree
# before comparison — the round-11 documented seam, closed in r12).
# Canonical form, chosen so the RFC's own example table holds and so
# typical ASCII patterns/paths normalize to THEMSELVES (tests and the
# startswith fast path see unchanged strings):
#   - %-escapes of RESERVED characters (RFC 3986 gen-/sub-delims,
#     except the two robots metacharacters) decode to the literal:
#     ``%3A%2F%2F`` ≡ ``://`` — the RFC's second example row.
#   - ``*`` and ``$`` canonicalize ENCODED (%2A/%24): a literal target
#     octet must match a pattern's %2A escape, but a raw ``*``/final
#     ``$`` in a PATTERN is a metacharacter, handled before
#     normalization — keeping these encoded makes the stored pattern
#     unambiguous (a ``*`` in a normalized pattern is always a
#     wildcard).
#   - %-escapes of UNRESERVED characters stay ENCODED, hex uppercased:
#     ``%62%61%7A`` matches only ``%62%61%7A``, never ``baz`` — the
#     RFC's fifth example row.
#   - every other escape (%20, %25, …) stays encoded, hex uppercased.
#   - non-ASCII codepoints percent-encode per UTF-8 octet, uppercase:
#     ``ツ`` ≡ ``%E3%83%84`` — the RFC's third/fourth example rows.
_DECODE_RESERVED = frozenset(":/?#[]@!&'()+,;=")  # reserved minus * $
_ENCODE_LITERAL = {"*": "%2A", "$": "%24"}
_HEXDIGITS = frozenset("0123456789abcdefABCDEF")


def _normalize_octets(s: str) -> str:
    """One pattern piece or match target → RFC 9309 canonical octets.
    Identity for strings with no ``%``/``*``/``$`` and no non-ASCII —
    the overwhelming majority of both rules and URLs."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if (
            c == "%"
            and i + 2 < n
            and s[i + 1] in _HEXDIGITS
            and s[i + 2] in _HEXDIGITS
        ):
            ch = chr(int(s[i + 1 : i + 3], 16))
            if ch in _DECODE_RESERVED:
                out.append(ch)
            else:
                out.append("%" + s[i + 1 : i + 3].upper())
            i += 3
        elif c in _ENCODE_LITERAL:
            out.append(_ENCODE_LITERAL[c])
            i += 1
        elif c < "\x80":
            out.append(c)
            i += 1
        else:
            out.append(
                "".join(f"%{b:02X}" for b in c.encode("utf-8"))
            )
            i += 1
    return "".join(out)


def _normalize_pattern(pattern: str):
    """robots pattern → (normalized pattern, anchored Java regex).
    ``*`` matches any run, ``$`` at the end anchors — both consumed
    HERE, on the raw pattern, so normalization never manufactures a
    metacharacter (a decoded or literal ``*``/``$`` inside a piece
    comes out percent-encoded)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    pieces = [_normalize_octets(p) for p in body.split("*")]
    norm = "*".join(pieces) + ("$" if anchored else "")
    rx = "^" + ".*".join(re.escape(p) for p in pieces)
    return norm, (rx + "$" if anchored else rx)


def _parse_one(host: str, body: str):
    """One robots.txt → (rules, directives) row lists — the RFC 9309
    group model: consecutive User-agent lines open a group, rules bind
    to every agent of the current group, a User-agent line AFTER rules
    starts a new group."""
    rules, directives, sitemaps = [], [], []
    agents: list[str] = []
    group_open = False  # collecting consecutive UA lines
    if body[:1] == "\ufeff":
        # a BOM'd robots.txt (common in the wild; Google's reference
        # parser strips it) would otherwise reject the FIRST
        # User-agent line and silently drop that whole group's rules
        body = body[1:]
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0]
        m = _LINE_RE.match(line)
        if m is None:
            continue
        key = m.group(1).lower()
        val = m.group(2)
        if key == "user-agent":
            if not group_open:
                agents = []
                group_open = True
            agent = val.strip().lower()
            if agent:
                # an EMPTY product token is invalid per RFC 9309 —
                # registering "" would match every crawler via
                # contains("") and suppress the host's '*' group
                agents.append(agent)
            continue
        if key == "sitemap":  # group-independent per the RFC
            if val:
                sitemaps.append(val)
            continue
        group_open = False
        if not agents:
            continue  # rules before any User-agent line: undefined, skip
        if key in ("allow", "disallow"):
            if not val:
                continue  # empty pattern matches nothing (allow-all)
            norm, rx = _normalize_pattern(val)
            for a in agents:
                rules.append(
                    (
                        host,
                        a,
                        key == "allow",
                        norm,
                        # precedence counts octets of the CANONICAL
                        # form (all-ASCII), so the equivalent
                        # spellings ツ and %E3%83%84 tie exactly
                        len(norm),
                        rx,
                        "*" in val or val.endswith("$"),
                    )
                )
        elif key == "crawl-delay":
            for a in agents:
                directives.append((host, a, "crawl_delay", val))
    for s in sitemaps:
        directives.append((host, None, "sitemap", s))
    return rules, directives


def parse_robots(
    df: DataFrame, host_col: str, body_col: str
) -> DataFrame:
    """``(host, robots body)`` rows → the rules frame (see module
    docstring).  Undecodable bodies are treated as empty (decline —
    an unreadable robots.txt must not disallow the whole host, nor
    fail the task)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RULES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                if body is None or host is None:
                    continue
                if isinstance(body, (bytes, bytearray)):
                    body = bytes(body).decode("utf-8", "replace")
                try:
                    rules, _ = _parse_one(str(host), body)
                except Exception:
                    rules = []
                rows.extend(rules)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(host_col, body_col).mapInPandas(fn, RULES_SCHEMA)


def robots_directives(
    df: DataFrame, host_col: str, body_col: str
) -> DataFrame:
    """``Crawl-delay`` (per agent group) and ``Sitemap`` (host-wide)
    lines — the non-rule directives a crawl scheduler consumes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in DIRECTIVES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                if body is None or host is None:
                    continue
                if isinstance(body, (bytes, bytearray)):
                    body = bytes(body).decode("utf-8", "replace")
                try:
                    _, directives = _parse_one(str(host), body)
                except Exception:
                    directives = []
                rows.extend(directives)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(host_col, body_col).mapInPandas(fn, DIRECTIVES_SCHEMA)


def filter_robots_allowed(
    df: DataFrame,
    url_col: str,
    rules: DataFrame,
    agent: str = "*",
    out_col: str = "robots_allowed",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Append ``out_col``: may ``agent`` fetch each URL per the host's
    rules?  RFC 9309 precedence exactly: the group for the product
    token (substring match per §2.2.1, lowercased) beats the ``*``
    group; among the selected group's matching rules the one with the
    most pattern octets prevails, allow winning ties; no matching rule
    or no group at all ⇒ allowed.  Matching is against path + optional
    ``?query`` (fragment never reaches the server).

    One join URL→host-rules (broadcast by default — rules are per-host
    metadata), one grouped max — no window, no explode of the URL
    stream beyond the bounded per-host rule fan-out.

    Both sides compare in RFC 9309 §2.2.2 canonical octets: rule
    patterns normalize at parse time (rules are metadata-sized); the
    match target normalizes in ONE vectorized Arrow stage whose slow
    path runs only on the minority of URLs containing ``%``, ``*``,
    ``$`` or non-ASCII — everything else passes through a vectorized
    regex gate untouched, so the URL stream stays a single map stage
    with no shuffle added."""
    import pandas

    from pyspark.sql.functions import pandas_udf

    a = agent.lower()

    def _norm_fn(s):
        needs = s.str.contains(
            r"[%*$]|[^\x00-\x7f]", regex=True, na=False
        )
        if needs.any():
            s = s.copy()
            s[needs] = s[needs].map(
                lambda x: _normalize_octets(x)
                if isinstance(x, str)
                else x
            )
        return s

    # PEP 563 module: attach real annotation objects (see
    # dedup.unicode_normalized for the precedent)
    _norm_fn.__annotations__ = {
        "s": pandas.Series, "return": pandas.Series,
    }
    _norm_target = pandas_udf(_norm_fn, "string")

    pfx = "__rob"
    while any(c.startswith(pfx) for c in df.columns):
        pfx += "_"

    u = F.col(url_col)
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("/"))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.try_parse_url(u, F.lit("QUERY"))
    target = F.when(
        query.isNull() | (query == ""), path
    ).otherwise(F.concat(path, F.lit("?"), query))
    keyed = df.withColumn(f"{pfx}_host", host).withColumn(
        f"{pfx}_target", _norm_target(target)
    )

    # RFC §2.2.1: a group matches the crawler when its agent token is a
    # case-insensitive SUBSTRING of the product token; '*' is the
    # fallback group.  Precompute per (host): specific-group rules and
    # whether any exist — all on the rules frame (metadata-sized).
    r = rules.withColumn("agent", F.lower(F.col("agent")))
    specific = (
        r.where(
            (F.col("agent") != "*")
            & F.lit(a).contains(F.col("agent"))
        )
        if a != "*"
        else r.where(F.lit(False))
    )
    hosts_with_specific = specific.select("host").distinct().withColumn(
        "has_specific", F.lit(True)
    )
    fallback = r.where(F.col("agent") == "*").join(
        hosts_with_specific, "host", "left_anti"
    )
    selected = specific.unionByName(fallback).select(
        F.col("host").alias(f"{pfx}_host"),
        F.col("is_allow").alias(f"{pfx}_allow"),
        F.col("pattern").alias(f"{pfx}_pat"),
        F.col("pattern_octets").alias(f"{pfx}_oct"),
        F.col("regex").alias(f"{pfx}_rx"),
        F.col("has_wildcard").alias(f"{pfx}_wild"),
    )
    if broadcast_rules:
        selected = F.broadcast(selected)

    rid = F.monotonically_increasing_id().alias(f"{pfx}_id")
    keyed = keyed.withColumn(f"{pfx}_id", rid)
    joined = keyed.join(selected, f"{pfx}_host", "left")
    tgt = F.col(f"{pfx}_target")
    matched = F.when(
        F.col(f"{pfx}_pat").isNull(), F.lit(False)
    ).when(
        ~F.col(f"{pfx}_wild"), tgt.startswith(F.col(f"{pfx}_pat"))
    ).otherwise(F.regexp_like(tgt, F.col(f"{pfx}_rx")))
    # the RFC's precedence as ONE lexicographic max: longest pattern
    # first, allow beating disallow on equal length
    verdict_struct = F.when(
        matched,
        F.struct(
            F.col(f"{pfx}_oct").alias("o"),
            F.col(f"{pfx}_allow").alias("a"),
        ),
    )
    per_url = joined.groupBy(f"{pfx}_id").agg(
        F.max(verdict_struct).alias(f"{pfx}_best"),
        *[
            F.first(c, ignorenulls=False).alias(c)
            for c in df.columns
        ],
    )
    allowed = F.coalesce(
        F.col(f"{pfx}_best")["a"], F.lit(True)  # no matching rule
    )
    return per_url.select(*df.columns, allowed.alias(out_col))


SITEMAP_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("kind", T.StringType()),  # urlset | sitemapindex
        T.StructField("loc", T.StringType()),
        T.StructField("lastmod", T.StringType()),
        T.StructField("changefreq", T.StringType()),
        T.StructField("priority", T.DoubleType()),
    ]
)

_LOC_RE = re.compile(r"<loc>\s*([^<]+?)\s*</loc>", re.I)


def _parse_sitemap_one(host: str, body):
    """One sitemap body → rows.  Accepts gzipped bodies (the .xml.gz
    convention — sniffed, since servers mislabel), parses with the
    stdlib ElementTree namespace-agnostically, and falls back to a
    bare <loc> regex scan on malformed XML (real sitemaps frequently
    are) — salvage the URLs, never fail the task."""
    import gzip as _gzip
    import io as _io
    import xml.etree.ElementTree as _ET

    if isinstance(body, (bytes, bytearray)):
        data = bytes(body)
    else:
        data = str(body).encode("utf-8", "replace")
    if data[:2] == b"\x1f\x8b":
        try:
            data = _gzip.GzipFile(fileobj=_io.BytesIO(data)).read()
        except OSError:
            return []
    rows = []
    try:
        root = _ET.fromstring(data)
        tag = root.tag.rsplit("}", 1)[-1].lower()
        kind = "sitemapindex" if tag == "sitemapindex" else "urlset"
        for entry in root:
            fields = {
                child.tag.rsplit("}", 1)[-1].lower(): (child.text or "").strip()
                for child in entry
            }
            loc = fields.get("loc")
            if not loc:
                continue
            prio = None
            if fields.get("priority"):
                try:
                    prio = float(fields["priority"])
                except ValueError:
                    prio = None
            rows.append(
                (
                    host,
                    kind,
                    loc,
                    fields.get("lastmod") or None,
                    fields.get("changefreq") or None,
                    prio,
                )
            )
        return rows
    except _ET.ParseError:
        text = data.decode("utf-8", "replace")
        kind = "sitemapindex" if "<sitemapindex" in text[:2048] else "urlset"
        return [
            (host, kind, loc, None, None, None)
            for loc in _LOC_RE.findall(text)
        ]


def parse_sitemaps(
    df: DataFrame, host_col: str, body_col: str
) -> DataFrame:
    """Sitemap bodies → ``(host, kind, loc, lastmod, changefreq,
    priority)`` rows: ``urlset`` entries are crawl-frontier URLs,
    ``sitemapindex`` entries are MORE sitemaps to fetch (the caller
    drives that loop — fetching is not this engine's job).  Completes
    the frontier trio with :func:`parse_robots` (whose ``Sitemap``
    directives name these files) and the URL operators.  Same Arrow-
    batched bytes→rows shape and decline contract as every ingest
    edge."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SITEMAP_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                if body is None or host is None:
                    continue
                try:
                    rows.extend(_parse_sitemap_one(str(host), body))
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=cols)

    return df.select(host_col, body_col).mapInPandas(fn, SITEMAP_SCHEMA)
