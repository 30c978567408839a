"""Scalar expression builders — every scalar the reference emits, Spark-side.

Reference emission sites (SURVEY §2.6):
- ``cityHash64(*)``            → :func:`row_hash` (xxhash64; database.go:511,535)
- ``formatReadableSize(n)``    → :func:`format_readable_size` (database.go:400,405)
- ``toUUIDOrZero(s)``          → :func:`to_uuid_or_zero` (sidefunctions.go:131-132)
- ``toIPv4(s)/toIPv6(s)``      → :func:`ipv4_to_long` / :func:`canonical_ipv6`
                                 (sidefunctions.go:127-130)
- ``toJSONString(x)``          → :func:`to_json_string` (sidefunctions.go:133-134)

All are pure Column expressions (JVM-side, codegen-eligible) — no Python
UDFs, so they stay inside WholeStageCodegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Canonical 8-4-4-4-12 hex UUID, case-insensitive.
UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
ZERO_UUID = "00000000-0000-0000-0000-000000000000"

# Dotted-quad with each octet 0-255.
_IPV4_OCTET = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_RE = rf"^{_IPV4_OCTET}\.{_IPV4_OCTET}\.{_IPV4_OCTET}\.{_IPV4_OCTET}$"


def row_hash(*cols: Column | str) -> Column:
    """64-bit row content hash — the engine's ``cityHash64(*)``.

    The reference fingerprints rows with ``cityHash64(*)``
    (database.go:511). The *semantics* that matter are: both compare sides
    hash identically-typed, identically-ordered columns with the same
    function. Spark's built-in ``xxhash64`` satisfies that and runs inside
    codegen; the specific hash family is irrelevant to correctness.
    """
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


def portable_row_hash(*cols: Column | str) -> Column:
    """Engine-portable 60-bit row hash: md5 over '|'-joined rendered columns.

    :func:`row_hash` (xxhash64) is the fast path for same-engine compares;
    this variant is reproducible in ANY engine with md5 (DuckDB:
    ``CAST('0x' || substring(md5(s),1,15) AS BIGINT)``), enabling
    cross-engine fingerprint parity — the property the reference needs when
    source and destination servers must agree on ``cityHash64`` semantics.
    Callers pass explicitly *rendered* (string) columns so numeric/time
    formatting is under the caller's control, never engine defaults.
    """
    rendered = [F.col(c) if isinstance(c, str) else c for c in cols]
    joined = F.concat_ws("|", *rendered)
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("bigint")


def format_readable_size(bytes_col: Column | str) -> Column:
    """Human-readable byte size — ``formatReadableSize`` (database.go:400).

    Pure CASE/arithmetic expression chain (no UDF), ClickHouse style: 1024
    base, two decimals, unit suffix. Rendering is exact integer math
    (floor to hundredths) rather than float formatting, so the output is
    bit-identical across engines — float ``%.2f`` differs between
    Java's HALF_UP and C's half-even exactly on the dyadic ties that
    dividing by powers of 1024 produces.
    """
    b = (F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col).cast("bigint")
    units = ["B", "KiB", "MiB", "GiB", "TiB", "PiB"]

    def render(i: int) -> Column:
        # hundredths = floor(b*100 / 1024^i), computed so every engine gets
        # the exact same integer: subtract the modulo in bigint domain, then
        # divide — the numerator is exactly divisible by the power-of-two
        # divisor, so the (double) division is exact in IEEE754.
        num = b * F.lit(100)
        d = F.lit(1024**i)
        hundredths = ((num - num % d) / d).cast("bigint")
        return F.concat(
            ((hundredths - hundredths % 100) / 100).cast("bigint").cast("string"),
            F.lit("."),
            F.lpad((hundredths % 100).cast("string"), 2, "0"),
            F.lit(f" {units[i]}"),
        )

    expr = render(len(units) - 1)
    for i in range(len(units) - 2, -1, -1):
        expr = F.when(b < F.lit(1024 ** (i + 1)), render(i)).otherwise(expr)
    return expr


def to_uuid_or_zero(col: Column | str) -> Column:
    """``toUUIDOrZero(s)`` — canonical lowercase UUID, or the zero UUID.

    Reference: sidefunctions.go:131-132 casts strings to UUID with a
    zero-value fallback. Spark has no UUID type; canonical 36-char lowercase
    string is the engine's representation (SURVEY §1.3).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.rlike(UUID_RE), F.lower(c)).otherwise(F.lit(ZERO_UUID))


def ipv4_to_long(col: Column | str) -> Column:
    """``toIPv4(s)`` — dotted-quad string → numeric (bigint), NULL if invalid.

    ClickHouse's IPv4 is a UInt32 under the hood; bigint holds the full
    unsigned range. Expression-only: split + aggregate, no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    packed = (
        parts.getItem(0).cast("long") * F.lit(16777216)
        + parts.getItem(1).cast("long") * F.lit(65536)
        + parts.getItem(2).cast("long") * F.lit(256)
        + parts.getItem(3).cast("long")
    )
    return F.when(c.rlike(IPV4_RE), packed).otherwise(F.lit(None).cast("long"))


def long_to_ipv4(col: Column | str) -> Column:
    """Inverse of :func:`ipv4_to_long` — numeric → dotted-quad string."""
    c = (F.col(col) if isinstance(col, str) else col).cast("long")

    def octet(d: int) -> Column:
        # exact integer math: subtract the modulo before dividing
        return (((c - c % d) / d).cast("long") % 256).cast("string")

    return F.concat_ws(".", octet(16777216), octet(65536), octet(256), (c % 256).cast("string"))


def canonical_ipv6(col: Column | str) -> Column:
    """``toIPv6(s)`` — full RFC-5952 canonical IPv6 text, expression-only.

    Spark has no IPv6 type; the engine's contract is *deterministic
    canonical text* so fingerprints agree across sides (SURVEY §7.5).
    The three RFC-5952 rules, each as pure string/array expressions:

    1. **expand** ``::`` to the missing zero groups (split sides, count,
       ``array_repeat`` the filler);
    2. **normalize** each group: lowercase + strip leading zeros (empty →
       ``'0'``);
    3. **compress** the longest run of zero groups (leftmost on ties,
       runs of ≥ 2 only): the padded form ``:g:g:…:`` is probed with
       ``instr`` for ``:0:0:…:`` patterns from 8 zeros down to 2 — the
       first hit is the longest leftmost run — and spliced around with
       ``::``.

    Non-IPv6-shaped input (≠ 8 groups after expansion) falls back to
    lowercase/trim unchanged, so the function never corrupts passthrough
    text. IPv4-mapped tails (``::ffff:1.2.3.4``) are not re-rendered (the
    dotted tail parses as ≠ 8 groups → fallback) — same narrowing as the
    reference's text round-trip. The DuckDB rendering of this exact
    algorithm lives in queries_window.q_ipv6_canon's oracle.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(F.trim(c))

    # 1. expansion
    halves = F.split(s, "::", 2)
    larr = F.filter(F.split(halves.getItem(0), ":"), lambda x: x != F.lit(""))
    rarr = F.filter(
        F.split(F.coalesce(halves.getItem(1), F.lit("")), ":"),
        lambda x: x != F.lit(""),
    )
    mid = F.greatest(F.lit(0), F.lit(8) - F.size(larr) - F.size(rarr))
    expanded = F.concat(larr, F.array_repeat(F.lit("0"), mid), rarr)
    full = F.when(F.instr(s, "::") > 0, expanded).otherwise(F.split(s, ":"))

    # 2. per-group normalization (strip leading zeros, keep one digit)
    def norm_group(g: Column) -> Column:
        stripped = F.regexp_replace(g, "^0+", "")
        return F.when(stripped == "", F.lit("0")).otherwise(stripped)

    n8 = F.concat_ws(":", F.transform(full, norm_group))
    padded = F.concat(F.lit(":"), n8, F.lit(":"))

    # 3. longest-run compression: n descending wins (outermost when)
    res = n8
    for n in range(2, 9):
        pat = ":" + "0:" * n  # ':0:0:…:' — n zero groups, colon-bounded
        pos = F.instr(padded, pat)
        prefix = F.regexp_replace(padded.substr(F.lit(1), pos - 1), "^:", "")
        after = F.regexp_replace(
            padded.substr(pos + F.lit(2 * n + 1), F.length(padded)), ":$", ""
        )
        res = F.when(pos > 0, F.concat(prefix, F.lit("::"), after)).otherwise(res)

    return F.when(F.size(full) == 8, res).otherwise(s)


def to_json_string(col: Column | str) -> Column:
    """``toJSONString(x)`` — any value → its JSON text (sidefunctions.go:133).

    For struct/array/map inputs uses ``to_json``; for already-string JSON
    the reference passes text through, which callers get by not invoking
    this on string columns (see plans.casting).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.to_json(F.struct(c.alias("v")))
