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
    """``toIPv6(s)`` — normalized (lowercased, trimmed) IPv6 text.

    Spark has no IPv6 type; the engine's contract is *deterministic
    canonical text* so fingerprints agree across sides (SURVEY §7.5). Full
    RFC-5952 compression is deliberately not attempted in expressions;
    lowercase/trim is deterministic and fingerprint-stable.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))


def to_json_string(col: Column | str) -> Column:
    """``toJSONString(x)`` — any value → its JSON text (sidefunctions.go:133).

    For struct/array/map inputs uses ``to_json``; for already-string JSON
    the reference passes text through, which callers get by not invoking
    this on string columns (see plans.casting).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.to_json(F.struct(c.alias("v")))
