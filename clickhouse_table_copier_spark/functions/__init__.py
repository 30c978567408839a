"""Scalar expression helpers (SURVEY §2.6)."""

from clickhouse_table_copier_spark.functions.scalars import (  # noqa: F401
    row_hash,
    format_readable_size,
    to_uuid_or_zero,
    ipv4_to_long,
    long_to_ipv4,
    canonical_ipv6,
    to_json_string,
)
