"""Query batch 2: scalar-function parity + portable fingerprints (§2.6, A3, A5).

Registered into the same registry as queries.py (importing this module is
enough). Every query is designed for exact cross-engine value equality —
see queries.py module docstring for the determinism rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.functions.scalars import (
    format_readable_size,
    ipv4_to_long,
    long_to_ipv4,
    portable_row_hash,
    to_uuid_or_zero,
)
from clickhouse_table_copier_spark.queries import _events, _t, _tc, register

# ---------------------------------------------------------------------------
# A3 — order-insensitive table fingerprint, portable flavor.
# Columns are explicitly rendered to strings (ints and dates have identical
# canonical text in every engine) so the md5-based hash agrees with DuckDB.
# ---------------------------------------------------------------------------
def _fp_cols_spark():
    # built lazily: Column construction needs an active SparkContext
    return [
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.date_format("l_shipdate", "yyyy-MM-dd"),
    ]
_FP_EXPR_SQL = (
    "CAST('0x' || substring(md5("
    "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_partkey AS VARCHAR) || '|' || "
    "CAST(l_suppkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' || "
    "l_returnflag || '|' || l_linestatus || '|' || strftime(l_shipdate, '%Y-%m-%d')"
    "), 1, 15) AS BIGINT)"
)


@register(
    "table_fingerprint",
    oracle=f"""
    SELECT count(*) AS rows_, bit_xor({_FP_EXPR_SQL}) AS fingerprint
    FROM lineitem
    """,
)
def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _tc(spark, sf_dir, "lineitem")
    return df.select(portable_row_hash(*_fp_cols_spark()).alias("h")).agg(
        F.count(F.lit(1)).alias("rows_"), F.bit_xor("h").alias("fingerprint")
    )


@register(
    "partition_fingerprints",
    oracle=f"""
    SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
           count(*) AS rows_, bit_xor({_FP_EXPR_SQL}) AS fingerprint
    FROM lineitem GROUP BY 1
    """,
)
def q_partition_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _tc(spark, sf_dir, "lineitem")
    return (
        df.withColumn("__h", portable_row_hash(*_fp_cols_spark()))
        .groupBy(F.expr("CAST(month(l_shipdate) AS INT)").alias("ship_month"))
        .agg(F.count(F.lit(1)).alias("rows_"), F.bit_xor("__h").alias("fingerprint"))
    )


# ---------------------------------------------------------------------------
# A5 — formatReadableSize over per-partition byte sizes (database.go:400).
# Oracle reproduces the exact integer floor-to-hundredths rendering.
# ---------------------------------------------------------------------------
def _readable_sql(expr: str) -> str:
    units = ["B", "KiB", "MiB", "GiB", "TiB", "PiB"]

    def render(i: int) -> str:
        num = f"(CAST({expr} AS BIGINT) * 100)"
        d = 1024**i
        h = f"CAST(({num} - {num} % {d}) / {d} AS BIGINT)"
        return (
            f"CAST(CAST(({h} - {h} % 100) / 100 AS BIGINT) AS VARCHAR)"
            f" || '.' || lpad(CAST({h} % 100 AS VARCHAR), 2, '0') || ' {units[i]}'"
        )

    out = render(len(units) - 1)
    for i in range(len(units) - 2, -1, -1):
        out = f"CASE WHEN CAST({expr} AS BIGINT) < {1024 ** (i + 1)} THEN {render(i)} ELSE {out} END"
    return out


_LINEITEM_WIDTH_SQL = (
    "8+8+8+4+8+8+8+8"
    "+coalesce(length(l_returnflag),0)+coalesce(length(l_linestatus),0)+8"
)


@register(
    "readable_partition_sizes",
    oracle=f"""
    WITH p AS (
      SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
             CAST(sum({_LINEITEM_WIDTH_SQL}) AS BIGINT) AS bytes_size
      FROM lineitem GROUP BY 1
    )
    SELECT ship_month, bytes_size, {_readable_sql("bytes_size")} AS readable_size
    FROM p
    """,
)
def q_readable_partition_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.partition_stats import partition_stats
    from clickhouse_table_copier_spark.plans.partition_spec import (
        PartitionField,
        PartitionSpec,
    )

    df = _t(spark, sf_dir, "lineitem")
    spec = PartitionSpec.of(PartitionField("ship_month", "CAST(month(l_shipdate) AS INT)"))
    stats = partition_stats(df, spec)
    return stats.select(
        "ship_month",
        "bytes_size",
        format_readable_size("bytes_size").alias("readable_size"),
    )


# ---------------------------------------------------------------------------
# toUUIDOrZero (sidefunctions.go:131-132): valid canonical UUIDs lowercase,
# anything else → zero UUID. Inputs are deterministically derived from
# orders: md5 → 8-4-4-4-12 for valid, o_orderstatus text for invalid.
# ---------------------------------------------------------------------------
@register(
    "uuid_or_zero",
    oracle="""
    WITH inputs AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_orderstatus
                  ELSE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) || '-' ||
                       substring(md5(CAST(o_orderkey AS VARCHAR)), 9, 4) || '-' ||
                       substring(md5(CAST(o_orderkey AS VARCHAR)), 13, 4) || '-' ||
                       substring(md5(CAST(o_orderkey AS VARCHAR)), 17, 4) || '-' ||
                       substring(md5(CAST(o_orderkey AS VARCHAR)), 21, 12)
             END AS u
      FROM orders
    )
    SELECT o_orderkey,
           CASE WHEN regexp_full_match(u,
             '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}')
             THEN lower(u)
             ELSE '00000000-0000-0000-0000-000000000000' END AS uuid_canon
    FROM inputs
    """,
)
def q_uuid_or_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "orders")
    m = F.md5(F.col("o_orderkey").cast("string"))
    uuid_like = F.concat_ws(
        "-",
        F.substring(m, 1, 8),
        F.substring(m, 9, 4),
        F.substring(m, 13, 4),
        F.substring(m, 17, 4),
        F.substring(m, 21, 12),
    )
    inputs = df.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_orderstatus"))
        .otherwise(uuid_like)
        .alias("u"),
    )
    return inputs.select(
        "o_orderkey", to_uuid_or_zero("u").alias("uuid_canon")
    )


# ---------------------------------------------------------------------------
# toIPv4 round trip (sidefunctions.go:127-128): dotted-quad → packed long →
# dotted-quad, plus invalid inputs → NULL. Inputs derived from orders keys.
# ---------------------------------------------------------------------------
@register(
    "ipv4_roundtrip",
    oracle="""
    WITH inputs AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'not.an.ip.addr'
                  ELSE '10.' || CAST(o_orderkey % 256 AS VARCHAR) || '.' ||
                       CAST((o_orderkey // 256) % 256 AS VARCHAR) || '.' ||
                       CAST(o_orderkey % 100 AS VARCHAR)
             END AS ip
      FROM orders
    ),
    packed AS (
      SELECT o_orderkey, ip,
             CASE WHEN regexp_full_match(ip,
               '(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])')
             THEN CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
                + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
                + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
                + CAST(string_split(ip, '.')[4] AS BIGINT)
             ELSE NULL END AS ip_num
      FROM inputs
    )
    SELECT o_orderkey, ip_num,
           CASE WHEN ip_num IS NULL THEN NULL ELSE
             CAST(CAST((ip_num - ip_num % 16777216) / 16777216 AS BIGINT) % 256 AS VARCHAR)
             || '.' || CAST(CAST((ip_num - ip_num % 65536) / 65536 AS BIGINT) % 256 AS VARCHAR)
             || '.' || CAST(CAST((ip_num - ip_num % 256) / 256 AS BIGINT) % 256 AS VARCHAR)
             || '.' || CAST(ip_num % 256 AS VARCHAR)
           END AS ip_canon
    FROM packed
    """,
)
def q_ipv4_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ip = (
        F.when(k % 7 == 0, F.lit("not.an.ip.addr"))
        .otherwise(
            F.concat_ws(
                ".",
                F.lit("10"),
                (k % 256).cast("string"),
                F.expr("CAST((o_orderkey div 256) % 256 AS STRING)"),
                (k % 100).cast("string"),
            )
        )
        .alias("ip")
    )
    inputs = df.select("o_orderkey", ip)
    packed = inputs.select(
        "o_orderkey", ipv4_to_long("ip").alias("ip_num")
    )
    return packed.select(
        "o_orderkey",
        "ip_num",
        F.when(F.col("ip_num").isNull(), F.lit(None).cast("string"))
        .otherwise(long_to_ipv4("ip_num"))
        .alias("ip_canon"),
    )


# ---------------------------------------------------------------------------
# toJSONString + JSON field access (sidefunctions.go:133-134; events.props
# is String-typed JSON, which the reference passes through verbatim).
# ---------------------------------------------------------------------------
@register(
    "json_passthrough_extract",
    oracle="""
    SELECT event_id,
           props AS props_json,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           CAST(to_json(struct_pack(event_type := event_type, user_id := user_id)) AS VARCHAR)
             AS envelope_json
    FROM events
    """,
)
def q_json_passthrough_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    return df.select(
        "event_id",
        F.col("props").alias("props_json"),  # String JSON passes through
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
        F.to_json(F.struct(F.col("event_type"), F.col("user_id"))).alias(
            "envelope_json"
        ),
    )
