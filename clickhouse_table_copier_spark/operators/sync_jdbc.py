"""Sync into a JDBC destination — the reference's native shape end-to-end.

The parquet path (``operators.sync``) replaces delete+reinsert with
dynamic partition overwrite; a remote SQL server has no such primitive,
so this module is the faithful D1+D2 loop (``/root/reference/copy/
copy.go:139-271``): classify partitions with ONE diff join, then

- D1 delete: one ``DELETE FROM t WHERE (k=v AND …) OR (…)`` statement
  covering every inconsistent partition (``ALTER TABLE … DELETE``
  parity, database.go:463-484) — driver-side, metadata-sized;
- D2 insert: one distributed append of all partitions needing data
  (``INSERT … SELECT`` parity, database.go:486-507) via the executors'
  JDBC connections.

Comparison runs in the DESTINATION's type domain (source hashed through
the dest-type casts it will INSERT with) — same convergence contract as
the parquet path. Column-name case is normalized (Derby/Oracle uppercase
identifiers) so the diff join and the insert projection line up.

The delete-then-insert window is visible to concurrent readers — exactly
the reference's semantics, and why both verify with fingerprints on the
next run rather than assuming atomicity.
"""

from __future__ import annotations

import datetime
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.operators.diff import Verdict, diff_partitions
from clickhouse_table_copier_spark.operators.sync import SyncOptions, SyncResult
from clickhouse_table_copier_spark.plans.partition_spec import PartitionSpec
from clickhouse_table_copier_spark.sources.table import (
    TableRef,
    jdbc_retry_policy,
    load_table,
    write_table,
)

# Dialects whose string literals treat backslash as an escape character by
# default (ClickHouse — the reference's native target — and MySQL family).
# Standard-conforming servers (Derby, Postgres, Oracle) must NOT get
# doubled backslashes: there '\' is literal.
_BACKSLASH_ESCAPE_URL_PREFIXES = ("jdbc:clickhouse", "jdbc:ch:", "jdbc:mysql", "jdbc:mariadb")


def dialect_backslash_escapes(jdbc_url: str) -> bool:
    return jdbc_url.lower().startswith(_BACKSLASH_ESCAPE_URL_PREFIXES)


def sql_equality_where(
    names: list[str], rows: list[tuple], backslash_escapes: bool = False
) -> str:
    """``(k1=v1 AND k2=v2) OR (…)`` — remote-side WHERE text for the
    delete step. The reference's GenerateWhere (sidefunctions.go:194-236)
    emits one predicate per round trip; rendering the OR over all doomed
    partitions keeps it to ONE statement. Fixes the two-key arity bug
    (``tmp = +1``) the same way plans.predicates does for Column form.

    ``backslash_escapes``: set for dialects (ClickHouse/MySQL) where ``\\``
    escapes inside string literals — a key value ending in a backslash
    would otherwise swallow the closing quote and mis-target the DELETE."""

    def lit(v) -> str:
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return str(v)
        if isinstance(v, (datetime.date, datetime.datetime)):
            return f"'{v}'"
        s = str(v)
        if backslash_escapes:
            s = s.replace("\\", "\\\\")
        return "'" + s.replace("'", "''") + "'"

    def one(row: tuple) -> str:
        # ANSI-quoted identifiers: Spark's JDBC writer creates columns as
        # quoted (case-sensitive) names, so the delete must address them
        # the same way or case-folding servers (Derby, Postgres) miss
        parts = [
            f'"{n}" IS NULL' if v is None else f'"{n}" = {lit(v)}'
            for n, v in zip(names, row)
        ]
        return "(" + " AND ".join(parts) + ")"

    return " OR ".join(one(r) for r in rows)


def _jdbc_execute(spark: SparkSession, ref: TableRef, sql: str) -> None:
    """Driver-side statement on the destination server (the reference's
    control-plane connection; data never flows through it)."""
    jvm = spark._jvm
    driver = ref.options.get("driver")
    if driver:
        jvm.java.lang.Class.forName(driver)
    props = jvm.java.util.Properties()
    for k in ("user", "password"):
        if k in ref.options:
            props.setProperty(k, str(ref.options[k]))
    conn = jvm.java.sql.DriverManager.getConnection(ref.location, props)
    try:
        st = conn.createStatement()
        # execute(), not executeUpdate(): the exists-probe is a SELECT and
        # JDBC drivers reject executeUpdate for result-returning statements
        st.execute(sql)
        st.close()
    finally:
        conn.close()


# SQLStates that mean "that table does not exist" — Derby 42X05,
# SQL-Server/MySQL-family 42S02, Postgres 42P01, ODBC S0002, DB2 42704.
# Anything else (connection refused, auth failure, timeout) is NOT
# evidence of absence: treating it as missing routed sync_to_jdbc into the
# dest-absent branch whose overwrite DROPS the remote table — destroying
# dest-only data on a transient network blip.
_TABLE_MISSING_SQLSTATES = frozenset({"42X05", "42S02", "42P01", "S0002", "42704"})


def _sql_states(exc: Exception) -> list[str]:
    """SQLState codes along the Java cause chain of a py4j error."""
    states: list[str] = []
    je = getattr(exc, "java_exception", None)
    while je is not None:
        try:
            st = je.getSQLState()
            if st:
                states.append(str(st).upper())
        except Exception:
            pass  # not a java.sql.SQLException — keep walking the chain
        try:
            je = je.getCause()
        except Exception:
            break
    return states


def _jdbc_table_exists(spark: SparkSession, ref: TableRef) -> bool:
    """Existence probe (S5 parity, database.go:344). Only a table-missing
    SQLState returns False; connection-class failures retry under the C9
    knobs (``connect_retries``/``retry_delay_s``) and then re-raise."""
    retries, delay = jdbc_retry_policy(ref)
    attempt = 0
    while True:
        try:
            _jdbc_execute(spark, ref, f"SELECT 1 FROM {ref.table} WHERE 1=0")
            return True
        except Exception as e:
            if any(s in _TABLE_MISSING_SQLSTATES for s in _sql_states(e)):
                return False
            if 0 <= retries <= attempt:
                raise
            attempt += 1
            time.sleep(delay)


def sync_to_jdbc(
    spark: SparkSession,
    src: DataFrame,
    dest_ref: TableRef,
    spec: PartitionSpec,
    options: SyncOptions = SyncOptions(),
) -> SyncResult:
    """Make the JDBC destination table match ``src`` partition-wise."""
    src_parts = spec.with_partition_columns(src)
    data_cols = [c for c in src.columns if c not in spec.names]

    if not _jdbc_table_exists(spark, dest_ref):
        report = (
            src_parts.groupBy(*spec.names)
            .agg(F.count(F.lit(1)).alias("src_rows"))
            .withColumn("dest_rows", F.lit(None).cast("bigint"))
            .withColumn("verdict", F.lit(Verdict.COPY.value))
            .withColumn("action", F.lit("copied" if not options.dry_run else "none"))
        )
        copied = 0
        if not options.dry_run:
            write_table(src_parts, dest_ref, mode="overwrite")
            copied = report.count()
        return SyncResult(report=report, copied_partitions=copied, deleted_partitions=0)

    dest = load_table(spark, dest_ref)
    # case-normalize (Derby/Oracle uppercase identifiers) back to the
    # source-side names so joins/projections line up
    by_lower = {c.lower(): c for c in dest.columns}
    missing = [n for n in spec.names if n.lower() not in by_lower]
    if missing:
        raise ValueError(f"dest table lacks partition columns: {missing}")
    common = [c for c in data_cols if c.lower() in by_lower]
    src_types = dict(src_parts.dtypes)
    dest_named = dest.select(
        *[F.col(by_lower[n.lower()]).cast(src_types[n]).alias(n) for n in spec.names],
        *[F.col(by_lower[c.lower()]).alias(c) for c in common],
    )
    dest_types = dict(dest_named.dtypes)
    src_cmp = src_parts.select(
        *spec.names,
        *[F.col(c).cast(dest_types[c]).alias(c) for c in common],
    )

    report = diff_partitions(
        src_cmp,
        dest_named,
        PartitionSpec.bare(*spec.names),
        cols=common,
        check_hashes=options.check_hashes,
    )

    action = (
        F.when(F.col("verdict") == Verdict.COPY.value, F.lit("copied"))
        .when(
            (F.col("verdict") == Verdict.INCONSISTENT.value)
            & F.lit(not options.skip_delete)
            & F.lit(not options.skip_reimport),
            F.lit("overwritten"),
        )
        .when(
            (F.col("verdict") == Verdict.INCONSISTENT.value)
            & F.lit(options.skip_delete)
            & F.lit(not options.skip_reimport),
            F.lit("appended"),
        )
        .when(
            (F.col("verdict") == Verdict.INCONSISTENT.value)
            & F.lit(not options.skip_delete)
            & F.lit(options.skip_reimport),
            F.lit("deleted"),
        )
        .otherwise(F.lit("none"))
    )
    report = report.withColumn(
        "action", action if not options.dry_run else F.lit("none")
    )
    if options.dry_run:
        return SyncResult(report=report, copied_partitions=0, deleted_partitions=0)

    rows = report.collect()  # metadata-sized, materialized before mutation
    report = spark.createDataFrame(rows, report.schema)
    key = lambda r: tuple(r[n] for n in spec.names)  # noqa: E731

    # D1: one DELETE covering every partition being replaced or dropped
    doomed = [key(r) for r in rows if r["action"] in ("overwritten", "deleted")]
    deleted = 0
    if doomed:
        where = sql_equality_where(
            list(spec.names),
            doomed,
            backslash_escapes=dialect_backslash_escapes(dest_ref.location),
        )
        _jdbc_execute(spark, dest_ref, f"DELETE FROM {dest_ref.table} WHERE {where}")
        deleted = len(doomed)

    # D2: one distributed append of everything needing data, cast to the
    # destination's types (INSERT INTO dest (cols) SELECT castExprs)
    to_write = [
        key(r) for r in rows if r["action"] in ("copied", "overwritten", "appended")
    ]
    copied = 0
    if to_write:
        key_col = F.struct(*[F.col(n) for n in spec.names])
        filtered = src_parts.where(
            key_col.isin([F.struct(*[F.lit(v) for v in k]) for k in to_write])
        ).select(
            *spec.names,
            *[F.col(c).cast(dest_types[c]).alias(c) for c in common],
        )
        write_table(filtered, dest_ref, mode="append")
        copied = len(to_write)

    return SyncResult(report=report, copied_partitions=copied, deleted_partitions=deleted)
