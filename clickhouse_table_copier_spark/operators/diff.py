"""Partition diff — the consistency verdict join (SURVEY §2.3 J2, §2.9 C5).

The reference classifies each source partition against the destination in a
driver loop (``/root/reference/copy/copy.go:194-266``): probe the dest count
(``:215``), then paired async fingerprints (``:217-232``), then the verdict
state machine (``:237-266``). This engine expresses the whole classification
as ONE full-outer join of the two sides' fingerprint tables:

    src_fp FULL OUTER JOIN dest_fp ON partition_keys  →  verdict column

Both fingerprint tables have one row per partition (tiny — thousands of
rows even at 100 TB), so the join is broadcast and costs nothing; all the
heavy lifting happened in the two grouped aggregations that produced them.

Verdicts (the C5 state machine, minus its known WaitGroup bug):
- ``copy``          dest partition absent or empty (copy.go:262-266, :241-245)
- ``identical``     fingerprints match → skip (copy.go:258-260)
- ``inconsistent``  fingerprints differ → delete+recopy per flags (:246-257)
- ``extra``         partition exists only on dest (reference warns when dest
                    has more data, copy.go:162-168; surfaced as a verdict)
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.operators.fingerprint import partition_fingerprints
from clickhouse_table_copier_spark.plans.partition_spec import PartitionSpec


class Verdict(str, Enum):
    COPY = "copy"
    IDENTICAL = "identical"
    INCONSISTENT = "inconsistent"
    EXTRA = "extra"


def diff_partitions(
    src: DataFrame,
    dest: DataFrame,
    spec: PartitionSpec,
    cols: list[str] | None = None,
    check_hashes: bool = True,
) -> DataFrame:
    """Classify every partition in one pass per side + one tiny join.

    ``check_hashes=False`` degrades the comparison to row counts only — the
    reference's ``check_hashes`` toggle (config/config.go:34, C6).
    Returns: partition keys + src_rows, dest_rows, src_fingerprint,
    dest_fingerprint, verdict — the report the reference's ``--info`` mode
    prints (copy/copy.go:12-137), as a DataFrame.
    """
    src_fp = partition_fingerprints(src, spec, cols)
    dest_fp = partition_fingerprints(dest, spec, cols)
    return classify_fingerprints(src_fp, dest_fp, list(spec.names), check_hashes)


def classify_fingerprints(
    src_fp: DataFrame,
    dest_fp: DataFrame,
    names: list[str],
    check_hashes: bool = True,
) -> DataFrame:
    """The verdict join over two pre-aggregated (keys, rows, fingerprint)
    tables — shared by the live diff and the offline manifest diff
    (operators.manifest): one row per partition in, one verdict row out."""
    spec = PartitionSpec.bare(*names)
    s = src_fp.select(
        *spec.names,
        F.col("rows").alias("src_rows"),
        F.col("fingerprint").alias("src_fingerprint"),
    )
    d = dest_fp.select(
        *spec.names,
        F.col("rows").alias("dest_rows"),
        F.col("fingerprint").alias("dest_fingerprint"),
    )

    # Both sides are one-row-per-partition (thousands of rows even at
    # 100 TB). full_outer can't broadcast, so shuffle-hash-join hint both
    # sides — avoids the sort of a SortMergeJoin on these tiny inputs.
    # Null-safe key equality: a NULL partition value is a real partition
    # (hive's __HIVE_DEFAULT_PARTITION__); standard join equality would
    # split it into phantom copy+extra rows.
    d_renamed = d.select(
        *[F.col(n).alias(f"__d_{n}") for n in spec.names],
        "dest_rows",
        "dest_fingerprint",
    )
    cond = None
    for n in spec.names:
        c = F.col(n).eqNullSafe(F.col(f"__d_{n}"))
        cond = c if cond is None else cond & c
    if check_hashes:
        equal = F.col("src_fingerprint").eqNullSafe(F.col("dest_fingerprint")) & F.col(
            "src_rows"
        ).eqNullSafe(F.col("dest_rows"))
    else:
        equal = F.col("src_rows").eqNullSafe(F.col("dest_rows"))

    verdict = (
        F.when(F.col("src_rows").isNull(), F.lit(Verdict.EXTRA.value))
        .when(
            F.col("dest_rows").isNull() | (F.col("dest_rows") == 0),
            F.lit(Verdict.COPY.value),
        )
        .when(equal, F.lit(Verdict.IDENTICAL.value))
        .otherwise(F.lit(Verdict.INCONSISTENT.value))
    )
    # verdict rides in the join's projection: a trailing withColumn would
    # be one more eager JVM re-analysis of the whole diff lineage per call
    return (
        s.hint("shuffle_hash")
        .join(d_renamed.hint("shuffle_hash"), cond, "full_outer")
        .select(
            *[
                F.coalesce(F.col(n), F.col(f"__d_{n}")).alias(n)
                for n in spec.names
            ],
            "src_rows",
            "src_fingerprint",
            "dest_rows",
            "dest_fingerprint",
            verdict.alias("verdict"),
        )
    )
