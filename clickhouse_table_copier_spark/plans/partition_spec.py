"""Partition-key specification and partition-value parsing.

The reference parses ClickHouse partition keys out of
``system.tables.partition_key`` text: bare column names
(``/root/reference/database/sidefunctions.go:17-32``), raw
function-of-column expressions like ``toYYYYMM(ts)`` (``:34-50``), and it
tokenizes *tuple* partition values like ``('2021-09-01', 42)`` with a regex
(``:11-15``). A partition key may therefore be:

- one or more bare columns                → equality predicates (P3)
- a function of a Date/DateTime column    → time-range predicates (P4)

This module is the engine's typed replacement: a :class:`PartitionSpec` is a
list of named fields, each with an explicit Spark SQL expression, so the
"strip the outer function by regex" fragility disappears — the expression is
carried whole and evaluated by Catalyst on both the stats side and the
predicate side.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokenizer for tuple partition values rendered as text, e.g.
# "('2021-09-01', 42)" → ['2021-09-01', '42'].  Mirrors the intent of
# RegexPartitionName (sidefunctions.go:11-15).
_PARTITION_VALUE_TOKEN = re.compile(r"[A-Za-z0-9_:\.\- ]+")


@dataclass(frozen=True)
class PartitionField:
    """One component of a (possibly tuple) partition key.

    ``name``       output column name of the derived partition value.
    ``expr``       Spark SQL expression over source columns, e.g.
                   ``"l_returnflag"`` or ``"month(l_shipdate)"`` —
                   the typed analogue of ``toYYYYMM(ts)`` keys.
    ``source_col`` the underlying raw column, when the expression wraps one
                   (used for time-range predicates, P4); None for bare keys.
    ``is_temporal``True when ``source_col`` is a Date/DateTime column, which
                   selects the range-predicate branch of GenerateWhere
                   (sidefunctions.go:215-220).
    """

    name: str
    expr: str
    source_col: str | None = None
    is_temporal: bool = False

    def column(self) -> Column:
        return F.expr(self.expr).alias(self.name)


@dataclass(frozen=True)
class PartitionSpec:
    fields: tuple[PartitionField, ...]

    @staticmethod
    def of(*fields: PartitionField) -> "PartitionSpec":
        return PartitionSpec(tuple(fields))

    @staticmethod
    def bare(*names: str) -> "PartitionSpec":
        """Bare-column key(s) — sidefunctions.go:17-32 case."""
        return PartitionSpec(tuple(PartitionField(n, n) for n in names))

    @property
    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def columns(self) -> list[Column]:
        return [f.column() for f in self.fields]

    def with_partition_columns(self, df: DataFrame) -> DataFrame:
        """Materialize derived partition-value columns onto a DataFrame."""
        out = df
        for f in self.fields:
            if f.expr != f.name or f.name not in df.columns:
                out = out.withColumn(f.name, F.expr(f.expr))
        return out


def parse_partition_value(text: str) -> list[str]:
    """Tokenize a tuple partition value string → component values.

    ``"('2021-09-01', 42)"`` → ``['2021-09-01', '42']``. Engine analogue of
    RegexPartitionName (sidefunctions.go:11-15); kept for CLI/job-spec
    compatibility where partition values arrive as text.
    """
    return [t.strip() for t in _PARTITION_VALUE_TOKEN.findall(text) if t.strip()]
