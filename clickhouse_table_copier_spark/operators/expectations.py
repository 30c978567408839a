"""Data-quality expectations — the validation gate before ingestion/sync.

A training-data pipeline (and a careful sync job) asserts properties of a
table before writing it onward: null rates, value bounds, uniqueness,
row-count floors, accepted-value sets. This operator evaluates a rule
list in ONE aggregation pass (every rule compiles to an aggregate
expression — no per-rule scans, no UDFs) and returns a long-format
report: one row per rule with the observed value and pass/fail.

Rules (dicts; ``column`` + ``check`` + check-specific params):

- ``{"column": c, "check": "not_null", "max_null_frac": f}``
- ``{"column": c, "check": "unique"}``            — no duplicate values
- ``{"column": c, "check": "between", "lo": x, "hi": y}`` — all values in range
- ``{"column": c, "check": "in_set", "values": [...]}``   — accepted values
- ``{"column": None, "check": "min_rows", "n": k}``

At 100 TB this is one scan with map-side-combined partials — the same
cost as one grouped aggregate, regardless of how many rules run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rule_exprs(rule: dict, idx: int) -> tuple[Column, Column]:
    """(observed, passed) aggregate expressions for one rule."""
    check = rule["check"]
    c = rule.get("column")
    if check == "not_null":
        frac = F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast(
            "double"
        ) / F.count(F.lit(1)).cast("double")
        return frac, frac <= float(rule.get("max_null_frac", 0.0))
    if check == "unique":
        dupes = (F.count(c) - F.countDistinct(c)).cast("double")
        return dupes, dupes == 0
    if check == "between":
        bad = F.sum(
            F.when(
                F.col(c).isNotNull()
                & ((F.col(c) < rule["lo"]) | (F.col(c) > rule["hi"])),
                1,
            ).otherwise(0)
        ).cast("double")
        return bad, bad == 0
    if check == "in_set":
        bad = F.sum(
            F.when(
                F.col(c).isNotNull() & ~F.col(c).isin(list(rule["values"])), 1
            ).otherwise(0)
        ).cast("double")
        return bad, bad == 0
    if check == "min_rows":
        n = F.count(F.lit(1)).cast("double")
        return n, n >= float(rule["n"])
    raise ValueError(f"unknown check: {check!r}")


def validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """One-pass evaluation → (rule_idx, column, check, observed, passed)."""
    if not rules:
        raise ValueError("no rules given")
    aggs = []
    for i, rule in enumerate(rules):
        obs, ok = _rule_exprs(rule, i)
        aggs.append(obs.alias(f"__obs_{i}"))
        aggs.append(ok.cast("int").alias(f"__ok_{i}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"{i}, '{rules[i].get('column') or ''}', '{rules[i]['check']}', "
        f"__obs_{i}, __ok_{i}"
        for i in range(len(rules))
    )
    return wide.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS "
            "(rule_idx, column, check, observed, passed)"
        )
    ).select(
        F.col("rule_idx").cast("int").alias("rule_idx"),
        "column",
        "check",
        F.col("observed").cast("double").alias("observed"),
        F.col("passed").cast("int").alias("passed"),
    )
