"""Local mimic of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same sf dir,
normalizes both to pandas (columns sorted by name, rows sorted by all
columns), and asserts exact value equality. Stricter than tolerance-based
comparison on purpose: the engine's queries are designed to be
cross-engine deterministic (decimal-exact aggregation, engine-internal
fingerprints), so any drift is a design bug to fix, not to tolerate.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    import numpy as np

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: pd.Timestamp(v)
                if isinstance(v, (datetime.date, datetime.datetime))
                else tuple(v)
                if isinstance(v, (list, tuple, np.ndarray))
                else v
            )
        elif pd.api.types.is_datetime64_any_dtype(df[c].dtype):
            df[c] = df[c].map(lambda v: pd.Timestamp(v) if pd.notna(v) else None)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def _dtype_key(dt) -> str:
    """Canonical dtype signature so int32-vs-int64 style drift is caught
    (the driver compares schemas; keep Spark and DuckDB types aligned)."""
    return f"{dt.kind}{getattr(dt, 'itemsize', '')}"


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str) -> None:
    raw_got, raw_want = spark_df.toPandas(), oracle_pdf
    for c in sorted(set(raw_got.columns) & set(raw_want.columns)):
        gk, wk = _dtype_key(raw_got[c].dtype), _dtype_key(raw_want[c].dtype)
        # datetime64 representation differences are normalized later; only
        # flag numeric width/kind drift
        if {raw_got[c].dtype.kind, raw_want[c].dtype.kind} <= {"i", "u", "f"}:
            assert gk == wk, f"{name}: dtype mismatch col={c} spark={raw_got[c].dtype} oracle={raw_want[c].dtype}"
    got = normalize(raw_got)
    want = normalize(raw_want)
    assert len(got) == len(want), (
        f"{name}: row count mismatch spark={len(got)} oracle={len(want)}"
    )
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch spark={list(got.columns)} oracle={list(want.columns)}"
    )
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            assert _values_equal(a, b), (
                f"{name}: value mismatch col={c} row={i}: spark={a!r} oracle={b!r}"
            )
