"""Shared test/verification helpers: the order-insensitive compare the
driver's correctness gate uses (row count + column set + value hash)."""

from __future__ import annotations

import hashlib

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> str:
    # Kind-sensitive like the driver's gate: a DuckDB HUGEINT landing as
    # float64 (un-cast SUM over integers) must NOT hash equal to Spark's
    # int64 even when every value is integral; int widths (i4 vs i8)
    # still compare equal.
    kinds = ",".join(f"{c}:{df[c].dtype.kind}" for c in df.columns)
    payload = kinds + "\n" + df.to_csv(index=False, float_format="%.9g")
    return hashlib.md5(payload.encode()).hexdigest()


def frames_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"row count {len(a)} != {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns {sorted(a.columns)} != {sorted(b.columns)}"
    na, nb = normalize(a), normalize(b)
    if value_hash(na) != value_hash(nb):
        diff = (na != nb) & ~(na.isna() & nb.isna())
        bad = [c for c in na.columns if diff[c].any()]
        return False, f"value mismatch in columns {bad[:6]}"
    return True, "ok"
