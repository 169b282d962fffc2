"""Shared Column-expression helpers (JVM-side, codegen-friendly)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column, n: int) -> Column:
    """Deterministic rounding FLOOR(x*10^n + 0.5)/10^n — mirror of
    functions.hex_sql.round_sql, bit-identical across engines (native
    ROUND differs at half-way boundaries between Spark and DuckDB)."""
    p = float(10**n)
    return F.floor(col * F.lit(p) + F.lit(0.5)).cast("double") / F.lit(p)
