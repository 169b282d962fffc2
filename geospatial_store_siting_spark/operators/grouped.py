"""Grouped-map operators via applyInPandas — the per-group pandas escape
hatch (SURVEY §7 pattern list): each metro's rows arrive as one pandas
DataFrame, numpy computes within the group, results return as Arrow.

Used where semantics are genuinely per-group-imperative: robust (median/
MAD) outlier scoring needs two passes over the group's distribution —
expressible in SQL with two grouped joins, but the grouped-map form is the
idiomatic kernel when the per-group logic grows (and is the pattern for
per-group model scoring).  Rows-only check (the SQL twin exists as
median_imputation's shape; this surface exercises applyInPandas itself).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def metro_outlier_scores(spark: SparkSession) -> DataFrame:
    """Per-metro robust z-scores (median/MAD) of predicted sales with an
    outlier flag — one pandas group per metro."""
    from .scoring import score_candidates

    scored = score_candidates(spark).select("site_id", "metro", "predicted_annual_sales")

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["predicted_annual_sales"].to_numpy(dtype=np.float64)
        med = np.median(x)
        mad = np.median(np.abs(x - med)) or 1.0
        rz = 0.6745 * (x - med) / mad
        out = pdf[["site_id", "metro", "predicted_annual_sales"]].copy()
        out["robust_z"] = np.round(rz, 6)
        out["is_outlier"] = np.abs(rz) > 3.5
        return out

    schema = (
        "site_id bigint, metro string, predicted_annual_sales double, "
        "robust_z double, is_outlier boolean"
    )
    return scored.groupBy("metro").applyInPandas(per_group, schema=schema)
