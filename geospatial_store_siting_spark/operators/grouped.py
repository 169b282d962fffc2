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
        # deterministic floor-rounding (dround twin) — np.round is
        # half-to-even and would diverge from the SQL oracle
        out["robust_z"] = np.floor(rz * 1e6 + 0.5) / 1e6
        out["is_outlier"] = np.abs(rz) > 3.5
        return out

    schema = (
        "site_id bigint, metro string, predicted_annual_sales double, "
        "robust_z double, is_outlier boolean"
    )
    return scored.groupBy("metro").applyInPandas(per_group, schema=schema)


def metro_outlier_scores_oracle_sql() -> str:
    """SQL twin of the grouped-map kernel: per-metro median + MAD via
    exact quantiles, identical arithmetic order (0.6745·(x−med))/mad."""
    from .scoring import _scored_oracle_core

    rz = "((0.6745 * (d.predicted_annual_sales - d.med)) / (CASE WHEN m.mad = 0 THEN 1.0 ELSE m.mad END))"
    return f"""
WITH scored AS (
  SELECT site_id, metro, predicted_annual_sales
  FROM ({_scored_oracle_core()}) __sc
),
meds AS (
  SELECT metro, QUANTILE_CONT(predicted_annual_sales, 0.5) AS med
  FROM scored GROUP BY metro
),
devs AS (
  SELECT s.site_id, s.metro, s.predicted_annual_sales, m.med
  FROM scored s JOIN meds m ON s.metro = m.metro
),
mads AS (
  SELECT metro, QUANTILE_CONT(ABS(predicted_annual_sales - med), 0.5) AS mad
  FROM devs GROUP BY metro
)
SELECT d.site_id, d.metro, d.predicted_annual_sales,
       (FLOOR({rz} * 1000000.0 + 0.5) / 1000000.0) AS robust_z,
       ABS({rz}) > 3.5 AS is_outlier
FROM devs d JOIN mads m ON d.metro = m.metro"""


def metro_supply_balance(
    spark: SparkSession,
    stores_df: DataFrame | None = None,
    comps_df: DataFrame | None = None,
) -> DataFrame:
    """Cogrouped-map (``cogroup(...).applyInPandas``): stores and
    competitors arrive as TWO aligned pandas frames per metro key and are
    reconciled in one kernel — the two-sided per-group escape hatch (the
    pattern for per-key model blending / per-market reconciliation where
    both sides' rows are needed together).

    Scale: both sides hash-shuffle once on the metro key and stream
    group-by-group through Arrow; nothing is collected, and per-group
    memory is one metro's rows.  (Hot metros would be the skew concern —
    the salting pattern of operators/skew.py applies upstream.)
    """
    sites = spark.table("sites") if stores_df is None else stores_df
    if "site_type" in sites.columns:
        # same filter the oracle skeleton applies to ITS sites relation —
        # an override passing the full sites table (the symmetric parity
        # setup) must not count candidate/closed rows as stores
        sites = sites.filter(F.col("site_type") == "store")
    stores = sites.select("metro", "annual_sales")
    comps = (
        spark.table("competitors") if comps_df is None else comps_df
    ).select("metro", "competitor_id")

    def merge(key, s_pdf: pd.DataFrame, c_pdf: pd.DataFrame) -> pd.DataFrame:
        n_s, n_c = len(s_pdf), len(c_pdf)
        med = (
            float(np.median(s_pdf["annual_sales"].to_numpy(dtype=np.float64)))
            if n_s
            else None
        )
        # deterministic floor-rounding (dround twin — np.round is half-to-even)
        r4 = lambda x: None if x is None else float(np.floor(x * 1e4 + 0.5) / 1e4)  # noqa: E731
        return pd.DataFrame(
            {
                "metro": [key[0]],
                "n_stores": [n_s],
                "n_competitors": [n_c],
                "median_store_sales": [r4(med)],
                # None when EITHER side is empty: a metro with competitors
                # but no store row reaches the oracle's FULL OUTER join with
                # NULL n_stores, so its division is NULL — not 0.0
                "stores_per_competitor": [r4(n_s / n_c) if (n_c and n_s) else None],
            }
        )

    schema = (
        "metro string, n_stores bigint, n_competitors bigint, "
        "median_store_sales double, stores_per_competitor double"
    )
    return (
        stores.groupBy("metro")
        .cogroup(comps.groupBy("metro"))
        .applyInPandas(merge, schema=schema)
    )


def metro_supply_balance_oracle_sql(
    sites_sql: str | None = None, competitors_sql: str | None = None
) -> str:
    """SQL twin: per-side grouped aggregates full-outer-joined on metro
    (cogroup passes an empty frame for a key missing on one side —
    FULL OUTER + COALESCE mirrors that).  ``sites_sql``/``competitors_sql``
    override the input relations so crafted fixtures (store-less metros)
    can run the SAME skeleton the sf oracle uses."""
    from ..functions import hex_sql

    sites_sql = sites_sql or hex_sql.sites_sql()
    competitors_sql = competitors_sql or hex_sql.competitors_sql()
    return f"""
WITH sites AS ({sites_sql}), competitors AS ({competitors_sql}),
s AS (
  SELECT metro, COUNT(*) AS n_stores,
         QUANTILE_CONT(annual_sales, 0.5) AS med
  FROM sites WHERE site_type = 'store' GROUP BY metro
),
c AS (SELECT metro, COUNT(*) AS n_comp FROM competitors GROUP BY metro)
SELECT COALESCE(s.metro, c.metro) AS metro,
       COALESCE(s.n_stores, 0) AS n_stores,
       COALESCE(c.n_comp, 0) AS n_competitors,
       (FLOOR(s.med * 10000.0 + 0.5) / 10000.0) AS median_store_sales,
       CASE WHEN COALESCE(c.n_comp, 0) = 0 THEN NULL
            ELSE (FLOOR((CAST(s.n_stores AS DOUBLE) / c.n_comp) * 10000.0 + 0.5) / 10000.0)
       END AS stores_per_competitor
FROM s FULL OUTER JOIN c ON s.metro = c.metro"""
