"""Remaining reference-specific transforms: median imputation (J14),
one-hot encoding (M1), per-metro percentile windows (W1 scaled variant),
and the summary/correlation statistics surface (A13/A14).

Reference cites:
- per-metro median imputation + coalesce fallback:
  `/root/reference/notebooks/10_feature_engineering.py:334-364`
- one-hot via pd.get_dummies with a saved deterministic column order:
  `notebooks/11_train_model.py:64-67,404-408`
- percent_rank partitioned (our scale-safe variant of the reference's
  global single-partition window, `notebooks/01_seed_demo_data.py:661-664`)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import METROS
from ..functions import hex_sql
from ..functions.exprs import dround

# synthetic sparse column: parking ratio, missing for ~1/7 of sites
_PARKING = (
    "CASE WHEN site_id % 7 = 0 THEN NULL "
    "ELSE 0.5 + CAST((site_id * 37) % 100 AS DOUBLE) / 100.0 END"
)


def median_imputation(spark: SparkSession) -> DataFrame:
    """Per-metro median fill of a sparse numeric column: grouped exact
    median → left join back → coalesce (J14 + A9)."""
    sites = spark.table("sites").withColumn("parking_ratio", F.expr(_PARKING))
    med = sites.groupBy("metro").agg(
        F.expr("percentile(parking_ratio, 0.5)").alias("metro_median")
    )
    return (
        sites.join(med, "metro", "left")
        .select(
            "site_id",
            "metro",
            dround(F.coalesce(F.col("parking_ratio"), F.col("metro_median")), 6).alias(
                "parking_ratio_filled"
            ),
            F.col("parking_ratio").isNull().alias("was_imputed"),
        )
    )


def median_imputation_oracle_sql() -> str:
    return f"""
WITH sites AS ({hex_sql.sites_sql()}),
sp AS (SELECT site_id, metro, {_PARKING} AS parking_ratio FROM sites),
med AS (SELECT metro, QUANTILE_CONT(parking_ratio, 0.5) AS metro_median FROM sp GROUP BY metro)
SELECT sp.site_id, sp.metro,
       (FLOOR((COALESCE(sp.parking_ratio, med.metro_median)) * 1000000.0 + 0.5) / 1000000.0)
           AS parking_ratio_filled,
       sp.parking_ratio IS NULL AS was_imputed
FROM sp LEFT JOIN med ON sp.metro = med.metro"""


# deterministic categorical domains (reference one-hots metro AND
# property_type via pd.get_dummies, `notebooks/11_train_model.py:64-67`)
PROPERTY_TYPES = ["endcap", "freestanding", "inline"]


def one_hot_features(spark: SparkSession) -> DataFrame:
    """Deterministic one-hot encoding of BOTH categoricals (M1 complete):
    metro + property_type, fixed column order, 0/1 double columns."""
    sites = spark.table("sites")
    metro_cols = [
        F.when(F.col("metro") == name, 1.0).otherwise(0.0).alias(f"metro_{name.lower()}")
        for name, _, _ in METROS
    ]
    prop_cols = [
        F.when(F.col("property_type") == p, 1.0).otherwise(0.0).alias(f"property_{p}")
        for p in PROPERTY_TYPES
    ]
    return sites.select("site_id", *metro_cols, *prop_cols, F.col("drive_thru"))


def one_hot_features_oracle_sql() -> str:
    metro_cols = ",\n       ".join(
        f"CAST(CASE WHEN metro = '{name}' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS metro_{name.lower()}"
        for name, _, _ in METROS
    )
    prop_cols = ",\n       ".join(
        f"CAST(CASE WHEN property_type = '{p}' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS property_{p}"
        for p in PROPERTY_TYPES
    )
    return f"""
SELECT site_id,
       {metro_cols},
       {prop_cols},
       drive_thru
FROM ({hex_sql.sites_sql()}) __sites"""


def model_feature_column_names() -> list[str]:
    """THE persisted feature-order contract (reference saves
    gold.model_feature_columns so serving applies the training column
    order, `notebooks/11_train_model.py:404-408`): numeric features then
    one-hot columns, fixed."""
    from .ml import FEATURE_COLS

    return (
        list(FEATURE_COLS)
        + [f"metro_{name.lower()}" for name, _, _ in METROS]
        + [f"property_{p}" for p in PROPERTY_TYPES]
    )


def model_feature_columns(spark: SparkSession) -> DataFrame:
    """gold.model_feature_columns: (feature_name, feature_index)."""
    rows = [(name, i) for i, name in enumerate(model_feature_column_names())]
    return spark.createDataFrame(rows, "feature_name string, feature_index int")


def model_feature_columns_oracle_sql() -> str:
    vals = ", ".join(
        f"('{name}', {i})" for i, name in enumerate(model_feature_column_names())
    )
    return f"""
SELECT feature_name, feature_index
FROM (VALUES {vals}) AS __m(feature_name, feature_index)"""


def one_hot_metro(spark: SparkSession) -> DataFrame:
    """Deterministic one-hot encoding of the metro categorical (M1):
    fixed column order from config, 0/1 double columns."""
    sites = spark.table("sites")
    cols = [
        F.when(F.col("metro") == name, 1.0).otherwise(0.0).alias(
            f"metro_{name.lower()}"
        )
        for name, _, _ in METROS
    ]
    return sites.select("site_id", *cols, F.col("drive_thru"))


def one_hot_metro_oracle_sql() -> str:
    cols = ",\n       ".join(
        f"CAST(CASE WHEN metro = '{name}' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS metro_{name.lower()}"
        for name, _, _ in METROS
    )
    return f"""
SELECT site_id,
       {cols},
       drive_thru
FROM ({hex_sql.sites_sql()}) __sites"""


def percentile_by_metro(spark: SparkSession) -> DataFrame:
    """percent_rank partitioned by metro (the scale-safe window: one
    partition per metro instead of the reference's global sort)."""
    from .scoring import predicted_sales_col
    from .features import location_features

    feats = location_features(spark).filter(F.col("site_type") == "candidate")
    scored = feats.select("site_id", "metro", predicted_sales_col().alias("pred"))
    w = Window.partitionBy("metro").orderBy("pred", "site_id")
    return scored.select(
        "site_id",
        "metro",
        dround(F.col("pred"), 4).alias("predicted_annual_sales"),
        dround(F.percent_rank().over(w), 6).alias("metro_percentile"),
    )


def percentile_by_metro_oracle_sql() -> str:
    from .scoring import _scored_oracle_core

    return f"""
SELECT site_id, metro, predicted_annual_sales,
       (FLOOR((PERCENT_RANK() OVER (PARTITION BY metro
                                    ORDER BY predicted_annual_sales, site_id)) * 1000000.0 + 0.5) / 1000000.0)
           AS metro_percentile
FROM ({_scored_oracle_core()}) __s"""


def feature_summary(spark: SparkSession) -> DataFrame:
    """The A13 describe/summary surface + A14 correlation, as one tidy
    frame (reference: df.summary at `notebooks/10_feature_engineering.py:
    842-844`, corr loop at `:854-864`)."""
    from .features import location_features

    feats = location_features(spark)
    cols = ["population_1ring", "competitive_intensity", "trade_area_quality"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__count"),
            dround(F.avg(c), 4).alias(f"{c}__mean"),
            dround(F.min(c), 4).alias(f"{c}__min"),
            dround(F.expr(f"percentile({c}, 0.25)"), 4).alias(f"{c}__p25"),
            dround(F.expr(f"percentile({c}, 0.5)"), 4).alias(f"{c}__p50"),
            dround(F.expr(f"percentile({c}, 0.75)"), 4).alias(f"{c}__p75"),
            dround(F.max(c), 4).alias(f"{c}__max"),
        ]
    return feats.agg(*aggs)


def feature_summary_oracle_sql() -> str:
    from .features import location_features_oracle_sql

    cols = ["population_1ring", "competitive_intensity", "trade_area_quality"]
    parts = []
    for c in cols:
        parts += [
            f"COUNT({c}) AS {c}__count",
            f"(FLOOR((AVG({c})) * 10000.0 + 0.5) / 10000.0) AS {c}__mean",
            f"(FLOOR((MIN({c})) * 10000.0 + 0.5) / 10000.0) AS {c}__min",
            f"(FLOOR((QUANTILE_CONT({c}, 0.25)) * 10000.0 + 0.5) / 10000.0) AS {c}__p25",
            f"(FLOOR((QUANTILE_CONT({c}, 0.5)) * 10000.0 + 0.5) / 10000.0) AS {c}__p50",
            f"(FLOOR((QUANTILE_CONT({c}, 0.75)) * 10000.0 + 0.5) / 10000.0) AS {c}__p75",
            f"(FLOOR((MAX({c})) * 10000.0 + 0.5) / 10000.0) AS {c}__max",
        ]
    sel = ",\n       ".join(parts)
    return f"""
SELECT {sel}
FROM ({location_features_oracle_sql()}) __f"""


def hex_string_ids(spark: SparkSession) -> DataFrame:
    """Canonical 15-hex-char string rendering of cell ids — the
    reference's H3 string-id contract (validity regex ^[0-9a-f]{15}$,
    `notebooks/00_quality_checks.py:91-98`).  String ids are the
    interchange format; bigint ids are the join keys."""
    sites = spark.table("sites")
    hex_str = F.lower(F.lpad(F.hex(F.col("h3_res8")), 15, "0"))
    return sites.select(
        "site_id",
        F.col("h3_res8").alias("cell_id"),
        hex_str.alias("h3_str"),
        hex_str.rlike("^[0-9a-f]{15}$").alias("valid"),
    )


def hex_string_ids_oracle_sql() -> str:
    return f"""
SELECT site_id, h3_res8 AS cell_id,
       lpad(lower(to_hex(h3_res8)), 15, '0') AS h3_str,
       regexp_matches(lpad(lower(to_hex(h3_res8)), 15, '0'), '^[0-9a-f]{{15}}$') AS valid
FROM ({hex_sql.sites_sql()}) __sites"""
