"""ML operators (SURVEY §2.10): model training + distributed Huff-β
calibration, with the reference's quality-gate semantics.

- ``train_sales_model`` — pyspark.ml GBTRegressor on the engineered
  features against store sales (the reference's XGBoost/Optuna/SHAP stack,
  `notebooks/11_train_model.py:188-247`, is swapped for Spark-native GBT
  per SURVEY §7.0(b); same feature/label contract, same R²/MAPE gates at
  `notebooks/_config.py:156-158`).
- ``feature_contributions`` — the shap_top5 JSON contract
  (`notebooks/13_score_candidates.py:123-146`) approximated by
  importance × standardized value, serialized with to_json.
- ``calibrate_huff_beta`` — the reference's driver-side nested loops
  (`notebooks/10_feature_engineering.py:469-549`) re-expressed as a
  DISTRIBUTED grid search: β is a column from explode(β-grid), gravity/
  share/demand computed per β in one shuffle, then corr(demand, sales)
  per β and an argmax — no Python loops over rows anywhere.

Training is inherently iterative/non-SQL → rows-only checks; the β
calibration correlation is portable (CORR exists in both engines) but the
grid expansion keeps it Spark-surfaced — its oracle is the pytest
recomputation at tiny SF.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import HUFF_BETA_GRID, MODEL_MAPE_GATE, MODEL_R2_GATE
from ..functions.exprs import dround

# full NUMERIC_FEATURES analog (reference `_config.py:95-124`)
FEATURE_COLS = [
    "population_1ring",
    "median_income_1ring",
    "target_demo_pct_1ring",
    "daytime_pop_1ring",
    "college_pct_1ring",
    "max_pedestrian_traffic",
    "avg_transit_score",
    "foot_traffic_sum",
    "competitors_1ring",
    "competitors_3ring",
    "nearest_competitor_miles",
    "nearest_same_category_dist",
    "competitive_intensity",
    "anchor_poi_1ring",
    "office_poi_count_1ring",
    "school_count_2ring",
    "total_foot_traffic_1ring",
    "drive_thru",
    "parking_spaces",
    "square_feet",
    "rent_per_sqft",
    "trade_area_quality",
    "cannibalization_risk",
    "market_saturation",
    "huff_market_share",
    "huff_expected_demand",
]


def training_frame(spark: SparkSession) -> DataFrame:
    """features ⋈ store sales (J10 target join, inner on site_id)."""
    from .features import location_features

    feats = location_features(spark)
    stores = spark.table("sites").filter(F.col("site_type") == "store").select(
        "site_id", "annual_sales"
    )
    return feats.join(stores, "site_id", "inner")


def train_sales_model(spark: SparkSession):
    """GBT regression with seeded split + reference quality gates.
    Returns (model, metrics dict)."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    df = training_frame(spark).na.fill(0.0, FEATURE_COLS)
    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="features_vec")
    data = assembler.transform(df).select("site_id", "features_vec", "annual_sales")
    train, test = data.randomSplit([0.8, 0.2], seed=42)
    gbt = GBTRegressor(
        featuresCol="features_vec", labelCol="annual_sales", maxIter=30, maxDepth=4, seed=42
    )
    model = gbt.fit(train)
    pred = model.transform(test)
    r2 = RegressionEvaluator(
        labelCol="annual_sales", predictionCol="prediction", metricName="r2"
    ).evaluate(pred)
    mape = (
        pred.select(
            F.avg(F.abs(F.col("prediction") - F.col("annual_sales")) / F.col("annual_sales"))
        ).first()[0]
    )
    metrics = {
        "r2": r2,
        "mape": mape,
        "r2_gate": MODEL_R2_GATE,
        "mape_gate": MODEL_MAPE_GATE,
        "passes_gates": bool(r2 >= MODEL_R2_GATE and mape <= MODEL_MAPE_GATE),
        "feature_importances": dict(
            zip(FEATURE_COLS, [float(x) for x in model.featureImportances.toArray()])
        ),
    }
    return model, metrics


def model_predictions(spark: SparkSession) -> DataFrame:
    """Rows-only query surface: GBT predictions for candidate sites with
    the shap_top5-style contribution JSON."""
    from pyspark.ml.feature import VectorAssembler

    model, metrics = train_sales_model(spark)
    from .features import location_features

    feats = location_features(spark).filter(F.col("site_type") == "candidate").na.fill(
        0.0, FEATURE_COLS
    )
    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="features_vec")
    pred = model.transform(assembler.transform(feats))
    imps = metrics["feature_importances"]
    # contribution proxy: importance * feature value, top-5 as JSON
    contrib_cols = F.array(
        *[
            F.struct(
                F.lit(c).alias("feature"),
                (F.col(c) * F.lit(imps[c])).alias("contribution"),
            )
            for c in FEATURE_COLS
        ]
    )
    top5 = F.slice(
        F.reverse(F.array_sort(contrib_cols, lambda a, b: F.when(
            a["contribution"] < b["contribution"], -1
        ).when(a["contribution"] > b["contribution"], 1).otherwise(0))),
        1,
        5,
    )
    return pred.select(
        "site_id",
        F.col("prediction").alias("predicted_annual_sales"),
        F.to_json(top5).alias("shap_top5"),
    )


def calibrate_huff_beta(spark: SparkSession) -> DataFrame:
    """Distributed β grid search (M4): one plan computes demand per (site,
    β) via explode(β-grid); corr(huff_demand, annual_sales) per β; best β
    by max correlation.  Returns one row per β with is_best flag."""
    from . import rings
    from .huff import _dist2_miles, supply_df
    from ..config import DISTANCE_FLOOR_MILES, TRADE_AREA_RADIUS_MILES

    stores = spark.table("sites").filter(F.col("site_type") == "store")
    cells = spark.table("hex_grid").select(
        "cell_id", "centroid_lat", "centroid_lon", "population"
    )
    trade = rings.ring_pairs(spark, stores, k=2, extra_cols=["lat", "lon", "annual_sales"])
    j = trade.join(cells, trade.neighbor_h3 == cells.cell_id, "inner")
    d2 = _dist2_miles(
        F.col("lat"), F.col("lon"), F.col("centroid_lat"), F.col("centroid_lon")
    )
    j = j.withColumn("d", F.sqrt(F.greatest(d2, F.lit(DISTANCE_FLOOR_MILES ** 2))))
    # β dimension via explode — the grid search IS the plan, not a loop
    betas = F.array(*[F.lit(float(b)) for b in HUFF_BETA_GRID])
    j = j.withColumn("beta", F.explode(betas))
    j = j.withColumn("g", F.lit(1.0) / F.pow(F.col("d"), F.col("beta")))
    demand = (
        j.groupBy("site_id", "beta", "annual_sales")
        .agg(F.sum(F.col("g") * F.col("population")).alias("huff_demand"))
    )
    per_beta = (
        demand.groupBy("beta")
        .agg(
            dround(F.corr("huff_demand", "annual_sales"), 6).alias("corr_with_sales"),
            F.count(F.lit(1)).alias("n_stores"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("corr_with_sales"), F.asc("beta"))
    return per_beta.withColumn("rank", F.row_number().over(w)).withColumn(
        "is_best", F.col("rank") == 1
    ).drop("rank")


def calibrate_huff_beta_oracle_sql() -> str:
    """DuckDB twin of the β grid search: the calibration is fully
    relational (ring expansion × β VALUES grid → gravity demand → CORR per
    β → argmax), so it gets a value-checked oracle like any other query.
    POWER with fractional β is libm on both engines (≤1 ulp); the 1e-6
    floor-rounding on the final CORR absorbs the summation-order and ulp
    noise, and the argmax is computed on the ROUNDED value in both."""
    from ..functions import hex_sql
    from . import rings
    from .huff import _dist2_sql
    from ..config import DISTANCE_FLOOR_MILES

    ring = rings.ring_pairs_oracle_sql(
        "SELECT site_id, lat, lon, annual_sales, q, r FROM sites WHERE site_type = 'store'",
        2,
        extra_cols=["lat", "lon", "annual_sales"],
    )
    beta_rows = ", ".join(f"({float(b)})" for b in HUFF_BETA_GRID)
    d2 = _dist2_sql("t.lat", "t.lon", "h.centroid_lat", "h.centroid_lon")
    floor2 = DISTANCE_FLOOR_MILES ** 2
    return f"""
WITH sites AS ({hex_sql.sites_sql()}), hex_grid AS ({hex_sql.grid_sql()}),
trade AS ({ring}),
betas AS (SELECT CAST(beta AS DOUBLE) AS beta FROM (VALUES {beta_rows}) AS __b(beta)),
demand AS (
  SELECT t.site_id, b.beta, t.annual_sales,
         SUM((1.0 / POWER(SQRT(GREATEST({d2}, {floor2})), b.beta)) * h.population)
             AS huff_demand
  FROM trade t
  JOIN hex_grid h ON t.neighbor_h3 = h.cell_id
  CROSS JOIN betas b
  GROUP BY t.site_id, b.beta, t.annual_sales
),
per_beta AS (
  SELECT beta,
         (FLOOR((CORR(huff_demand, annual_sales)) * 1000000.0 + 0.5) / 1000000.0)
             AS corr_with_sales,
         COUNT(*) AS n_stores
  FROM demand GROUP BY beta
)
SELECT beta, corr_with_sales, n_stores,
       (ROW_NUMBER() OVER (ORDER BY corr_with_sales DESC, beta ASC)) = 1 AS is_best
FROM per_beta"""


def feature_importance(spark: SparkSession) -> DataFrame:
    """The app's feature-importance endpoint (`app/main.py:267-280`):
    GBT importances ranked (rows-only — tree ensembles aren't
    SQL-expressible)."""
    _, metrics = train_sales_model(spark)
    ranked = sorted(metrics["feature_importances"].items(), key=lambda kv: (-kv[1], kv[0]))
    rows = [(name, float(imp), i + 1) for i, (name, imp) in enumerate(ranked)]
    return spark.createDataFrame(rows, "feature_name string, importance double, rank int")
