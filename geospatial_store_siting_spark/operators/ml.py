"""ML operators (SURVEY §2.10): model training + distributed Huff-β
calibration, with the reference's quality-gate semantics.

- ``train_sales_model`` — pyspark.ml GBTRegressor on the engineered
  features against store sales (the reference's XGBoost/Optuna/SHAP stack,
  `notebooks/11_train_model.py:188-247`, is swapped for Spark-native GBT
  per SURVEY §7.0(b); same feature/label contract, same R²/MAPE gates at
  `notebooks/_config.py:156-158`).
- ``feature_contributions`` — the shap_top5 JSON contract
  (`notebooks/13_score_candidates.py:123-146`) via SAABAS path
  attribution over the trained GBT: each tree's prediction decomposes
  exactly into bias + per-feature deltas along the decision path
  (value(child) − value(node) charged to the split feature), so
  bias + Σ contributions == the model's prediction per row — true
  per-row tree attribution, not a proxy.  Tree tables are extracted
  once on the driver (30 trees × ≤31 nodes) and broadcast; the kernel
  is one Arrow-batched pandas UDF doing vectorized node descent.
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

import numpy as np
import pandas as pd
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


def train_sales_model(spark: SparkSession, cv_folds: int | None = None):
    """GBT regression with seeded split + reference quality gates.
    Returns (model, metrics dict).  ``cv_folds=k`` additionally runs
    k-fold CV first (`cross_validate_sales_model`) and attaches
    ``cv_r2_mean`` / ``cv_r2_std`` / ``cv_passes_gate`` to the metrics —
    the reference's confidence-interval step before the final fit
    (`notebooks/11_train_model.py:110-167`)."""
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
    if cv_folds:
        cv = cross_validate_sales_model(spark, k=cv_folds).first()
        metrics.update(
            cv_r2_mean=cv["r2_mean"], cv_r2_std=cv["r2_std"],
            cv_passes_gate=cv["passes_gate"], cv_stable=cv["stable"],
        )
    return model, metrics


def _tree_table(tree_model):
    """Flatten a pyspark.ml DecisionTreeRegressionModel into parallel
    numpy arrays (feature, threshold, left, right, value) with one
    driver-side walk of the JVM node graph — O(numNodes), tiny for
    depth-4 trees, and the broadcastable form the Saabas kernel needs.
    Internal nodes carry the subtree mean as ``prediction()``, which is
    exactly the node value Saabas attribution differences."""
    feat: list[int] = []
    thr: list[float] = []
    left: list[int] = []
    right: list[int] = []
    val: list[float] = []

    def add(node) -> int:
        idx = len(feat)
        feat.append(-1)
        thr.append(0.0)
        left.append(-1)
        right.append(-1)
        val.append(float(node.prediction()))
        if "InternalNode" in node.getClass().getSimpleName():
            split = node.split()
            if "ContinuousSplit" not in split.getClass().getSimpleName():
                # never produced here: assembled features are plain doubles
                # with no categorical metadata
                raise NotImplementedError("categorical splits not supported")
            feat[idx] = int(split.featureIndex())
            thr[idx] = float(split.threshold())
            left[idx] = add(node.leftChild())
            right[idx] = add(node.rightChild())
        return idx

    add(tree_model._call_java("rootNode"))
    return (
        np.array(feat, dtype=np.int32),
        np.array(thr, dtype=np.float64),
        np.array(left, dtype=np.int32),
        np.array(right, dtype=np.int32),
        np.array(val, dtype=np.float64),
    )


def saabas_contributions(X, trees, weights):
    """Vectorized Saabas path attribution for a GBT ensemble.

    ``X``: (n, d) float64; ``trees``: list of _tree_table outputs;
    ``weights``: per-tree weights (GBT prediction = Σ wᵢ·treeᵢ(x)).
    Returns (bias, contrib (n, d)) with the exact decomposition
    bias + contrib.sum(1) == prediction — every split visited charges
    w·(value(child) − value(node)) to its split feature.  All rows
    descend in lockstep (numpy gather per level, no per-row Python),
    the Arrow-batch-friendly form for the pandas UDF."""
    n, d = X.shape
    contrib = np.zeros((n, d))
    bias = 0.0
    rows = np.arange(n)
    for (feat, thr, left, right, val), w in zip(trees, weights):
        bias += w * val[0]
        cur = np.zeros(n, dtype=np.int32)
        active = feat[cur] >= 0
        while active.any():
            idx = cur[active]
            f = feat[idx]
            go_left = X[active, f] <= thr[idx]
            child = np.where(go_left, left[idx], right[idx])
            np.add.at(contrib, (rows[active], f), w * (val[child] - val[idx]))
            cur[active] = child
            active = feat[cur] >= 0
    return bias, contrib


def model_predictions(spark: SparkSession) -> DataFrame:
    """Rows-only query surface: GBT predictions for candidate sites with
    the shap_top5 contribution JSON (`notebooks/13_score_candidates.py:
    123-146`) — per-row Saabas tree-path attribution (exact decomposition
    of the GBT prediction), plus the bias and contribution-sum columns
    that make the decomposition checkable: predicted_annual_sales ==
    contrib_bias + contrib_sum to float precision (asserted in
    tests/test_round5_ops.py with an independent numpy recomputation)."""
    from pyspark.ml.feature import VectorAssembler

    model, _ = train_sales_model(spark)
    from .features import location_features

    feats = location_features(spark).filter(F.col("site_type") == "candidate").na.fill(
        0.0, FEATURE_COLS
    )
    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="features_vec")
    pred = model.transform(assembler.transform(feats))

    trees = [_tree_table(t) for t in model.trees]
    weights = [float(w) for w in model.treeWeights]
    bc = spark.sparkContext.broadcast((trees, weights))
    names = list(FEATURE_COLS)

    @F.pandas_udf("struct<shap_top5:string,contrib_bias:double,contrib_sum:double>")
    def attributions(batch: pd.DataFrame) -> pd.DataFrame:
        b_trees, b_weights = bc.value
        X = batch[names].to_numpy(dtype=np.float64)
        bias, contrib = saabas_contributions(X, b_trees, b_weights)
        rounded = np.floor(contrib * 1e6 + 0.5) / 1e6
        out_json = []
        for r in rounded:
            # deterministic top-5: contribution desc, feature name asc
            order = sorted(range(len(names)), key=lambda i: (-r[i], names[i]))[:5]
            out_json.append(
                json.dumps(
                    [{"feature": names[i], "contribution": r[i]} for i in order]
                )
            )
        return pd.DataFrame(
            {
                "shap_top5": out_json,
                "contrib_bias": np.full(len(X), bias),
                "contrib_sum": contrib.sum(axis=1),
            }
        )

    att = attributions(F.struct(*[F.col(c) for c in names]))
    return pred.withColumn("__att", att).select(
        "site_id",
        F.col("prediction").alias("predicted_annual_sales"),
        F.col("__att.shap_top5").alias("shap_top5"),
        F.col("__att.contrib_bias").alias("contrib_bias"),
        F.col("__att.contrib_sum").alias("contrib_sum"),
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


CV_FOLDS = 5  # reference `notebooks/_config.py:159`
CV_R2_STD_STABILITY = 0.15  # reference `notebooks/11_train_model.py:161`


def cross_validate_sales_model(spark: SparkSession, k: int = CV_FOLDS) -> DataFrame:
    """k-fold CV confidence intervals (`notebooks/11_train_model.py:
    110-167`): per-fold R²/MAPE/RMSE for a baseline GBT, with mean ± std
    and the reference's gates — quality gate on the MEAN R² vs
    MODEL_R2_GATE, stability flag when the R² std exceeds 0.15.

    Fold assignment is ``crc32(site_id) mod k`` — deterministic and
    shuffle-free in a distributed setting (the reference's row-order
    KFold(shuffle=True) has no stable distributed analog); each fold
    fits on the other k−1 folds and evaluates on its own.  Rows-only
    check (iterative ML), one row per fold with the summary columns
    repeated (flat schema)."""
    import math

    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    df = training_frame(spark).na.fill(0.0, FEATURE_COLS)
    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="features_vec")
    data = (
        assembler.transform(df)
        .select("site_id", "features_vec", "annual_sales")
        .withColumn("fold", F.pmod(F.crc32(F.col("site_id").cast("string")), F.lit(k)))
        .localCheckpoint(eager=True)  # k fits reuse one materialization
    )
    # hash folds can come up empty on tiny inputs (sf0.001 has ~15 store
    # rows); evaluating an empty fold throws in the JVM summarizer, so CV
    # runs over the populated folds only (mean/std are over those)
    fold_sizes = {
        r["fold"]: r["n"]
        for r in data.groupBy("fold").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = []
    for i in range(k):
        if not fold_sizes.get(i):
            continue
        train = data.filter(F.col("fold") != i)
        test = data.filter(F.col("fold") == i)
        model = GBTRegressor(
            featuresCol="features_vec",
            labelCol="annual_sales",
            maxIter=30,
            maxDepth=4,
            seed=42,
        ).fit(train)
        pred = model.transform(test)
        r2 = RegressionEvaluator(
            labelCol="annual_sales", predictionCol="prediction", metricName="r2"
        ).evaluate(pred)
        mape, rmse = pred.select(
            F.avg(
                F.abs(F.col("prediction") - F.col("annual_sales")) / F.col("annual_sales")
            ),
            F.sqrt(F.avg(F.pow(F.col("prediction") - F.col("annual_sales"), 2))),
        ).first()
        rows.append((i, float(r2), float(mape), float(rmse)))

    if not rows:
        raise ValueError("cross-validation found no populated folds")
    r2s = [r[1] for r in rows]
    mean = sum(r2s) / len(r2s)
    # population std, like the reference's np.std
    std = math.sqrt(sum((x - mean) ** 2 for x in r2s) / len(r2s))
    passes = bool(mean >= MODEL_R2_GATE)
    stable = bool(std <= CV_R2_STD_STABILITY)
    out = [
        (fold, r2, mape, rmse, mean, std, passes, stable)
        for fold, r2, mape, rmse in rows
    ]
    return spark.createDataFrame(
        out,
        "fold int, r2 double, mape double, rmse double, "
        "r2_mean double, r2_std double, passes_gate boolean, stable boolean",
    )


def feature_importance(spark: SparkSession) -> DataFrame:
    """The app's feature-importance endpoint (`app/main.py:267-280`):
    GBT importances ranked (rows-only — tree ensembles aren't
    SQL-expressible)."""
    _, metrics = train_sales_model(spark)
    ranked = sorted(metrics["feature_importances"].items(), key=lambda kv: (-kv[1], kv[0]))
    rows = [(name, float(imp), i + 1) for i, (name, imp) in enumerate(ranked)]
    return spark.createDataFrame(rows, "feature_name string, importance double, rank int")
