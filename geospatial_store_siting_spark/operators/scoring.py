"""Candidate scoring: predicted sales → percentile rank → tier → top-N.

Reference semantics: ``/root/reference/notebooks/13_score_candidates.py``
L109-146 (model prediction), L168 (pandas ``rank(pct=True)`` → here
``percent_rank()`` over an ordered window, W2 in SURVEY §2.5), L171-181
(tier thresholds A≥.90 / B≥.70 / C≥.40 / D), L200 (top-5 per metro →
``row_number`` window, W4).

For the oracle-checked surface the "model" is a deterministic linear
scorer over the engineered features (the GBT trainer in operators/ml.py is
the non-SQL-expressible variant, checked rows-only).  Window choice at
scale: the global percent_rank window is a single-partition sort — fine
for ≤10^7 scored candidates (the real-world cardinality of scoring
output); for larger, scoring.py exposes the per-metro variant which
partitions the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exprs import dround
from .features import gold_features, location_features_oracle_sql

# (name, weight) — deterministic linear scorer over engineered features
SCORE_WEIGHTS = [
    ("population_1ring", 50.0),
    ("target_demo_pct_1ring", 400000.0),
    ("anchor_poi_1ring", 20000.0),
    ("max_pedestrian_traffic", 100.0),
    ("competitive_intensity", -3000.0),
    ("cannibalization_risk", -2000.0),
    ("drive_thru", 75000.0),
]
SCORE_INTERCEPT = 500000.0


def predicted_sales_col():
    expr = F.lit(SCORE_INTERCEPT)
    for name, w in SCORE_WEIGHTS:
        expr = expr + F.coalesce(F.col(name), F.lit(0.0)) * F.lit(w)
    return dround(expr, 4)


def score_candidates(spark: SparkSession, features_df: DataFrame | None = None) -> DataFrame:
    """gold.scored_locations: candidates only, percentile + tier.

    ``features_df`` lets a caller feed an explicit feature table; with no
    argument the resolver prefers the pipeline's COMMITTED feature snapshot
    and only recomputes the feature plan when none exists
    (features.gold_features)."""
    feats = gold_features(spark, features_df).filter(F.col("site_type") == "candidate")
    scored = feats.select(
        "site_id", "metro", predicted_sales_col().alias("predicted_annual_sales")
    )
    # distributed two-pass global rank (operators/ranks.py) — a plain
    # Window.orderBy here would single-partition every scored candidate
    from .ranks import with_percent_rank

    scored = with_percent_rank(
        scored, ["predicted_annual_sales", "site_id"], out_col="__pr"
    ).withColumn("percentile", dround(F.col("__pr"), 6)).drop("__pr")
    tier = (
        F.when(F.col("percentile") >= 0.90, "A")
        .when(F.col("percentile") >= 0.70, "B")
        .when(F.col("percentile") >= 0.40, "C")
        .otherwise("D")
    )
    return scored.withColumn("tier", tier)


def _scored_oracle_core() -> str:
    feats = location_features_oracle_sql()
    score = " + ".join(
        [str(SCORE_INTERCEPT)]
        + [f"COALESCE({name}, 0.0) * {repr(w)}" for name, w in SCORE_WEIGHTS]
    )
    return f"""
WITH feats AS ({feats}),
scored AS (
  SELECT site_id, metro, (FLOOR(({score}) * 10000.0 + 0.5) / 10000.0) AS predicted_annual_sales
  FROM feats WHERE site_type = 'candidate'
)
SELECT site_id, metro, predicted_annual_sales,
       (FLOOR((PERCENT_RANK() OVER (ORDER BY predicted_annual_sales, site_id)) * 1000000.0 + 0.5) / 1000000.0)
           AS percentile
FROM scored"""


def score_candidates_oracle_sql() -> str:
    return f"""
SELECT site_id, metro, predicted_annual_sales, percentile,
       CASE WHEN percentile >= 0.90 THEN 'A'
            WHEN percentile >= 0.70 THEN 'B'
            WHEN percentile >= 0.40 THEN 'C'
            ELSE 'D' END AS tier
FROM ({_scored_oracle_core()}) __s"""


def scored_view(spark: SparkSession, scored_df: DataFrame | None = None) -> DataFrame:
    """Resolve gold.scored_locations: explicit DataFrame > the pipeline's
    committed stage table > recompute (mirrors features.gold_features —
    the reference app reads the persisted scored table, `app/main.py:146`)."""
    if scored_df is not None:
        return scored_df
    from ..sources.tables import stage_view

    staged = stage_view(spark, "scored_locations")
    return staged if staged is not None else score_candidates(spark)


def top_candidates_per_metro(spark: SparkSession, n: int = 5) -> DataFrame:
    """Top-N candidates per metro (reference pandas ``nlargest(5)`` → W4
    row_number window)."""
    scored = scored_view(spark)
    w = Window.partitionBy("metro").orderBy(
        F.desc("predicted_annual_sales"), F.asc("site_id")
    )
    return (
        scored.withColumn("rank_in_metro", F.row_number().over(w))
        .filter(F.col("rank_in_metro") <= n)
        .select("metro", "site_id", "predicted_annual_sales", "rank_in_metro")
    )


def top_candidates_per_metro_oracle_sql(n: int = 5) -> str:
    return f"""
SELECT metro, site_id, predicted_annual_sales, rank_in_metro
FROM (
  SELECT metro, site_id, predicted_annual_sales,
         ROW_NUMBER() OVER (PARTITION BY metro
                            ORDER BY predicted_annual_sales DESC, site_id ASC)
             AS rank_in_metro
  FROM ({_scored_oracle_core()}) __s
) __r
WHERE rank_in_metro <= {n}"""


def metro_summary(spark: SparkSession) -> DataFrame:
    """Per-metro summary — the app's metro endpoint
    (`app/main.py:224-236`): avg prediction, tier-A share (A8 conditional
    sum), counts."""
    scored = scored_view(spark)
    return (
        scored.groupBy("metro")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            dround(F.avg("predicted_annual_sales"), 4).alias("avg_predicted_sales"),
            F.count(F.when(F.col("tier") == "A", F.lit(1))).alias("tier_a_count"),
            dround(F.max("predicted_annual_sales"), 4).alias("best_predicted_sales"),
        )
    )


def metro_summary_oracle_sql() -> str:
    return f"""
SELECT metro,
       COUNT(*) AS n_candidates,
       (FLOOR((AVG(predicted_annual_sales)) * 10000.0 + 0.5) / 10000.0) AS avg_predicted_sales,
       COUNT(CASE WHEN tier = 'A' THEN 1 END) AS tier_a_count,
       (FLOOR((MAX(predicted_annual_sales)) * 10000.0 + 0.5) / 10000.0) AS best_predicted_sales
FROM ({score_candidates_oracle_sql()}) __sc
GROUP BY metro"""


# ---------------------------------------------------------------------------
# Phase-2 summary / validation surface
# ---------------------------------------------------------------------------

MIN_PREDICTION_STDDEV = 10000.0  # the reference's $10K variance gate


def phase_summary(
    spark: SparkSession,
    scored_df: DataFrame | None = None,
    min_std: float = MIN_PREDICTION_STDDEV,
) -> DataFrame:
    """The phase-2 validation report over scored locations
    (`/root/reference/notebooks/14_phase2_summary.py:125-154`): per-tier
    distribution (count + avg prediction), per-metro distribution (count +
    tier-A count), and the global prediction range/stddev with the ≥$10K
    variance gate — one long-format table, three sections, fixed schema.

    Three aggregations over one scored scan; at scale each is a partial+
    final hash agg on a low-cardinality key and the global row is a
    single-row reduce."""
    scored = scored_view(spark, scored_df)
    pred = F.col("predicted_annual_sales")
    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    tier_part = (
        scored.groupBy(F.col("tier").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_sites"),
            dround(F.avg(pred), 4).alias("avg_sales"),
        )
        .select(
            F.lit("tier").alias("section"), "key", "n_sites", "avg_sales",
            null_l.alias("tier_a_count"), null_d.alias("min_pred"),
            null_d.alias("max_pred"), null_d.alias("std_pred"),
            null_l.alias("variance_ok"),
        )
    )
    metro_part = (
        scored.groupBy(F.col("metro").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_sites"),
            # plain conditional COUNT: scored_locations has exactly one row
            # per site, so DISTINCT would only add an Expand + an extra
            # shuffle keyed on (metro, site_id) for identical values (the
            # oracle keeps COUNT(DISTINCT ...) and the hash check proves it)
            F.count(F.when(F.col("tier") == "A", F.col("site_id"))).alias(
                "tier_a_count"
            ),
        )
        .select(
            F.lit("metro").alias("section"), "key", "n_sites",
            null_d.alias("avg_sales"), "tier_a_count", null_d.alias("min_pred"),
            null_d.alias("max_pred"), null_d.alias("std_pred"),
            null_l.alias("variance_ok"),
        )
    )
    global_part = (
        scored.agg(
            F.count(F.lit(1)).alias("n_sites"),
            dround(F.min(pred), 4).alias("min_pred"),
            dround(F.max(pred), 4).alias("max_pred"),
            dround(F.stddev(pred), 4).alias("std_pred"),
        )
        .select(
            F.lit("global").alias("section"), F.lit("predictions").alias("key"),
            "n_sites", null_d.alias("avg_sales"), null_l.alias("tier_a_count"),
            "min_pred", "max_pred", "std_pred",
            # BIGINT flag, not BOOLEAN: a NULL boolean survives pandas as
            # a None-bearing object column on one engine and NaN on the
            # other, breaking the order-insensitive value hash
            (F.col("std_pred") >= F.lit(min_std)).cast("long").alias("variance_ok"),
        )
    )
    return tier_part.unionByName(metro_part).unionByName(global_part)


def phase_summary_oracle_sql(min_std: float = MIN_PREDICTION_STDDEV) -> str:
    return f"""
WITH scored AS ({score_candidates_oracle_sql()})
SELECT 'tier' AS section, tier AS key, COUNT(*) AS n_sites,
       (FLOOR((AVG(predicted_annual_sales)) * 10000.0 + 0.5) / 10000.0) AS avg_sales,
       CAST(NULL AS BIGINT) AS tier_a_count,
       CAST(NULL AS DOUBLE) AS min_pred, CAST(NULL AS DOUBLE) AS max_pred,
       CAST(NULL AS DOUBLE) AS std_pred, CAST(NULL AS BIGINT) AS variance_ok
FROM scored GROUP BY tier
UNION ALL
SELECT 'metro', metro, COUNT(*),
       CAST(NULL AS DOUBLE),
       COUNT(DISTINCT CASE WHEN tier = 'A' THEN site_id END),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS BIGINT)
FROM scored GROUP BY metro
UNION ALL
SELECT 'global', 'predictions', COUNT(*),
       CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
       (FLOOR((MIN(predicted_annual_sales)) * 10000.0 + 0.5) / 10000.0),
       (FLOOR((MAX(predicted_annual_sales)) * 10000.0 + 0.5) / 10000.0),
       (FLOOR((STDDEV_SAMP(predicted_annual_sales)) * 10000.0 + 0.5) / 10000.0),
       CAST((FLOOR((STDDEV_SAMP(predicted_annual_sales)) * 10000.0 + 0.5) / 10000.0) >= {min_std} AS BIGINT)
FROM scored"""
