"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Every operator below is a SURVEY.md §2 entry re-expressed
Spark-first; oracles are ANSI SQL over the same parquet tables using the
engine's dialect-neutral hex-codec SQL (bit-identical tile assignments).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from geospatial_store_siting_spark.operators import features, huff, scoring
from geospatial_store_siting_spark.sources import tables


def _load(spark: SparkSession, sf_dir: str) -> None:
    # The driver owns the session; these are runtime-mutable confs that the
    # engine relies on (AQE coalescing keeps tiny-SF runs from spraying 200
    # shuffle tasks; UTC pins timestamp comparisons against the oracle).
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tables.load_all(spark, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full hex-feature-join table at sf0.001."""
    _load(spark, "/root/testdata/sf0.001")
    return features.location_features(spark)


def _q(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _load(spark, sf_dir)
        return fn(spark)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- hex feature engineering (SURVEY §2.3 J1-J9, §2.4) ---
        "hex_feature_join": _q(features.location_features),
        "demographics_ring1": _q(lambda s: features.demographics_ring(s, 1)),
        "demographics_ring2": _q(lambda s: features.demographics_ring(s, 2)),
        "traffic_ring1": _q(lambda s: features.traffic_ring(s, 1)),
        "competition_ring1": _q(lambda s: features.competition_ring(s, 1)),
        "competition_distance": _q(features.competition_distance),
        "poi_ring1": _q(lambda s: features.poi_ring(s, 1)),
        "cannibalization": _q(features.cannibalization),
        # --- Huff gravity model (§2.9 G5) ---
        "huff_features": _q(huff.huff_features),
        # --- scoring / windows (§2.5 W1-W4) ---
        "score_candidates": _q(scoring.score_candidates),
        "top5_per_metro": _q(scoring.top_candidates_per_metro),
        "metro_summary": _q(scoring.metro_summary),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "hex_feature_join": features.location_features_oracle_sql(),
        "demographics_ring1": features.demographics_ring_oracle_sql(1),
        "demographics_ring2": features.demographics_ring_oracle_sql(2),
        "traffic_ring1": features.traffic_ring_oracle_sql(1),
        "competition_ring1": features.competition_ring_oracle_sql(1),
        "competition_distance": features.competition_distance_oracle_sql(),
        "poi_ring1": features.poi_ring_oracle_sql(1),
        "cannibalization": features.cannibalization_oracle_sql(),
        "huff_features": huff.huff_features_oracle_sql(),
        "score_candidates": scoring.score_candidates_oracle_sql(),
        "top5_per_metro": scoring.top_candidates_per_metro_oracle_sql(),
        "metro_summary": scoring.metro_summary_oracle_sql(),
    }
