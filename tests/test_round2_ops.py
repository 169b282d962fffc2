"""Behavioral tests for the round-2 operator surface: Huff what-if,
confidence intervals, dev signals, IVF recall, one-hot contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from geospatial_store_siting_spark.operators import (
    app_queries,
    dev_signals,
    encode,
    similarity,
)


def test_whatif_cannibalization_shares_sane(geo):
    # pick a candidate that actually has a store within 3 planar miles at
    # this SF (the driver's sf0.01 run pins site 7; the tiny test SF may
    # have a sparser store field)
    sites = geo.table("sites")
    stores = sites.filter(F.col("site_type") == "store").select(
        F.col("lat").alias("s_lat"), F.col("lon").alias("s_lon"), F.col("metro").alias("s_metro")
    )
    d2 = (
        ((F.col("s_lat") - F.col("lat")) * 69.0) ** 2
        + ((F.col("s_lon") - F.col("lon")) * 54.6) ** 2
    )
    cand = (
        sites.filter(F.col("site_type") == "candidate")
        .join(stores, F.col("metro") == F.col("s_metro"))
        .filter(d2 <= 9.0)
        .select("site_id")
        .limit(1)
        .collect()
    )
    if not cand:
        # sf0.001's ~13 stores are too sparse for any 3-mile overlap; the
        # endpoint's value assertions run at sf0.01+ (and the driver's
        # oracle compare covers it at sf0.01). Still assert the empty case
        # is handled gracefully.
        import pytest

        assert app_queries.whatif_cannibalization(geo, 7).count() == 0
        pytest.skip("no candidate with an in-radius store at this SF")
    rows = app_queries.whatif_cannibalization(geo, cand[0]["site_id"]).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 < r["share_after"] < r["share_before"] <= 1.0
        assert r["impact_pct"] > 0.0
        assert r["impacted_sales"] > 0.0
        assert r["distance_mi"] <= 3.0 + 1e-6


def test_confidence_intervals_monotone(geo):
    row = app_queries.confidence_intervals(geo, 42).collect()[0]
    n_stores = geo.table("sites").filter(F.col("site_type") == "store").count()
    assert row["sample_size"] == min(app_queries.CI_TOP_K, n_stores)
    assert row["p10"] <= row["p25"] <= row["p50"] <= row["p75"] <= row["p90"]


def test_dev_signals_market_heat_domain(geo):
    dev = dev_signals.dev_signals_by_h3(geo)
    heats = {r["market_heat"] for r in dev.select("market_heat").distinct().collect()}
    assert heats <= {"Hot", "Warm", "Neutral", "Cooling"}
    assert dev.filter(F.col("zip_count") < 1).count() == 0
    # the national-average BPS fallback leaves no NULL permit signal
    assert dev.filter(F.col("permits_yoy_pct").isNull()).count() == 0


def test_dominant_county_unique_per_zip(geo):
    dom = dev_signals.dominant_county(geo)
    assert dom.count() == dom.select("zip_code").distinct().count()


def test_ivf_recall_against_brute_force(geo):
    """IVF with nprobe=2 of 16 lists is approximate; recall of the exact
    top-3 should still be substantial on this corpus."""
    brute = {
        (r["query_id"], r["corpus_id"])
        for r in similarity.brute_force_topk(geo, k=3).collect()
    }
    ivf = {
        (r["query_id"], r["corpus_id"])
        for r in similarity.ivf_topk(geo, k=3).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.3, f"IVF recall {recall:.2f} vs brute force"


def test_one_hot_rows_are_valid_indicators(geo):
    df = encode.one_hot_features(geo)
    metro_cols = [c for c in df.columns if c.startswith("metro_")]
    prop_cols = [c for c in df.columns if c.startswith("property_")]
    sums = df.select(
        sum(F.col(c) for c in metro_cols).alias("m"),
        sum(F.col(c) for c in prop_cols).alias("p"),
    )
    assert sums.filter((F.col("m") != 1.0) | (F.col("p") != 1.0)).count() == 0


def test_model_feature_columns_match_scoring_features(geo):
    order = [
        r["feature_name"]
        for r in encode.model_feature_columns(geo).orderBy("feature_index").collect()
    ]
    assert order == encode.model_feature_column_names()
    sf = app_queries.scoring_features(geo, 42).collect()
    assert [r["feature_name"] for r in sf] == order
    assert all(r["value"] is not None for r in sf)
