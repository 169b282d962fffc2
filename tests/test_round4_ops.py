"""Round-4 operator tests: gate-dispatched assembly distance families,
manifest-stats broadcast gate, snapshot-fed app surface, SimHash pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geospatial_store_siting_spark.operators import features


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


class TestAssemblyDistanceGate:
    def test_below_gate_uses_metro_blocked_broadcast(self, geo):
        # sf0.001 dims are tiny: the exact metro-blocked joins are chosen
        plan = _optimized(features.location_features(geo))
        assert "c_metro" in plan  # competition_distance's block key
        assert "cb_metro" in plan  # cannibalization's block key
        assert "r_coarse" not in plan

    def test_above_gate_uses_windowed_plans(self, geo, monkeypatch):
        monkeypatch.setattr(features, "BROADCAST_DIM_LIMIT", 0)
        plan = _optimized(features.location_features(geo))
        # no metro-key join anywhere: the 5-distinct-value block key is the
        # scale killer the windowed plans remove
        assert "c_metro" not in plan
        assert "cb_metro" not in plan
        # both distance families ride the coarse-cell candidate join
        assert "r_coarse" in plan

    def test_above_gate_plan_builds_without_count_jobs(self, geo, monkeypatch):
        monkeypatch.setattr(features, "BROADCAST_DIM_LIMIT", 0)
        def boom(self):
            raise AssertionError("count() job ran during plan construction")
        monkeypatch.setattr(DataFrame, "count", boom)
        features.location_features(geo)  # gate reads manifest stats only

    def test_windowed_cannibalization_risk_matches_blocked(self, geo):
        """cannibalization_risk is exact under the window contract (the
        ring window strictly contains the 3-mile gravity radius), so it
        must agree with the metro-blocked plan on every common site."""
        blocked = features.cannibalization(geo).select(
            "site_id", F.col("cannibalization_risk").alias("risk_b")
        )
        windowed = features.cannibalization_windowed(geo).select(
            "site_id", F.col("cannibalization_risk").alias("risk_w")
        )
        diff = (
            blocked.join(windowed, "site_id")
            .filter(F.abs(F.col("risk_b") - F.col("risk_w")) > 1e-9)
            .count()
        )
        assert diff == 0


class TestManifestBroadcastGate:
    def test_dim_small_reads_manifest_rows_not_count(self, geo, monkeypatch):
        def boom(self):
            raise AssertionError("count() job ran during gate decision")
        monkeypatch.setattr(DataFrame, "count", boom)
        assert features._dim_small(geo.table("competitors"), table_hint="competitors")
        stores = geo.table("sites").filter(F.col("site_type") == "store")
        # filtered dim: the backing table's manifest count is the upper bound
        assert features._dim_small(stores, table_hint="sites")

    def test_dim_small_hint_is_conservative_above_limit(self, geo, monkeypatch):
        def boom(self):
            raise AssertionError("count() must not run for a hinted dim")
        monkeypatch.setattr(DataFrame, "count", boom)
        assert not features._dim_small(
            geo.table("competitors"), limit=0, table_hint="competitors"
        )

    def test_dim_small_falls_back_to_count_without_hint(self, geo):
        df = geo.table("competitors").limit(3)
        assert features._dim_small(df, limit=3)
        assert not features._dim_small(df, limit=2)
