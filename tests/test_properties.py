"""Property-based tests (hypothesis) for the math kernels and contracts."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geospatial_store_siting_spark.config import TIER_THRESHOLDS
from geospatial_store_siting_spark.functions import hexgrid


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-60, max_value=60, allow_nan=False),
    st.floats(min_value=-179, max_value=179, allow_nan=False),
    st.floats(min_value=-60, max_value=60, allow_nan=False),
    st.floats(min_value=-179, max_value=179, allow_nan=False),
)
def test_haversine_metric_axioms(lat1, lon1, lat2, lon2):
    d12 = hexgrid.haversine_miles(lat1, lon1, lat2, lon2)
    d21 = hexgrid.haversine_miles(lat2, lon2, lat1, lon1)
    d11 = hexgrid.haversine_miles(lat1, lon1, lat1, lon1)
    assert d12 >= 0
    assert abs(d12 - d21) < 1e-9  # symmetry
    assert d11 < 1e-6  # identity
    assert d12 <= 12451.0  # half circumference in miles (ceiling)


def test_huff_shares_bounded(geo):
    """Σ share ≤ 1 per hex and each share ∈ (0, 1] — the probability
    contract of the gravity model."""
    from pyspark.sql import functions as F

    from geospatial_store_siting_spark.operators import huff, rings

    sites = geo.table("sites")
    cells = geo.table("hex_grid").select("cell_id", "centroid_lat", "centroid_lon")
    trade = rings.ring_pairs(geo, sites, k=2, extra_cols=["lat", "lon", "site_type"])
    j = trade.join(cells, trade.neighbor_h3 == cells.cell_id, "inner")
    d2 = huff._dist2_miles(
        F.col("lat"), F.col("lon"), F.col("centroid_lat"), F.col("centroid_lon")
    )
    j = j.withColumn("g_site", huff._gravity2(d2))
    j = j.join(F.broadcast(huff.hex_denominators(geo)), "cell_id", "left")
    share = F.col("g_site") / (
        F.coalesce(F.col("denom"), F.lit(0.0))
        + F.when(F.col("site_type") == "candidate", F.col("g_site")).otherwise(F.lit(0.0))
    )
    stats = j.select(share.alias("s")).agg(
        F.min("s").alias("lo"), F.max("s").alias("hi")
    ).first()
    assert stats["lo"] > 0.0
    assert stats["hi"] <= 1.0 + 1e-9


def test_tier_thresholds_partition_unit_interval():
    cuts = [t for _, t in TIER_THRESHOLDS]
    assert cuts == sorted(cuts, reverse=True)
    assert all(0.0 < c < 1.0 for c in cuts)


def test_jaccard_bounds_and_symmetry(geo):
    from geospatial_store_siting_spark.operators import dedup

    pairs = dedup.ngram_jaccard_pairs(geo, threshold=0.0).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert 0.0 <= r["jaccard"] <= 1.0 + 1e-9
        assert r["a"] < r["b"]  # canonical pair order — no duplicates


def test_minhash_estimates_track_jaccard(geo):
    """MinHash est_jaccard must positively track exact Jaccard on the
    candidate pairs both methods surface."""
    from geospatial_store_siting_spark.operators import dedup

    exact = {(r["a"], r["b"]): r["jaccard"] for r in
             dedup.ngram_jaccard_pairs(geo, threshold=0.0).collect()}
    est = {(r["a"], r["b"]): r["est_jaccard"] for r in
           dedup.minhash_lsh_pairs(geo, threshold=0.0).collect()}
    common = set(exact) & set(est)
    assert len(common) >= 5
    # high-estimate pairs should have meaningfully higher exact jaccard
    hi = [exact[p] for p in common if est[p] >= 0.75]
    lo = [exact[p] for p in common if est[p] <= 0.25]
    if hi and lo:
        assert np.mean(hi) > np.mean(lo)


@given(
    sig=st.integers(min_value=0, max_value=2**60 - 1),
    flips=st.sets(st.integers(min_value=0, max_value=59), max_size=3),
)
@settings(max_examples=300, deadline=None)
def test_simhash_banding_is_exact_for_small_hamming(sig, flips):
    """The pigeonhole guarantee behind dedup.simhash_pairs: any pair with
    hamming distance <= 3 MUST agree on at least one of the 4 x 15-bit
    bands, so the banded bucket join loses no qualifying pair."""
    other = sig
    for b in flips:
        other ^= 1 << b
    assert bin(sig ^ other).count("1") <= 3
    bands_a = [(sig >> (15 * i)) % 32768 for i in range(4)]
    bands_b = [(other >> (15 * i)) % 32768 for i in range(4)]
    assert any(x == y for x, y in zip(bands_a, bands_b))
