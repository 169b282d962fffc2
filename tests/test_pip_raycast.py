"""PIP kernel unit tests — including a NON-convex polygon, which the
convex-oracle query can't cover (the ray-casting kernel is general)."""

from __future__ import annotations

import numpy as np

from geospatial_store_siting_spark.operators import pip


def test_ray_cast_nonconvex_l_shape():
    # L-shaped polygon (lat, lon): notch at the top-right
    verts = np.array(
        [(0.0, 0.0), (0.0, 4.0), (2.0, 4.0), (2.0, 2.0), (4.0, 2.0), (4.0, 0.0)],
        dtype=np.float64,
    )
    pts_in = [(1.0, 1.0), (1.0, 3.0), (3.0, 1.0), (1.9, 3.9)]
    pts_out = [(3.0, 3.0), (5.0, 1.0), (-0.5, 1.0), (2.5, 2.5)]
    lat = np.array([p[0] for p in pts_in + pts_out])
    lon = np.array([p[1] for p in pts_in + pts_out])
    hit = pip._ray_cast(lat, lon, verts)
    assert hit[: len(pts_in)].all()
    assert not hit[len(pts_in):].any()


def test_bucketed_index_matches_direct_raycast():
    polys = pip.synthetic_polygons()
    index = pip.PolygonIndex(polys)
    rng = np.random.default_rng(3)
    # points scattered around the first metro center
    lat = 41.88 + rng.uniform(-0.3, 0.3, 500)
    lon = -87.63 + rng.uniform(-0.3, 0.3, 500)
    got = index.query(lat, lon)
    # direct (unbucketed) first-hit reference
    want = np.full(len(lat), -1, dtype=np.int64)
    for i, p in enumerate(polys):
        vs = np.asarray(p["verts"], dtype=np.float64)
        hit = pip._ray_cast(lat, lon, vs)
        sel = hit & (want == -1)
        want[sel] = i
    assert (got == want).all()
    assert (got >= 0).sum() > 50  # the sample actually hits polygons
