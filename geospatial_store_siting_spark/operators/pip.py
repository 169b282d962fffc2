"""Point-in-polygon trade-area joins via a cell-bucketed broadcast index.

North-star requirement (absent in the reference, which substitutes hex
membership for PIP — SURVEY §2.9 G7): join points against census/boundary
polygons using an R-tree/cell-bucketed broadcast index inside vectorized
Arrow batches.

Two layers:

- ``pip_join`` — the general engine path: polygons (any simple ring) are
  broadcast as a numpy vertex table bucketed by the res-7 cells their
  bounding boxes overlap; a ``mapInPandas`` kernel does vectorized
  ray-casting per Arrow batch, probing only the polygons bucketed under
  each point's coarse cell.  O(|points| · avg bucket size), never
  |points|×|polygons|.

- ``pip_convex_join`` — the oracle-checkable twin over the synthetic
  boundary layer: deterministic convex polygons (hexagonal trade zones
  around each metro center) tested with half-plane inequalities — pure
  arithmetic, identical in any engine.

The synthetic boundary layer (one polygon per metro ring) is the
"boundary" table of BASELINE.json's "synthetic POI+boundary" posture.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import METROS
from ..functions import hexgrid, hex_sql

# Synthetic boundary layer: for each metro, 2 concentric hexagonal zones
# (inner trade core, outer trade area), vertex radius in degrees.
ZONE_RADII = [0.08, 0.2]


def synthetic_polygons() -> list[dict]:
    """Deterministic polygon set: regular hexagons around metro centers.

    Vertices at angles 30°+60°k — flat-top hexes, convex, closed rings.
    """
    polys = []
    pid = 0
    for name, clat, clon in METROS:
        for zi, rad in enumerate(ZONE_RADII):
            verts = []
            for k in range(6):
                ang = math.radians(30 + 60 * k)
                verts.append((clat + rad * math.sin(ang), clon + rad * math.cos(ang)))
            polys.append(
                {
                    "poly_id": pid,
                    "metro": name,
                    "zone": "core" if zi == 0 else "area",
                    "verts": verts,
                }
            )
            pid += 1
    return polys


# ---------------------------------------------------------------------------
# General path: cell-bucketed broadcast index + vectorized ray casting
# ---------------------------------------------------------------------------

class PolygonIndex:
    """Broadcast-side index: polygon vertex arrays + coarse-cell buckets."""

    def __init__(self, polys: list[dict], res: int = 7):
        self.res = res
        self.polys = polys
        self.buckets: dict[int, list[int]] = {}
        for i, p in enumerate(polys):
            vs = np.asarray(p["verts"], dtype=np.float64)
            lat_lo, lon_lo = vs.min(axis=0)
            lat_hi, lon_hi = vs.max(axis=0)
            # all coarse cells overlapped by the bbox (vectorized lattice scan)
            from ..config import HEX_SIZE_DEG

            step = HEX_SIZE_DEG[res] * 0.8
            lats = np.arange(lat_lo - step, lat_hi + step, step)
            lons = np.arange(lon_lo - step, lon_hi + step, step)
            glat, glon = np.meshgrid(lats, lons)
            cells = np.unique(
                hexgrid.latlng_to_cell(glat.ravel(), glon.ravel(), res)
            )
            for c in cells:
                self.buckets.setdefault(int(c), []).append(i)

    def query(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        """Vectorized PIP: returns poly index per point (-1 = none).
        Points are grouped by coarse cell; each group tests only its
        bucket's polygons with vectorized ray casting."""
        out = np.full(len(lat), -1, dtype=np.int64)
        cells = hexgrid.latlng_to_cell(lat, lon, self.res)
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        bounds = np.searchsorted(sorted_cells, np.unique(sorted_cells))
        uniq = np.unique(sorted_cells)
        for u, start in zip(uniq, bounds):
            end = np.searchsorted(sorted_cells, u, side="right")
            idx = order[start:end]
            for pi in self.buckets.get(int(u), []):
                vs = np.asarray(self.polys[pi]["verts"], dtype=np.float64)
                hit = _ray_cast(lat[idx], lon[idx], vs)
                # first polygon wins only where not already assigned
                assignable = hit & (out[idx] == -1)
                out[idx[assignable]] = pi
        return out


def _ray_cast(lat: np.ndarray, lon: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting (x=lon, y=lat)."""
    x, y = lon, lat
    n = len(verts)
    inside = np.zeros(len(x), dtype=bool)
    for i in range(n):
        y1, x1 = verts[i]
        y2, x2 = verts[(i + 1) % n]
        crosses = ((y1 > y) != (y2 > y)) & (
            x < (x2 - x1) * (y - y1) / (y2 - y1 + 1e-300) + x1
        )
        inside ^= crosses
    return inside


def pip_join(spark: SparkSession, points: DataFrame | None = None) -> DataFrame:
    """mapInPandas PIP join: points → (point cols, poly_id, zone, metro).

    The index is closed over by the kernel (task-broadcast via pickled
    closure — dim-scale by construction); batches stay in Arrow.
    """
    pts = points if points is not None else spark.table("sites").select("site_id", "lat", "lon")
    polys = synthetic_polygons()
    index = PolygonIndex(polys)
    meta = [(p["poly_id"], p["metro"], p["zone"]) for p in polys]
    base_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in pts.schema.fields)
    out_schema = base_schema + ", poly_id bigint, poly_metro string, poly_zone string"

    def kernel(batches):
        for pdf in batches:
            hit = index.query(pdf["lat"].values.astype(np.float64),
                              pdf["lon"].values.astype(np.float64))
            pdf = pdf.copy()
            pdf["poly_id"] = [meta[h][0] if h >= 0 else -1 for h in hit]
            pdf["poly_metro"] = [meta[h][1] if h >= 0 else None for h in hit]
            pdf["poly_zone"] = [meta[h][2] if h >= 0 else None for h in hit]
            yield pdf

    return pts.mapInPandas(kernel, schema=out_schema)


# ---------------------------------------------------------------------------
# Oracle-checkable twin: convex half-plane PIP in portable SQL
# ---------------------------------------------------------------------------

def _halfplane_conds(verts: list[tuple[float, float]], lat: str, lon: str) -> str:
    """Point-left-of-every-edge test for a CCW convex ring (x=lon, y=lat)."""
    conds = []
    n = len(verts)
    for i in range(n):
        y1, x1 = verts[i]
        y2, x2 = verts[(i + 1) % n]
        # cross((v2-v1), (p-v1)) >= 0
        conds.append(
            f"(({x2!r} - {x1!r}) * (({lat}) - {y1!r})"
            f" - ({y2!r} - {y1!r}) * (({lon}) - {x1!r})) >= 0"
        )
    return "(" + " AND ".join(conds) + ")"


def pip_zone_case_sql(lat: str, lon: str) -> tuple[str, str]:
    """(poly_id_expr, zone_expr): first-match CASE over core-then-area
    polygons — identical semantics to the bucketed index's first-hit rule
    because cores are listed before areas per metro."""
    polys = synthetic_polygons()
    ordered = sorted(polys, key=lambda p: (p["zone"] != "core", p["poly_id"]))
    id_whens, zone_whens = [], []
    for p in ordered:
        cond = _halfplane_conds(p["verts"], lat, lon)
        id_whens.append(f"WHEN {cond} THEN {p['poly_id']}")
        zone_whens.append(f"WHEN {cond} THEN '{p['zone']}'")
    return (
        f"CASE {' '.join(id_whens)} ELSE -1 END",
        f"CASE {' '.join(zone_whens)} ELSE NULL END",
    )


def pip_convex_join(spark: SparkSession) -> DataFrame:
    """Sites × boundary zones via half-plane tests + per-zone rollup."""
    pid, zone = pip_zone_case_sql("lat", "lon")
    sites = spark.table("sites")
    return (
        sites.select(
            "site_id",
            "metro",
            F.expr(pid).cast("long").alias("poly_id"),
            F.expr(zone).alias("zone"),
        )
        .groupBy("metro", "zone")
        .agg(F.count(F.lit(1)).alias("n_sites"), F.min("site_id").alias("first_site"))
    )


def pip_convex_join_oracle_sql() -> str:
    pid, zone = pip_zone_case_sql("lat", "lon")
    return f"""
SELECT metro, {zone} AS zone,
       COUNT(*) AS n_sites, MIN(site_id) AS first_site
FROM ({hex_sql.sites_sql()}) __sites
GROUP BY 1, 2"""


def pip_assignments_oracle_sql() -> str:
    """Oracle for the bucketed-index mapInPandas path: polygons are convex
    and disjoint-per-priority (core before area), so first-hit bucket
    assignment == the ordered half-plane CASE."""
    pid, zone = pip_zone_case_sql("lat", "lon")
    return f"""
SELECT site_id, CAST({pid} AS BIGINT) AS poly_id, {zone} AS poly_zone
FROM ({hex_sql.sites_sql()}) __sites"""
