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
                hit = _ray_cast_rings(lat[idx], lon[idx], _rings(self.polys[pi]))
                # first polygon wins only where not already assigned
                assignable = hit & (out[idx] == -1)
                out[idx[assignable]] = pi
        return out


def _rings(p: dict) -> list[np.ndarray]:
    """Outer ring + any hole rings of a polygon record."""
    return [np.asarray(p["verts"], dtype=np.float64)] + [
        np.asarray(h, dtype=np.float64) for h in p.get("holes", [])
    ]


def _ray_cast_rings(lat: np.ndarray, lon: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd membership over a polygon with holes: XOR across rings
    (inside the outer ring and outside every hole)."""
    inside = np.zeros(len(np.asarray(lat)), dtype=bool)
    for ring in rings:
        inside ^= _ray_cast(lat, lon, ring)
    return inside


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


def pip_join(
    spark: SparkSession,
    points: DataFrame | None = None,
    polys: list[dict] | None = None,
) -> DataFrame:
    """mapInPandas PIP join: points → (point cols, poly_id, zone, metro).

    The index is closed over by the kernel (task-broadcast via pickled
    closure — dim-scale by construction); batches stay in Arrow.
    """
    pts = points if points is not None else spark.table("sites").select("site_id", "lat", "lon")
    if polys is None:
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


# ---------------------------------------------------------------------------
# Polygon -> cell cover (polyfill) and the shuffle-free JVM cover join
# ---------------------------------------------------------------------------
#
# The 100-TB path for PIP: pre-compute each polygon's hex-cell cover once
# (driver-side numpy over a dim-scale polygon layer), classify every cover
# cell as INTERIOR (hex fully inside the polygon -- membership decided by
# the cell equi-join alone, no per-point geometry) or BOUNDARY (hex
# intersects the polygon edge -- refine with the exact half-plane test).
# Points then join the broadcast cover on their existing cell id; only the
# thin boundary ring pays per-point math, and even that stays JVM-side as
# codegen'd column arithmetic.  No mapInPandas, no shuffle, no Python in
# the hot path -- the plan is Scan -> BroadcastHashJoin -> Project.

_HEX_CORNER_ANGLES = [math.radians(30 + 60 * k) for k in range(6)]


def _ccw(verts: np.ndarray) -> np.ndarray:
    """Return the ring in CCW orientation (x=lon, y=lat)."""
    y, x = verts[:, 0], verts[:, 1]
    area2 = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    return verts if area2 >= 0 else verts[::-1]


def _cell_corners(q: np.ndarray, r: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, 6) corner lat / lon arrays for pointy-top hexes of the lattice."""
    from ..config import HEX_SIZE_DEG

    s = HEX_SIZE_DEG[res]
    clat = r * 1.5 * s
    clon = (q + r / 2.0) * hexgrid.SQRT3 * s
    sin = np.array([math.sin(a) for a in _HEX_CORNER_ANGLES])
    cos = np.array([math.cos(a) for a in _HEX_CORNER_ANGLES])
    return clat[:, None] + s * sin[None, :], clon[:, None] + s * cos[None, :]


def polygon_cell_cover(polys: list[dict] | None = None, res: int | None = None) -> list[dict]:
    """Polyfill: every res-cell whose hex intersects each (convex) polygon.

    Rows: {cell, poly_id, metro, zone, priority, interior}.  ``interior``
    means the whole hex is inside the polygon (all 6 corners pass every
    half-plane -- sufficient because both shapes are convex); other
    intersecting cells (separating-axis test finds no gap) are boundary.

    Completeness: any point p inside P lies in a cell whose center is
    within one circumradius of p, hence inside bbox(P) expanded by one
    cell -- exactly the lattice rectangle enumerated here.  The reference
    has no polyfill (it substitutes hex membership for PIP); this is the
    H3 `polygon_to_cells` analogue over our from-scratch lattice.
    """
    from ..config import HEX_SIZE_DEG, RES_TRADE_AREA

    if polys is None:
        polys = synthetic_polygons()
    res = RES_TRADE_AREA if res is None else res
    s = HEX_SIZE_DEG[res]
    ordered = sorted(polys, key=lambda p: (p["zone"] != "core", p["poly_id"]))
    rows: list[dict] = []
    for prio, p in enumerate(ordered):
        vs = _ccw(np.asarray(p["verts"], dtype=np.float64))
        lat_lo, lon_lo = vs.min(axis=0)
        lat_hi, lon_hi = vs.max(axis=0)
        # exact lattice rectangle over bbox expanded by one circumradius
        r_lo = math.floor((lat_lo - s) / (1.5 * s)) - 1
        r_hi = math.ceil((lat_hi + s) / (1.5 * s)) + 1
        # q = lon/(sqrt3*s) - r/2 ; widen by the full r-range so the
        # rectangle in (q, r) covers the sheared bbox
        q_lo = math.floor((lon_lo - s) / (hexgrid.SQRT3 * s) - r_hi / 2.0) - 1
        q_hi = math.ceil((lon_hi + s) / (hexgrid.SQRT3 * s) - r_lo / 2.0) + 1
        qq, rr = np.meshgrid(np.arange(q_lo, q_hi + 1), np.arange(r_lo, r_hi + 1))
        q, r = qq.ravel().astype(np.int64), rr.ravel().astype(np.int64)
        clat, clon = _cell_corners(q, r, res)  # (n, 6)

        # interior: every corner left of every CCW edge
        inside_all = np.ones(len(q), dtype=bool)
        for i in range(len(vs)):
            y1, x1 = vs[i]
            y2, x2 = vs[(i + 1) % len(vs)]
            cross = (x2 - x1) * (clat - y1) - (y2 - y1) * (clon - x1)
            inside_all &= (cross >= 0).all(axis=1)

        # intersecting: separating-axis test over poly edge normals +
        # the hex's 3 edge-normal axes (pointy-top: 30/90/150 degrees)
        separated = np.zeros(len(q), dtype=bool)
        axes = []
        for i in range(len(vs)):
            y1, x1 = vs[i]
            y2, x2 = vs[(i + 1) % len(vs)]
            axes.append((-(y2 - y1), x2 - x1))  # normal of edge (dx, dy)
        for a in (30, 90, 150):
            axes.append((math.cos(math.radians(a)), math.sin(math.radians(a))))
        for ax, ay in axes:
            ph = clon * ax + clat * ay  # (n, 6) hex projections
            pp = vs[:, 1] * ax + vs[:, 0] * ay  # (m,) poly projections
            separated |= (ph.max(axis=1) < pp.min()) | (ph.min(axis=1) > pp.max())
        hit = ~separated
        for cell, is_int in zip(
            hexgrid.qr_to_cell(q[hit], r[hit], res), inside_all[hit]
        ):
            rows.append(
                {
                    "cell": int(cell),
                    "poly_id": p["poly_id"],
                    "metro": p["metro"],
                    "zone": p["zone"],
                    "priority": prio,
                    "interior": bool(is_int),
                }
            )
    return rows


def _convex_hull(verts: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull, CCW, in (lat, lon) rows (x=lon, y=lat)."""
    pts = verts[np.lexsort((verts[:, 0], verts[:, 1]))]  # sort by lon, lat

    def half(seq):
        out: list[np.ndarray] = []
        for p in seq:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[1] - o[1]) * (p[0] - o[0]) - (a[0] - o[0]) * (p[1] - o[1]) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)


def _segments_cross(
    a_lat: np.ndarray, a_lon: np.ndarray, b_lat: np.ndarray, b_lon: np.ndarray,
    c: tuple[float, float], d: tuple[float, float],
) -> np.ndarray:
    """Vectorized segment intersection: hex edges (a->b, arrays) vs one
    polygon edge (c->d). Touching counts as crossing (conservative: a
    touched cell is demoted from interior to boundary, never the reverse)."""
    cy, cx = c
    dy, dx = d

    def orient(py, px, qy, qx, ry, rx):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    o1 = orient(a_lat, a_lon, b_lat, b_lon, cy, cx)
    o2 = orient(a_lat, a_lon, b_lat, b_lon, dy, dx)
    o3 = orient(cy, cx, dy, dx, a_lat, a_lon)
    o4 = orient(cy, cx, dy, dx, b_lat, b_lon)
    return (o1 * o2 <= 0) & (o3 * o4 <= 0)


def polygon_cell_cover_general(polys: list[dict], res: int | None = None) -> list[dict]:
    """Polyfill for ARBITRARY simple polygons (non-convex allowed).

    Interior = all 6 hex corners inside (even-odd ray cast over outer +
    hole rings) AND no ring edge crosses any hex edge AND no hole sits
    wholly inside the hex — together that means the hex is fully
    contained.  Candidate cells are pruned with a separating-axis test
    against the OUTER ring's convex hull (sound: hex∩P ⊆ hex∩hull);
    surviving non-interior cells are boundary — a conservative superset
    (cells in a concavity notch or inside a hole route to the exact
    kernel and resolve to no-hit there), which costs refine work, never
    correctness.  Polygons may carry ``holes``: a list of interior rings
    (census tracts with excluded enclaves, water bodies, ...).
    """
    from ..config import HEX_SIZE_DEG, RES_TRADE_AREA

    res = RES_TRADE_AREA if res is None else res
    s = HEX_SIZE_DEG[res]
    ordered = sorted(polys, key=lambda p: (p.get("zone") != "core", p["poly_id"]))
    rows: list[dict] = []
    for i, p in enumerate(ordered):
        # explicit priorities let the polyfill run distributed over polygon
        # partitions (a per-batch enumerate would collide across tasks)
        prio = p.get("priority", i)
        rings = _rings(p)
        vs = rings[0]  # bbox/hull from the outer ring; holes lie inside it
        hull = _ccw(_convex_hull(vs))
        lat_lo, lon_lo = vs.min(axis=0)
        lat_hi, lon_hi = vs.max(axis=0)
        r_lo = math.floor((lat_lo - s) / (1.5 * s)) - 1
        r_hi = math.ceil((lat_hi + s) / (1.5 * s)) + 1
        q_lo = math.floor((lon_lo - s) / (hexgrid.SQRT3 * s) - r_hi / 2.0) - 1
        q_hi = math.ceil((lon_hi + s) / (hexgrid.SQRT3 * s) - r_lo / 2.0) + 1
        qq, rr = np.meshgrid(np.arange(q_lo, q_hi + 1), np.arange(r_lo, r_hi + 1))
        q, r = qq.ravel().astype(np.int64), rr.ravel().astype(np.int64)
        clat, clon = _cell_corners(q, r, res)  # (n, 6)

        # prune with hull SAT (same axes as the convex path)
        separated = np.zeros(len(q), dtype=bool)
        axes = []
        for i in range(len(hull)):
            y1, x1 = hull[i]
            y2, x2 = hull[(i + 1) % len(hull)]
            axes.append((-(y2 - y1), x2 - x1))
        for a in (30, 90, 150):
            axes.append((math.cos(math.radians(a)), math.sin(math.radians(a))))
        for ax, ay in axes:
            ph = clon * ax + clat * ay
            pp = hull[:, 1] * ax + hull[:, 0] * ay
            separated |= (ph.max(axis=1) < pp.min()) | (ph.min(axis=1) > pp.max())
        hit = ~separated
        q, r, clat, clon = q[hit], r[hit], clat[hit], clon[hit]

        # all corners inside the actual (possibly concave, holed) polygon
        corners_in = _ray_cast_rings(clat.ravel(), clon.ravel(), rings).reshape(clat.shape)
        inside_all = corners_in.all(axis=1)

        # any ring edge (outer or hole) crossing any hex edge?
        crossed = np.zeros(len(q), dtype=bool)
        nxt = np.roll(np.arange(6), -1)
        b_lat, b_lon = clat[:, nxt], clon[:, nxt]
        for ring in rings:
            for i in range(len(ring)):
                c_v = tuple(ring[i])
                d_v = tuple(ring[(i + 1) % len(ring)])
                crossed |= _segments_cross(clat, clon, b_lat, b_lon, c_v, d_v).any(axis=1)

        # a hole wholly inside the hex leaves no corner/crossing trace:
        # demote any hex containing a hole vertex
        hole_in_hex = np.zeros(len(q), dtype=bool)
        for ring in rings[1:]:
            for vy, vx in ring:
                # CCW hex half-plane test (corners at angles 30+60k are CCW)
                cross = (b_lon - clon) * (vy - clat) - (b_lat - clat) * (vx - clon)
                hole_in_hex |= (cross >= 0).all(axis=1)

        interior = inside_all & ~crossed & ~hole_in_hex
        for cell, is_int in zip(hexgrid.qr_to_cell(q, r, res), interior):
            rows.append(
                {
                    "cell": int(cell),
                    "poly_id": p["poly_id"],
                    "metro": p.get("metro"),
                    "zone": p.get("zone"),
                    "priority": prio,
                    "interior": bool(is_int),
                }
            )
    return rows


def pip_join_hybrid(
    spark: SparkSession,
    points: DataFrame | None = None,
    polys: list[dict] | None = None,
    res: int | None = None,
    cell_col: str = "h3_res8",
) -> DataFrame:
    """General-polygon PIP at scale: JVM for the interior, kernel for the rim.

    Points whose cell's FIRST candidate (priority order) is an interior
    cell are assigned by the broadcast join alone — no geometry, no
    Python.  Only points in boundary cells (or cells where a boundary
    candidate outranks the interior one) route through the exact ray-cast
    kernel; no-cover points are no-hit by construction.  At the synthetic
    layer's density that rim is ~10% of covered cells, so >90% of the
    corpus never leaves whole-stage codegen while supporting arbitrary
    simple polygons (unlike ``pip_cover_join``'s convex-only refinement).
    """
    pts = (
        points
        if points is not None
        else spark.table("sites").select("site_id", "lat", "lon", "h3_res8")
    )
    if polys is None:
        polys = synthetic_polygons()
    ordered = sorted(polys, key=lambda p: (p.get("zone") != "core", p["poly_id"]))
    rows = polygon_cell_cover_general(polys, res=res)
    cover = _pack_cover(spark, rows)
    joined = pts.join(F.broadcast(cover), pts[cell_col] == cover["cell"], "left").select(
        *pts.columns, F.col("cands")
    )
    decided = F.expr("cands IS NULL OR get(cands, 0).interior")
    fast = joined.filter(decided).select(
        "site_id",
        F.coalesce(F.expr("get(cands, 0).poly_id"), F.lit(-1).cast("long")).alias(
            "poly_id"
        ),
        F.expr("get(cands, 0).zone").alias("poly_zone"),
    )
    # exact kernel only for the boundary rim, with the SAME priority rule
    # (PolygonIndex first-hit follows list order = priority order here)
    rim = joined.filter(~decided).drop("cands")
    slow = pip_join(spark, points=rim, polys=ordered).select(
        "site_id", "poly_id", "poly_zone"
    )
    return fast.unionByName(slow)


def _refine_case_sql(lat: str, lon: str, poly_key: str) -> str:
    """CASE <poly_key> WHEN id THEN <half-plane test> ... -- the exact
    membership test applied only to boundary-cell candidates."""
    whens = []
    for p in synthetic_polygons():
        whens.append(f"WHEN {p['poly_id']} THEN {_halfplane_conds(p['verts'], lat, lon)}")
    return f"CASE {poly_key} {' '.join(whens)} ELSE false END"


def _pack_cover(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """One row per cover cell, candidates pre-sorted by priority in an
    array column so the probe side resolves first-match without a groupBy."""
    by_cell: dict[int, list[dict]] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    packed = [
        (
            cell,
            [
                (c["priority"], c["poly_id"], c["zone"], c["metro"], c["interior"])
                for c in sorted(cands, key=lambda c: c["priority"])
            ],
        )
        for cell, cands in by_cell.items()
    ]
    return spark.createDataFrame(
        packed,
        schema=(
            "cell bigint, cands array<struct<priority:int,poly_id:bigint,"
            "zone:string,metro:string,interior:boolean>>"
        ),
    )


def cover_by_cell(spark: SparkSession, res: int | None = None) -> DataFrame:
    """The broadcast side of the convex-layer cover join."""
    return _pack_cover(spark, polygon_cell_cover(res=res))


def _resolve_cover_hit(
    spark: SparkSession,
    pts: DataFrame,
    keys: list[str],
    res: int | None = None,
    cell_col: str = "h3_res8",
) -> DataFrame:
    """keys + the first accepted cover candidate (null struct = no hit)."""
    cover = cover_by_cell(spark, res=res)
    refine = _refine_case_sql("lat", "lon", "x.poly_id")
    hit = f"filter(cands, x -> x.interior OR {refine})"
    joined = pts.join(F.broadcast(cover), pts[cell_col] == cover["cell"], "left")
    return joined.select(*keys, F.expr(f"get({hit}, 0)").alias("__hit"))


def pip_cover_join(
    spark: SparkSession,
    points: DataFrame | None = None,
    res: int | None = None,
    cell_col: str = "h3_res8",
) -> DataFrame:
    """Shuffle-free PIP: points x polygons via the broadcast cell cover.

    Plan: Scan -> BroadcastHashJoin(cell) -> Project.  Interior-cell hits
    skip geometry entirely; boundary-cell candidates run the exact
    half-plane test inside an array lambda (whole-stage codegen, no Python,
    no Exchange).  First passing candidate in priority order wins --
    identical semantics to ``pip_zone_case_sql``'s ordered CASE, so the
    same oracle checks both plans.
    """
    pts = (
        points
        if points is not None
        else spark.table("sites").select("site_id", "lat", "lon", "h3_res8")
    )
    resolved = _resolve_cover_hit(spark, pts, ["site_id"], res=res, cell_col=cell_col)
    return resolved.select(
        "site_id",
        F.coalesce(F.col("__hit.poly_id"), F.lit(-1).cast("long")).alias("poly_id"),
        F.col("__hit.zone").alias("poly_zone"),
    )


def doc_zone_counts(spark: SparkSession) -> DataFrame:
    """Corpus x boundary layer: geotagged document spans assigned to trade
    zones via the broadcast cell cover, rolled up per (metro, zone).

    The interleaved-docs side of the north star meets the PIP side: span
    extraction already attaches the res-8 hex_id, so zone assignment is
    the same shuffle-free broadcast cover join the sites use -- the only
    shuffle in this plan is the final rollup's hash agg.
    """
    from ..sources.documents import geotagged_spans

    g = geotagged_spans(spark)
    pts = g.select("doc_id", "lat", "lon", F.col("hex_id").alias("h3_res8"))
    resolved = _resolve_cover_hit(spark, pts, ["doc_id"])
    return (
        resolved.filter(F.col("__hit").isNotNull())
        .select(
            "doc_id",
            F.col("__hit.metro").alias("metro"),
            F.col("__hit.zone").alias("zone"),
        )
        .groupBy("metro", "zone")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )


# ---------------------------------------------------------------------------
# Census-scale layers: distributed polyfill + shuffle cover join
# ---------------------------------------------------------------------------
#
# The broadcast cover join above assumes a dim-scale polygon layer (the
# cover fits one executor and the refine CASE fits one expression).  A
# census-scale layer (10^5+ polygons, cover in the 10^8-cell range) fits
# neither: the polyfill itself must run distributed over polygon
# partitions, the cover join becomes a shuffle hash join on cell, and the
# boundary-ring refinement runs as an Arrow kernel over ONLY the boundary
# candidates (cover rows carry their ring geometry, so no second join).
# Priority resolution is one hash agg — min(struct) per point — so the
# whole plan is two shuffles and zero driver-side geometry.

# geometry rides as a JSON string of rings (outer first, then holes):
# deeply-nested list columns (array<array<array<double>>>) segfault this
# environment's pyarrow->pandas input conversion inside mapInPandas, and a
# few hundred bytes of JSON per BOUNDARY row is noise next to the ray-cast
_COVER_GEOM_SCHEMA = (
    "cell bigint, poly_id bigint, zone string, metro string, priority int, "
    "interior boolean, rings_json string"
)


def polygons_df(spark: SparkSession, polys: list[dict] | None = None) -> DataFrame:
    """A polygon layer as a DataFrame (the big-layer input contract):
    (poly_id, zone, metro, priority, rings_json)."""
    import json

    if polys is None:
        polys = synthetic_polygons()
    ordered = sorted(polys, key=lambda p: (p.get("zone") != "core", p["poly_id"]))
    rows = [
        (
            p["poly_id"],
            p.get("zone"),
            p.get("metro"),
            prio,
            json.dumps(
                [[[float(a), float(b)] for a, b in p["verts"]]]
                + [[[float(a), float(b)] for a, b in h] for h in p.get("holes", [])]
            ),
        )
        for prio, p in enumerate(ordered)
    ]
    return spark.createDataFrame(
        rows,
        schema="poly_id bigint, zone string, metro string, priority int, rings_json string",
    )


def polyfill_distributed(
    spark: SparkSession, polys: DataFrame | None = None, res: int | None = None
) -> DataFrame:
    """Distributed polyfill: one Arrow batch of polygons in, cover cells
    out.  Scales with |polygons| across executors — no driver geometry,
    no broadcast.  Boundary rows carry their ring geometry so the
    downstream refine needs no join back to the layer."""
    pdf_in = polys if polys is not None else polygons_df(spark)

    def kernel(batches):
        import json

        import pandas as pd

        for pdf in batches:
            recs = []
            raw = {}
            for row in pdf.itertuples():
                rings = json.loads(row.rings_json)
                raw[int(row.poly_id)] = row.rings_json
                recs.append(
                    {
                        "poly_id": int(row.poly_id),
                        "zone": row.zone,
                        "metro": row.metro,
                        "priority": int(row.priority),
                        "verts": [tuple(v) for v in rings[0]],
                        "holes": [[tuple(v) for v in h] for h in rings[1:]],
                    }
                )
            cov = polygon_cell_cover_general(recs, res=res)
            out = pd.DataFrame.from_records(cov) if cov else pd.DataFrame(
                columns=["cell", "poly_id", "metro", "zone", "priority", "interior"]
            )
            out["rings_json"] = [
                None if i else raw[pid]
                for pid, i in zip(out["poly_id"], out["interior"])
            ]
            yield out[
                ["cell", "poly_id", "zone", "metro", "priority", "interior",
                 "rings_json"]
            ]

    return pdf_in.mapInPandas(kernel, schema=_COVER_GEOM_SCHEMA)


def pip_cover_join_distributed(
    spark: SparkSession,
    points: DataFrame | None = None,
    polys: DataFrame | None = None,
    res: int | None = None,
    cell_col: str = "h3_res8",
    key: str = "site_id",
) -> DataFrame:
    """PIP for layers too big to broadcast: shuffle cover join + Arrow
    refine on boundary candidates only + one min(struct) resolution agg.

    Plan shape: points ⇄ cover SHUFFLE_HASH join on cell (AQE handles the
    urban-core cell skew), a mapInPandas ray-cast over ONLY the boundary
    candidate rows (~10% of cover), then a hash agg on the point key.
    Interior candidates and cover misses never touch Python.
    """
    pts = (
        points
        if points is not None
        else spark.table("sites").select("site_id", "lat", "lon", "h3_res8")
    )
    cover = polyfill_distributed(spark, polys=polys, res=res)
    cand = pts.join(
        cover.hint("shuffle_hash"), pts[cell_col] == cover["cell"], "left"
    ).select(
        key, "lat", "lon", "poly_id", "zone", "priority", "interior", "rings_json"
    )

    easy = cand.filter(F.col("interior").isNull() | F.col("interior")).select(
        key, "poly_id", "zone", "priority",
        F.coalesce(F.col("interior"), F.lit(False)).alias("accepted"),
    )

    hard_in = cand.filter(~F.col("interior"))
    key_type = dict((f.name, f.dataType.simpleString()) for f in pts.schema.fields)[key]
    refine_schema = (
        f"{key} {key_type}, poly_id bigint, zone string, priority int, accepted boolean"
    )

    def refine(batches):
        import json

        for pdf in batches:
            for pid, grp in pdf.groupby("poly_id", sort=False):
                rings = [
                    np.asarray(ring, dtype=np.float64)
                    for ring in json.loads(grp.iloc[0]["rings_json"])
                ]
                acc = _ray_cast_rings(
                    grp["lat"].values.astype(np.float64),
                    grp["lon"].values.astype(np.float64),
                    rings,
                )
                out = grp[[key, "poly_id", "zone", "priority"]].copy()
                out["accepted"] = acc
                yield out

    hard = hard_in.mapInPandas(refine, schema=refine_schema)

    resolved = (
        easy.unionByName(hard)
        .groupBy(key)
        .agg(
            F.min(
                F.when(
                    F.col("accepted"),
                    F.struct(
                        F.col("priority"), F.col("poly_id"), F.col("zone")
                    ),
                )
            ).alias("__hit")
        )
    )
    return resolved.select(
        key,
        F.coalesce(F.col("__hit.poly_id"), F.lit(-1).cast("long")).alias("poly_id"),
        F.col("__hit.zone").alias("poly_zone"),
    )


def _pip_field_case_sql(lat: str, lon: str, field: str) -> str:
    """First-match CASE emitting a polygon attribute (zone/metro)."""
    polys = synthetic_polygons()
    ordered = sorted(polys, key=lambda p: (p["zone"] != "core", p["poly_id"]))
    whens = [
        f"WHEN {_halfplane_conds(p['verts'], lat, lon)} THEN '{p[field]}'"
        for p in ordered
    ]
    return f"CASE {' '.join(whens)} ELSE NULL END"


def doc_zone_counts_oracle_sql() -> str:
    from ..sources.documents import geotagged_spans_oracle_sql

    zone = _pip_field_case_sql("lat", "lon", "zone")
    metro = _pip_field_case_sql("lat", "lon", "metro")
    return f"""
SELECT metro, zone,
       COUNT(DISTINCT doc_id) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_spans
FROM (
  SELECT doc_id, {metro} AS metro, {zone} AS zone
  FROM ({geotagged_spans_oracle_sql()}) __g
) __assigned
WHERE zone IS NOT NULL
GROUP BY 1, 2"""
