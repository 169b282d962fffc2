"""Dialect-neutral SQL for the from-scratch hex tile index.

This module is the single source of truth for cell assignment: the same SQL
text runs in Spark (via ``spark.sql`` / ``F.expr``) and in any ANSI oracle
(DuckDB), guaranteeing bit-identical tile assignments — every operation is
IEEE-exact (add/mul/div/floor/abs on doubles, bigint integer arithmetic),
with no libm trig in the codec path.

Grid model: pointy-top axial hex lattice over (lon, lat) degree space.
For resolution ``res`` with center-to-vertex size ``s`` degrees:

    qf = (lon * (sqrt(3)/3) - lat/3) / s
    rf = (lat / 1.5) / s
    (q, r) = cube_round(qf, rf)          # nearest hex center
    cell_id = (res-6)*2^50 + (q+2^24)*2^25 + (r+2^24)   # < 2^53

Reference parity: replaces the H3 string ids of
``/root/reference/notebooks/_config.py:43-45`` (res 7/8/9) and the
``h3.latlng_to_cell`` / ``h3.grid_disk`` driver loops of
``/root/reference/notebooks/10_feature_engineering.py:77-116`` with a
distributed, closed-form codec.  k-ring sizes match the reference exactly:
1+3k(k+1) = 7/19/37 cells at k=1/2/3
(``notebooks/10_feature_engineering.py:116``).
"""

from __future__ import annotations

import math

from ..config import AXIS_OFFSET, AXIS_SHIFT, HEX_SIZE_DEG, RES_CODE_SHIFT

SQRT3_OVER_3 = "0.5773502691896258"  # literal: parses to the same float64 everywhere
SQRT3 = "1.7320508075688772"


def round_sql(expr: str, n: int) -> str:
    """Deterministic cross-engine rounding: FLOOR(x*10^n + 0.5)/10^n.

    Engine-native ROUND() differs at half-way boundaries (Spark HALF_UP on
    the exact BigDecimal expansion vs DuckDB's scaled-multiply nearbyint),
    which breaks value-hash parity.  This formulation is pure IEEE
    multiply/add/floor/divide — bit-identical everywhere.
    """
    p = 10**n
    return f"(FLOOR(({expr}) * {p}.0 + 0.5) / {p}.0)"


def frac_axial_sql(lat: str, lon: str, res: int) -> tuple[str, str]:
    """Fractional axial coords (qf, rf) as SQL expressions."""
    s = repr(HEX_SIZE_DEG[res])
    qf = f"((({lon}) * {SQRT3_OVER_3} - ({lat}) / 3.0) / {s})"
    rf = f"((({lat}) / 1.5) / {s})"
    return qf, rf


def encode_select_sql(
    inner_sql: str,
    lat: str,
    lon: str,
    res: int,
    keep_cols: list[str],
    cell_alias: str = "cell_id",
    q_alias: str = "q",
    r_alias: str = "r",
) -> str:
    """Wrap ``inner_sql`` in nested SELECTs that add (cell_id, q, r).

    ``lat``/``lon`` are column names (or expressions over columns) of the
    inner relation; ``keep_cols`` are passed through. The nested-select
    layering keeps each sub-expression written once, so the emitted SQL is
    readable and CSE-friendly in both engines.
    """
    qf, rf = frac_axial_sql(lat, lon, res)
    keep = ", ".join(keep_cols)
    keep_pfx = f"{keep}, " if keep_cols else ""
    # cube coords: x=qf, z=rf, y=-x-z; round each, then repair the axis with
    # the largest rounding error so x+y+z == 0 still holds.
    return f"""
SELECT {keep_pfx}
       ({(res - 6)} * {RES_CODE_SHIFT}
        + ({q_alias} + {AXIS_OFFSET}) * {AXIS_SHIFT}
        + ({r_alias} + {AXIS_OFFSET})) AS {cell_alias},
       {q_alias}, {r_alias}
FROM (
  SELECT {keep_pfx}
         CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS {q_alias},
         CASE WHEN dx > dy AND dx > dz THEN rz
              WHEN dy > dz THEN rz
              ELSE -rx - ry END AS {r_alias}
  FROM (
    SELECT {keep_pfx} rx, ry, rz,
           ABS(rx - xf) AS dx, ABS(ry - yf) AS dy, ABS(rz - zf) AS dz
    FROM (
      SELECT {keep_pfx} xf, yf, zf,
             CAST(FLOOR(xf + 0.5) AS BIGINT) AS rx,
             CAST(FLOOR(yf + 0.5) AS BIGINT) AS ry,
             CAST(FLOOR(zf + 0.5) AS BIGINT) AS rz
      FROM (
        SELECT {keep_pfx} xf, -xf - zf AS yf, zf
        FROM (
          SELECT {keep_pfx} {qf} AS xf, {rf} AS zf
          FROM ({inner_sql}) __enc0
        ) __enc1
      ) __enc2
    ) __enc3
  ) __enc4
) __enc5"""


def cell_id_from_qr_sql(q: str, r: str, res: int) -> str:
    """cell_id from integer axial coords — used for neighbor/ring ids."""
    return (
        f"({(res - 6)} * {RES_CODE_SHIFT}"
        f" + (({q}) + {AXIS_OFFSET}) * {AXIS_SHIFT}"
        f" + (({r}) + {AXIS_OFFSET}))"
    )


def centroid_sql(q: str, r: str, res: int) -> tuple[str, str]:
    """(lat, lon) of a cell centroid from axial coords."""
    s = repr(HEX_SIZE_DEG[res])
    lat = f"(({r}) * 1.5 * {s})"
    lon = f"((({q}) + ({r}) / 2.0) * {SQRT3} * {s})"
    return lat, lon


def decode_qr_sql(cell: str) -> tuple[str, str]:
    """(q, r) decode expressions from a packed cell id.

    Exactness: cell < 2^53 so it is double-exact; FLOOR-division by a
    power of two only shifts the exponent (no rounding), so the decode is
    bit-identical in any IEEE engine — the inverse of the encode packing
    at ``cell_id_from_qr_sql``.
    """
    rem = f"(({cell}) % {RES_CODE_SHIFT})"
    q = f"(CAST(FLOOR({rem} / {AXIS_SHIFT}.0) AS BIGINT) - {AXIS_OFFSET})"
    r = f"(({rem}) % {AXIS_SHIFT} - {AXIS_OFFSET})"
    return q, r


def grid_distance_sql(q1: str, r1: str, q2: str, r2: str) -> str:
    """Hex grid distance between two axial coords (H3 grid_distance
    analogue): (|dq| + |dr| + |dq+dr|) / 2 — pure integer arithmetic."""
    dq = f"(({q1}) - ({q2}))"
    dr = f"(({r1}) - ({r2}))"
    # the sum is always even; /2.0 on ints < 2^52 is exact, CAST truncates
    # nothing (DIV/" // " integer-division spellings differ across engines)
    return f"CAST((ABS({dq}) + ABS({dr}) + ABS({dq} + {dr})) / 2.0 AS BIGINT)"


# exact corner-offset literals shared with the numpy codec
# (functions/hexgrid + operators/pip._cell_corners use math.sin/cos of the
# same angles, so SQL corners match the kernel bit-for-bit)
CORNER_OFFSETS = [
    (
        k,
        repr(math.cos(math.radians(30 + 60 * k))),
        repr(math.sin(math.radians(30 + 60 * k))),
    )
    for k in range(6)
]


def corner_offsets_values_sql() -> str:
    """6-row VALUES relation (corner, ux, uy): unit offsets of the
    pointy-top hex corners at angles 30+60k degrees."""
    rows = ", ".join(f"({k}, {ux}, {uy})" for k, ux, uy in CORNER_OFFSETS)
    return f"(VALUES {rows}) __corners(corner, ux, uy)"


def ring_offsets(k: int) -> list[tuple[int, int]]:
    """Axial offsets of the k-disk (includes center): 1+3k(k+1) cells."""
    out = []
    for dq in range(-k, k + 1):
        for dr in range(-k, k + 1):
            if abs(dq + dr) <= k:
                out.append((dq, dr))
    return out


def ring_offsets_values_sql(k: int) -> str:
    """A VALUES relation (dq, dr) for the k-disk — same text in both dialects."""
    rows = ", ".join(f"({dq}, {dr})" for dq, dr in ring_offsets(k))
    return f"(SELECT * FROM (VALUES {rows}) AS __ring(dq, dr))"


# ---------------------------------------------------------------------------
# Deterministic geo synthesis from the TPC-H-ish test tables.
#
# The engine's input per BASELINE.json is an interleaved-document table plus
# POI/boundary layers; for the oracle-checked query surface we derive the
# geospatial "bronze" tables (sites, competitors, poi, hex demographics)
# deterministically from the shared parquet tables with pure bigint/float64
# arithmetic, so Spark and DuckDB materialize identical worlds.
# ---------------------------------------------------------------------------

# Multiplicative hash constants (Knuth 2654435761; primes). All products stay
# below 2^53 for key ranges up to ~3e6, so float64 engines stay exact.
H1 = 2654435761
H2 = 179424673
H3C = 96002369


def metro_case_sql(key: str, col: str) -> str:
    """metro name from an integer key (5 metros, reference `_config.py:49-55`)."""
    from ..config import METROS

    whens = " ".join(
        f"WHEN ({key}) % 5 = {i} THEN '{name}'" for i, (name, _, _) in enumerate(METROS)
    )
    return f"CASE {whens} END AS {col}"


def _metro_coord_case(key: str, idx: int) -> str:
    from ..config import METROS

    vals = [(lat, lon) for (_, lat, lon) in METROS]
    coord = [v[idx] for v in vals]
    whens = " ".join(f"WHEN ({key}) % 5 = {i} THEN {repr(c)}" for i, c in enumerate(coord))
    return f"CASE {whens} END"


def latlon_sql(key: str) -> tuple[str, str]:
    """Deterministic (lat, lon) near the key's metro center, ±0.25 deg."""
    u1 = f"(CAST((({key}) * {H1}) % 100000 AS DOUBLE) / 100000.0)"
    u2 = f"(CAST((({key}) * {H2}) % 100000 AS DOUBLE) / 100000.0)"
    lat0 = _metro_coord_case(key, 0)
    lon0 = _metro_coord_case(key, 1)
    lat = f"(({lat0}) + ({u1} - 0.5) * 0.5)"
    lon = f"(({lon0}) + ({u2} - 0.5) * 0.5)"
    return lat, lon


def sites_sql(customer: str = "customer") -> str:
    """Unified sites table (stores + candidates) from ``customer``.

    Mirrors the reference's union of existing stores and candidate locations
    (`notebooks/10_feature_engineering.py:36-65`): ~1:10 store:candidate mix,
    metro assignment, drive-thru flag, property columns (parking/rent NULL
    for stores, as in the reference's imputation input, `:334-364`), and
    synthetic annual_sales for stores.

    annual_sales is derived from the site's OWN-CELL demographics (same
    closed-form attrs as the grid) plus bounded noise, so sales genuinely
    correlate with trade-area quality — the reference generator does the
    same so its anti-circular gate (r >= 0.4) is meaningful
    (`notebooks/00_quality_checks.py:128-143`).
    """
    lat, lon = latlon_sql("c_custkey")
    inner = f"""
SELECT c_custkey AS site_id,
       {metro_case_sql("c_custkey", "metro")},
       {lat} AS lat,
       {lon} AS lon,
       CASE WHEN c_custkey % 11 = 0 THEN 'store' ELSE 'candidate' END AS site_type,
       CAST(CASE WHEN c_custkey % 3 = 0 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS drive_thru,
       c_acctbal AS acctbal,
       CASE WHEN c_custkey % 3 = 0 THEN 'inline'
            WHEN c_custkey % 3 = 1 THEN 'endcap'
            ELSE 'freestanding' END AS property_type,
       (1200.0 + CAST((c_custkey * 31) % 2800 AS DOUBLE)) AS square_feet,
       CASE WHEN c_custkey % 11 = 0 THEN NULL
            ELSE CAST(5 + (c_custkey * 13) % 95 AS DOUBLE) END AS parking_spaces,
       CASE WHEN c_custkey % 11 = 0 THEN NULL
            ELSE (12.0 + CAST((c_custkey * 29) % 400 AS DOUBLE) / 10.0) END AS rent_per_sqft
FROM {customer}"""
    enc = encode_select_sql(
        inner,
        lat="lat",
        lon="lon",
        res=8,
        keep_cols=["site_id", "metro", "lat", "lon", "site_type", "drive_thru", "acctbal",
                   "property_type", "square_feet", "parking_spaces", "rent_per_sqft"],
        cell_alias="h3_res8",
    )
    attrs = grid_attrs_sql("h3_res8")
    sales = (
        f"CASE WHEN site_type = 'store' "
        f"THEN 400000.0 + {attrs['population']} * 180.0 + {attrs['median_income']} * 9.0 "
        f"+ CAST((site_id * {H3C}) % 120000 AS DOUBLE) + acctbal * 20.0 "
        f"ELSE NULL END"
    )
    return f"""
SELECT site_id, metro, lat, lon, site_type, drive_thru,
       {sales} AS annual_sales,
       property_type, square_feet, parking_spaces, rent_per_sqft,
       h3_res8, q, r
FROM ({enc}) __senc"""


def competitors_sql(supplier: str = "supplier") -> str:
    """Competitors from ``supplier`` (reference bronze.competitors)."""
    key = "(s_suppkey * 7 + 3)"
    lat, lon = latlon_sql(key)
    inner = f"""
SELECT s_suppkey AS competitor_id,
       {metro_case_sql(key, "metro")},
       {lat} AS lat,
       {lon} AS lon,
       CASE WHEN s_suppkey % 4 = 0 THEN 'QSR_Burger'
            WHEN s_suppkey % 4 = 1 THEN 'QSR_Chicken'
            WHEN s_suppkey % 4 = 2 THEN 'Coffee'
            ELSE 'Pizza' END AS category
FROM {supplier}"""
    return encode_select_sql(
        inner,
        lat="lat",
        lon="lon",
        res=8,
        keep_cols=["competitor_id", "metro", "lat", "lon", "category"],
        cell_alias="h3_res8",
    )


def poi_sql(part: str = "part") -> str:
    """Points of interest from ``part`` (reference bronze.poi)."""
    key = "(p_partkey * 13 + 5)"
    lat, lon = latlon_sql(key)
    inner = f"""
SELECT p_partkey AS poi_id,
       {metro_case_sql(key, "metro")},
       {lat} AS lat,
       {lon} AS lon,
       CASE WHEN p_partkey % 7 = 0 THEN 'anchor' ELSE 'standard' END AS size_class,
       CASE WHEN p_partkey % 11 = 0 THEN 'grocery'
            WHEN p_partkey % 11 IN (1, 6) THEN 'retail'
            WHEN p_partkey % 11 IN (2, 7) THEN 'gym'
            WHEN p_partkey % 11 IN (3, 8) THEN 'school'
            ELSE 'office' END AS category,
       (CAST((p_partkey * 17) % 997 AS DOUBLE) * 2.0) AS foot_traffic_index
FROM {part}"""
    return encode_select_sql(
        inner,
        lat="lat",
        lon="lon",
        res=8,
        keep_cols=["poi_id", "metro", "lat", "lon", "size_class", "category",
                   "foot_traffic_index"],
        cell_alias="h3_res8",
    )


def grid_attrs_sql(cell: str) -> dict[str, str]:
    """Closed-form per-cell demographic/traffic attributes from the cell id.

    Mirrors reference bronze.demographics / bronze.traffic columns
    (`docs/DATA_REFERENCE.md:8-28`) with deterministic arithmetic so both
    engines derive identical grids without a stored table.
    """
    return {
        "population": f"(500.0 + CAST((({cell}) % 9973) % 5000 AS DOUBLE))",
        "median_income": f"(30000.0 + CAST(({cell}) % 101 AS DOUBLE) * 700.0)",
        "target_demo_pct": f"(0.1 + CAST(({cell}) % 47 AS DOUBLE) / 47.0 * 0.5)",
        "college_pct": f"(CAST(({cell}) % 31 AS DOUBLE) / 31.0 * 0.6)",
        "pedestrian_traffic": f"(CAST((({cell}) % 1009) AS DOUBLE) * 3.0)",
        "transit_score": f"(CAST(({cell}) % 83 AS DOUBLE) / 83.0 * 100.0)",
        "foot_traffic": f"(CAST((({cell}) % 769) AS DOUBLE) * 5.0)",
        # commute flows for daytime population (reference bronze.traffic
        # commute_inflow/outflow, `notebooks/10_feature_engineering.py:156-173`)
        "commute_inflow": f"(CAST((({cell}) % 401) AS DOUBLE) * 20.0)",
        "commute_outflow": f"(CAST((({cell}) % 379) AS DOUBLE) * 18.0)",
    }


def nearest_metro_case_sql(lat: str, lon: str) -> str:
    """Metro assignment of an arbitrary point = nearest metro center
    (squared-degree distance; centers are >5 deg apart, points within
    ±0.3 deg of a center, so this is exact)."""
    from ..config import METROS

    dists = [
        f"(POWER(({lat}) - {repr(mlat)}, 2) + POWER(({lon}) - {repr(mlon)}, 2))"
        for (_, mlat, mlon) in METROS
    ]
    whens = []
    for i, (name, _, _) in enumerate(METROS[:-1]):
        conds = " AND ".join(f"{dists[i]} <= {dists[j]}" for j in range(len(METROS)) if j != i)
        whens.append(f"WHEN {conds} THEN '{name}'")
    return f"CASE {' '.join(whens)} ELSE '{METROS[-1][0]}' END"


def grid_sql(customer: str = "customer") -> str:
    """The hex demographics grid: distinct res-8 cells seen by customers,
    with closed-form attributes, centroid coords, and metro assignment.
    One row per cell (reference bronze.demographics has one row per hex
    with centroid lat/lon columns, `docs/DATA_REFERENCE.md:8-28,169`)."""
    sites = sites_sql(customer)
    attrs = grid_attrs_sql("cell_id")
    attr_cols = ",\n       ".join(f"{expr} AS {name}" for name, expr in attrs.items())
    clat, clon = centroid_sql("q", "r", 8)
    metro = nearest_metro_case_sql(clat, clon)
    return f"""
SELECT cell_id, q, r,
       {clat} AS centroid_lat,
       {clon} AS centroid_lon,
       {metro} AS metro,
       {attr_cols}
FROM (
  SELECT DISTINCT h3_res8 AS cell_id, q, r FROM ({sites}) __s
) __cells"""


def haversine_miles_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle miles — the reference's native-expression kernel
    (`notebooks/10_feature_engineering.py:235-243`). Identical formula both
    engines; compared outputs are rounded by callers (libm trig may differ
    in the last ulp across engines)."""
    return (
        f"(7917.511798 * ASIN(SQRT("
        f"POWER(SIN(RADIANS(({lat2}) - ({lat1})) / 2), 2)"
        f" + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))"
        f" * POWER(SIN(RADIANS(({lon2}) - ({lon1})) / 2), 2)"
        f")))"
    )
