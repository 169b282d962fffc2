"""Distributed k-ring expansion.

Replaces the reference's driver-side ``h3.grid_disk`` loop
(``/root/reference/notebooks/10_feature_engineering.py:77-116`` — collect
5,350 sites to the driver, expand in Python, createDataFrame back) with a
fully distributed expansion: a 7/19/37-row offsets dimension is joined
(Catalyst broadcasts a literal local relation for free) and the neighbor
cell id is closed-form bigint arithmetic — so the expansion runs JVM-side
inside whole-stage codegen, scales linearly with sites, and never touches
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import AXIS_OFFSET, AXIS_SHIFT, RES_CODE_SHIFT
from ..functions import hex_sql


def offsets_df(spark: SparkSession, k: int) -> DataFrame:
    """The k-disk offsets as a tiny DataFrame (1+3k(k+1) rows)."""
    return spark.createDataFrame(
        [(int(dq), int(dr)) for dq, dr in hex_sql.ring_offsets(k)], "dq int, dr int"
    )


def neighbor_cell_col(q, r, res: int = 8):
    """Neighbor cell id from axial coords + offsets — pure bigint arithmetic."""
    return (
        F.lit(res - 6).cast("long") * F.lit(RES_CODE_SHIFT)
        + (q + F.lit(AXIS_OFFSET)).cast("long") * F.lit(AXIS_SHIFT)
        + (r + F.lit(AXIS_OFFSET)).cast("long")
    )


def hex_distance(dq: int, dr: int) -> int:
    """Hex grid distance of an axial offset."""
    return (abs(dq) + abs(dr) + abs(dq + dr)) // 2


def ring_pairs(
    spark: SparkSession,
    points: DataFrame,
    k: int,
    id_col: str = "site_id",
    res: int = 8,
    extra_cols: list[str] | None = None,
    with_ring: bool = False,
) -> DataFrame:
    """(id, neighbor_h3) pair table for the k-disk around each point.

    ``points`` must carry axial coords ``q``/``r`` (from the encoder).
    Output cardinality = |points| * (1+3k(k+1)) — 7/19/37 per site, matching
    the reference's ring tables (`notebooks/10_feature_engineering.py:116`).

    Implementation: ``explode`` over a literal offsets array — stays inside
    whole-stage codegen as a generator, no join at all (a crossJoin against
    the offsets dimension would plan as BroadcastNestedLoopJoin and fall
    out of codegen).
    """
    cols = [id_col, *(extra_cols or [])]
    # one F.expr call, not 37×(struct+3 lits) Column ops: each Column op is
    # a py4j round trip (~0.3 ms) — the string form parses server-side and
    # cut ring_pairs construction from ~0.5 s to ~5 ms (same logical plan)
    items = ", ".join(
        f"struct({int(dq)} as dq, {int(dr)} as dr, {hex_distance(dq, dr)} as ring_k)"
        for dq, dr in hex_sql.ring_offsets(k)
    )
    offs_array = F.expr(f"array({items})")
    exploded = points.select(*cols, "q", "r", F.explode(offs_array).alias("o"))
    ring_extra = [F.col("o.ring_k").alias("ring_k")] if with_ring else []
    return exploded.select(
        *cols,
        neighbor_cell_col(
            F.col("q") + F.col("o.dq"), F.col("r") + F.col("o.dr"), res
        ).alias("neighbor_h3"),
        *ring_extra,
    )


def ring_pairs_oracle_sql(src_sql: str, k: int, id_col: str = "site_id",
                          extra_cols: list[str] | None = None, res: int = 8) -> str:
    """Oracle-side equivalent of ``ring_pairs`` over a source subquery that
    exposes (id_col, q, r)."""
    cols = ", ".join([f"p.{c}" for c in [id_col, *(extra_cols or [])]])
    neigh = hex_sql.cell_id_from_qr_sql("p.q + o.dq", "p.r + o.dr", res)
    return (
        f"SELECT {cols}, {neigh} AS neighbor_h3 "
        f"FROM ({src_sql}) p CROSS JOIN {hex_sql.ring_offsets_values_sql(k)} o"
    )


# ---------------------------------------------------------------------------
# H3-parity cell geometry APIs: cell_to_boundary and grid_distance
# ---------------------------------------------------------------------------

def _cell_boundary_sql(src_sql: str) -> str:
    """Shared Spark/DuckDB SQL: distinct cells of ``src`` × the 6-corner
    offsets relation → one row per (cell, corner) with exact coordinates.

    H3 ``cell_to_boundary`` analogue over the from-scratch lattice; the
    corner offsets are the same sin/cos literals the numpy codec uses
    (``pip._cell_corners``), so all three formulations agree bit-for-bit.
    """
    from ..config import HEX_SIZE_DEG, RES_TRADE_AREA

    # every literal CAST to DOUBLE: bare decimal literals parse as DECIMAL
    # in Spark SQL (exact-decimal arithmetic, 1-ulp off the IEEE path
    # DuckDB and the numpy codec take); op order mirrors _cell_corners
    s = f"CAST({HEX_SIZE_DEG[RES_TRADE_AREA]!r} AS DOUBLE)"
    sqrt3 = f"CAST({hex_sql.SQRT3} AS DOUBLE)"
    clat = f"(CAST(r AS DOUBLE) * CAST(1.5 AS DOUBLE) * {s})"
    clon = f"((CAST(q AS DOUBLE) + CAST(r AS DOUBLE) / CAST(2.0 AS DOUBLE)) * {sqrt3} * {s})"
    return f"""
SELECT cell_id, corner,
       ({clat} + {s} * CAST(uy AS DOUBLE)) AS corner_lat,
       ({clon} + {s} * CAST(ux AS DOUBLE)) AS corner_lon
FROM (SELECT DISTINCT h3_res8 AS cell_id, q, r FROM ({src_sql}) __src) __cells
CROSS JOIN {hex_sql.corner_offsets_values_sql()}"""


def cell_boundaries(spark: SparkSession) -> DataFrame:
    """Boundary polygons (6 corners) of every distinct site cell."""
    return spark.sql(_cell_boundary_sql("SELECT h3_res8, q, r FROM sites"))


def cell_boundaries_oracle_sql() -> str:
    return _cell_boundary_sql(hex_sql.sites_sql())


def _metro_center_distance_sql(src_sql: str) -> str:
    """Shared SQL: per-site hex grid distance (ring count) from the site's
    cell to its metro center's cell.  The site's (q, r) are RE-DERIVED from
    the packed cell id via ``decode_qr_sql`` — exercising the decode as the
    exact inverse of the encode in both engines — and the center cells are
    driver-side numpy encodes inlined as literals (dim-scale constants)."""
    import numpy as np

    from ..config import METROS, RES_TRADE_AREA
    from ..functions import hexgrid

    lats = np.array([m[1] for m in METROS])
    lons = np.array([m[2] for m in METROS])
    cq, cr = hexgrid.latlng_to_qr(lats, lons, RES_TRADE_AREA)
    q_case = " ".join(
        f"WHEN '{m[0]}' THEN {int(q)}" for m, q in zip(METROS, cq)
    )
    r_case = " ".join(
        f"WHEN '{m[0]}' THEN {int(r)}" for m, r in zip(METROS, cr)
    )
    dq, dr = hex_sql.decode_qr_sql("h3_res8")
    dist = hex_sql.grid_distance_sql(
        dq, dr, f"(CASE metro {q_case} END)", f"(CASE metro {r_case} END)"
    )
    return f"""
SELECT site_id, metro, {dist} AS ring_steps
FROM ({src_sql}) __sites"""


def metro_center_distance(spark: SparkSession) -> DataFrame:
    """H3 ``grid_distance`` analogue: ring count from each site's cell to
    its metro center's cell — integer-exact, decode-validated."""
    return spark.sql(
        _metro_center_distance_sql("SELECT site_id, metro, h3_res8 FROM sites")
    )


def metro_center_distance_oracle_sql() -> str:
    return _metro_center_distance_sql(hex_sql.sites_sql())


def _parent_rollup_sql(grid_sql_src: str) -> str:
    """Shared SQL: res-8 grid cells rolled up to their res-7 parents
    (H3 ``cell_to_parent`` analogue: parent = encode(centroid(cell)) at
    the coarser res — the lattice isn't subdivision-nested, so parenthood
    is centroid re-encode, same contract as ``hexgrid.cell_to_parent``).

    All-DOUBLE casts keep the centroid arithmetic on the IEEE path in
    both engines (bare decimals parse as DECIMAL in Spark SQL)."""
    from ..config import HEX_SIZE_DEG, RES_MARKET, RES_TRADE_AREA

    s8 = f"CAST({HEX_SIZE_DEG[RES_TRADE_AREA]!r} AS DOUBLE)"
    sqrt3 = f"CAST({hex_sql.SQRT3} AS DOUBLE)"
    clat = f"(CAST(r AS DOUBLE) * CAST(1.5 AS DOUBLE) * {s8})"
    clon = f"((CAST(q AS DOUBLE) + CAST(r AS DOUBLE) / CAST(2.0 AS DOUBLE)) * {sqrt3} * {s8})"
    inner = f"""
SELECT cell_id, population, median_income, {clat} AS clat, {clon} AS clon
FROM ({grid_sql_src}) __grid8"""
    enc = hex_sql.encode_select_sql(
        inner,
        lat="clat",
        lon="clon",
        res=RES_MARKET,
        keep_cols=["cell_id", "population", "median_income"],
        cell_alias="parent_cell",
    )
    return f"""
SELECT parent_cell,
       CAST(COUNT(*) AS BIGINT) AS n_children,
       CAST(SUM(population) AS DOUBLE) AS sum_population,
       CAST(SUM(median_income) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_income
FROM ({enc}) __enc7
GROUP BY parent_cell"""


def parent_rollup(spark: SparkSession) -> DataFrame:
    """Market-resolution rollup of the demographics grid (res 8 → res 7)."""
    return spark.sql(
        _parent_rollup_sql("SELECT cell_id, q, r, population, median_income FROM hex_grid")
    )


def parent_rollup_oracle_sql() -> str:
    return _parent_rollup_sql(hex_sql.grid_sql())
