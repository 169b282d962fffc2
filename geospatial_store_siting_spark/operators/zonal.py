"""Raster → hex zonal statistics (north-star G8; absent in the reference,
whose population surface is already hex-keyed).

Model: a synthetic raster — a regular pixel lattice per metro window with
a closed-form value surface v(px, py) — is assigned to hex cells via the
shared codec and aggregated per cell (mean/min/max/count).  At scale this
is the canonical raster ingestion plan: pixel generation is a distributed
range (map-only), cell assignment is closed-form arithmetic fused into the
scan, and the only shuffle is the final per-cell aggregation (partial agg
first, so pixels collapse map-side).

The raster is deterministic and dialect-neutral: the oracle generates the
identical lattice with its own range() source — pixel values are pure
arithmetic of (px, py), so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import METROS
from ..functions import hex_sql
from ..functions.exprs import dround

GRID_N = 64  # pixels per axis per metro window (64x64 per metro)
WINDOW_HALF_DEG = 0.25


def _pixel_exprs(metro_idx: str, px: str, py: str) -> tuple[str, str, str]:
    """(lat, lon, value) of a pixel as dialect-neutral SQL."""
    lat0 = " ".join(
        f"WHEN ({metro_idx}) = {i} THEN {repr(lat)}" for i, (_, lat, _) in enumerate(METROS)
    )
    lon0 = " ".join(
        f"WHEN ({metro_idx}) = {i} THEN {repr(lon)}" for i, (_, _, lon) in enumerate(METROS)
    )
    step = repr(2 * WINDOW_HALF_DEG / GRID_N)
    lat = f"((CASE {lat0} END) - {WINDOW_HALF_DEG} + ({py}) * {step})"
    lon = f"((CASE {lon0} END) - {WINDOW_HALF_DEG} + ({px}) * {step})"
    # synthetic population-density surface: radial falloff + deterministic noise
    value = (
        f"(1000.0 - (ABS(({px}) - {GRID_N // 2}) + ABS(({py}) - {GRID_N // 2})) * 10.0"
        f" + CAST((({px}) * 31 + ({py}) * 17) % 23 AS DOUBLE))"
    )
    return lat, lon, value


def raster_pixels(spark: SparkSession) -> DataFrame:
    """The distributed raster: 5 metros × GRID_N² pixels (spark.range —
    map-only generation, no driver materialization)."""
    n = len(METROS) * GRID_N * GRID_N
    base = spark.range(n).select(
        (F.col("id") % len(METROS)).alias("metro_idx"),
        ((F.col("id") / len(METROS)).cast("long") % GRID_N).alias("px"),
        ((F.col("id") / (len(METROS) * GRID_N)).cast("long") % GRID_N).alias("py"),
    )
    lat, lon, value = _pixel_exprs("metro_idx", "px", "py")
    return base.select(
        "metro_idx",
        "px",
        "py",
        F.expr(lat).alias("lat"),
        F.expr(lon).alias("lon"),
        F.expr(value).alias("value"),
    )


def zonal_stats(spark: SparkSession, res: int = 8) -> DataFrame:
    """Per-hex zonal statistics of the raster surface."""
    px = raster_pixels(spark)
    px.createOrReplaceTempView("__raster_tmp")
    encoded = spark.sql(
        hex_sql.encode_select_sql(
            "SELECT metro_idx, value, lat, lon FROM __raster_tmp",
            lat="lat",
            lon="lon",
            res=res,
            keep_cols=["metro_idx", "value"],
            cell_alias="cell_id",
        )
    )
    return (
        encoded.groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_pixels"),
            dround(F.avg("value"), 4).alias("mean_value"),
            dround(F.min("value"), 4).alias("min_value"),
            dround(F.max("value"), 4).alias("max_value"),
        )
    )


def zonal_stats_oracle_sql(res: int = 8) -> str:
    lat, lon, value = _pixel_exprs("metro_idx", "px", "py")
    n = len(METROS) * GRID_N * GRID_N
    pixels = f"""
SELECT CAST(i % {len(METROS)} AS BIGINT) AS metro_idx,
       CAST(FLOOR(i / {len(METROS)}) AS BIGINT) % {GRID_N} AS px,
       CAST(FLOOR(i / {len(METROS) * GRID_N}) AS BIGINT) % {GRID_N} AS py
FROM (SELECT UNNEST(range({n})) AS i) __r"""
    with_coords = f"""
SELECT metro_idx, {value} AS value, {lat} AS lat, {lon} AS lon
FROM ({pixels}) __px"""
    encoded = hex_sql.encode_select_sql(
        with_coords,
        lat="lat",
        lon="lon",
        res=res,
        keep_cols=["metro_idx", "value"],
        cell_alias="cell_id",
    )
    return f"""
SELECT cell_id,
       COUNT(*) AS n_pixels,
       (FLOOR((AVG(value)) * 10000.0 + 0.5) / 10000.0) AS mean_value,
       (FLOOR((MIN(value)) * 10000.0 + 0.5) / 10000.0) AS min_value,
       (FLOOR((MAX(value)) * 10000.0 + 0.5) / 10000.0) AS max_value
FROM ({encoded}) __e
GROUP BY cell_id"""


# ---------------------------------------------------------------------------
# Inverse-distance-weighted (IDW) surface interpolation
# ---------------------------------------------------------------------------
# The other raster↔vector direction: scattered point samples (store sites
# with observed annual_sales) interpolated onto the hex grid — the sales
# surface a siting analyst drapes over the demand map. Shepard weights
# w = 1/max(d², floor²) with the engine's planar squared distance (pure
# multiply/add — libm trig would wobble a steep kernel, operators/huff.py).
#
# Determinism: weights AND sample values snap to exact integers BEFORE any
# aggregation (weight → micros, sales → cents), so the per-cell sums are
# order-independent BIGINT arithmetic and one shared double division at
# the end is bit-identical across engines — the huff_isochrone /
# unigram_surprisal discipline.
#
# Scale: the sample dim (stores) explodes to its ring-2 disk (×19) and
# hash-joins grid cells on the cell id — dim-side explode, |grid|-side
# untouched; one hash agg per cell. No crossJoin, no window, no Python.

IDW_RING = 2
IDW_FLOOR2 = "0.0025"  # miles², = DISTANCE_FLOOR_MILES²


def _idw_sql(grid_src: str, sites_src: str, exact_acc: bool = False) -> str:
    from ..config import HEX_SIZE_DEG, RES_TRADE_AREA

    offs = ", ".join(
        f"({dq}, {dr})" for dq, dr in hex_sql.ring_offsets(IDW_RING)
    )
    nbr = hex_sql.cell_id_from_qr_sql(
        "s.q + __o.dq", "s.r + __o.dr", RES_TRADE_AREA
    )
    # centroids recomputed HERE with all-DOUBLE casts, not read from the
    # grid view: the view's centroid columns are DECIMAL on Spark (bare
    # decimal literals) and DOUBLE on DuckDB — a latent 1-ulp divergence
    # the weight snap could amplify at a .5 boundary; the shared cast
    # chain pins both engines to the identical IEEE path (the
    # parent_rollup / cell_boundary discipline)
    s8 = f"CAST({HEX_SIZE_DEG[RES_TRADE_AREA]!r} AS DOUBLE)"
    sqrt3 = f"CAST({hex_sql.SQRT3} AS DOUBLE)"
    clat = f"(CAST(gq_r AS DOUBLE) * CAST(1.5 AS DOUBLE) * {s8})"
    clon = (
        f"((CAST(gq_q AS DOUBLE) + CAST(gq_r AS DOUBLE) / CAST(2.0 AS DOUBLE))"
        f" * {sqrt3} * {s8})"
    )
    d2 = (
        f"((({clat} - lat) * CAST(69.0 AS DOUBLE))"
        f" * (({clat} - lat) * CAST(69.0 AS DOUBLE))"
        f" + (({clon} - lon) * CAST(54.6 AS DOUBLE))"
        f" * (({clon} - lon) * CAST(54.6 AS DOUBLE)))"
    )
    w = (
        f"(CAST(1.0 AS DOUBLE) / (CASE WHEN {d2} > CAST({IDW_FLOOR2} AS DOUBLE)"
        f" THEN {d2} ELSE CAST({IDW_FLOOR2} AS DOUBLE) END))"
    )
    w_micros = f"CAST(FLOOR({w} * 1000000.0 + 0.5) AS BIGINT)"
    s_cents = "CAST(FLOOR(annual_sales * 100.0 + 0.5) AS BIGINT)"
    idw = "(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / CAST(100.0 AS DOUBLE))"
    if exact_acc:
        # Spark-side headroom (ADVICE r5): a floor-distance sample yields
        # w_micros≈4e8 and s_cents≈2.5e8 (~1e17 per row) — ~90 such rows in
        # one cell's disk overflow a BIGINT num at corpus scale, the exact
        # class commit 007720d moved the Gi* Σx² to DECIMAL(38,0) for.
        # Accumulate num/den as DECIMAL(38,0) and CAST to DOUBLE only in
        # the final division: identical values wherever BIGINT did not
        # overflow (same exact integer → same double).  DuckDB needs no
        # twin (its BIGINT SUM aggregates through HUGEINT), so the ORACLE
        # TEXT — which the driver fingerprints — keeps the default form.
        num_agg = (
            f"SUM(CAST({w_micros} AS DECIMAL(19,0))"
            f" * CAST({s_cents} AS DECIMAL(19,0))) AS num"
        )
        den_agg = f"SUM(CAST({w_micros} AS DECIMAL(19,0))) AS den"
    else:
        num_agg = f"CAST(SUM({w_micros} * {s_cents}) AS BIGINT) AS num"
        den_agg = f"CAST(SUM({w_micros}) AS BIGINT) AS den"
    return f"""
WITH stores AS (
  SELECT site_id, q, r, lat, lon, annual_sales
  FROM ({sites_src}) __s WHERE annual_sales IS NOT NULL),
pairs AS (
  SELECT {nbr} AS cell_id, s.site_id, s.lat, s.lon, s.annual_sales
  FROM stores s
  CROSS JOIN (SELECT * FROM (VALUES {offs}) AS __ring(dq, dr)) __o),
joined AS (
  SELECT pr.cell_id, pr.lat, pr.lon, pr.annual_sales,
         g.q AS gq_q, g.r AS gq_r
  FROM pairs pr JOIN ({grid_src}) g ON pr.cell_id = g.cell_id),
contrib AS (
  SELECT cell_id,
         CAST(COUNT(*) AS BIGINT) AS n_samples,
         {num_agg},
         {den_agg}
  FROM joined
  GROUP BY cell_id)
SELECT cell_id, n_samples,
       CAST({hex_sql.round_sql(idw, 2)} AS DOUBLE) AS idw_sales
FROM contrib WHERE den > 0"""


def idw_sales_surface(spark: SparkSession) -> DataFrame:
    """IDW-interpolated sales surface over the demographics grid."""
    return spark.sql(
        _idw_sql(
            "SELECT cell_id, q, r FROM hex_grid",
            "SELECT site_id, q, r, lat, lon, annual_sales FROM sites",
            exact_acc=True,
        )
    )


def idw_sales_surface_oracle_sql() -> str:
    return _idw_sql(hex_sql.grid_sql(), hex_sql.sites_sql())
