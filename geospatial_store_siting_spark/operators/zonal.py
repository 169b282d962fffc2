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
