"""kNN competitor-distance features via cell-prefix candidate generation +
haversine refinement (the north-star replacement for metro-blocked joins).

At reference scale the blocked distance join (features.competition_distance)
crosses every site with every in-metro competitor (~7M pairs noted
"manageable" at `/root/reference/notebooks/10_feature_engineering.py:233`).
At 10^12-entity scale that cross product is unbounded — the scalable plan:

1. index both sides at a coarse resolution (res 7 parent cell);
2. candidate generation: k-ring of the site's coarse cell (a 1+3k(k+1)-row
   generator explode) equi-joined to the competitor coarse cell — a pure
   hash join on a high-cardinality key, no theta join, no metro blocking;
3. refinement: exact haversine on the candidate pairs only;
4. top-k per site via a partitioned row_number window.

The coarse ring bounds the search radius: ring-2 of res-7 cells (~1.2 km
size) covers everything within ~2.4 km of the site's cell, comfortably
over the 3-mile trade radius at ring-3.  Semantics are therefore
"k nearest within the ring-R window" — the oracle replicates the same
candidate generation, so results match exactly (and the bounded-window
semantics is the documented contract, as in any production ANN-style kNN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hex_sql
from ..functions.exprs import dround
from . import rings
from .features import haversine_col

COARSE_RES = 7
COARSE_RING_K = 3


def _with_coarse_qr(
    df: DataFrame, lat: str = "lat", lon: str = "lon", res: int = COARSE_RES
) -> DataFrame:
    """Attach axial coords (cq, cr) at ``res`` via the shared closed-form
    encoder, as pure Column expressions (streaming-safe: no temp views)."""
    qf, rf = hex_sql.frac_axial_sql(lat, lon, res)
    # inline cube-round (same formulation as encode_select_sql, expression form)
    df = df.withColumn("__xf", F.expr(qf)).withColumn("__zf", F.expr(rf))
    df = df.withColumn("__yf", -F.col("__xf") - F.col("__zf"))
    for c in ("x", "y", "z"):
        df = df.withColumn(f"__r{c}", F.floor(F.col(f"__{c}f") + F.lit(0.5)))
    df = (
        df.withColumn("__dx", F.abs(F.col("__rx") - F.col("__xf")))
        .withColumn("__dy", F.abs(F.col("__ry") - F.col("__yf")))
        .withColumn("__dz", F.abs(F.col("__rz") - F.col("__zf")))
    )
    fix_x = (F.col("__dx") > F.col("__dy")) & (F.col("__dx") > F.col("__dz"))
    fix_z = ~fix_x & ~(F.col("__dy") > F.col("__dz"))
    df = df.withColumn(
        "cq", F.when(fix_x, -F.col("__ry") - F.col("__rz")).otherwise(F.col("__rx"))
    ).withColumn(
        "cr", F.when(fix_z, -F.col("__rx") - F.col("__ry")).otherwise(F.col("__rz"))
    )
    return df.drop(*[c for c in df.columns if c.startswith("__")])


def _coarse_encode_subquery(src_sql: str, keep: list[str]) -> str:
    """Oracle-side: wrap src in the coarse-res encoder (q,r named cq,cr)."""
    return hex_sql.encode_select_sql(
        src_sql,
        lat="lat",
        lon="lon",
        res=COARSE_RES,
        keep_cols=keep,
        cell_alias="coarse_cell",
        q_alias="cq",
        r_alias="cr",
    )


def knn_competitors(spark: SparkSession, k: int = 3) -> DataFrame:
    """k nearest competitors per site within the coarse-ring window."""
    sites = _with_coarse_qr(
        spark.table("sites").select("site_id", "lat", "lon")
    )
    comps = _with_coarse_qr(
        spark.table("competitors").select(
            F.col("competitor_id"), F.col("lat").alias("c_lat"), F.col("lon").alias("c_lon")
        ),
        lat="c_lat",
        lon="c_lon",
    ).select(
        "competitor_id",
        "c_lat",
        "c_lon",
        rings.neighbor_cell_col(F.col("cq"), F.col("cr"), COARSE_RES).alias("c_coarse"),
    )
    ring = rings.ring_pairs(
        spark,
        sites.withColumnRenamed("cq", "q").withColumnRenamed("cr", "r"),
        COARSE_RING_K,
        extra_cols=["lat", "lon"],
        res=COARSE_RES,
    )
    cand = ring.join(comps, ring.neighbor_h3 == comps.c_coarse, "inner")
    d = haversine_col(F.col("lat"), F.col("lon"), F.col("c_lat"), F.col("c_lon"))
    scored = cand.select(
        "site_id", "competitor_id", dround(d, 4).alias("dist_miles")
    )
    w = Window.partitionBy("site_id").orderBy(F.asc("dist_miles"), F.asc("competitor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("site_id", "competitor_id", "dist_miles", "rank")
    )


def knn_competitors_oracle_sql(k: int = 3) -> str:
    sites_enc = _coarse_encode_subquery(
        f"SELECT site_id, lat, lon FROM ({hex_sql.sites_sql()}) __s",
        keep=["site_id", "lat", "lon"],
    )
    comp_enc = _coarse_encode_subquery(
        f"SELECT competitor_id, lat AS c_lat, lon AS c_lon, lat, lon FROM ({hex_sql.competitors_sql()}) __c",
        keep=["competitor_id", "c_lat", "c_lon"],
    )
    ring = rings.ring_pairs_oracle_sql(
        f"SELECT site_id, lat, lon, cq AS q, cr AS r FROM ({sites_enc}) __se",
        COARSE_RING_K,
        extra_cols=["lat", "lon"],
        res=COARSE_RES,
    )
    hav = hex_sql.haversine_miles_sql("rg.lat", "rg.lon", "co.c_lat", "co.c_lon")
    return f"""
WITH comp AS (
  SELECT competitor_id, c_lat, c_lon, coarse_cell FROM ({comp_enc}) __ce
),
ring AS ({ring}),
scored AS (
  SELECT rg.site_id, co.competitor_id,
         (FLOOR(({hav}) * 10000.0 + 0.5) / 10000.0) AS dist_miles
  FROM ring rg JOIN comp co ON rg.neighbor_h3 = co.coarse_cell
)
SELECT site_id, competitor_id, dist_miles, rank FROM (
  SELECT site_id, competitor_id, dist_miles,
         ROW_NUMBER() OVER (PARTITION BY site_id
                            ORDER BY dist_miles ASC, competitor_id ASC) AS rank
  FROM scored
) __r WHERE rank <= {k}"""
