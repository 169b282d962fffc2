"""The interactive query surface — the reference's 18 FastAPI endpoints
(`/root/reference/app/main.py`) re-expressed as engine functions.

The HTTP layer is out of scope (SURVEY §7.4); what matters is the QUERY
semantics each endpoint issues to the warehouse, plus the Python
post-processing some endpoints do in the app process — both become
DataFrame programs here:

- ``scored_locations``      : dynamic WHERE builder (P13) + ORDER BY/LIMIT
                              (`app/main.py:146-167`)
- ``location_detail``       : point-lookup join (J11, `app/main.py:179-192`)
- ``competition_heatmap``   : bbox prefilter (P8) + per-hex counts (A5)
                              (`app/main.py:375-406,446-463`)
- ``similar_locations``     : cosine kNN over standardized feature vectors
                              — the app-process Python loop at
                              `app/main.py:603-647` made distributed (G6)
- ``daypart_trade_area``    : site hex ∪ exploded k-ring → semi join →
                              trade-area means (J18/U2, `app/main.py:756-774`)
- ``flag_site``/``flagged`` : write-back sink; UPDATE semantics without a
                              transactional store = append + latest-wins
                              window view (S8, `app/main.py:804-868`)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exprs import dround
from . import rings
from .scoring import score_candidates


def scored_locations(
    spark: SparkSession,
    metro: str | None = None,
    tier: str | None = None,
    limit: int = 500,
) -> DataFrame:
    """Dynamic filter assembly — only requested predicates enter the plan,
    so partition pruning / pushdown see literal filters (P13)."""
    df = score_candidates(spark)
    if metro is not None:
        df = df.filter(F.col("metro") == metro)
    if tier is not None:
        df = df.filter(F.col("tier") == tier)
    return df.orderBy(F.desc("predicted_annual_sales"), F.asc("site_id")).limit(limit)


def location_detail(spark: SparkSession, site_id: int) -> DataFrame:
    """Point lookup: features ⋈ scored with the site filter PUSHED under
    both join inputs (J11)."""
    from .features import location_features

    feats = location_features(spark).filter(F.col("site_id") == site_id)
    scored = score_candidates(spark).select("site_id", "predicted_annual_sales", "percentile", "tier")
    return feats.join(scored, "site_id", "left")


def competition_heatmap(
    spark: SparkSession,
    lat_lo: float,
    lat_hi: float,
    lon_lo: float,
    lon_hi: float,
    limit: int = 2000,
) -> DataFrame:
    """Per-hex competitor density inside a bounding box: sargable BETWEEN
    prefilter (P8) then hash agg on the cell (A5)."""
    comp = spark.table("competitors").filter(
        F.col("lat").between(lat_lo, lat_hi) & F.col("lon").between(lon_lo, lon_hi)
    )
    return (
        comp.groupBy("h3_res8")
        .agg(
            F.count(F.lit(1)).alias("n_competitors"),
            F.countDistinct("category").alias("n_categories"),
        )
        .orderBy(F.desc("n_competitors"), F.asc("h3_res8"))
        .limit(limit)
    )


FEATURE_VEC_COLS = [
    "population_1ring",
    "median_income_1ring",
    "competitive_intensity",
    "anchor_poi_1ring",
    "max_pedestrian_traffic",
]


def similar_locations(spark: SparkSession, site_id: int, k: int = 15) -> DataFrame:
    """Top-k feature-space cosine neighbors of a site.

    The reference collects every feature row into the app process and
    loops in Python (`app/main.py:603-647`); here: global standardization
    stats (one agg), z-scored vectors, the probe row broadcast, cosine as
    a native expression, top-k via TakeOrderedAndProject."""
    from .features import location_features

    feats = location_features(spark).select("site_id", "metro", *FEATURE_VEC_COLS)
    stats = feats.agg(
        *[F.avg(c).alias(f"mu_{c}") for c in FEATURE_VEC_COLS],
        *[F.stddev(c).alias(f"sd_{c}") for c in FEATURE_VEC_COLS],
    )
    z = feats.crossJoin(F.broadcast(stats))
    for c in FEATURE_VEC_COLS:
        z = z.withColumn(
            f"z_{c}",
            (F.col(c) - F.col(f"mu_{c}")) / F.coalesce(
                F.nullif(F.col(f"sd_{c}"), F.lit(0.0)), F.lit(1.0)
            ),
        )
    zcols = [f"z_{c}" for c in FEATURE_VEC_COLS]
    probe = z.filter(F.col("site_id") == site_id).select(
        *[F.col(c).alias(f"p_{c}") for c in zcols]
    )
    paired = z.filter(F.col("site_id") != site_id).crossJoin(F.broadcast(probe))
    dot = sum(F.col(c) * F.col(f"p_{c}") for c in zcols)
    norm_a = F.sqrt(sum(F.col(c) * F.col(c) for c in zcols))
    norm_b = F.sqrt(sum(F.col(f"p_{c}") * F.col(f"p_{c}") for c in zcols))
    cos = dot / (norm_a * norm_b)
    return (
        paired.select("site_id", "metro", dround(cos, 6).alias("similarity"))
        .orderBy(F.desc("similarity"), F.asc("site_id"))
        .limit(k)
    )


def daypart_trade_area(spark: SparkSession, site_id: int) -> DataFrame:
    """Trade-area hex semantics of the daypart endpoint: the site's hex ∪
    its k-ring (U2 union of the exploded ring), left-semi joined against
    the grid, then means (J18 → semi join against an exploded ring frame)."""
    site = spark.table("sites").filter(F.col("site_id") == site_id)
    ring = rings.ring_pairs(spark, site, k=1).select(
        F.col("neighbor_h3").alias("cell_id")
    )
    own = site.select(F.col("h3_res8").alias("cell_id"))
    cells = own.union(ring).distinct()
    grid = spark.table("hex_grid")
    in_area = grid.join(cells, "cell_id", "left_semi")
    return in_area.agg(
        F.count(F.lit(1)).alias("n_cells"),
        dround(F.sum("population"), 4).alias("total_population"),
        dround(F.avg("pedestrian_traffic"), 4).alias("avg_pedestrian"),
        dround(F.avg("transit_score"), 4).alias("avg_transit"),
    )


# ---------------------------------------------------------------------------
# Oracle twins for the deterministic app-query surface
# ---------------------------------------------------------------------------

def scored_locations_oracle_sql(metro: str, limit: int) -> str:
    from .scoring import score_candidates_oracle_sql

    return f"""
SELECT * FROM ({score_candidates_oracle_sql()}) __sc
WHERE metro = '{metro}'
ORDER BY predicted_annual_sales DESC, site_id ASC
LIMIT {limit}"""


def competition_heatmap_oracle_sql(
    lat_lo: float, lat_hi: float, lon_lo: float, lon_hi: float, limit: int = 2000
) -> str:
    from ..functions import hex_sql

    return f"""
SELECT h3_res8,
       COUNT(*) AS n_competitors,
       COUNT(DISTINCT category) AS n_categories
FROM ({hex_sql.competitors_sql()}) __c
WHERE lat BETWEEN {lat_lo} AND {lat_hi} AND lon BETWEEN {lon_lo} AND {lon_hi}
GROUP BY h3_res8
ORDER BY n_competitors DESC, h3_res8 ASC
LIMIT {limit}"""


def similar_locations_oracle_sql(site_id: int, k: int = 15) -> str:
    from .features import location_features_oracle_sql

    cols = FEATURE_VEC_COLS
    mu_sd = ", ".join(
        f"AVG({c}) AS mu_{c}, STDDEV_SAMP({c}) AS sd_{c}" for c in cols
    )
    zc = ", ".join(
        f"(({c}) - mu_{c}) / COALESCE(NULLIF(sd_{c}, 0.0), 1.0) AS z_{c}" for c in cols
    )
    dot = " + ".join(f"(z.z_{c} * p.z_{c})" for c in cols)
    na = " + ".join(f"(z.z_{c} * z.z_{c})" for c in cols)
    nb = " + ".join(f"(p.z_{c} * p.z_{c})" for c in cols)
    return f"""
WITH feats AS (SELECT site_id, metro, {', '.join(cols)}
               FROM ({location_features_oracle_sql()}) __f),
stats AS (SELECT {mu_sd} FROM feats),
z AS (SELECT site_id, metro, {zc} FROM feats CROSS JOIN stats),
p AS (SELECT * FROM z WHERE site_id = {site_id}),
scored AS (
  SELECT z.site_id, z.metro,
         (FLOOR((({dot}) / (SQRT({na}) * SQRT({nb}))) * 1000000.0 + 0.5) / 1000000.0)
             AS similarity
  FROM z CROSS JOIN p
  WHERE z.site_id <> {site_id}
)
SELECT site_id, metro, similarity FROM scored
ORDER BY similarity DESC, site_id ASC
LIMIT {k}"""


def daypart_trade_area_oracle_sql(site_id: int) -> str:
    from ..functions import hex_sql
    from . import rings

    ring = rings.ring_pairs_oracle_sql(
        f"SELECT site_id, q, r FROM sites WHERE site_id = {site_id}", 1
    )
    return f"""
WITH sites AS ({hex_sql.sites_sql()}),
hex_grid AS ({hex_sql.grid_sql()}),
cells AS (
  SELECT DISTINCT neighbor_h3 AS cell_id FROM ({ring}) __r
  UNION
  SELECT h3_res8 AS cell_id FROM sites WHERE site_id = {site_id}
)
SELECT COUNT(*) AS n_cells,
       (FLOOR((SUM(population)) * 10000.0 + 0.5) / 10000.0) AS total_population,
       (FLOOR((AVG(pedestrian_traffic)) * 10000.0 + 0.5) / 10000.0) AS avg_pedestrian,
       (FLOOR((AVG(transit_score)) * 10000.0 + 0.5) / 10000.0) AS avg_transit
FROM hex_grid g
WHERE EXISTS (SELECT 1 FROM cells c WHERE c.cell_id = g.cell_id)"""


# ---------------------------------------------------------------------------
# Write-back sink: flagged sites (S8) — append + latest-wins view
# ---------------------------------------------------------------------------

def flag_site(
    spark: SparkSession,
    path: str,
    site_id: int,
    status: str,
    note: str = "",
    seq: int | None = None,
) -> None:
    """Append a flag event.  UPDATE semantics without a transactional
    table = event append; readers resolve latest-wins (below).  ``seq`` is
    the ordering key (monotonic writer sequence; reference uses
    current_timestamp at `app/main.py:822` — injectable here so tests are
    deterministic)."""
    row = [(int(site_id), status, note, int(seq if seq is not None else 0))]
    df = spark.createDataFrame(row, "site_id bigint, status string, note string, seq bigint")
    df.write.mode("append").parquet(path)


def flagged_sites(spark: SparkSession, path: str) -> DataFrame:
    """Latest-wins resolution of the flag event log (U4: row_number over
    (site, seq desc) == 1 — the MERGE-less UPDATE)."""
    log = spark.read.parquet(path)
    w = Window.partitionBy("site_id").orderBy(F.desc("seq"))
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def flagged_with_scores(spark: SparkSession, path: str) -> DataFrame:
    """Presentation join (J12): flagged ⋉ scored, left."""
    return flagged_sites(spark, path).join(
        score_candidates(spark).select("site_id", "predicted_annual_sales", "tier"),
        "site_id",
        "left",
    )
