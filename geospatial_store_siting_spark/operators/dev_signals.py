"""Development-signal H3 layer — the reference's Phase-3 module.

Re-expresses ``/root/reference/notebooks/06_build_dev_signal_layer.py``
(L107-195 zip→H3 crosswalk + Zillow joins, L120-260 county crosswalk with
dominant-county dedup + BPS join with national-average fallback + proxy
signals, L268-303 H3 aggregation + market-heat CASE) and the feature ring
means of ``notebooks/10_feature_engineering.py:703-741``.

Offline synthetic sources (the reference downloads Census gazetteer /
relationship files; here every table is closed-form from ``part`` so both
engines derive identical inputs):

- ``zips``                     — zip gazetteer: centroid lat/lon (+ H3 cell),
                                 population, renter share
- ``zillow_home_values``       — zip-level ZHVI + growth (≈90% coverage)
- ``zillow_rental_index``      — zip-level ZORI + growth (≈80% coverage)
- ``zcta_county_rel``          — zip ↔ candidate counties with area overlap
                                 (2 rows per zip → dominant-county dedup, U4)
- ``building_permits_county``  — county-level permits (1/3 of counties
                                 missing → exercises the national-average
                                 fallback coalesce)

Scale design: the crosswalk dedup is a per-zip window (row_number over a
deterministic order — the reference's pandas sort+drop_duplicates is
tie-unstable); county/BPS dims are broadcast; the H3 rollup is one hash
agg on the cell key; the national-average fallback is a broadcast 1-row
cross join instead of a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hex_sql
from ..functions.exprs import dround
from . import rings

DEV_SIGNAL_COLS = [
    "home_value_index",
    "home_value_growth_1yr",
    "home_value_growth_3yr",
    "rent_index",
    "rent_growth_1yr",
    "permits_new_units_avg",
    "permits_yoy_pct",
    "multifamily_units_pipeline",
    "commercial_starts_index",
    "infra_investment_score",
]


# ---------------------------------------------------------------------------
# Synthetic source tables (dialect-neutral SQL; both engines run this text)
# ---------------------------------------------------------------------------

def zips_sql(part: str = "part") -> str:
    """Zip gazetteer: one ZCTA per part key, centroid near its metro,
    population + renter share for the proxy signals."""
    key = "(p_partkey * 23 + 11)"
    lat, lon = hex_sql.latlon_sql(key)
    inner = f"""
SELECT LPAD(CAST(p_partkey AS STRING), 5, '0') AS zip_code,
       {lat} AS lat,
       {lon} AS lon,
       (1000.0 + CAST(({key}) % 8000 AS DOUBLE)) AS population,
       (0.2 + CAST(({key}) % 50 AS DOUBLE) / 100.0) AS pct_renter
FROM {part}"""
    return hex_sql.encode_select_sql(
        inner,
        lat="lat",
        lon="lon",
        res=8,
        keep_cols=["zip_code", "lat", "lon", "population", "pct_renter"],
        cell_alias="h3_res8",
    )


def zillow_home_values_sql(part: str = "part") -> str:
    key = "(p_partkey * 41 + 3)"
    return f"""
SELECT LPAD(CAST(p_partkey AS STRING), 5, '0') AS zip_code,
       (150000.0 + CAST((p_partkey * 13) % 450000 AS DOUBLE)) AS home_value_index,
       (CAST(({key}) % 130 AS DOUBLE) - 30.0) / 1000.0 AS home_value_growth_1yr,
       (CAST(({key}) % 300 AS DOUBLE) - 50.0) / 1000.0 AS home_value_growth_3yr
FROM {part}
WHERE p_partkey % 10 <> 0"""


def zillow_rental_index_sql(part: str = "part") -> str:
    key = "(p_partkey * 59 + 17)"
    return f"""
SELECT LPAD(CAST(p_partkey AS STRING), 5, '0') AS zip_code,
       (800.0 + CAST((p_partkey * 7) % 2400 AS DOUBLE)) AS rent_index,
       (CAST(({key}) % 110 AS DOUBLE) - 20.0) / 1000.0 AS rent_growth_1yr
FROM {part}
WHERE p_partkey % 5 <> 0"""


def zcta_county_rel_sql(part: str = "part") -> str:
    """Zip↔county relationship rows: every zip overlaps TWO candidate
    counties with complementary land-area shares (the reference file has
    one row per overlap; dominant-county selection is the dedup)."""
    a = "(0.3 + CAST((p_partkey * 71 + 29) % 60 AS DOUBLE) / 100.0)"
    return f"""
SELECT LPAD(CAST(p_partkey AS STRING), 5, '0') AS zip_code,
       LPAD(CAST(1 + (p_partkey * 31) % 120 AS STRING), 5, '0') AS county_fips,
       {a} AS area_pct
FROM {part}
UNION ALL
SELECT LPAD(CAST(p_partkey AS STRING), 5, '0') AS zip_code,
       LPAD(CAST(1 + (p_partkey * 47 + 13) % 120 AS STRING), 5, '0') AS county_fips,
       1.0 - {a} AS area_pct
FROM {part}"""


def building_permits_county_sql(part: str = "part") -> str:
    """County-level BPS permits; counties ≡ 0 (mod 3) are missing so the
    national-average fallback path is exercised."""
    rel = zcta_county_rel_sql(part)
    return f"""
SELECT county_fips,
       (50.0 + CAST((CAST(county_fips AS BIGINT) * 17) % 400 AS DOUBLE)) AS permits_new_units_avg,
       (CAST(CAST(county_fips AS BIGINT) % 90 AS DOUBLE) - 20.0) / 1000.0 AS permits_yoy_pct
FROM (SELECT DISTINCT county_fips FROM ({rel}) __rel) __c
WHERE CAST(county_fips AS BIGINT) % 3 <> 0"""


DEV_VIEWS = {
    "zips": zips_sql,
    "zillow_home_values": zillow_home_values_sql,
    "zillow_rental_index": zillow_rental_index_sql,
    "zcta_county_rel": zcta_county_rel_sql,
    "building_permits_county": building_permits_county_sql,
}


def _dev_with_clause() -> str:
    parts = ",\n".join(f"{n} AS ({fn()})" for n, fn in DEV_VIEWS.items())
    return parts


# ---------------------------------------------------------------------------
# Dominant-county crosswalk (U4 dedup-by-key, deterministic)
# ---------------------------------------------------------------------------

def dominant_county(spark: SparkSession) -> DataFrame:
    """One county per zip: max land-area overlap, county_fips tiebreak
    (the reference's pandas sort+drop_duplicates, `06_...py:158-163`,
    made tie-deterministic)."""
    rel = spark.table("zcta_county_rel")
    w = Window.partitionBy("zip_code").orderBy(F.desc("area_pct"), F.asc("county_fips"))
    return (
        rel.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("zip_code", "county_fips", dround(F.col("area_pct"), 6).alias("area_pct"))
    )


def dominant_county_oracle_sql() -> str:
    return f"""
WITH {_dev_with_clause()}
SELECT zip_code, county_fips,
       (FLOOR(area_pct * 1000000.0 + 0.5) / 1000000.0) AS area_pct
FROM (
  SELECT zip_code, county_fips, area_pct,
         ROW_NUMBER() OVER (PARTITION BY zip_code
                            ORDER BY area_pct DESC, county_fips ASC) AS __rn
  FROM zcta_county_rel
) __r
WHERE __rn = 1"""


# ---------------------------------------------------------------------------
# The H3 signal layer
# ---------------------------------------------------------------------------

def _zip_signals(spark: SparkSession) -> DataFrame:
    """Zip-level signals: ZHVI inner ⋈, ZORI left ⋈, county→BPS left ⋈
    with national-average coalesce fallback, plus the three proxy signals
    (`06_build_dev_signal_layer.py:186-260`)."""
    zips = spark.table("zips")
    zhvi = spark.table("zillow_home_values")
    zori = spark.table("zillow_rental_index")
    bps = spark.table("building_permits_county")
    nat = bps.agg(
        F.floor(F.avg("permits_new_units_avg")).cast("double").alias("nat_permits"),
        F.avg("permits_yoy_pct").alias("nat_yoy"),
    )
    j = (
        zips.join(zhvi, "zip_code", "inner")
        .join(zori, "zip_code", "left")
        .join(F.broadcast(dominant_county(spark).select("zip_code", "county_fips")),
              "zip_code", "left")
        .join(F.broadcast(bps), "county_fips", "left")
        .crossJoin(F.broadcast(nat))
    )
    return (
        j.withColumn(
            "permits_new_units_avg",
            F.coalesce(F.col("permits_new_units_avg"), F.col("nat_permits")),
        )
        .withColumn("permits_yoy_pct", F.coalesce(F.col("permits_yoy_pct"), F.col("nat_yoy")))
        .withColumn(
            "multifamily_units_pipeline",
            F.greatest(
                F.lit(0.0),
                F.floor(
                    F.col("pct_renter") * 200.0
                    + (1.0 - F.greatest(F.lit(0.1), 1.0 - F.col("population") / 5000.0)) * 60.0
                ).cast("double"),
            ),
        )
        .withColumn(
            "commercial_starts_index",
            F.least(
                F.lit(100.0),
                F.greatest(
                    F.lit(0.0),
                    F.col("home_value_growth_1yr") * 400.0
                    + F.col("rent_growth_1yr") * 200.0
                    + 25.0,
                ),
            ),
        )
        .withColumn(
            "infra_investment_score",
            F.least(
                F.lit(100.0),
                F.greatest(
                    F.lit(0.0),
                    F.col("home_value_index") / 600000.0 * 40.0
                    + F.col("rent_index") / 3000.0 * 20.0
                    + 15.0,
                ),
            ),
        )
    )


def _zip_signals_oracle_core() -> str:
    return f"""
dom AS (
  SELECT zip_code, county_fips FROM (
    SELECT zip_code, county_fips,
           ROW_NUMBER() OVER (PARTITION BY zip_code
                              ORDER BY area_pct DESC, county_fips ASC) AS __rn
    FROM zcta_county_rel
  ) __r WHERE __rn = 1
),
nat AS (
  SELECT CAST(FLOOR(AVG(permits_new_units_avg)) AS DOUBLE) AS nat_permits,
         AVG(permits_yoy_pct) AS nat_yoy
  FROM building_permits_county
),
zip_signals AS (
  SELECT z.zip_code, z.h3_res8, z.population, z.pct_renter,
         h.home_value_index, h.home_value_growth_1yr, h.home_value_growth_3yr,
         r.rent_index, r.rent_growth_1yr,
         COALESCE(b.permits_new_units_avg, n.nat_permits) AS permits_new_units_avg,
         COALESCE(b.permits_yoy_pct, n.nat_yoy) AS permits_yoy_pct,
         GREATEST(0.0, CAST(FLOOR(z.pct_renter * 200.0
             + (1.0 - GREATEST(0.1, 1.0 - z.population / 5000.0)) * 60.0) AS DOUBLE))
             AS multifamily_units_pipeline,
         LEAST(100.0, GREATEST(0.0,
             h.home_value_growth_1yr * 400.0 + r.rent_growth_1yr * 200.0 + 25.0))
             AS commercial_starts_index,
         LEAST(100.0, GREATEST(0.0,
             h.home_value_index / 600000.0 * 40.0 + r.rent_index / 3000.0 * 20.0 + 15.0))
             AS infra_investment_score
  FROM zips z
  JOIN zillow_home_values h ON z.zip_code = h.zip_code
  LEFT JOIN zillow_rental_index r ON z.zip_code = r.zip_code
  LEFT JOIN dom d ON z.zip_code = d.zip_code
  LEFT JOIN building_permits_county b ON d.county_fips = b.county_fips
  CROSS JOIN nat n
)"""


def dev_signals_by_h3(spark: SparkSession) -> DataFrame:
    """bronze.dev_signals_by_h3: zip signals averaged per H3 cell, plus
    the 4-way market-heat CASE (`06_build_dev_signal_layer.py:268-303`)."""
    sig = _zip_signals(spark)
    agg = sig.groupBy("h3_res8").agg(
        dround(F.avg("home_value_index"), 4).alias("home_value_index"),
        dround(F.avg("home_value_growth_1yr"), 6).alias("home_value_growth_1yr"),
        dround(F.avg("home_value_growth_3yr"), 6).alias("home_value_growth_3yr"),
        dround(F.avg("rent_index"), 4).alias("rent_index"),
        dround(F.avg("rent_growth_1yr"), 6).alias("rent_growth_1yr"),
        dround(F.avg("permits_new_units_avg"), 4).alias("permits_new_units_avg"),
        dround(F.avg("permits_yoy_pct"), 6).alias("permits_yoy_pct"),
        F.floor(F.avg("multifamily_units_pipeline")).cast("long").alias(
            "multifamily_units_pipeline"
        ),
        dround(F.avg("commercial_starts_index"), 4).alias("commercial_starts_index"),
        dround(F.avg("infra_investment_score"), 4).alias("infra_investment_score"),
        F.count("zip_code").alias("zip_count"),
    )
    heat = (
        F.when(
            (F.col("home_value_growth_1yr") >= 0.06) & (F.col("permits_yoy_pct") >= 0.05),
            "Hot",
        )
        .when(
            (F.col("home_value_growth_1yr") >= 0.04) | (F.col("permits_yoy_pct") >= 0.02),
            "Warm",
        )
        .when(F.col("home_value_growth_1yr") >= 0.01, "Neutral")
        .otherwise("Cooling")
    )
    return agg.withColumn("market_heat", heat)


def dev_signals_by_h3_oracle_sql() -> str:
    return f"""
WITH {_dev_with_clause()},
{_zip_signals_oracle_core()},
agg AS (
  SELECT h3_res8,
         (FLOOR(AVG(home_value_index) * 10000.0 + 0.5) / 10000.0) AS home_value_index,
         (FLOOR(AVG(home_value_growth_1yr) * 1000000.0 + 0.5) / 1000000.0) AS home_value_growth_1yr,
         (FLOOR(AVG(home_value_growth_3yr) * 1000000.0 + 0.5) / 1000000.0) AS home_value_growth_3yr,
         (FLOOR(AVG(rent_index) * 10000.0 + 0.5) / 10000.0) AS rent_index,
         (FLOOR(AVG(rent_growth_1yr) * 1000000.0 + 0.5) / 1000000.0) AS rent_growth_1yr,
         (FLOOR(AVG(permits_new_units_avg) * 10000.0 + 0.5) / 10000.0) AS permits_new_units_avg,
         (FLOOR(AVG(permits_yoy_pct) * 1000000.0 + 0.5) / 1000000.0) AS permits_yoy_pct,
         CAST(FLOOR(AVG(multifamily_units_pipeline)) AS BIGINT) AS multifamily_units_pipeline,
         (FLOOR(AVG(commercial_starts_index) * 10000.0 + 0.5) / 10000.0) AS commercial_starts_index,
         (FLOOR(AVG(infra_investment_score) * 10000.0 + 0.5) / 10000.0) AS infra_investment_score,
         COUNT(zip_code) AS zip_count
  FROM zip_signals
  GROUP BY h3_res8
)
SELECT *,
       CASE WHEN home_value_growth_1yr >= 0.06 AND permits_yoy_pct >= 0.05 THEN 'Hot'
            WHEN home_value_growth_1yr >= 0.04 OR permits_yoy_pct >= 0.02 THEN 'Warm'
            WHEN home_value_growth_1yr >= 0.01 THEN 'Neutral'
            ELSE 'Cooling' END AS market_heat
FROM agg"""


# ---------------------------------------------------------------------------
# Feature family: 1-ring dev-signal means per site (DEV_SIGNAL_FEATURES)
# ---------------------------------------------------------------------------

def dev_signal_ring(spark: SparkSession, k: int = 1) -> DataFrame:
    """The 8 DEV_SIGNAL_FEATURES of `_config.py:133-141` as k-ring means
    (`10_feature_engineering.py:703-741`).

    The zip→county→H3 crosswalk chain behind dev_signals_by_h3 is a
    pipeline stage; when a committed stage table exists this reads it
    (one parquet scan) instead of rebuilding the whole chain per query —
    the interactive-surface scale contract."""
    from ..sources.tables import stage_view

    sites = spark.table("sites")
    staged = stage_view(spark, "dev_signals_by_h3")
    dev = staged if staged is not None else dev_signals_by_h3(spark)
    pairs = rings.ring_pairs(spark, sites, k)
    joined = pairs.join(dev, pairs.neighbor_h3 == dev.h3_res8, "left")
    return joined.groupBy("site_id").agg(
        dround(F.avg("home_value_index"), 4).alias(f"avg_home_value_{k}ring"),
        dround(F.avg("home_value_growth_1yr"), 6).alias(
            f"avg_home_value_growth_1yr_{k}ring"
        ),
        dround(F.avg("rent_index"), 4).alias(f"avg_rent_index_{k}ring"),
        dround(F.avg("rent_growth_1yr"), 6).alias(f"avg_rent_growth_1yr_{k}ring"),
        dround(F.avg("permits_yoy_pct"), 6).alias(f"avg_permit_momentum_{k}ring"),
        dround(F.avg("multifamily_units_pipeline"), 4).alias(
            f"avg_multifamily_pipeline_{k}ring"
        ),
        dround(F.avg("commercial_starts_index"), 4).alias(
            f"avg_commercial_starts_{k}ring"
        ),
        dround(F.avg("infra_investment_score"), 4).alias(
            f"avg_infra_investment_{k}ring"
        ),
    )


def dev_signal_ring_oracle_sql(k: int = 1) -> str:
    sites = hex_sql.sites_sql()
    dev = dev_signals_by_h3_oracle_sql()
    ring = rings.ring_pairs_oracle_sql("SELECT site_id, q, r FROM sites", k)
    return f"""
WITH sites AS ({sites}),
dev AS ({dev}),
ring AS ({ring})
SELECT site_id,
       (FLOOR(AVG(home_value_index) * 10000.0 + 0.5) / 10000.0) AS avg_home_value_{k}ring,
       (FLOOR(AVG(home_value_growth_1yr) * 1000000.0 + 0.5) / 1000000.0) AS avg_home_value_growth_1yr_{k}ring,
       (FLOOR(AVG(rent_index) * 10000.0 + 0.5) / 10000.0) AS avg_rent_index_{k}ring,
       (FLOOR(AVG(rent_growth_1yr) * 1000000.0 + 0.5) / 1000000.0) AS avg_rent_growth_1yr_{k}ring,
       (FLOOR(AVG(permits_yoy_pct) * 1000000.0 + 0.5) / 1000000.0) AS avg_permit_momentum_{k}ring,
       (FLOOR(AVG(multifamily_units_pipeline) * 10000.0 + 0.5) / 10000.0) AS avg_multifamily_pipeline_{k}ring,
       (FLOOR(AVG(commercial_starts_index) * 10000.0 + 0.5) / 10000.0) AS avg_commercial_starts_{k}ring,
       (FLOOR(AVG(infra_investment_score) * 10000.0 + 0.5) / 10000.0) AS avg_infra_investment_{k}ring
FROM ring LEFT JOIN dev ON ring.neighbor_h3 = dev.h3_res8
GROUP BY site_id"""
