"""Schema validation + data-quality gates — the reference's operational
correctness layer as engine functions.

Reference semantics (all in /root/reference):
- required-column / non-empty / min-sample checks
  (`notebooks/00_validate_schema.py:14-75,88-153`)
- parameterized per-table gates: row counts, key-null counts, id
  uniqueness, hex-id validity regex, value ranges, null rates
  (`notebooks/00_quality_checks.py:43-167,177-263`)
- cross-table phase gate: FK integrity via left-anti join (warn-only),
  metro coverage, sales↔quality correlation ≥ 0.4 "anti-circular"
  (`notebooks/00_quality_checks.py:128-143,159-167,365-445`)

Each check returns a result dict; ``run_gate`` raises on hard failures
(mirroring the runner at `notebooks/00_quality_checks.py:272-352`).
Everything is computed in ONE aggregation pass per table where possible
(the reference issues one action per check; at 100 TB that's N scans —
here a single wide agg).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Reference gate: generated sales must correlate with trade-area quality
# at r >= 0.4 (`notebooks/00_quality_checks.py:128-143`).
MIN_ANTI_CIRCULAR_R = 0.4


@dataclass
class TableSpec:
    name: str
    required_cols: list[str]
    id_col: str | None = None
    min_rows: int = 1
    hex_cols: list[str] = field(default_factory=list)
    ranges: dict[str, tuple[float, float]] = field(default_factory=dict)
    max_null_rate: dict[str, float] = field(default_factory=dict)


GEO_SPECS = [
    TableSpec(
        "sites",
        required_cols=["site_id", "metro", "lat", "lon", "site_type", "h3_res8"],
        id_col="site_id",
        min_rows=10,
        hex_cols=["h3_res8"],
        ranges={"lat": (-90.0, 90.0), "lon": (-180.0, 180.0)},
        max_null_rate={"metro": 0.0, "lat": 0.0, "lon": 0.0},
    ),
    TableSpec(
        "competitors",
        required_cols=["competitor_id", "metro", "lat", "lon", "category", "h3_res8"],
        id_col="competitor_id",
        min_rows=5,
        hex_cols=["h3_res8"],
        ranges={"lat": (-90.0, 90.0), "lon": (-180.0, 180.0)},
    ),
    TableSpec(
        "hex_grid",
        required_cols=["cell_id", "population", "median_income", "centroid_lat"],
        id_col="cell_id",
        min_rows=10,
        ranges={"population": (0.0, 1e7), "target_demo_pct": (0.0, 1.0)},
    ),
    TableSpec(
        "poi",
        required_cols=["poi_id", "metro", "lat", "lon", "size_class", "h3_res8"],
        id_col="poi_id",
        min_rows=5,
        hex_cols=["h3_res8"],
    ),
]


def validate_schema(spark: SparkSession, spec: TableSpec) -> dict:
    """Required columns exist + table non-empty (00_validate_schema)."""
    df = spark.table(spec.name)
    missing = [c for c in spec.required_cols if c not in df.columns]
    n = df.count()
    return {
        "table": spec.name,
        "missing_columns": missing,
        "rows": n,
        "passes": not missing and n >= spec.min_rows,
    }


def quality_checks(spark: SparkSession, spec: TableSpec) -> dict:
    """All per-table gates in ONE aggregation pass."""
    df = spark.table(spec.name)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    if spec.id_col:
        aggs.append(F.countDistinct(spec.id_col).alias("__distinct_ids"))
        aggs.append(F.count(F.when(F.col(spec.id_col).isNull(), 1)).alias("__null_ids"))
    for c in spec.hex_cols:
        # reference regex gate adapted to our 15-hex-char canonical string
        # (notebooks/00_quality_checks.py:91-98); cells here are bigint ids,
        # so validity = round-trips through the canonical rendering
        aggs.append(
            F.count(
                F.when(
                    ~F.lower(F.lpad(F.hex(F.col(c)), 15, "0")).rlike("^[0-9a-f]{15}$"),
                    1,
                )
            ).alias(f"__bad_hex_{c}")
        )
    for c, (lo, hi) in spec.ranges.items():
        if c in df.columns:
            aggs.append(
                F.count(F.when(~F.col(c).between(lo, hi), 1)).alias(f"__oor_{c}")
            )
    for c in spec.max_null_rate:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
    row = df.agg(*aggs).first().asDict()

    failures = []
    if spec.id_col and row.get("__distinct_ids") != row["__rows"]:
        failures.append(f"duplicate {spec.id_col}")
    if spec.id_col and row.get("__null_ids", 0) > 0:
        failures.append(f"null {spec.id_col}")
    for c in spec.hex_cols:
        if row.get(f"__bad_hex_{c}", 0) > 0:
            failures.append(f"invalid hex ids in {c}")
    for c in spec.ranges:
        if row.get(f"__oor_{c}", 0) > 0:
            failures.append(f"{c} out of range")
    for c, rate in spec.max_null_rate.items():
        if row["__rows"] and row.get(f"__nulls_{c}", 0) / row["__rows"] > rate:
            failures.append(f"{c} null rate > {rate}")
    return {"table": spec.name, "metrics": row, "failures": failures, "passes": not failures}


def fk_integrity(spark: SparkSession) -> dict:
    """Left-anti FK orphan detection (warn-only, like the reference)."""
    feats_orphans = (
        spark.table("sites")
        .select("h3_res8")
        .join(
            spark.table("hex_grid").select(F.col("cell_id").alias("h3_res8")),
            "h3_res8",
            "left_anti",
        )
        .count()
    )
    return {"check": "sites.h3_res8 ⊆ hex_grid.cell_id", "orphans": feats_orphans, "warn_only": True}


def anti_circular_correlation(spark: SparkSession) -> dict:
    """Generated sales must correlate with trade-area quality (r ≥ 0.4) —
    the reference's anti-circular-reasoning gate
    (`notebooks/00_quality_checks.py:128-143`) via df.stat.corr (A14)."""
    from .features import location_features

    feats = location_features(spark)
    stores = spark.table("sites").filter(F.col("site_type") == "store").select(
        "site_id", "annual_sales"
    )
    j = feats.join(stores, "site_id")
    r = j.stat.corr("trade_area_quality", "annual_sales")
    return {
        "check": "corr(trade_area_quality, annual_sales)",
        "r": r,
        "passes": abs(r) >= MIN_ANTI_CIRCULAR_R,
    }


def run_gate(spark: SparkSession, raise_on_fail: bool = True) -> dict:
    """The phase gate: all tables validated + cross-table checks."""
    report = {
        "schema": [validate_schema(spark, s) for s in GEO_SPECS],
        "quality": [quality_checks(spark, s) for s in GEO_SPECS],
        "fk": fk_integrity(spark),
        "anti_circular": anti_circular_correlation(spark),
    }
    hard_failures = [r for r in report["schema"] + report["quality"] if not r["passes"]]
    report["passes"] = not hard_failures
    if raise_on_fail and hard_failures:
        raise AssertionError(f"quality gate failed: {hard_failures}")
    return report
