"""The stage DAG: bronze synthesis → feature engineering → huff → scoring,
with per-stage snapshot checkpoints, lineage, and rows/sec metrics.

Mirrors the reference's job DAG (`resources/phase2_ml_pipeline.yml:10-80`:
validate → features → train → score → summary) re-expressed as a
checkpointed Spark pipeline per the north rule:

- each stage commit routes through sources/iceberg.write_stage: a real
  Iceberg ``createOrReplace`` snapshot when a catalog resolves, else the
  atomic parquet+manifest protocol of sources/snapshots.py — a crashed
  run RESUMES: committed stages are skipped (their manifests exist),
  only the remainder re-executes;
- each stage's run report records lineage (input stage names + row
  counts) and throughput (rows/sec, wall seconds) plus PER-PARTITION row
  counts (spark_partition_id groupBy — the skew fingerprint);
- committed stages are published as session views
  (sources/tables.register_stage_view) so the interactive app surface and
  dev_signal_ring read the gold tables instead of recomputing them;
- the module is a spark-submit entry point:
    spark-submit --py-files gss.zip -m geospatial_store_siting_spark.plans.pipeline
  (or `python -m ... --sf-dir /root/testdata/sf0.01`).

Run `python -m geospatial_store_siting_spark.plans.pipeline --help`.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import snapshots, tables

STAGE_ROOT = os.environ.get("SPARK_GRAFT_STAGE_DIR", "/root/repo/.snapshots/stages")


def _partition_histogram(df: DataFrame) -> list[int]:
    rows = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    return [int(r["count"]) for r in sorted(rows, key=lambda r: r["__pid"])]


class Stage:
    def __init__(self, name: str, fn, inputs: list[str]):
        self.name = name
        self.fn = fn
        self.inputs = inputs


def _doc_tiles_stage(spark: SparkSession) -> DataFrame:
    from ..sources.documents import doc_tiles

    return doc_tiles(spark)


def _training_corpus_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import training_corpus

    return training_corpus(spark, sf_dir=sf_dir)


def _hotspot_stage(spark: SparkSession) -> DataFrame:
    from ..operators.hotspots import hotspot_gi

    return hotspot_gi(spark)


def run_pipeline(spark: SparkSession, sf_dir: str, force: bool = False) -> dict:
    """Execute the DAG with checkpoint/resume; returns the run report."""
    from ..operators import dev_signals, features, huff, scoring

    tables.load_all(spark, sf_dir)

    stages = [
        Stage(
            "dev_signals_by_h3",
            dev_signals.dev_signals_by_h3,
            ["zips", "zillow_home_values", "zillow_rental_index",
             "zcta_county_rel", "building_permits_county"],
        ),
        # tile assignment for the interleaved corpus: committed as gold so
        # the tile-sharded corpus write (sources/documents.write_corpus_tiles)
        # and tile-local readers reuse it instead of re-deriving the
        # geotagged-span extraction
        Stage("doc_tiles", _doc_tiles_stage, ["documents"]),
        # the cleaned-corpus gold table (quality gate → exact dedup →
        # near-dup component drop → PII scrub).  Its own expensive
        # intermediates (distinct shingles, packed minhash signatures,
        # per-round CC labels) are committed content-keyed stages inside
        # the operator (operators/dedup._stage_or_checkpoint), so a
        # resumed or repeated run re-reads them instead of recomputing —
        # the pipeline commits only the final doc-level result
        Stage(
            "training_corpus",
            lambda sp: _training_corpus_stage(sp, sf_dir),
            ["documents"],
        ),
        Stage("location_features", features.location_features, ["sites", "hex_grid", "competitors", "poi"]),
        # the spatial-statistics gold layer: Gi* tiers are a committed
        # table the app/heatmap surface reads, not an ad-hoc query — the
        # analyst's hotspot map is pipeline output like every feature
        Stage("hotspot_scores", _hotspot_stage, ["hex_grid"]),
        Stage("huff_features", huff.huff_features, ["sites", "hex_grid", "competitors"]),
        # consumes the COMMITTED feature snapshot (registered as a view by
        # the previous stage) — resuming after a crash re-reads parquet,
        # never recomputes upstream
        Stage(
            "scored_locations",
            lambda sp: scoring.score_candidates(sp, features_df=sp.table("location_features")),
            ["location_features"],
        ),
    ]

    from ..sources import iceberg

    use_iceberg = iceberg.iceberg_available(spark)
    report: dict = {"sf_dir": sf_dir, "stages": []}
    for st in stages:
        path = report_path = None
        if not use_iceberg:
            # content key = stage name: fixed path per (sf, stage), the
            # resume contract (a crashed run picks up committed stages;
            # --force recomputes)
            path = iceberg.stage_path(None, st.name, sf_dir, content_key=st.name, root=STAGE_ROOT)
            report_path = os.path.join(path, "_stage_report.json")
            if os.path.exists(report_path) and not force:
                with open(report_path) as f:
                    meta = json.load(f)
                meta["resumed"] = True
                tables.register_stage_view(spark, st.name, spark.read.parquet(path), sf_dir)
                report["stages"].append(meta)
                continue
            if os.path.exists(path) and force:
                import shutil

                shutil.rmtree(path)

        t0 = time.perf_counter()
        committed = iceberg.write_stage(
            spark, st.fn(spark), st.name, sf_dir,
            content_key=st.name, root=STAGE_ROOT, force=force,
        )
        wall = time.perf_counter() - t0

        parts = _partition_histogram(committed)
        rows = sum(parts)
        meta = {
            "stage": st.name,
            "lineage": {"inputs": st.inputs, "sf_dir": sf_dir},
            "rows": rows,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "partitions": len(parts),
            "partition_rows": parts,
            "partition_skew": round(max(parts) / (sum(parts) / len(parts)), 3)
            if parts and sum(parts)
            else None,
            "resumed": False,
        }
        if report_path is not None:
            # run report (lineage/throughput/skew) rides NEXT TO the commit
            # manifest; "_"-prefixed so Spark's FileIndex ignores it
            with open(report_path + ".tmp", "w") as f:
                json.dump(meta, f)
            os.rename(report_path + ".tmp", report_path)
        tables.register_stage_view(spark, st.name, committed, sf_dir)
        report["stages"].append(meta)

    return report


def main() -> None:
    ap = argparse.ArgumentParser(description="run the siting feature pipeline")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--force", action="store_true", help="recompute committed stages")
    ap.add_argument(
        "--prune",
        action="store_true",
        help="after the run, GC stale content-keyed snapshot dirs "
        "(keep the latest committed snapshot per stage)",
    )
    args = ap.parse_args()

    from ..session import get_spark

    spark = get_spark(app_name="gss-pipeline", cores=args.cores)
    report = run_pipeline(spark, args.sf_dir, force=args.force)
    if args.prune:
        from ..sources import snapshots

        gc = snapshots.prune()
        gc_stages = snapshots.prune(root=STAGE_ROOT)
        report["pruned"] = {
            "removed": len(gc["removed"]) + len(gc_stages["removed"]),
            "kept": len(gc["kept"]) + len(gc_stages["kept"]),
        }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
