"""Pipeline DAG tests: checkpoint/resume semantics + lineage/metrics
manifests; Arrow kernel parity with the SQL codec path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from geospatial_store_siting_spark.functions import kernels
from geospatial_store_siting_spark.plans import pipeline
from tests.conftest import SF_DIR


def test_pipeline_runs_and_resumes(geo, tmp_path_factory):
    import geospatial_store_siting_spark.plans.pipeline as pl

    old_root = pl.STAGE_ROOT
    pl.STAGE_ROOT = str(tmp_path_factory.mktemp("stages"))
    try:
        report1 = pl.run_pipeline(geo, SF_DIR)
        assert [s["stage"] for s in report1["stages"]] == [
            "dev_signals_by_h3",
            "doc_tiles",
            "training_corpus",
            "location_features",
            "hotspot_scores",
            "huff_features",
            "scored_locations",
        ]
        assert all(not s["resumed"] for s in report1["stages"])
        for s in report1["stages"]:
            assert s["rows"] > 0
            assert s["rows_per_sec"] is None or s["rows_per_sec"] > 0
            assert sum(s["partition_rows"]) == s["rows"]  # per-partition lineage
            assert s["lineage"]["inputs"]
        # second run: every stage resumes from its committed snapshot
        report2 = pl.run_pipeline(geo, SF_DIR)
        assert all(s["resumed"] for s in report2["stages"])
        assert [s["rows"] for s in report2["stages"]] == [
            s["rows"] for s in report1["stages"]
        ]
    finally:
        pl.STAGE_ROOT = old_root


def test_arrow_kernel_matches_sql_codec(geo):
    """G1 kernel (Arrow pandas UDF) is bit-identical to the SQL-expression
    codec that the oracle checks."""
    sites = geo.table("sites").select("site_id", "lat", "lon", "h3_res8")
    enc = kernels.make_encode_udf(8)
    out = sites.withColumn("kernel_cell", enc(F.col("lat"), F.col("lon")))
    bad = out.filter(F.col("kernel_cell") != F.col("h3_res8")).count()
    assert bad == 0
    # string rendering round-trip + validity
    s = out.withColumn("hex_str", kernels.make_cell_to_string_udf()(F.col("kernel_cell")))
    assert s.filter(~F.col("hex_str").rlike("^[0-9a-f]{15}$")).count() == 0


def test_kring_kernel_sizes(geo):
    sites = geo.table("sites").limit(50)
    ringed = sites.withColumn("ring", kernels.make_kring_udf(1)(F.col("h3_res8")))
    sizes = ringed.select(F.size("ring").alias("n")).distinct().collect()
    assert [r["n"] for r in sizes] == [7]


def test_corpus_tiles_reuse_committed_stage(geo, tmp_path_factory):
    """After a pipeline run commits doc_tiles, the tile-sharded corpus
    writer joins the committed parquet (read-from-gold) instead of
    re-deriving the geotagged-span extraction — and the written corpus is
    identical either way."""
    import geospatial_store_siting_spark.plans.pipeline as pl
    from geospatial_store_siting_spark.sources import documents, tables

    old_root = pl.STAGE_ROOT
    pl.STAGE_ROOT = str(tmp_path_factory.mktemp("stages"))
    tables.load_all(geo, SF_DIR)  # unpublish stage views from earlier tests
    try:
        fresh = documents.corpus_tile_assignments(geo)
        assert "min_by" in fresh._jdf.queryExecution().optimizedPlan().toString()
        before = {r["doc_id"]: r["tile"] for r in fresh.select("doc_id", "tile").collect()}

        pl.run_pipeline(geo, SF_DIR)
        assert tables.stage_view(geo, "doc_tiles") is not None
        gold = documents.corpus_tile_assignments(geo)
        plan = gold._jdf.queryExecution().optimizedPlan().toString()
        assert "min_by" not in plan  # assignment read from the stage, not re-derived
        after = {r["doc_id"]: r["tile"] for r in gold.select("doc_id", "tile").collect()}
        assert after == before
    finally:
        pl.STAGE_ROOT = old_root
        tables.load_all(geo, SF_DIR)  # unpublish stage views for later tests
