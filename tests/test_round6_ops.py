"""Round-6 optimization internals: warm-path stage resolution without
plan construction, and the layout stats guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geospatial_store_siting_spark.operators import dedup
from geospatial_store_siting_spark.sources import iceberg


class TestStageWarmFastLane:
    """_stage_or_checkpoint with a callable plan: the warm path must
    resolve the committed content-keyed stage WITHOUT invoking the
    plan-producing callable (the r6 fix for dedup_incremental's 2.2 s of
    driver-serial plan construction per call)."""

    def test_committed_stage_skips_plan_construction(self, spark, tmp_path):
        sf_dir = str(tmp_path / "sf")
        df = spark.range(5).select(F.col("id").alias("doc_id"))
        cold = dedup._stage_or_checkpoint(
            spark, lambda: df, "r6_fastlane", "r6-fastlane-sql|v1", sf_dir
        )
        assert cold.count() == 5

        def boom():
            raise AssertionError("plan constructed on the warm path")

        warm = dedup._stage_or_checkpoint(
            spark, boom, "r6_fastlane", "r6-fastlane-sql|v1", sf_dir
        )
        assert warm.count() == 5
        assert [r.doc_id for r in warm.orderBy("doc_id").collect()] == list(range(5))

    def test_force_recomputes_through_the_callable(self, spark, tmp_path):
        sf_dir = str(tmp_path / "sf")
        dedup._stage_or_checkpoint(
            spark, lambda: spark.range(3).select(F.col("id").alias("doc_id")),
            "r6_force", "r6-force-sql|v1", sf_dir,
        )
        calls = []

        def rebuild():
            calls.append(1)
            return spark.range(4).select(F.col("id").alias("doc_id"))

        forced = dedup._stage_or_checkpoint(
            spark, rebuild, "r6_force", "r6-force-sql|v1", sf_dir, force=True
        )
        assert calls and forced.count() == 4

    def test_key_mismatch_falls_through_to_write(self, spark, tmp_path):
        sf_dir = str(tmp_path / "sf")
        assert (
            iceberg.read_stage_committed(spark, "r6_absent", sf_dir, "no-such-key")
            is None
        )

    def test_bucketed_fast_lane_matches_writer(self, spark, tmp_path):
        sf_dir = str(tmp_path / "sf")
        df = spark.range(20).select(
            F.col("id").alias("fp"), (F.col("id") % 3).alias("exact_match")
        )
        written = iceberg.write_stage_bucketed(
            spark, df, "r6_bidx", sf_dir, bucket_col="fp", n_buckets=4,
            sort_cols=["fp"], content_key="r6-bidx|v1",
        )
        fast = iceberg.read_stage_bucketed_committed(
            spark, "r6_bidx", sf_dir, "r6-bidx|v1", bucket_col="fp", n_buckets=4
        )
        assert fast is not None
        assert fast.count() == written.count() == 20
        # the fast-lane reader keeps the bucketed (exchange-free) scan side
        plan = (
            fast.groupBy("fp").count()._jdf.queryExecution()  # noqa: SLF001
            .executedPlan().toString()
        )
        assert "Bucketed: true" in plan


class TestRowGroupStatsGuard:
    def test_missing_stats_count_as_touched(self, spark, tmp_path):
        from geospatial_store_siting_spark.sources import layout

        path = str(tmp_path / "nostats")
        (
            spark.range(100)
            .select((F.col("id") % 10).alias("q"), (F.col("id") % 7).alias("r"))
            .write.option("parquet.column.statistics.enabled", "false")
            .mode("overwrite").parquet(path)
        )
        import glob

        import pyarrow.parquet as pq

        f = sorted(glob.glob(f"{path}/*.parquet"))[0]
        meta = pq.ParquetFile(f).metadata
        if meta.row_group(0).column(0).statistics is not None:
            pytest.skip("parquet writer ignored the statistics-disable option")
        touched, total = layout.row_groups_touched(path, (0, 1), (0, 1))
        assert total >= 1
        # stats disabled -> nothing prunable, never an AttributeError
        assert touched == total
