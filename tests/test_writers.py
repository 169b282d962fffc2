"""Write-side operator tests: partition pruning, CSV round-trip, NaN guard."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from geospatial_store_siting_spark.sources import writers


def test_partitioned_write_prunes(geo):
    path = tempfile.mkdtemp(prefix="part_") + "/sites"
    sites = geo.table("sites").select("site_id", "metro", "lat", "lon")
    writers.write_partitioned(sites, path, ["metro"])
    pruned = writers.read_partition_pruned(geo, path, "Chicago")
    assert pruned.count() == sites.filter(F.col("metro") == "Chicago").count()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # pruning reached the scan: the metro equality is the partition filter
    # (r6 turned off constraint propagation, which used to add a redundant
    # isnotnull(metro) alongside it)
    import re

    assert re.search(r"PartitionFilters: \[[^\]]*\(metro#\d+ = ", plan)


def test_csv_roundtrip_schema_stable(geo):
    path = tempfile.mkdtemp(prefix="csv_") + "/out"
    df = geo.table("customer").select("c_custkey", "c_name", "c_acctbal")
    back = writers.csv_roundtrip(geo, df, path)
    assert back.schema == df.schema
    assert back.count() == df.count()
    assert back.agg(F.sum("c_custkey")).first()[0] == df.agg(F.sum("c_custkey")).first()[0]


def test_clean_numeric_handles_nan_and_null(geo):
    df = geo.createDataFrame(
        [(1, float("nan")), (2, None), (3, 5.0)], "id int, v double"
    )
    out = writers.clean_numeric(df, ["v"])
    vals = {r["id"]: r["v"] for r in out.collect()}
    assert vals == {1: 0.0, 2: 0.0, 3: 5.0}


def test_bucketed_join_is_shuffle_free(geo):
    """Two tables bucketed+sorted on the join key: the join must read
    bucket-aligned files with NO Exchange on either side — the co-located
    join bucketing exists for (at 100 TB this is the difference between a
    full shuffle of the feature table per consumer and none)."""
    left = geo.table("sites").select("site_id", "metro", "annual_sales")
    right = geo.table("sites").select("site_id", "lat", "lon")
    writers.write_bucketed(left, "bkt_left", "site_id", n=8)
    writers.write_bucketed(right, "bkt_right", "site_id", n=8)
    prev = geo.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the test proves bucket co-location,
        # not broadcast avoidance
        geo.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = geo.table("bkt_left").join(geo.table("bkt_right"), "site_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == left.count()
    finally:
        geo.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        geo.sql("DROP TABLE IF EXISTS bkt_left")
        geo.sql("DROP TABLE IF EXISTS bkt_right")
