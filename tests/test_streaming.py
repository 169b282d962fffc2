"""Structured Streaming tests: bounded parquet stream → memory sink, with
batch-equivalence assertions (the streaming twin must agree with the
oracle-checked batch operator)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from geospatial_store_siting_spark.operators import events_ops
from geospatial_store_siting_spark.streaming import stream_jobs
from tests.conftest import SF_DIR


def test_windowed_stream_matches_batch(geo):
    ev = stream_jobs.events_stream(geo, SF_DIR)
    agg = stream_jobs.windowed_counts_stream(ev)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = (
        geo.sql("SELECT window_start_epoch, event_type, n_events, sum_value FROM win_out")
        .toPandas()
        .sort_values(["window_start_epoch", "event_type"], ignore_index=True)
    )
    batch = (
        events_ops.tumbling_counts(geo)
        .select("window_start_epoch", "event_type", "n_events")
        .toPandas()
        .sort_values(["window_start_epoch", "event_type"], ignore_index=True)
    )
    assert len(streamed) == len(batch)
    assert (streamed["n_events"].values == batch["n_events"].values).all()


def test_session_window_stream_runs(geo):
    ev = stream_jobs.events_stream(geo, SF_DIR)
    sess = stream_jobs.sessionize_stream(ev, watermark="3650 days")
    q = (
        sess.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = geo.sql("SELECT * FROM sess_out").toPandas()
    assert len(out) > 0
    assert (out["n_events"] >= 1).all()
    # session count must match the batch sessionizer's (same gap)
    batch_sessions = events_ops.sessionize(geo).count()
    assert len(out) == batch_sessions


def test_stateful_running_totals(geo):
    ev = stream_jobs.events_stream(geo, SF_DIR)
    totals = stream_jobs.running_user_totals(ev)
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName("totals_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # last update per user = final running total == batch groupBy sum
    out = geo.sql(
        "SELECT user_id, max(n_events) AS n FROM totals_out GROUP BY user_id"
    ).toPandas().set_index("user_id")["n"]
    batch = (
        geo.table("events").groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .toPandas().set_index("user_id")["n"]
    )
    assert len(out) == len(batch)
    joined = out.to_frame("stream").join(batch.to_frame("batch"))
    assert (joined["stream"] == joined["batch"]).all()


def test_doc_cells_stream_equals_batch(geo):
    """The streaming geotagged-span→tile rollup converges to the batch
    doc_cells result (cells, metros, exact span counts)."""
    from geospatial_store_siting_spark.sources import documents

    docs = stream_jobs.documents_stream(geo, SF_DIR)
    cells = stream_jobs.doc_cells_stream(docs)
    q = (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName("doc_cells_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = geo.sql(
        "SELECT hex_id, metro, n_spans FROM doc_cells_out"
    ).toPandas().sort_values(["hex_id", "metro"]).reset_index(drop=True)
    batch = (
        documents.doc_cells(geo)
        .select("hex_id", "metro", "n_spans")
        .toPandas()
        .sort_values(["hex_id", "metro"])
        .reset_index(drop=True)
    )
    assert out.equals(batch)


def test_transform_with_state_running_totals(geo):
    """Spark 4.x arbitrary-state twin (transformWithStateInPandas) matches
    the batch groupBy — skipped where the worker-side protobuf the
    operator's state protocol needs is unavailable (stream_jobs.tws_available)."""
    import pytest

    if not stream_jobs.tws_available():
        pytest.skip("transformWithStateInPandas needs protobuf in the Python worker")
    old = geo.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    geo.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = stream_jobs.events_stream(geo, SF_DIR)
        totals = stream_jobs.running_user_totals_tws(ev)
        q = (
            totals.writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_totals_out")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        out = geo.sql(
            "SELECT user_id, max(n_events) AS n FROM tws_totals_out GROUP BY user_id"
        ).toPandas().set_index("user_id")["n"]
        batch = (
            geo.table("events").groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
            .toPandas().set_index("user_id")["n"]
        )
        joined = out.to_frame("stream").join(batch.to_frame("batch"))
        assert len(out) == len(batch)
        assert (joined["stream"] == joined["batch"]).all()
    finally:
        if old is not None:
            geo.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            geo.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_stream_join_equals_batch(geo):
    """Stream-stream purchase⋈view join (watermarked, time-bounded) must
    converge to the batch inequality join on the same events."""
    ev = stream_jobs.events_stream(geo, SF_DIR)
    joined = stream_jobs.purchase_view_join_stream(ev, watermark="30 days")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = (
        geo.sql("SELECT * FROM ss_join_out")
        .toPandas()
        .sort_values(["purchase_event_id", "view_event_id"])
        .reset_index(drop=True)
    )
    batch = geo.sql(
        """
SELECT p.event_id AS purchase_event_id, p.user_id, v.event_id AS view_event_id,
       unix_timestamp(p.ts) - unix_timestamp(v.ts) AS secs_between
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR"""
    ).toPandas().sort_values(["purchase_event_id", "view_event_id"]).reset_index(drop=True)
    assert len(out) == len(batch) and len(batch) > 0
    assert out.equals(batch[out.columns])


def test_corpus_ingest_stream_equals_batch_front_end(geo):
    """The streaming corpus-ingest twin (quality gate → fp dedup → scrub)
    keeps exactly the batch front end's fingerprint set — one survivor
    per fingerprint — and every survivor carries the batch scrub values
    (canonical CHOICE may differ: batch keeps min doc_id, stream keeps
    first arrival; content equivalence is what matters)."""
    from geospatial_store_siting_spark.operators import text_ops

    docs = stream_jobs.documents_stream(geo, SF_DIR)
    cleaned = stream_jobs.corpus_ingest_stream(docs)
    q = (
        cleaned.writeStream.outputMode("append")
        .format("memory")
        .queryName("corpus_ingest_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = geo.sql("SELECT * FROM corpus_ingest_out").toPandas()

    quality_kept = text_ops.quality_score(geo).filter(F.col("keep")).select("doc_id")
    batch_fps = set(
        r["fp"]
        for r in text_ops.fingerprint(geo)
        .join(quality_kept, "doc_id", "left_semi")
        .select("fp")
        .distinct()
        .collect()
    )
    assert set(out["fp"]) == batch_fps
    assert len(out) == len(batch_fps)  # exactly one survivor per fingerprint

    scrub = text_ops.scrub_pii(geo).toPandas().set_index("doc_id")
    merged = out.set_index("doc_id").join(scrub, rsuffix="_b")
    assert (merged["scrubbed_md5"] == merged["scrubbed_md5_b"]).all()
    assert (merged["n_emails"] == merged["n_emails_b"]).all()
    assert (merged["n_urls"] == merged["n_urls_b"]).all()


def test_incremental_dedup_stream_equals_batch(geo):
    """The foreachBatch ingest-dedup service, fed the SAME arrival split
    the batch operator uses, must produce row-identical classifications:
    micro-batched arrival (signatures recomputed from text per batch)
    changes nothing about the verdicts."""
    from geospatial_store_siting_spark.operators import dedup
    from geospatial_store_siting_spark.operators.sampling import _u_col

    incoming = _u_col(seed=dedup.INGEST_SEED) < F.lit(dedup.INGEST_FRACTION)
    arrivals = stream_jobs.documents_stream(geo, SF_DIR).filter(incoming)
    streamed = stream_jobs.incremental_dedup_stream(geo, arrivals).toPandas()
    batch = dedup.dedup_incremental(geo).toPandas()

    key = ["doc_id", "status", "match_doc"]
    s = streamed[key].sort_values("doc_id", ignore_index=True)
    b = batch[key].sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(s, b, check_dtype=False)


def test_self_extending_stream_dedups_across_triggers(geo, tmp_path, monkeypatch):
    """The production ingest loop: trigger 1 delivers a novel doc, the
    service commits it to the probe index, trigger 2 delivers an exact
    copy and a near-dup under new ids — BOTH must classify against the
    trigger-1 doc (cross-trigger growth the non-extending twin forbids)."""
    import os
    import shutil
    import time as _time

    from geospatial_store_siting_spark.operators import dedup
    from geospatial_store_siting_spark.sources import snapshots

    monkeypatch.setattr(snapshots, "DEFAULT_ROOT", str(tmp_path))
    dedup.ingest_probe_index(geo, SF_DIR)

    novel_text = " ".join(f"sx{i}" for i in range(50))
    near_text = " ".join(f"sx{i}" for i in range(49)) + " tail"
    src = tmp_path / "arrival_stream"
    os.makedirs(src)

    def add_file(name: str, rows: list, mtime: float) -> None:
        tmp = str(tmp_path / f"w_{name}")
        geo.createDataFrame(rows, "doc_id bigint, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = str(src / name)
        shutil.copyfile(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    t0 = _time.time() - 100
    add_file("b1.parquet", [(800001, novel_text)], t0)
    add_file("b2.parquet", [(800002, novel_text), (800003, near_text)], t0 + 50)

    docs = (
        geo.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = {
        r.doc_id: r
        for r in stream_jobs.self_extending_ingest_stream(
            geo, docs, SF_DIR
        ).collect()
    }
    assert out[800001].status == "novel"
    assert out[800002].status == "exact_dup" and out[800002].match_doc == 800001
    assert out[800003].status == "near_dup" and out[800003].match_doc == 800001


def test_doc_zones_stream_equals_batch(geo):
    """The streaming zone assignment (stream-static broadcast cover join)
    converges to the batch doc_zone_counts result — exact doc counts too,
    since every doc carries at most one geo span per (metro, zone) here
    is NOT assumed: only zones and exact span counts are compared, and
    n_docs is cross-checked against the batch countDistinct."""
    from geospatial_store_siting_spark.operators import pip

    docs = stream_jobs.documents_stream(geo, SF_DIR)
    zones = stream_jobs.doc_zones_stream(geo, docs)
    q = (
        zones.writeStream.outputMode("complete")
        .format("memory")
        .queryName("doc_zones_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = geo.sql(
        "SELECT metro, zone, n_spans FROM doc_zones_out"
    ).toPandas().sort_values(["metro", "zone"]).reset_index(drop=True)
    batch = (
        pip.doc_zone_counts(geo)
        .select("metro", "zone", "n_spans")
        .toPandas()
        .sort_values(["metro", "zone"])
        .reset_index(drop=True)
    )
    assert out.equals(batch)


def test_catchment_stream_equals_batch(geo, tmp_path):
    """Union of per-trigger isochrone expansions == one-shot batch reach
    (per-site expansion over static dims: trigger partitioning can't
    change any cost)."""
    from geospatial_store_siting_spark.operators import isochrone

    src = str(tmp_path / "sites_stream")
    base = geo.table("sites").select("site_id", "h3_res8", "q", "r")
    base.repartition(3).write.mode("overwrite").parquet(src)
    sites = (
        geo.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streamed = (
        stream_jobs.catchment_stream(geo, sites)
        .toPandas()
        .sort_values(["site_id", "cell_id"])
        .reset_index(drop=True)
    )
    batch = (
        isochrone.catchment_reach(geo)
        .select("site_id", "cell_id", "cost_min")
        .toPandas()
        .sort_values(["site_id", "cell_id"])
        .reset_index(drop=True)
    )
    assert streamed.equals(batch)


def test_st_bins_stream_matches_batch(geo):
    """The streaming space-time bins equal the batch binning stage
    (hotspots._bins_sql) row-for-row — window-start day ids and the
    epoch-floor day ids must agree under the UTC session."""
    from geospatial_store_siting_spark.operators import hotspots

    ev = stream_jobs.events_stream(geo, SF_DIR)
    bins = stream_jobs.st_bins_stream(ev, geo.table("sites"))
    stream_jobs.run_to_memory(bins, "st_bins")
    got = (
        geo.table("st_bins")
        .toPandas()
        .sort_values(["cell_id", "day"], ignore_index=True)
    )
    want = (
        geo.sql(
            hotspots._bins_sql(
                "SELECT site_id, h3_res8, q, r FROM sites", dialect="spark"
            )
        )
        .toPandas()
        .sort_values(["cell_id", "day"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[["cell_id", "q", "r", "day", "n"]].astype("int64"),
        want[["cell_id", "q", "r", "day", "n"]].astype("int64"),
    )
