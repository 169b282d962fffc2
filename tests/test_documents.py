"""Interleaved-document tests: input_hint schema + the span-sequence
invariant (kind, text, media_ref, order) per doc_id through pipeline
stages."""

from __future__ import annotations

from pyspark.sql import functions as F

from geospatial_store_siting_spark.sources import documents


def test_interleaved_schema_matches_input_hint(geo):
    df = documents.interleaved_documents(geo)
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields) == {
        "doc_id": "string",
        "spans": "array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    }


def test_span_counts_in_range(geo):
    df = documents.interleaved_documents(geo)
    sizes = df.select(F.size("spans").alias("n")).agg(
        F.min("n").alias("lo"), F.max("n").alias("hi")
    ).collect()[0]
    assert sizes["lo"] >= 4 and sizes["hi"] <= 8


def test_span_kinds_complete(geo):
    rows = documents.span_rows(geo)
    kinds = {r["kind"] for r in rows.select("kind").distinct().collect()}
    assert kinds == {"text", "geo", "image", "audio"}
    # media spans carry refs, text/geo spans don't
    bad = rows.filter(
        (F.col("kind").isin("image", "audio") & F.col("media_ref").isNull())
        | (F.col("kind").isin("text", "geo") & F.col("media_ref").isNotNull())
    ).count()
    assert bad == 0


def test_span_sequence_invariant_through_pipeline(geo):
    """The north-rule invariant: a pipeline stage that explodes spans,
    attaches hex ids, and reassembles must preserve the exact
    (kind, text, media_ref, offset) sequence per doc."""
    docs = documents.interleaved_documents(geo)
    before = {r["doc_id"]: r["span_sig"] for r in documents.span_signature(docs).collect()}

    # pipeline stage: explode → attach a derived column (hex of geo spans
    # via the extraction path) → reassemble the nested shape
    flat = docs.select("doc_id", F.posexplode("spans").alias("pos", "s"))
    enriched = flat.withColumn(
        "derived", F.md5(F.concat_ws(":", F.col("doc_id"), F.col("pos")))
    )
    rebuilt = (
        enriched.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "s"))).alias("raw"))
        .select(
            "doc_id",
            F.transform(F.col("raw"), lambda x: x["s"]).alias("spans"),
        )
    )
    after = {r["doc_id"]: r["span_sig"] for r in documents.span_signature(rebuilt).collect()}
    assert before == after
    assert len(before) > 0


def test_geotagged_spans_cells_valid(geo):
    g = documents.geotagged_spans(geo)
    from geospatial_store_siting_spark.functions import hexgrid

    pdf = g.toPandas()
    assert len(pdf) > 0
    # numpy codec agrees with the SQL-path encoding
    np_cells = hexgrid.latlng_to_cell(pdf["lat"].values, pdf["lon"].values, 8)
    assert (np_cells == pdf["hex_id"].values).all()


class TestCorpusTileWrite:
    """The north-rule write stage: tile-sharded interleaved corpus with
    salted repartitioning."""

    def test_span_invariant_and_pruning_through_write(self, geo, tmp_path):
        out = str(tmp_path / "corpus_tiles")
        written = documents.write_corpus_tiles(geo, out)

        # span-sequence equality per doc_id through the write (input_hint
        # invariant): signatures before == after
        orig = documents.interleaved_documents(geo)
        before = {r["doc_id"]: r["span_sig"]
                  for r in documents.span_signature(orig).collect()}
        after = {r["doc_id"]: r["span_sig"]
                 for r in documents.span_signature(written).collect()}
        assert after == before and before

        # every doc's tile is its FIRST geo span's res-8 cell ("t" prefix
        # pins the shard key to a string for partition-type inference)
        first = {
            str(r["doc_id"]): "t" + str(r["tile"])
            for r in documents.geotagged_spans(geo)
            .groupBy("doc_id")
            .agg(F.min_by("hex_id", "span_offset").alias("tile"))
            .collect()
        }
        for r in written.select("doc_id", "tile").collect():
            assert r["tile"] == first.get(r["doc_id"], documents.UNTILED)

        # partition pruning: a single-tile read plans only that directory
        # (the pruning predicate is the tile equality; r6 turned off
        # constraint propagation, which used to add a redundant
        # isnotnull(tile) alongside it)
        import re

        some_tile = written.filter(F.col("tile") != documents.UNTILED).first()["tile"]
        one = geo.read.parquet(out).filter(F.col("tile") == some_tile)
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"PartitionFilters: \[[^\]]*\(tile#\d+ = ", plan)

    def test_hot_tile_splits_across_salted_writers(self, geo, tmp_path):
        """Crafted urban-core skew via the assignment override: 240 of
        246 docs share one tile; the hot tile's directory must hold
        multiple salted files, not one straggler task's single file."""
        import os

        rows = [(str(i), "hot-tile-cell") for i in range(240)] + [
            (str(1000 + i), f"cold-{i}") for i in range(6)
        ]
        assigned = geo.createDataFrame(rows, "doc_id string, tile string")
        out = str(tmp_path / "skewed_tiles")
        # explicit n_tasks: AQE would otherwise coalesce this tiny crafted
        # shuffle to one task (at real volume partitions exceed the
        # coalesce target and the salts spread without it)
        written = documents.write_corpus_tiles(
            geo, out, n_salts=8, n_tasks=16, assigned=assigned
        )
        tiles = written.groupBy("tile").count().collect()
        hot_tile = max(tiles, key=lambda r: r["count"])
        assert hot_tile["count"] == 240
        hot_dir = os.path.join(out, f"tile={hot_tile['tile']}")
        files = [f for f in os.listdir(hot_dir) if f.endswith(".parquet")]
        assert len(files) > 1, "hot tile written by a single straggler task"
        assert len(files) <= 8
