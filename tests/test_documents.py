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
