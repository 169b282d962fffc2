"""Interleaved text+media document model (BASELINE.json ``input_hint``).

Input contract: an Iceberg-style table of interleaved documents
``(doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)``.
The shared test tables carry flat documents (doc_id, text, ...); this
module derives the interleaved span structure DETERMINISTICALLY from them
— both as a nested-array Spark view (the pipeline's native shape) and as
a flat relational form whose construction is dialect-neutral SQL, so the
DuckDB oracle materializes the identical span world.

Span model per document (seeded by doc_id):
  n_spans = 4 + doc_id % 5                       (4..8 spans)
  kind(i) = text / geo / image / audio cycling on (doc_id + i) % 4
  text spans  : a deterministic slice of the document text
  geo spans   : text = "<lat>,<lon>" (closed-form hash arithmetic — the
                geotag the extraction stage parses and hex-encodes)
  media spans : media_ref = "img://<doc>/<i>" or "aud://<doc>/<i>",
                text NULL
  offset(i) = i  (the sequence key; the per-row invariant is that the
                  (kind, text, media_ref, offset) sequence survives every
                  pipeline stage — verified in tests/test_documents.py)

Scale posture: span derivation is a generator expression (explode of a
sequence) fused into the scan — at 10^12 docs it's a map-only stage, no
shuffle; the nested form is built by sort_array(collect_list(struct(...)))
only where a consumer genuinely needs the array shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hex_sql

MAX_SPANS = 9


def span_fields_sql(doc_id: str = "doc_id", i: str = "i", text_col: str = "text") -> dict[str, str]:
    """Dialect-neutral SQL for the span attributes of span index ``i``."""
    kind = (
        f"CASE WHEN (({doc_id}) + ({i})) % 4 = 0 THEN 'text' "
        f"WHEN (({doc_id}) + ({i})) % 4 = 1 THEN 'geo' "
        f"WHEN (({doc_id}) + ({i})) % 4 = 2 THEN 'image' "
        f"ELSE 'audio' END"
    )
    # geo coordinates: same closed-form hash arithmetic as the site tables,
    # keyed by doc and span position
    key = f"(({doc_id}) * 97 + ({i}) * 31 + 7)"
    lat, lon = hex_sql.latlon_sql(key)
    # text spans: a deterministic slice of the source text (8..27 chars)
    slice_start = f"(1 + ((({doc_id}) * 13 + ({i}) * 37) % 20))"
    slice_len = f"(8 + ((({doc_id}) + ({i})) % 20))"
    span_text = (
        f"CASE WHEN {kind} = 'text' THEN SUBSTR({text_col}, {slice_start}, {slice_len}) "
        f"WHEN {kind} = 'geo' THEN CAST({lat} AS STRING) || ',' || CAST({lon} AS STRING) "
        f"ELSE NULL END"
    )
    media_ref = (
        f"CASE WHEN {kind} = 'image' THEN 'img://' || CAST({doc_id} AS STRING) || '/' || CAST({i} AS STRING) "
        f"WHEN {kind} = 'audio' THEN 'aud://' || CAST({doc_id} AS STRING) || '/' || CAST({i} AS STRING) "
        f"ELSE NULL END"
    )
    return {"kind": kind, "text": span_text, "media_ref": media_ref}


def span_rows_sql(documents: str = "documents") -> str:
    """Flat span rows (doc_id, offset, kind, text, media_ref) — the
    dialect-neutral relational form (documents × span-index VALUES)."""
    idx_rows = ", ".join(f"({i})" for i in range(MAX_SPANS))
    f = span_fields_sql("d.doc_id", "o.i", "d.text")
    return f"""
SELECT d.doc_id, o.i AS span_offset,
       {f["kind"]} AS kind,
       {f["text"]} AS text,
       {f["media_ref"]} AS media_ref
FROM {documents} d
CROSS JOIN (SELECT * FROM (VALUES {idx_rows}) AS __idx(i)) o
WHERE o.i < 4 + d.doc_id % 5"""


def span_rows(spark: SparkSession) -> DataFrame:
    """Spark-native flat span rows via a generator (explode of sequence) —
    map-only, no join, fused into the document scan."""
    docs = spark.table("documents")
    exploded = docs.select(
        "doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(MAX_SPANS - 1))).alias("i")
    ).filter(F.col("i") < 4 + F.col("doc_id") % 5)
    f = span_fields_sql("doc_id", "i", "text")
    return exploded.select(
        "doc_id",
        F.col("i").alias("span_offset"),
        F.expr(f["kind"]).alias("kind"),
        F.expr(f["text"]).alias("text"),
        F.expr(f["media_ref"]).alias("media_ref"),
    )


def interleaved_documents(spark: SparkSession) -> DataFrame:
    """The input_hint shape: (doc_id string, spans array<struct<kind, text,
    media_ref, offset>>) with spans in offset order."""
    rows = span_rows(spark).withColumnRenamed("span_offset", "offset")
    return (
        rows.groupBy(F.col("doc_id").cast("string").alias("doc_id"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
            ).alias("raw")
        )
        .select(
            "doc_id",
            F.transform(
                F.col("raw"),
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )


def span_signature(df: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Per-doc invariant signature: md5 over the offset-ordered
    (kind|text|media_ref|offset) sequence.  Two pipeline stages preserve
    span-sequence equality iff their signatures match."""
    flat = df.select(
        doc_col,
        F.posexplode("spans").alias("pos", "s"),
    ).select(
        doc_col,
        F.concat_ws(
            "|",
            F.col("s.kind"),
            F.coalesce(F.col("s.text"), F.lit("")),
            F.coalesce(F.col("s.media_ref"), F.lit("")),
            F.col("s.offset").cast("string"),
        ).alias("part"),
        "pos",
    )
    return flat.groupBy(doc_col).agg(
        F.md5(F.concat_ws("~", F.array_sort(F.collect_list(F.struct("pos", "part")))
                          .cast("array<string>"))).alias("span_sig")
    )


# ---------------------------------------------------------------------------
# Geotagged-span extraction (the north-rule pipeline stage)
# ---------------------------------------------------------------------------

def geotagged_spans(spark: SparkSession) -> DataFrame:
    """Extract geo spans, parse coordinates, hex-encode at res 8.

    split_part + CAST parse (dialect-neutral); the encode is the shared
    codec SQL, so the oracle assigns identical cells.

    The cast is guarded by ``kind = 'geo'`` INSIDE the expression, not
    only by the preceding filter: a downstream INNER join on hex_id makes
    Catalyst infer ``isnotnull(hex_id)`` and push it into the span-rows
    Filter, where codegen's common-subexpression elimination evaluates
    the cast chain BEFORE the kind conjunct — under ANSI mode that throws
    CAST_INVALID_INPUT on the first text span ('key agg …').  The CASE
    keeps the hoisted evaluation lazy; post-filter semantics unchanged.
    """
    rows = span_rows(spark).filter(F.col("kind") == "geo")
    parsed = rows.select(
        "doc_id",
        "span_offset",
        F.expr(
            "CASE WHEN kind = 'geo'"
            " THEN CAST(split_part(text, ',', 1) AS DOUBLE) END"
        ).alias("lat"),
        F.expr(
            "CASE WHEN kind = 'geo'"
            " THEN CAST(split_part(text, ',', 2) AS DOUBLE) END"
        ).alias("lon"),
    )
    parsed.createOrReplaceTempView("__geo_spans_tmp")
    return spark.sql(
        hex_sql.encode_select_sql(
            "SELECT doc_id, span_offset, lat, lon FROM __geo_spans_tmp",
            lat="lat",
            lon="lon",
            res=8,
            keep_cols=["doc_id", "span_offset", "lat", "lon"],
            cell_alias="hex_id",
        )
    )


def geotagged_spans_oracle_sql() -> str:
    spans = span_rows_sql()
    inner = f"""
SELECT doc_id, span_offset,
       CAST(split_part(text, ',', 1) AS DOUBLE) AS lat,
       CAST(split_part(text, ',', 2) AS DOUBLE) AS lon
FROM ({spans}) __spans WHERE kind = 'geo'"""
    return hex_sql.encode_select_sql(
        inner,
        lat="lat",
        lon="lon",
        res=8,
        keep_cols=["doc_id", "span_offset", "lat", "lon"],
        cell_alias="hex_id",
    )


def doc_cells(spark: SparkSession) -> DataFrame:
    """Hex rollup of geotagged spans: docs per cell + metro attribution —
    the 'attach hex_id and tile assignments' stage aggregated to tiles."""
    g = geotagged_spans(spark)
    metro = hex_sql.nearest_metro_case_sql("lat", "lon")
    return (
        g.select("doc_id", "hex_id", F.expr(metro).alias("metro"))
        .groupBy("hex_id", "metro")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )


def doc_cells_oracle_sql() -> str:
    g = geotagged_spans_oracle_sql()
    metro = hex_sql.nearest_metro_case_sql("lat", "lon")
    return f"""
SELECT hex_id, {metro} AS metro,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_spans
FROM ({g}) __g
GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# Tile-sharded corpus write (the north-rule salted-repartition stage)
# ---------------------------------------------------------------------------

UNTILED = "untiled"
TILE_SALTS = 8


def corpus_tile_assignments(spark: SparkSession) -> DataFrame:
    """One tile per document: the res-8 cell of its FIRST geo span in
    offset order (deterministic — offsets are unique within a doc);
    documents with no geo span land in the ``untiled`` shard.  Join key
    cast to string to match the input_hint doc_id type.

    Read-from-gold: when a pipeline run has committed the ``doc_tiles``
    stage in this session, the assignment joins the committed parquet
    instead of re-deriving the geotagged-span extraction (same posture as
    the app surface and dev_signal_ring)."""
    from .tables import stage_view

    gold = stage_view(spark, "doc_tiles")
    if gold is not None:
        return (
            interleaved_documents(spark)
            .join(gold.select("doc_id", "tile"), "doc_id", "left")
            .withColumn("tile", F.coalesce(F.col("tile"), F.lit(UNTILED)))
        )
    first = (
        geotagged_spans(spark)
        .groupBy("doc_id")
        # "t" prefix: cell ids are all-digit strings, and a partition
        # directory mix of numeric values and the 'untiled' sentinel
        # breaks Spark's partition-column type inference on read-back
        # (LongType inferred, NumberFormatException on the sentinel) —
        # prefixing pins the shard key to a string, like Hive date dirs
        .agg(
            F.concat(F.lit("t"), F.min_by("hex_id", "span_offset")).alias("tile")
        )
        .select(F.col("doc_id").cast("string").alias("doc_id"), "tile")
    )
    return (
        interleaved_documents(spark)
        .join(first, "doc_id", "left")
        .withColumn("tile", F.coalesce(F.col("tile"), F.lit(UNTILED)))
    )


def doc_tiles(spark: SparkSession) -> DataFrame:
    """Query surface for the tile assignment: (doc_id, tile) per document
    — the value-checkable core of the tile-sharded write."""
    return corpus_tile_assignments(spark).select("doc_id", "tile")


def doc_tiles_oracle_sql() -> str:
    g = geotagged_spans_oracle_sql()
    return f"""
WITH g AS ({g}),
first AS (
  SELECT doc_id, 't' || CAST(arg_min(hex_id, span_offset) AS STRING) AS tile
  FROM g GROUP BY doc_id
)
SELECT CAST(d.doc_id AS STRING) AS doc_id,
       COALESCE(f.tile, '{UNTILED}') AS tile
FROM documents d LEFT JOIN first f ON d.doc_id = f.doc_id"""


def write_corpus_tiles(
    spark: SparkSession,
    path: str,
    n_salts: int = TILE_SALTS,
    n_tasks: int | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Write the interleaved corpus sharded by tile, with SALTED
    repartitioning — the north-rule stage: "attaching hex_id and tile
    assignments, with salted repartitioning to break urban-core hex
    skew".

    Without the salt, ``repartition("tile")`` lands the urban-core
    tile's ENTIRE row set on one task: one straggler writes one giant
    file while the rest of the cluster idles — the exact skew the rule
    names.  Hashing on (tile, salt) with salt = pmod(xxhash64(doc_id),
    n_salts) spreads a hot tile over up to ``n_salts`` writer tasks, so
    its partition directory holds that many balanced files; cold tiles
    still coalesce into few files.  The on-disk layout stays
    ``tile=<cell>/`` (partition pruning: a reader of one metro's tiles
    scans only those directories), and the span sequence of every
    document survives byte-for-byte (asserted via span_signature in
    tests — the input_hint's per-row invariant).

    ``assigned`` overrides the tile assignment (any frame carrying a
    ``tile`` column and the doc payload — custom tiling schemes, crafted
    skew tests); default is ``corpus_tile_assignments``.  ``n_tasks``
    pins the shuffle width: without it AQE may coalesce a small shuffle
    below the salt count (harmless at real volume, where partitions
    exceed the coalesce target and the salts spread on their own).

    Returns a reader of the written corpus."""
    if assigned is None:
        assigned = corpus_tile_assignments(spark)
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(n_salts))
    parts = [F.col("tile"), salt]
    salted = (
        assigned.repartition(n_tasks, *parts)
        if n_tasks
        else assigned.repartition(*parts)
    )
    salted.write.mode("overwrite").partitionBy("tile").parquet(path)
    return spark.read.parquet(path)
