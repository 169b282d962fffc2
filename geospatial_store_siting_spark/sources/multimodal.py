"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched kernels.

The decode step itself (JPEG/PNG/PCM parsing) needs libraries absent from
this environment, so it is STUBBED behind ``HAVE_MEDIA_LIBS``: the real
path raises NotImplementedError with the integration contract documented;
the deterministic fake path produces stable pseudo-features so the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is fully real and tested.

Pipeline shape (the part that matters at 100 TB):
  media table (doc_id, span_offset, media_kind, blob binary, meta struct)
    → mapInPandas(decode_features)     # Arrow batches, bounded memory
    → feature columns                  # fixed-size vector + scalars
No per-row Python, no driver round-trips; blobs never leave the executor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HAVE_MEDIA_LIBS = False  # PIL / soundfile / av are not in this image

FEATURE_DIM = 8


def media_table(spark: SparkSession) -> DataFrame:
    """Synthetic media blobs for the documents' image/audio spans: blob =
    md5-chained deterministic bytes, meta = (width, height, n_bytes).

    Built distributively from the span rows — binary generation happens in
    the JVM via expressions (md5 → unhex chain), not the driver."""
    from .documents import span_rows

    spans = span_rows(spark).filter(F.col("kind").isin("image", "audio"))
    seed = F.md5(F.concat_ws(":", "doc_id", "span_offset", "kind"))
    # 64-byte deterministic blob: 4 chained md5 digests, unhexed
    parts = [seed]
    for _ in range(3):
        parts.append(F.md5(parts[-1]))
    blob = F.unhex(F.concat(*parts))
    return spans.select(
        "doc_id",
        "span_offset",
        F.col("kind").alias("media_kind"),
        "media_ref",
        blob.alias("blob"),
        F.struct(
            (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 24).cast("int").alias("height"),
            F.length(blob).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_features(spark: SparkSession, media: DataFrame | None = None) -> DataFrame:
    """mapInPandas feature extraction over binary blobs.

    Real decode is gated: with media libs installed this would decode the
    blob (image resize → pooled pixels / audio → spectral moments).  The
    deterministic fake derives FEATURE_DIM floats from the blob bytes —
    same signature, same batch shape, same schema as the real kernel.
    """
    src = media if media is not None else media_table(spark)
    base_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields)
    out_schema = base_schema + f", features array<double>, decode_ok boolean"

    def kernel(batches):
        for pdf in batches:
            feats = []
            ok = []
            for blob in pdf["blob"]:
                if HAVE_MEDIA_LIBS:
                    raise NotImplementedError(
                        "real decode path: PIL.Image.open(io.BytesIO(blob)) → "
                        "resize((8,8)) → grayscale → row-mean pooling; audio: "
                        "soundfile.read → FFT band energies. Install media libs "
                        "and set HAVE_MEDIA_LIBS=True."
                    )
                b = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.float64)
                chunks = np.array_split(b, FEATURE_DIM)
                feats.append([float(c.mean()) / 255.0 for c in chunks])
                ok.append(True)
            pdf = pdf.copy()
            pdf["features"] = feats
            pdf["decode_ok"] = ok
            yield pdf

    return src.mapInPandas(kernel, schema=out_schema)


def resize_images(spark: SparkSession, media: DataFrame | None = None,
                  width: int = 8, height: int = 8) -> DataFrame:
    """Image resize kernel (stub-gated): real path = PIL resize; fake path
    reshapes blob bytes into a (h, w) grid deterministically.  Schema and
    Arrow batch shape are the real contract."""
    src = media if media is not None else media_table(spark)
    src = src.filter(F.col("media_kind") == "image")
    base_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields)
    out_schema = base_schema + ", pixels array<array<double>>, out_w int, out_h int"

    def kernel(batches):
        for pdf in batches:
            px, ws, hs = [], [], []
            for blob in pdf["blob"]:
                if HAVE_MEDIA_LIBS:
                    raise NotImplementedError(
                        "real path: PIL.Image.open → .resize((width, height)) → grayscale grid"
                    )
                b = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.float64)
                grid = np.resize(b, (height, width)) / 255.0
                px.append([list(row) for row in grid])
                ws.append(width)
                hs.append(height)
            pdf = pdf.copy()
            pdf["pixels"], pdf["out_w"], pdf["out_h"] = px, ws, hs
            yield pdf

    return src.mapInPandas(kernel, schema=out_schema)


def sample_frames(spark: SparkSession, media: DataFrame | None = None,
                  n_frames: int = 4) -> DataFrame:
    """Frame sampling for video/audio media (stub-gated): real path decodes
    the container and samples evenly-spaced frames; fake path slices the
    blob into n deterministic 'frames' (one output row per frame — the
    explode shape a video pipeline produces)."""
    src = media if media is not None else media_table(spark)
    src = src.filter(F.col("media_kind") == "audio")
    out_schema = "doc_id bigint, span_offset int, frame_idx int, frame_bytes binary"

    def kernel(batches):
        for pdf in batches:
            rows = {"doc_id": [], "span_offset": [], "frame_idx": [], "frame_bytes": []}
            for doc, off, blob in zip(pdf["doc_id"], pdf["span_offset"], pdf["blob"]):
                if HAVE_MEDIA_LIBS:
                    raise NotImplementedError(
                        "real path: av.open(BytesIO(blob)) → sample n evenly-spaced frames"
                    )
                b = bytes(blob)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    rows["doc_id"].append(doc)
                    rows["span_offset"].append(off)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(b[i * step : (i + 1) * step])
            yield pd.DataFrame(rows)

    return src.mapInPandas(kernel, schema=out_schema)


def media_feature_summary(spark: SparkSession) -> DataFrame:
    """Rows-only query surface: decoded-feature aggregate per media kind
    (exercises the full binary → Arrow kernel → feature path)."""
    feats = decode_features(spark)
    return (
        feats.select(
            "media_kind",
            F.col("meta.n_bytes").alias("n_bytes"),
            F.aggregate(
                F.col("features"), F.lit(0.0), lambda acc, v: acc + v
            ).alias("feat_sum"),
        )
        .groupBy("media_kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.avg("n_bytes").alias("avg_bytes"),
            F.avg("feat_sum").alias("avg_feat_sum"),
        )
    )
