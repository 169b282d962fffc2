"""Deduplication operators for training-data pipelines over ``documents``:

- exact dedup           : hash-groupBy on a normalized fingerprint
- n-gram Jaccard        : shingle inverted index → candidate pairs →
                          exact Jaccard via intersection/union counts
- MinHash + LSH         : per-seed min of md5(seed||shingle) signatures,
                          banded bucket join for candidates, similarity =
                          fraction of agreeing minhashes
- SimHash               : vectorized Arrow pandas UDF (bit-manipulation is
                          not portably SQL-expressible → rows-only check)
- embedding near-dup    : cosine over the embeddings table (see
                          operators/similarity.py for the kNN variant)

Scale design: everything is shingle-level map + hash-shuffle on the
shingle/band key (the canonical MinHash-LSH plan).  Hot shingles (stop
phrases) are the skew risk: the inverted index caps posting-list length
(DF cap) exactly as web-scale dedup pipelines drop ubiquitous shingles —
that cap also keeps candidate generation near-linear.  Pair keys are
always (lo, hi) ordered to dedupe the symmetric pair space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exprs import dround
from .text_ops import token_count_sql

N_SHINGLE_WORDS = 3
MAX_SHINGLES = 40  # per-doc cap: bounded work per document
DF_CAP = 50  # posting-list cap: drop ubiquitous shingles (skew + noise)
MINHASH_SEEDS = 8
LSH_BANDS = 4  # 2 seeds per band


def shingles(spark: SparkSession) -> DataFrame:
    """Word 3-gram shingles, ≤MAX_SHINGLES per doc (portable: split_part
    word indexing + a position generator)."""
    docs = spark.table("documents")
    n_tokens = F.expr(token_count_sql("text"))
    pos = docs.select(
        "doc_id",
        "text",
        n_tokens.alias("nt"),
        F.explode(F.sequence(F.lit(1), F.lit(MAX_SHINGLES))).alias("i"),
    ).filter(F.col("i") <= F.col("nt") - (N_SHINGLE_WORDS - 1))
    shingle = F.concat_ws(
        " ",
        *[F.expr(f"split_part(text, ' ', i + {j})") for j in range(N_SHINGLE_WORDS)],
    )
    return pos.select("doc_id", shingle.alias("shingle"))


def shingles_sql(documents: str = "documents") -> str:
    idx = ", ".join(f"({i})" for i in range(1, MAX_SHINGLES + 1))
    tk = token_count_sql("d.text")
    words = " || ' ' || ".join(
        f"split_part(d.text, ' ', o.i + {j})" for j in range(N_SHINGLE_WORDS)
    )
    return f"""
SELECT d.doc_id, {words} AS shingle
FROM {documents} d
CROSS JOIN (SELECT * FROM (VALUES {idx}) AS __pos(i)) o
WHERE o.i <= {tk} - {N_SHINGLE_WORDS - 1}"""


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(spark: SparkSession) -> DataFrame:
    """Duplicate groups on the normalized fingerprint: keep the minimum
    doc_id as canonical (hash-groupBy — one shuffle on the fingerprint)."""
    from .text_ops import fingerprint

    fp = fingerprint(spark)
    return (
        fp.groupBy("fp")
        .agg(F.min("doc_id").alias("canonical_doc"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 1)
    )


def exact_dedup_oracle_sql() -> str:
    from .text_ops import fingerprint_oracle_sql

    return f"""
SELECT fp, MIN(doc_id) AS canonical_doc, COUNT(*) AS n_docs
FROM ({fingerprint_oracle_sql()}) __fp
GROUP BY fp"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(spark: SparkSession, threshold: float = 0.35) -> DataFrame:
    """Candidate pairs from a shingle inverted index, scored with exact
    Jaccard over distinct shingles.  DF-capped postings bound the join."""
    sh = shingles(spark).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("size"))
    postings = sh.join(
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= DF_CAP),
        "shingle",
    )
    a = postings.select(F.col("doc_id").alias("a"), "shingle")
    b = postings.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    scored = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("size").alias("sa")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("size").alias("sb")), "b")
        .withColumn(
            "jaccard",
            dround(
                F.col("n_inter")
                / (F.col("sa") + F.col("sb") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "n_inter", "jaccard")
    )
    return scored


def ngram_jaccard_pairs_oracle_sql(threshold: float = 0.35) -> str:
    sh = shingles_sql()
    return f"""
WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({sh}) __s),
sizes AS (SELECT doc_id, COUNT(*) AS size FROM sh GROUP BY doc_id),
postings AS (
  SELECT sh.doc_id, sh.shingle FROM sh
  JOIN (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle HAVING COUNT(*) <= {DF_CAP}) f
    ON sh.shingle = f.shingle
),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_inter
  FROM postings x JOIN postings y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, n_inter,
       (FLOOR((CAST(n_inter AS DOUBLE) / (sa.size + sb.size - n_inter)) * 1000000.0 + 0.5) / 1000000.0) AS jaccard
FROM inter
JOIN sizes sa ON inter.a = sa.doc_id
JOIN sizes sb ON inter.b = sb.doc_id
WHERE (FLOOR((CAST(n_inter AS DOUBLE) / (sa.size + sb.size - n_inter)) * 1000000.0 + 0.5) / 1000000.0) >= {threshold}"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(spark: SparkSession) -> DataFrame:
    """Per-doc minhash signature columns mh0..mh{n-1}: lexicographic min of
    md5(seed || shingle) — a portable permutation family."""
    sh = shingles(spark).distinct()
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{seed}:"), F.col("shingle")))).alias(f"mh{seed}")
        for seed in range(MINHASH_SEEDS)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures_sql() -> str:
    sh = shingles_sql()
    aggs = ", ".join(
        f"MIN(MD5('s{seed}:' || shingle)) AS mh{seed}" for seed in range(MINHASH_SEEDS)
    )
    return f"""
SELECT doc_id, {aggs}
FROM (SELECT DISTINCT doc_id, shingle FROM ({sh}) __s) __d
GROUP BY doc_id"""


def minhash_lsh_pairs(spark: SparkSession, threshold: float = 0.5) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidates; the
    estimated similarity = fraction of agreeing minhash components."""
    sig = minhash_signatures(spark)
    per_band = MINHASH_SEEDS // LSH_BANDS
    bands = []
    for bidx in range(LSH_BANDS):
        cols = [f"mh{bidx * per_band + j}" for j in range(per_band)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(bidx).alias("band"),
                F.concat_ws("|", *[F.col(c) for c in cols]).alias("bucket"),
            )
        )
    buckets = bands[0]
    for b in bands[1:]:
        buckets = buckets.unionByName(b)
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(MINHASH_SEEDS)])
    sb = sig.select(F.col("doc_id").alias("b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(MINHASH_SEEDS)])
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(MINHASH_SEEDS)
    )
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .withColumn("est_jaccard", dround(agree / F.lit(float(MINHASH_SEEDS)), 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b", "est_jaccard")
    )


def minhash_lsh_pairs_oracle_sql(threshold: float = 0.5) -> str:
    sig = minhash_signatures_sql()
    per_band = MINHASH_SEEDS // LSH_BANDS
    band_selects = []
    for bidx in range(LSH_BANDS):
        cols = " || '|' || ".join(
            f"mh{bidx * per_band + j}" for j in range(per_band)
        )
        band_selects.append(
            f"SELECT doc_id, {bidx} AS band, {cols} AS bucket FROM sig"
        )
    buckets = " UNION ALL ".join(band_selects)
    agree = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(MINHASH_SEEDS)
    )
    return f"""
WITH sig AS ({sig}),
buckets AS ({buckets}),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM buckets x JOIN buckets y ON x.band = y.band AND x.bucket = y.bucket
  WHERE x.doc_id < y.doc_id
)
SELECT cand.a, cand.b,
       (FLOOR((({agree}) / {float(MINHASH_SEEDS)}) * 1000000.0 + 0.5) / 1000000.0) AS est_jaccard
FROM cand
JOIN sig sa ON cand.a = sa.doc_id
JOIN sig sb ON cand.b = sb.doc_id
WHERE (FLOOR((({agree}) / {float(MINHASH_SEEDS)}) * 1000000.0 + 0.5) / 1000000.0) >= {threshold}"""


# ---------------------------------------------------------------------------
# SimHash (vectorized Arrow kernel — rows-only check)
# ---------------------------------------------------------------------------

def simhash(spark: SparkSession, bits: int = 64) -> DataFrame:
    """64-bit SimHash over word tokens via a vectorized pandas UDF (Arrow
    batches; numpy bit ops per partition — never per-row Python)."""

    @F.pandas_udf("long")
    def simhash_udf(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for row, t in enumerate(texts):
            if not t:
                continue
            toks = t.split(" ")
            # deterministic 64-bit token hashes (FNV-1a, vectorized per doc)
            acc = np.zeros(bits, dtype=np.int64)
            hs = np.zeros(len(toks), dtype=np.uint64)
            for i, tok in enumerate(toks):
                h = np.uint64(1469598103934665603)
                for ch in tok.encode():
                    h = np.uint64((int(h) ^ ch) * 1099511628211 % (1 << 64))
                hs[i] = h
            bits_matrix = ((hs[:, None] >> np.arange(bits, dtype=np.uint64)) & 1).astype(np.int64)
            acc = (bits_matrix * 2 - 1).sum(axis=0)
            sig = np.uint64(0)
            for b in range(bits):
                if acc[b] > 0:
                    sig |= np.uint64(1) << np.uint64(b)
            out[row] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    docs = spark.table("documents")
    return docs.select("doc_id", simhash_udf(F.col("text")).alias("simhash"))


def embedding_near_dup(spark: SparkSession, threshold: float = 0.35) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the vector-space dedup pass
    of a training pipeline): all (lo, hi) pairs above the cosine
    threshold.  Brute force here (corpus-sized); the LSH-bucketed variant
    in operators/similarity.py is the scale path."""
    from .similarity import _dot_cols, _norm_col

    emb = spark.table("embeddings")
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("a") < F.col("b"))
    cos = _dot_cols("ea", "eb") / (_norm_col("ea") * _norm_col("eb"))
    return (
        pairs.select("a", "b", dround(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_oracle_sql(threshold: float = 0.35) -> str:
    from .similarity import _dot_sql, _norm_sql

    cos = f"({_dot_sql('x.embedding', 'y.embedding')}) / ({_norm_sql('x.embedding')} * {_norm_sql('y.embedding')})"
    return f"""
SELECT x.vec_id AS a, y.vec_id AS b,
       (FLOOR(({cos}) * 1000000.0 + 0.5) / 1000000.0) AS cosine
FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
WHERE (FLOOR(({cos}) * 1000000.0 + 0.5) / 1000000.0) >= {threshold}"""
