"""BM25 ranked retrieval over the documents corpus.

Full-text relevance ranking is the retrieval half of a training-data
stack (nearest neighbours on embeddings being the other — see
operators/similarity.py): given query terms, rank documents by
Robertson/Spärck-Jones BM25.  The plan is the inverted-index shape —
the token stream is filtered to the query terms BEFORE any aggregation,
so the postings side is |matching tokens|, never the corpus; document
length and corpus stats are one bounded agg each; the per-term idf
table (|query| rows) broadcasts; and the final top-k is ORDER BY +
LIMIT, which Spark plans as TakeOrderedAndProject (per-partition heaps
+ one k-row merge, never a full sort).

Determinism: BM25 mixes LN and float division, whose last-ulp behavior
is engine-specific in principle — so each per-term score is snapped to
integer MICROS before the per-document SUM (the unigram_surprisal
pattern: BIGINT sums are order-independent, so partial aggregation
order can't change the result), idf is snapped the same way, and the
ranking key is the integer micros score with doc_id as tie-break.
The DuckDB oracle runs the identical SQL text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_CAP = 200  # per-doc token bound, same cap as text_ops/sketches
QUERY_TERMS = ("spark", "window", "merge", "stream")
TOPK = 20
_K1 = "CAST(1.2 AS DOUBLE)"  # term-frequency saturation
_B = "CAST(0.75 AS DOUBLE)"  # length normalization


def _idf_micros_sql() -> str:
    """BM25+ idf over (df, n_docs), snapped to integer micros:
    LN(1 + (N - df + 0.5)/(df + 0.5)) — the +1 keeps idf positive even
    for terms in more than half the corpus (this synthetic vocabulary
    is tiny, so df is large)."""
    idf = (
        "LN(CAST(1 AS DOUBLE) + "
        "(CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        " / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))"
    )
    return f"CAST(FLOOR(({idf}) * 1000000.0 + 0.5) AS BIGINT)"


def _score_micros_sql() -> str:
    """Per-(doc, term) BM25 contribution over (tf, dl, idf_m, avgdl),
    snapped to micros for the order-independent BIGINT sum."""
    norm = (
        f"(CAST(1 AS DOUBLE) - {_B} + {_B} *"
        f" (CAST(dl AS DOUBLE) / avgdl))"
    )
    s = (
        f"(CAST(idf_m AS DOUBLE) / CAST(1000000 AS DOUBLE))"
        f" * (CAST(tf AS DOUBLE) * ({_K1} + CAST(1 AS DOUBLE)))"
        f" / (CAST(tf AS DOUBLE) + {_K1} * {norm})"
    )
    return f"CAST(FLOOR(({s}) * 1000000.0 + 0.5) AS BIGINT)"


def bm25_topk(
    spark: SparkSession,
    terms: tuple[str, ...] = QUERY_TERMS,
    k: int = TOPK,
) -> DataFrame:
    docs = spark.table("documents").repartition("doc_id")
    toks = docs.select(
        "doc_id",
        F.explode(F.slice(F.split(F.col("text"), " "), 1, TOKEN_CAP)).alias(
            "tok"
        ),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).select(
        "n_docs",
        F.expr("CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)").alias(
            "avgdl"
        ),
    )
    tf = (
        toks.filter(F.col("tok").isin(*terms))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats))
        .select("tok", F.expr(_idf_micros_sql()).alias("idf_m"))
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(idf), "tok")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.expr(_score_micros_sql()).alias("sm"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("sm").cast("long").alias("score_micros"),
        F.count(F.lit(1)).alias("n_terms"),
    )
    return (
        per_doc.orderBy(F.desc("score_micros"), F.asc("doc_id"))
        .limit(k)
        .select(
            "doc_id",
            "n_terms",
            "score_micros",
            F.expr(
                "CAST(score_micros AS DOUBLE) / CAST(1000000 AS DOUBLE)"
            ).alias("score"),
        )
    )


def bm25_topk_oracle_sql(
    terms: tuple[str, ...] = QUERY_TERMS, k: int = TOPK
) -> str:
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')[1:{TOKEN_CAP}]) AS tok
  FROM documents
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE tok IN ({in_list}) GROUP BY doc_id, tok
),
idf AS (
  SELECT tok, {_idf_micros_sql()} AS idf_m
  FROM (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok) __d,
       stats
),
sc AS (
  SELECT tf.doc_id, {_score_micros_sql()} AS sm
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN idf ON tf.tok = idf.tok, stats
),
pd AS (
  SELECT doc_id, CAST(SUM(sm) AS BIGINT) AS score_micros,
         CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM sc GROUP BY doc_id
)
SELECT doc_id, n_terms, score_micros,
       CAST(score_micros AS DOUBLE) / CAST(1000000 AS DOUBLE) AS score
FROM pd ORDER BY score_micros DESC, doc_id LIMIT {k}"""
