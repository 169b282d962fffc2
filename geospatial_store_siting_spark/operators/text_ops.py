"""Text analysis for training-data pipelines over the ``documents`` table:
language-ID (marker-word heuristic), quality scoring, token statistics,
document fingerprinting.

All expressions are engine-portable (replace-based substring counting,
split_part, md5, regexp_replace on simple classes), so every query here is
oracle-checked.  At 10^12 docs each is a map-only projection fused into
the columnar scan + one hash aggregation — no UDFs, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exprs import dround

# marker tokens per language for the n-gram-style heuristic (space-padded
# so they match whole words mid-text)
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " de "],
    "fr": [" le ", " la ", " et "],
    "de": [" der ", " und ", " die "],
    "zh": [" zh ", " shi ", " de "],
}


def _count_occurrences_sql(col: str, needle: str) -> str:
    """Portable substring-occurrence count via replace-length arithmetic."""
    esc = needle.replace("'", "''")
    return (
        f"((LENGTH({col}) - LENGTH(REPLACE({col}, '{esc}', ''))) / {len(needle)})"
    )


def token_count_sql(col: str = "text") -> str:
    """Whitespace token count (single-space-separated corpus)."""
    return f"(LENGTH({col}) - LENGTH(REPLACE({col}, ' ', '')) + 1)"


def text_stats(spark: SparkSession) -> DataFrame:
    """Per-document token/char statistics + punctuation and long-word
    ratios — the quality-signal primitives."""
    docs = spark.table("documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    n_tokens = F.expr(token_count_sql("text"))
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_computed"),
        n_tokens.alias("n_tokens"),
        dround(F.length("text").cast("double") / n_tokens, 4).alias("avg_token_len"),
        F.expr(_count_occurrences_sql("text", "data")).cast("long").alias("kw_data_count"),
    )


def text_stats_oracle_sql() -> str:
    tk = token_count_sql("text")
    return f"""
SELECT doc_id, lang,
       LENGTH(text) AS n_chars_computed,
       {tk} AS n_tokens,
       (FLOOR((CAST(LENGTH(text) AS DOUBLE) / {tk}) * 10000.0 + 0.5) / 10000.0) AS avg_token_len,
       CAST({_count_occurrences_sql("text", "data")} AS BIGINT) AS kw_data_count
FROM documents"""


def _lang_score_exprs(col: str) -> dict[str, str]:
    padded = f"(' ' || {col} || ' ')"
    return {
        lang: " + ".join(_count_occurrences_sql(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(spark: SparkSession) -> DataFrame:
    """Marker-based language identification; emits predicted language and
    whether it agrees with the labeled ``lang`` column."""
    docs = spark.table("documents")
    scores = _lang_score_exprs("text")
    langs = list(scores)
    score_cols = [F.expr(scores[lg]).alias(f"score_{lg}") for lg in langs]
    df = docs.select("doc_id", "lang", *score_cols)
    # argmax with deterministic tie-break on declaration order
    best = F.lit(langs[0])
    best_score = F.col(f"score_{langs[0]}")
    for lg in langs[1:]:
        cond = F.col(f"score_{lg}") > best_score
        best = F.when(cond, F.lit(lg)).otherwise(best)
        best_score = F.when(cond, F.col(f"score_{lg}")).otherwise(best_score)
    return df.select(
        "doc_id",
        "lang",
        best.alias("predicted_lang"),
        best_score.cast("long").alias("marker_hits"),
        (best == F.col("lang")).alias("agrees"),
    )


def lang_id_oracle_sql() -> str:
    scores = _lang_score_exprs("text")
    langs = list(scores)
    score_sel = ", ".join(f"({scores[lg]}) AS score_{lg}" for lg in langs)
    best = f"'{langs[0]}'"
    best_score = f"score_{langs[0]}"
    for lg in langs[1:]:
        best = f"CASE WHEN score_{lg} > {best_score} THEN '{lg}' ELSE {best} END"
        best_score = f"CASE WHEN score_{lg} > {best_score} THEN score_{lg} ELSE {best_score} END"
    return f"""
SELECT doc_id, lang,
       {best} AS predicted_lang,
       CAST({best_score} AS BIGINT) AS marker_hits,
       ({best}) = lang AS agrees
FROM (SELECT doc_id, lang, {score_sel} FROM documents) __scores"""


def quality_score(spark: SparkSession) -> DataFrame:
    """Composite quality score (length + lexical-diversity proxies) with a
    keep/drop verdict — the filter stage of a training-data pipeline."""
    docs = spark.table("documents")
    n_tokens = F.expr(token_count_sql("text"))
    uniq_ratio_proxy = F.expr(_count_occurrences_sql("text", "the"))
    score = (
        F.least(n_tokens.cast("double") / F.lit(50.0), F.lit(1.0)) * 0.5
        + F.when(F.col("n_chars") >= 100, 0.3).otherwise(0.0)
        + F.when(uniq_ratio_proxy <= 5, 0.2).otherwise(0.0)
    )
    return docs.select(
        "doc_id",
        dround(score, 4).alias("quality"),
        (score >= 0.6).alias("keep"),
    )


def quality_score_oracle_sql() -> str:
    tk = token_count_sql("text")
    the_count = _count_occurrences_sql("text", "the")
    score = (
        f"(LEAST(CAST({tk} AS DOUBLE) / 50.0, 1.0) * 0.5"
        f" + CASE WHEN n_chars >= 100 THEN 0.3 ELSE 0.0 END"
        f" + CASE WHEN {the_count} <= 5 THEN 0.2 ELSE 0.0 END)"
    )
    return f"""
SELECT doc_id,
       (FLOOR(({score}) * 10000.0 + 0.5) / 10000.0) AS quality,
       ({score}) >= 0.6 AS keep
FROM documents"""


def fingerprint(spark: SparkSession) -> DataFrame:
    """Normalized md5 document fingerprint (exact-dedup key)."""
    docs = spark.table("documents")
    # lower() BEFORE stripping: the strip class is [^a-z0-9 ], so stripping
    # first would delete uppercase letters instead of folding them.
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def fingerprint_oracle_sql() -> str:
    return """
SELECT doc_id, MD5(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g')) AS fp
FROM documents"""
