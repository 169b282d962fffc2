"""Skew handling: salted repartition + two-phase aggregation for hot keys.

North-rule requirement: "salted repartitioning to break urban-core hex
skew".  Urban-core cells concentrate orders-of-magnitude more entities
than suburban cells; a groupBy(cell) or join on cell then bottlenecks on
a handful of reducers.  The standard fix implemented here:

- ``salted(df, key, n)``      — adds ``salt = pmod(hash(<row>), n)``;
- ``salted_sum(df, key, ...)``— two-phase aggregation: partial agg on
  (key, salt) spreads a hot key over n reducers, final agg on key merges
  the partials.  Algebraic aggregates (sum/count/min/max) compose exactly,
  so results are identical to the naive single-phase plan — which is
  exactly what the oracle check asserts (oracle = naive SQL aggregation).
- AQE's skew-join split handles the join side at runtime
  (``spark.sql.adaptive.skewJoin.enabled`` is on in session.py); salting
  complements it for aggregations, which AQE does not rebalance.

The oracle-checked query aggregates span counts per hex cell over the
document corpus — doc-geo spans cluster around the 5 metro centers, a
miniature of the urban-core distribution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_SALTS = 16


def salted(df: DataFrame, salt_source: Column, n: int = N_SALTS) -> DataFrame:
    """Attach a deterministic salt column derived from a row expression
    (deterministic, so retries/resumes land rows in the same bucket)."""
    return df.withColumn("salt", F.pmod(F.xxhash64(salt_source), F.lit(n)))


def salted_sum(
    df: DataFrame,
    key: str,
    value_cols: dict[str, str],
    salt_source: Column,
    n: int = N_SALTS,
) -> DataFrame:
    """Two-phase salted aggregation: sums/counts per ``key`` with the hot
    key spread over ``n`` partial groups first.

    value_cols maps output name → input column ("*" = count rows).
    """
    s = salted(df, salt_source, n)
    partial_aggs = []
    final_aggs = []
    for out, src in value_cols.items():
        if src == "*":
            partial_aggs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
        else:
            partial_aggs.append(F.sum(src).alias(f"__p_{out}"))
        final_aggs.append(F.sum(f"__p_{out}").alias(out))
    partial = s.groupBy(key, "salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)


def salted_topk(
    df: DataFrame,
    key: str,
    order_cols: list[Column],
    k: int,
    salt_source: Column,
    n: int = N_SALTS,
) -> DataFrame:
    """EXACT per-key top-k with a salted two-phase window — the
    skew-mitigated form of the W4 row_number cut.

    A plain ``row_number() OVER (PARTITION BY key ...)`` sends every row
    of a hot key to ONE reducer to sort (map-side combine cannot help a
    window the way it collapses algebraic aggregates) — the urban-core
    cell becomes the stage straggler.  Phase 1 ranks within (key, salt),
    spreading the hot key's sort over ``n`` reducers and keeping ≤ k rows
    each; phase 2 ranks the ≤ n·k survivors per key.  Exact because the
    per-key top-k is a subset of the union of per-(key, salt) top-k; the
    caller's ``order_cols`` must define a TOTAL order (add a tiebreak
    column) so the cut is deterministic.
    """
    s = salted(df, salt_source, n)
    w1 = Window.partitionBy(key, "salt").orderBy(*order_cols)
    w2 = Window.partitionBy(key).orderBy(*order_cols)
    pruned = s.withColumn("__r1", F.row_number().over(w1)).filter(F.col("__r1") <= k)
    return (
        pruned.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .drop("salt", "__r1")
    )


def salted_topk_docs(spark: SparkSession, k: int = 3) -> DataFrame:
    """Top-k documents per hex cell by geo-span count, via the salted
    two-phase window (query surface: must equal the naive single-window
    plan, which the oracle runs)."""
    from ..sources.documents import geotagged_spans

    cnt = (
        geotagged_spans(spark)
        .groupBy("hex_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )
    return salted_topk(
        cnt,
        key="hex_id",
        order_cols=[F.desc("n_spans"), F.asc("doc_id")],
        k=k,
        salt_source=F.col("doc_id"),
    )


def salted_topk_docs_oracle_sql(k: int = 3) -> str:
    from ..sources.documents import geotagged_spans_oracle_sql

    return f"""
WITH cnt AS (
  SELECT hex_id, doc_id, COUNT(*) AS n_spans
  FROM ({geotagged_spans_oracle_sql()}) __g
  GROUP BY hex_id, doc_id
)
SELECT hex_id, doc_id, n_spans, rank FROM (
  SELECT hex_id, doc_id, n_spans,
         ROW_NUMBER() OVER (PARTITION BY hex_id
                            ORDER BY n_spans DESC, doc_id ASC) AS rank
  FROM cnt
) __r WHERE rank <= {k}"""


def salted_span_counts(spark: SparkSession) -> DataFrame:
    """Per-hex geo-span counts via the salted two-phase plan (query
    surface: must equal the naive aggregation, which the oracle runs)."""
    from ..sources.documents import geotagged_spans

    g = geotagged_spans(spark)
    out = salted_sum(
        g.select("hex_id", "doc_id"),
        key="hex_id",
        value_cols={"n_spans": "*"},
        salt_source=F.col("doc_id"),
    )
    return out


def salted_span_counts_oracle_sql() -> str:
    from ..sources.documents import geotagged_spans_oracle_sql

    return f"""
SELECT hex_id, COUNT(*) AS n_spans
FROM ({geotagged_spans_oracle_sql()}) __g
GROUP BY hex_id"""
