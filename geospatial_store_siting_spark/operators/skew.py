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

from pyspark.sql import Column, DataFrame, SparkSession
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
