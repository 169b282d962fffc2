"""Distributed global ranking — removes the single-partition window.

``PERCENT_RANK() OVER (ORDER BY …)`` plans as WindowExec with ALL rows in
one partition (Spark warns exactly that); at 10^6+ scored candidates that
is the pipeline's only non-scalable stage.  The standard two-pass plan,
implemented here:

1. ``repartitionByRange`` on the order key — a range shuffle (sampled
   boundaries) gives globally ordered partitions;
2. local ``row_number`` per partition (window partitioned by
   spark_partition_id — no data movement);
3. partition row-counts (K tiny rows) → driver cumsum → broadcast offsets;
4. global_rank = offset(pid) + local_rank;
   percent_rank = (global_rank - 1) / (N - 1).

With a unique tiebreaker in the order key, this equals SQL
``PERCENT_RANK() OVER (ORDER BY key, tiebreak)`` exactly — which is what
the DuckDB oracle computes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_percent_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "percentile",
    num_partitions: int | None = None,
) -> DataFrame:
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(n_part, *[F.col(c) for c in order_cols])
    ranged = ranged.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_cols])
    ranged = ranged.withColumn("__local_rank", F.row_number().over(w))
    # Materialize BEFORE the counts collect: repartitionByRange samples
    # boundaries with an RDD-id-derived seed, so re-executing the plan can
    # produce a DIFFERENT partitioning — the collected offsets would then
    # mis-assign ranks (and unseen pids would map to NULL).
    # localCheckpoint (not persist): the materialization is NON-recomputable
    # — on block/executor loss the job fails loudly instead of silently
    # re-sampling different boundaries — and its blocks are reclaimed by the
    # ContextCleaner when the plan is GC'd, so repeated calls don't
    # accumulate pinned cache for the session.  It also halves the upstream
    # work (the feature plan upstream of scoring is expensive): both the
    # counts job and the final output job read the one materialization.
    ranged = ranged.localCheckpoint(eager=True)
    counts = (
        ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt")).collect()
    )
    counts = sorted((r["__pid"], r["__cnt"]) for r in counts)
    total = sum(c for _, c in counts)
    offsets = {}
    acc = 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    offset_col: Column = F.lit(0)
    mapping = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    denom = float(max(total - 1, 1))
    return (
        ranged.withColumn("__offset", mapping[F.col("__pid")])
        .withColumn(
            out_col,
            (F.col("__offset") + F.col("__local_rank") - F.lit(1)).cast("double")
            / F.lit(denom),
        )
        .drop("__pid", "__local_rank", "__offset")
    )
