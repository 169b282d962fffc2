"""Write-side operators (SURVEY §2.1 S2/S3/S5/S8).

- partitioned parquet writes (S3 — reference partitions locations by
  state, `notebooks/01_seed_demo_data.py:632`; here by metro so partition
  pruning serves the per-metro query surface)
- bucketed writes for co-located joins (beyond the reference: bucketing
  by site_id lets repeated feature-table joins skip the shuffle)
- CSV ingest/egress round-trip (S5 — the Zillow/Census pd.read_csv paths,
  `notebooks/05_ingest_dev_signals.py:262-292`, engine-side and schema'd:
  no inferSchema in prod paths)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Hive-partitioned parquet (S3): downstream filters on the partition
    columns prune directories instead of scanning."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partition_pruned(spark: SparkSession, path: str, metro: str) -> DataFrame:
    """A read whose metro filter prunes partitions (verify via
    .explain → PartitionFilters)."""
    return spark.read.parquet(path).filter(F.col("metro") == metro)


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str, n: int = 8) -> None:
    """Bucketed managed table: joins/aggs on bucket_col co-locate without
    a shuffle (needs a warehouse dir; session default ./spark-warehouse)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def csv_roundtrip(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """CSV egress + schema'd ingest (no inference): the external-signal
    ingestion pattern of the reference, engine-side."""
    df.write.mode("overwrite").option("header", True).csv(path)
    schema = df.schema
    return spark.read.schema(schema).option("header", True).csv(path)


def clean_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """NaN/null guard (P10/P11 — reference `notebooks/10_feature_
    engineering.py:355-361`): NaN → null → 0.0, one pass."""
    for c in cols:
        df = df.withColumn(
            c,
            F.when(F.isnan(F.col(c)) | F.col(c).isNull(), F.lit(0.0)).otherwise(
                F.col(c)
            ),
        )
    return df
