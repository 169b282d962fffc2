"""SparkSession factory tuned for the engine.

Local-mode testing posture: one JVM, N threads. Cluster posture: the same
configs apply; AQE + adaptive skew-join are the runtime safety net for the
urban-core hex skew the salting helpers (operators/skew.py) address
explicitly.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import config


def get_spark(
    app_name: str = "geospatial_store_siting_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or config.DEFAULT_CPUS
    shuffle = shuffle_partitions or max(cores, config.SHUFFLE_PARTITIONS)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local-mode split sizing: bench corpora are O(1 GB) in ~30 MB
        # files, and the default 128 MB maxPartitionBytes packs them into
        # ~11 scan tasks — local[16]+ leaves cores idle on every corpus
        # scan (measured in BENCH/profile_ingest.py).  32 MB keeps one
        # task per file here; a real cluster submit (conf on spark-submit)
        # overrides this back up for 100-TB inputs with large files.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
