"""SparkSession factory with scale-minded defaults.

Local testing runs on ``local[N]``; the same config block is what we
would ship to a 1000-executor cluster (AQE on, skew-join handling,
broadcast threshold, UTC timezone pinned for oracle parity).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_cores() -> int:
    env = os.getenv("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def get_spark(app_name: str = "ed_housing_data_pipeline_spark") -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Config notes for scale:
    - AQE enabled: runtime shuffle-partition coalescing, join-strategy
      switching, and skew-join splitting — essential at 100 TB where
      static planning guesses wrong.
    - ``spark.sql.shuffle.partitions`` defaults to ~cores locally; on a
    real cluster AQE coalesces from a deliberately high initial number.
    - Arrow enabled for the (rare) pandas-UDF paths.
    - UTC session timezone so timestamp semantics match the DuckDB
      oracle (UTC-naive) and are portable across clusters.
    """
    cores = _local_cores()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.getenv("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if not os.getenv("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cores}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
