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
        # Takes effect when this builder launches the JVM (plain-python
        # local runs); a cluster's spark-submit sets its own.
        .config("spark.driver.memory", os.getenv("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    if not os.getenv("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cores}]")
    spark = builder.getOrCreate()
    ensure_runtime_confs(spark)
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Set the runtime-settable confs the engine's semantics depend on.

    Called by every registered query so the engine behaves identically
    under an externally-created SparkSession (the driver harness builds
    its own). All three are runtime-settable (verified on PySpark 4.1):

    - ``nanosAsLong``: the testdata ``events.parquet`` stores ts as
      INT64 TIMESTAMP(NANOS), which PySpark 4 refuses to read otherwise
      ([PARQUET_TYPE_ILLEGAL]); with the flag it reads as bigint ns and
      :func:`sources.tables.events_with_ts` converts to timestamp.
    - UTC session timezone: oracle (DuckDB) timestamps are naive-UTC.
    - AQE on: runtime shuffle coalescing / skew-join handling.

    ANSI mode is deliberately left at the session default: all engine
    expressions are ANSI-safe (``try_cast``, ``nullif`` guards) so
    results are identical either way.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


def count_spark_jobs(spark: SparkSession, fn) -> int:
    """Total Spark jobs submitted while ``fn()`` runs (job-group
    probe) — the mechanical pin behind 'this verb is driver-side
    metadata only' and 'this wave is ONE write job' claims (the
    zero-job suite pins and scripts/plan_audit.py's lifecycle table
    share this one implementation)."""
    import uuid

    sc = spark.sparkContext
    group = f"probe-{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, "job-count probe")
    try:
        fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return len(sc.statusTracker().getJobIdsForGroup(group))
