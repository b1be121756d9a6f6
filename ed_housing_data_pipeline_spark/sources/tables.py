"""Loaders for the driver's synthetic lake tables (TESTDATA.md).

One parquet file per table under ``<sf_dir>/<name>.parquet``.
``spark.read.parquet`` gives us the vectorized columnar scan with
predicate pushdown and column pruning for free — all downstream
operators should let Catalyst push filters/projections into these
scans rather than materializing intermediates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Memoized analyzed relations per (application, session, sf_dir, table):
# ``spark.read.parquet`` pays a driver-side file listing + parquet
# footer schema read on EVERY call — pure plan-build latency when each
# query rebuilds its plan per run (the bench/harness pattern). The memo
# holds only the analyzed logical relation (no data is cached) and the
# lake inputs are immutable for a given sf_dir, so reuse is exact.
# The SESSION is part of the key because a DataFrame executes with the
# session state (confs) it was created under — serving session A's
# relation to session B would silently run B's query with A's confs.
# ``id(spark)`` cannot alias a dead session: the memoized DataFrames
# keep their session object alive, so its id is never reused while the
# entry exists. Entries from other applications are pruned on miss,
# bounding the dict across session restarts; within one application it
# holds at most (#sessions × #tables) plan objects.
_TABLE_MEMO: dict[tuple[str, int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    app = spark.sparkContext.applicationId
    key = (app, id(spark), sf_dir, name)
    df = _TABLE_MEMO.get(key)
    if df is None:
        for k in list(_TABLE_MEMO):
            if k[0] != app:
                del _TABLE_MEMO[k]
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _TABLE_MEMO[key] = df
    return df


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to a session-TZ µs TIMESTAMP,
    whatever physical shape the lake stored it in:

    - INT64 TIMESTAMP(NANOS) read under
      ``spark.sql.legacy.parquet.nanosAsLong=true`` → bigint ns →
      ``timestamp_micros(ts DIV 1000)`` (the same ns→µs truncation
      DuckDB applies reading TIMESTAMP_NS, so oracles agree exactly);
    - TIMESTAMP_NTZ (plain µs parquet timestamp, isAdjustedToUTC=false,
      the round-5 testdata shape) → cast to TIMESTAMP — an identity on
      the instant under the engine's pinned UTC session timezone;
    - TIMESTAMP → already canonical.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table with ``ts`` as a proper µs timestamp
    (see :func:`normalize_event_ts` for the accepted physical shapes)."""
    from ed_housing_data_pipeline_spark.session import ensure_runtime_confs  # noqa: PLC0415

    ensure_runtime_confs(spark)
    return normalize_event_ts(load_table(spark, sf_dir, "events"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every lake table as a temp view for ``spark.sql`` use
    (mirrors the reference's DuckDB ``CREATE VIEW gold AS read_parquet``
    pattern — duckdb_viewer/view_gold.py:25-28). Sets the engine's
    runtime confs first: the events table is unreadable without the
    nanos conf on a vanilla session."""
    from ed_housing_data_pipeline_spark.session import ensure_runtime_confs  # noqa: PLC0415

    ensure_runtime_confs(spark)
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
