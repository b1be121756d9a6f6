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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table with ``ts`` as a proper µs timestamp.

    The testdata stores ``ts`` as INT64 TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` (set by
    :func:`session.ensure_runtime_confs`) it arrives as bigint
    nanoseconds. ``timestamp_micros(ts DIV 1000)`` truncates ns→µs —
    the same truncation DuckDB applies when it reads TIMESTAMP_NS into
    its µs TIMESTAMP, so oracle comparisons agree exactly.
    """
    from ed_housing_data_pipeline_spark.session import ensure_runtime_confs  # noqa: PLC0415

    ensure_runtime_confs(spark)
    df = load_table(spark, sf_dir, "events")
    return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))


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
