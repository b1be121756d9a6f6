"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``ed_housing_data_pipeline_spark``; this file
just exposes the registry (plans/registry.py) through the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the ranked-CTE →
    rank-sum → top-1 analysis (SURVEY.md §2.6 W3/E8, mirroring the
    reference's best-overall-county query at
    duckdb_viewer/view_gold.py:94-113)."""
    from ed_housing_data_pipeline_spark.plans.queries_core import q_rank_sum_top1

    return q_rank_sum_top1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    LLM-pipeline extension surface). Each callable takes
    (spark, sf_dir) and returns a DataFrame."""
    from ed_housing_data_pipeline_spark.plans.registry import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names
    and compatible types — see plans/registry.py conventions)."""
    from ed_housing_data_pipeline_spark.plans.registry import oracle_sql_map

    return oracle_sql_map()
