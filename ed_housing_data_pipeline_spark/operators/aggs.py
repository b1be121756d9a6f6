"""Aggregation operators (SURVEY.md §2.4).

Spark's hash aggregate already does map-side partial aggregation +
final merge after a shuffle on the group keys — the distributed
version of the reference's single-node ``groupby().agg()``
(silver_to_gold.py:63-70). These helpers pin down the semantics that
differ between pandas/DuckDB and Spark:

- NULL group keys: pandas drops them, Spark keeps a NULL group. The
  ``drop_null_keys`` flag makes the choice explicit per call.
- ``avg``/``countDistinct`` ignore NULLs in both systems (safe).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame


def grouped_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
    drop_null_keys: bool = False,
) -> DataFrame:
    """Group by ``keys`` computing named aggregates.

    ``aggs`` maps output name → aggregate Column (already aliased here,
    so query and oracle column names can never drift apart).
    """
    if drop_null_keys:
        df = df.na.drop(subset=list(keys))
    return df.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )


def salted_grouped_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Mapping[str, Column],
    final_aggs: Mapping[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for SKEWED group keys: salt → partial agg
    on (keys, salt) → final agg on keys.

    A hot key (one giant group) serializes on a single reducer in a
    plain groupBy; salting splits it across ``salt_buckets`` reducers
    first, then merges the partials. Only algebraic aggregates compose:
    ``partial_aggs`` produce per-bucket values; ``final_aggs`` combine
    them, referencing the partial output names (e.g. partial ``sum(v)``
    → final ``sum(partial)``; avg must be expressed sum/count).

    AQE's skew handling covers skewed JOINS; skewed aggregation still
    benefits from explicit salting when one key dominates.
    """
    from pyspark.sql import functions as F

    salted = df.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[e.alias(n) for n, e in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[e.alias(n) for n, e in final_aggs.items()]
    )
