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
