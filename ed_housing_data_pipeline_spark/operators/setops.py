"""Set operators (SURVEY.md §2.8 — absent in the reference, included
as near-free engine surface with oracle-checkable semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_by_name(a: DataFrame, b: DataFrame, allow_missing: bool = False) -> DataFrame:
    """UNION ALL matched by column name (not position)."""
    return a.unionByName(b, allowMissingColumns=allow_missing)


def intersect_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)
