"""Join operators (SURVEY.md §2.3).

The reference does two joins (left equi-join on lea_id,
silver_to_gold.py:73-77; inner join on normalized county,
silver_to_gold.py:80-84) plus a keep-first dedup before the second
(silver_to_gold.py:81). Generalized here with explicit scale policy:

- ``broadcast=True`` marks a bounded dimension side — at 100 TB the
  fact side never shuffles for these joins.
- Un-broadcast joins rely on AQE (skew-join splitting + runtime
  strategy switch) configured in session.py.
- ``dedup_one_per_key`` is deterministic (row_number over an explicit
  order), unlike ``dropDuplicates`` whose survivor is partition-order
  dependent — nondeterminism is unacceptable under a hashing oracle
  and in reproducible pipelines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """EXISTS — rows of ``left`` with a match; no right columns, no fanout."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — rows of ``left`` without a match."""
    return left.join(right, on=on, how="left_anti")


def dedup_one_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per key, chosen by an explicit total order.

    Deterministic replacement for the reference's
    ``drop_duplicates(subset=["county"])`` keep-first-in-file-order
    (silver_to_gold.py:81). One shuffle on ``keys``; the window scan is
    partition-local after that.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
