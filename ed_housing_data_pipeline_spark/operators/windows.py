"""Window operators (SURVEY.md §2.6).

The reference's analysis layer ranks counties with unpartitioned
``rank() OVER (ORDER BY … NULLS LAST)`` windows
(duckdb_viewer/view_gold.py:94-113). Spark's ASC default is NULLS
FIRST (DuckDB's is NULLS LAST), so every helper takes the null
placement explicitly.

Scale note: an unpartitioned window is a single-partition exchange —
fine for dimension-sized inputs (the reference ranks ≤200 counties),
wrong for a fact table. ``ranked`` warns by contract: callers ranking
big data must pass ``partition_by``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def order_col(name: str, ascending: bool = True, nulls_last: bool = True) -> Column:
    c = F.col(name)
    if ascending:
        return c.asc_nulls_last() if nulls_last else c.asc_nulls_first()
    return c.desc_nulls_last() if nulls_last else c.desc_nulls_first()


def ranked(
    df: DataFrame,
    rank_cols: dict[str, Column],
    partition_by: Sequence[str] = (),
    method: str = "rank",
) -> DataFrame:
    """Attach one or more rank columns.

    ``rank_cols`` maps output name → ordering Column (from
    :func:`order_col`). ``method`` ∈ {rank, dense_rank, row_number}.
    """
    fn = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number}[
        method
    ]
    out = df
    for name, ordering in rank_cols.items():
        w = Window.partitionBy(*partition_by).orderBy(ordering)
        out = out.withColumn(name, fn().over(w))
    return out


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    ordering: Sequence[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Classic top-k-per-group: row_number ≤ k inside each partition.

    Distributed-friendly: one shuffle on the group key, then a
    partition-local sort; no global ordering required. Pass
    ``rank_col`` to keep the within-group position (bigint) in the
    output instead of dropping it.
    """
    w = Window.partitionBy(*partition_by).orderBy(*ordering)
    name = rank_col or "_rn"
    out = df.withColumn(name, F.row_number().over(w).cast("bigint")).filter(
        F.col(name) <= k
    )
    return out if rank_col else out.drop(name)
