"""Global sort / limit / top-k (SURVEY.md §2.7).

``orderBy(...).limit(k)`` compiles to ``TakeOrderedAndProject`` — a
true distributed top-k (per-partition heap + driver merge of k rows),
NOT a global sort. That is the plan shape every reference analysis
query needs (``ORDER BY … LIMIT 1/20/50``,
duckdb_viewer/view_gold.py:41-113) and it survives 100 TB inputs.

Null placement is explicit because DuckDB defaults to NULLS LAST on
ASC while Spark defaults to nulls first (SURVEY.md §2.7 note).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, ordering: Sequence[Column], k: int) -> DataFrame:
    """Top-k by an explicit total order. Pass tie-breaker columns in
    ``ordering`` — under a value-hashing oracle, ties must be broken
    deterministically."""
    return df.orderBy(*ordering).limit(k)


def head(df: DataFrame, k: int) -> DataFrame:
    """Unordered LIMIT (CollectLimitExec — no full scan)."""
    return df.limit(k)
