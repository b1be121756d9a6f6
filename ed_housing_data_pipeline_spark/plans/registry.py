"""Named-query registry: every engine capability exposed as a
(spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) an
ANSI-SQL oracle twin for DuckDB differential testing.

This generalizes the reference's own correctness tooling — a DuckDB
viewer with hand-checked queries (duckdb_viewer/view_gold.py:37-118) —
into an automated oracle harness (SURVEY.md §5).

Conventions that keep the hash-compare honest:
- every computed column is aliased identically in Spark and SQL;
- floating aggregates are rounded on BOTH sides (sums of doubles are
  order-nondeterministic at the ulp level under distributed partial
  aggregation — rounding makes the hash stable without weakening the
  check materially);
- integer-sum oracles are cast to BIGINT (DuckDB widens to HUGEINT);
- raw timestamps are compared at epoch-millisecond precision
  (testdata ts is µs-aligned; DuckDB holds ns, Spark µs);
- LIMIT queries always carry a deterministic total order (unique
  tie-break column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class EngineQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    doc: str = ""


QUERIES: dict[str, EngineQuery] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = EngineQuery(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (registration side-effect)."""
    global _LOADED
    if _LOADED:
        return
    from ed_housing_data_pipeline_spark.plans import (  # noqa: F401, PLC0415
        queries_core,
        queries_events,
        queries_llm,
        queries_streaming,
    )

    _LOADED = True


def query_map() -> dict[str, QueryFn]:
    _load_all()
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
