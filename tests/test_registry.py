"""Contract tests for the query registry / driver surface."""

from __future__ import annotations

from ed_housing_data_pipeline_spark.plans.registry import oracle_sql_map, query_map


def test_registry_complete_and_paired():
    q, o = query_map(), oracle_sql_map()
    assert len(q) >= 40
    assert set(o) <= set(q), "orphan oracles"
    missing = set(q) - set(o)
    assert not missing, f"queries without oracle: {missing}"
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_entry_contract_importable():
    import __spark_entry__ as e

    assert callable(e.entry)
    assert set(e.queries()) == set(query_map())
    assert set(e.oracle_sql()) == set(oracle_sql_map())
