"""Constraint audit (operators/expectations): rule semantics on known
dirty data, NULL handling, empty input, and the shared-scan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from ed_housing_data_pipeline_spark.operators import expectations as ex

ROWS = [
    Row(k=1, fk=10, v=5.0),
    Row(k=2, fk=10, v=-1.0),   # range violation
    Row(k=2, fk=20, v=None),   # dup key + null v
    Row(k=3, fk=99, v=2.0),    # orphan fk
    Row(k=None, fk=None, v=0.0),  # null key group; 0 counts as <= 0
    Row(k=None, fk=10, v=1.0),    # second null key → a "duplicate"
]
SCHEMA = "k bigint, fk bigint, v double"


def _dim(spark):
    return spark.createDataFrame([Row(d=10), Row(d=20)], "d bigint")


def _audit(spark, rows=ROWS):
    df = spark.createDataFrame(rows, SCHEMA)
    out = ex.constraint_audit(
        df,
        [
            ex.RowCheck("v_not_null", F.col("v").isNull()),
            ex.RowCheck("v_positive", F.col("v") <= 0),
            ex.UniqueCheck("k_unique", ["k"]),
            ex.ForeignKeyCheck("fk_in_dim", ["fk"], dim=_dim(spark), dim_cols=["d"]),
        ],
    )
    return {r.rule: (r.n_violations, r.n_checked) for r in out.collect()}


def test_rule_counts_on_dirty_data(spark):
    got = _audit(spark)
    assert got["v_not_null"] == (1, 6)
    # v <= 0: -1.0 and 0.0 violate; NULL v is NOT a range violation
    assert got["v_positive"] == (2, 6)
    # dup groups: k=2 ×2 (1 extra) and k=NULL ×2 (1 extra)
    assert got["k_unique"] == (2, 6)
    # orphans: fk=99 and fk=NULL (never matches, SQL semantics)
    assert got["fk_in_dim"] == (2, 6)


def test_clean_data_all_zero(spark):
    rows = [Row(k=i, fk=10, v=float(i + 1)) for i in range(5)]
    got = _audit(spark, rows)
    assert all(v == (0, 5) for v in got.values()), got


def test_empty_input(spark):
    got = _audit(spark, [])
    assert got["v_not_null"] == (0, 0)
    assert got["v_positive"] == (0, 0)
    assert got["k_unique"] == (0, 0)
    assert got["fk_in_dim"] == (0, 0)


def test_no_checks_raises(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="no checks"):
        ex.constraint_audit(df, [])


def test_row_checks_share_one_aggregation(spark):
    """All row rules must fold into a single scan+agg (the 100 TB
    contract: N rules ≠ N passes)."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = ex.constraint_audit(
        df,
        [
            ex.RowCheck("a", F.col("v").isNull()),
            ex.RowCheck("b", F.col("v") <= 0),
            ex.RowCheck("c", F.col("k") < 0),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1, plan