"""Unit tests for operators/{windows,topk}.py — null-ordering parity
(DuckDB NULLS LAST vs Spark nulls-first default) and top-k plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.operators import topk, windows
from tests.conftest import rows


def _scores(spark):
    return spark.createDataFrame(
        [("a", 10.0), ("b", None), ("c", 30.0), ("d", 20.0)], "id string, v double"
    )


def test_rank_asc_nulls_last(spark):
    out = windows.ranked(_scores(spark), {"r": windows.order_col("v", ascending=True)})
    assert rows(out, "id", "r") == [("a", 1), ("b", 4), ("c", 3), ("d", 2)]


def test_rank_desc_nulls_last(spark):
    out = windows.ranked(_scores(spark), {"r": windows.order_col("v", ascending=False)})
    assert rows(out, "id", "r") == [("a", 3), ("b", 4), ("c", 1), ("d", 2)]


def test_rank_ties(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 1.0), ("c", 2.0)], "id string, v double")
    out = windows.ranked(df, {"r": windows.order_col("v")})
    assert rows(out, "id", "r") == [("a", 1), ("b", 1), ("c", 3)]


def test_dense_rank_and_row_number_methods(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 1.0), ("c", 2.0)], "id string, v double")
    dr = windows.ranked(df, {"r": windows.order_col("v")}, method="dense_rank")
    assert rows(dr, "id", "r") == [("a", 1), ("b", 1), ("c", 2)]
    rn = windows.ranked(df, {"r": windows.order_col("v")}, method="row_number")
    assert sorted(r["r"] for r in rn.collect()) == [1, 2, 3]


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g1", i * 1.0) for i in range(5)] + [("g2", 100.0)], "g string, v double"
    )
    out = windows.top_k_per_group(
        df, ["g"], [F.col("v").desc_nulls_last()], k=2, rank_col="rn"
    )
    assert rows(out) == [("g1", 3.0, 2), ("g1", 4.0, 1), ("g2", 100.0, 1)]
    no_rank = windows.top_k_per_group(df, ["g"], [F.col("v").desc_nulls_last()], k=2)
    assert "rn" not in no_rank.columns and "_rn" not in no_rank.columns


def test_top_k_nulls_last_and_plan(spark):
    out = topk.top_k(
        _scores(spark), [F.col("v").desc_nulls_last(), F.col("id").asc()], k=2
    )
    assert rows(out, "id") == [("c",), ("d",)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # true distributed top-k, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_head_limit(spark):
    assert topk.head(_scores(spark), 2).count() == 2
