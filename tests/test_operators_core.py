"""Unit tests for operators/{clean,joins,aggs,setops}.py — the
relational core, including plan-shape assertions (broadcast joins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.operators import aggs, clean, joins, setops
from tests.conftest import rows


# ----------------------------------------------------------------- clean
def test_project_rename_handles_spaces(spark):
    df = spark.createDataFrame([(1, "x")], "`School Age Total` int, b string")
    out = clean.project_rename(df, {"School Age Total": "total", "b": "name"})
    assert out.columns == ["total", "name"]
    assert out.first()["total"] == 1


def test_coerce_numeric_multiple_columns(spark):
    df = spark.createDataFrame([("1", "(X)"), ("2.5", "7")], "a string, b string")
    out = clean.coerce_numeric(df, ["a", "b"])
    assert rows(out) == [(1.0, None), (2.5, 7.0)]


def test_drop_null_keys(spark):
    df = spark.createDataFrame([(1, "a"), (None, "b"), (2, None)], "k int, v string")
    assert rows(clean.drop_null_keys(df, ["k"])) == [(1, "a"), (2, None)]
    assert rows(clean.drop_null_keys(df, ["k", "v"])) == [(1, "a")]


# ----------------------------------------------------------------- joins
def _dims(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, lv string"
    )
    right = spark.createDataFrame([(1, "R1"), (2, "R2")], "k int, rv string")
    return left, right


def test_left_join_null_pattern(spark):
    left, right = _dims(spark)
    out = joins.equi_join(left, right, on="k", how="left")
    assert rows(out, "k", "rv") == [(1, "R1"), (2, "R2"), (3, None)]


def test_inner_join_drops_unmatched(spark):
    left, right = _dims(spark)
    assert rows(joins.equi_join(left, right, on="k"), "k") == [(1,), (2,)]


def test_broadcast_join_plan(spark):
    left, right = _dims(spark)
    out = joins.equi_join(left, right, on="k", broadcast_right=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_semi_anti_join(spark):
    left, right = _dims(spark)
    assert rows(joins.semi_join(left, right, on="k"), "k") == [(1,), (2,)]
    assert rows(joins.anti_join(left, right, on="k"), "k") == [(3,)]


def test_dedup_one_per_key_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 3, "z"), ("a", 1, "y"), ("a", 1, "x"), ("b", 9, "w")],
        "k string, n int, s string",
    )
    out = joins.dedup_one_per_key(
        df, keys=["k"], order_by=[F.col("n").asc(), F.col("s").asc()]
    )
    # survivor = lowest n, then lowest s — fully deterministic
    assert rows(out) == [("a", 1, "x"), ("b", 9, "w")]
    assert "_rn" not in out.columns


# ------------------------------------------------------------------ aggs
def test_grouped_agg_null_key_policy(spark):
    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), ("a", 3.0)], "k string, v double"
    )
    spec = {"total": F.sum("v"), "n": F.count(F.lit(1))}
    kept = aggs.grouped_agg(df, ["k"], spec)
    assert rows(kept) == [(None, 2.0, 1), ("a", 4.0, 2)]
    # pandas-parity mode: NaN-keyed rows silently dropped (SURVEY §2.4 A1)
    dropped = aggs.grouped_agg(df, ["k"], spec, drop_null_keys=True)
    assert rows(dropped) == [("a", 4.0, 2)]


def test_grouped_agg_countdistinct_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a", "s1"), ("a", "s1"), ("a", None), ("a", "s2")], "k string, s string"
    )
    out = aggs.grouped_agg(df, ["k"], {"nuniq": F.countDistinct("s")})
    assert rows(out) == [("a", 2)]


# ---------------------------------------------------------------- setops
def test_union_by_name_reorders_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = spark.createDataFrame([("y", 2)], "v string, id int")
    assert rows(setops.union_by_name(a, b)) == [(1, "x"), (2, "y")]


def test_intersect_distinct_and_except_all(spark):
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "x int")
    b = spark.createDataFrame([(1,), (3,), (3,)], "x int")
    assert rows(setops.intersect_distinct(a, b)) == [(1,), (3,)]
    # EXCEPT ALL is multiset subtraction: {1,1,2,3} - {1,3,3} = {1,2}
    assert rows(setops.except_all(a, b)) == [(1,), (2,)]


# ------------------------------------------------------------- asof join
def test_asof_join_backward(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, "u", at(5)), (2, "u", at(10)), (3, "u", at(0)), (4, "v", at(7))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", at(1), 10.0), ("u", at(5), 20.0), ("u", at(9), 30.0)],
        "k string, rts timestamp, px double",
    )
    out = joins.asof_join(left, right, on="k", ts_left="ts", ts_right="rts",
                          value_cols=["px"])
    got = {r["id"]: r["px"] for r in out.collect()}
    # id=1 at 10:05 -> tie with right at 10:05 -> 20.0 (backward, ties match)
    # id=2 at 10:10 -> latest right 10:09 -> 30.0
    # id=3 at 10:00 -> no right yet -> NULL
    # id=4 key v    -> no rights for key -> NULL
    assert got == {1: 20.0, 2: 30.0, 3: None, 4: None}
    assert out.count() == 4  # left rows preserved exactly


def test_asof_join_tolerance(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, "u", t0 + dt.timedelta(seconds=100))], "id int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", t0, 1.0)], "k string, rts timestamp, px double"
    )
    ok = joins.asof_join(left, right, "k", "ts", "rts", ["px"], tolerance_sec=200)
    assert ok.first()["px"] == 1.0
    stale = joins.asof_join(left, right, "k", "ts", "rts", ["px"], tolerance_sec=50)
    assert stale.first()["px"] is None


def test_salted_grouped_agg_matches_plain(spark):
    import random

    random.seed(1)
    data = [("hot", float(i % 7)) for i in range(500)] + [
        (f"k{i % 5}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(data, "k string, v double")
    plain = aggs.grouped_agg(
        df, ["k"], {"total": F.sum("v"), "n": F.count(F.lit(1))}
    )
    salted = aggs.salted_grouped_agg(
        df,
        ["k"],
        partial_aggs={"ps": F.sum("v"), "pn": F.count(F.lit(1))},
        final_aggs={"total": F.sum("ps"), "n": F.sum("pn")},
        salt_buckets=8,
    )
    assert rows(plain) == rows(salted)


def test_asof_join_carries_null_values_faithfully(spark):
    """A matched right row whose value is NULL must be carried as NULL,
    not skipped in favor of an older non-null row (merge_asof / SQL
    ASOF semantics)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame([(1, "u", at(10))], "id int, k string, ts timestamp")
    right = spark.createDataFrame(
        [("u", at(1), 5.0, "a"), ("u", at(5), None, "b")],
        "k string, rts timestamp, px double, tag string",
    )
    out = joins.asof_join(left, right, "k", "ts", "rts", ["px", "tag"]).first()
    assert out["px"] is None  # most recent row's NULL, not the older 5.0
    assert out["tag"] == "b"  # both values from the SAME right row


def test_asof_join_rejects_value_col_collision(spark):
    import datetime as dt
    import pytest

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, "u", t0, 0.0)], "id int, k string, ts timestamp, px double")
    right = spark.createDataFrame([("u", t0, 1.0)], "k string, rts timestamp, px double")
    with pytest.raises(ValueError, match="px"):
        joins.asof_join(left, right, "k", "ts", "rts", ["px"])


def test_range_join_binned(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, at(100)), (2, at(1000))], "lid int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(10, at(95)), (11, at(100)), (12, at(150)), (13, at(161)), (14, at(1050))],
        "rid int, rts timestamp",
    )
    # rights within [lts, lts + 60s]; 150 vs left@100 crosses a bin edge
    out = joins.range_join_binned(left, right, "lts", "rts", 0, 60)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert got == [(1, 11), (1, 12), (2, 14)]  # 95 too early, 161 too late
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_range_join_rejects_column_collision(spark):
    import datetime as dt
    import pytest

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, "x", t0)], "id int, tag string, ts timestamp")
    right = spark.createDataFrame([(2, "y", t0)], "id int, tag string, rts timestamp")
    with pytest.raises(ValueError, match="both"):
        joins.range_join_binned(left, right, "ts", "rts", 0, 60)


def test_hll_approx_distinct_bound_and_merge(spark):
    """Distributed cardinality sketching — the 100 TB COUNT(DISTINCT)
    replacement: (a) approx_count_distinct lands within its rsd bound,
    (b) per-group HLL sketches MERGE (hll_union_agg) to the same
    estimate as sketching the whole column — the property that lets a
    pipeline keep per-partition/per-day sketches and union them later
    instead of rescanning."""
    from pyspark.sql import functions as F

    df = spark.range(0, 20000).select(
        (F.col("id") % 5000).alias("k"), (F.col("id") % 7).alias("g")
    )
    exact = 5000
    approx = df.agg(F.approx_count_distinct("k", rsd=0.02).alias("a")).first()["a"]
    assert abs(approx - exact) / exact < 0.08  # few sigma of rsd=2%
    whole = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("k")).alias("e")
    ).first()["e"]
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("k").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .first()["e"]
    )
    assert merged == whole  # sketch union is exact w.r.t. the sketch
    assert abs(whole - exact) / exact < 0.08
