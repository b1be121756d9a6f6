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


def test_sharded_running_sum_matches_naive_window(spark):
    """Exactness of the two-pass prefix-sum decomposition: sharded
    result equals the plain one-window running sum, including a
    source whose ids straddle many shard boundaries and a tiny source
    that fits in one shard."""
    from pyspark.sql import Window

    data = [(i, "big" if i < 900 else "small", (i * 7) % 13 + 1) for i in range(1000)]
    df = spark.createDataFrame(data, "doc_id long, source string, n long")
    naive_w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = {
        (r["source"], r["doc_id"]): r["cum"]
        for r in df.withColumn("cum", F.sum("n").over(naive_w)).collect()
    }
    sharded = windows.sharded_running_sum(
        df, "n", ["source"], "doc_id", shard=F.floor(F.col("doc_id") / 64), out_col="cum"
    )
    got = {(r["source"], r["doc_id"]): r["cum"] for r in sharded.collect()}
    assert got == naive


def test_sharded_running_sum_tied_order_keys_exact(spark):
    """Regression (ADVICE r4): duplicated order_by values within a
    (partition, shard) must not understate the shard total. The old
    max_by(local_cum, order_by) picked an arbitrary tied row whose
    running sum could exclude its tied siblings, corrupting every later
    shard's offset; shard totals are now SUM(value) and tie-safe.

    With ties the within-tie running sum is itself order-ambiguous, so
    the exact assertion is on per-shard BOUNDARIES: the cum at each
    shard's last row (any tied order) must equal the true prefix total,
    and the multiset of cums inside a tie group is a contiguous run.
    """
    # 4 rows per order value, 8 order values per shard of span 8 → every
    # shard's max order_by is a 4-way tie.
    data = [(v, "s", 1) for v in range(64) for _ in range(4)]
    df = spark.createDataFrame(data, "ord long, source string, n long")
    out = windows.sharded_running_sum(
        df, "n", ["source"], "ord", shard=F.floor(F.col("ord") / 8), out_col="cum"
    ).collect()
    # global exactness independent of tie order: the multiset of cums
    # must be exactly 1..256 (each row consumes one unit)
    assert sorted(r["cum"] for r in out) == list(range(1, 257))
    # and each order value's cums occupy its true contiguous range
    by_ord: dict[int, list[int]] = {}
    for r in out:
        by_ord.setdefault(r["ord"], []).append(r["cum"])
    for v, cums in by_ord.items():
        assert sorted(cums) == list(range(4 * v + 1, 4 * v + 5))


def test_sharded_running_sum_skewed_source_parallelizes(spark):
    """The giant-source guard: with one skewed source the main window
    must partition on (source, shard) — never a single task per
    source. The executed plan's window spec carries the shard column."""
    df = spark.createDataFrame(
        [(i, "onlysource", 1) for i in range(5000)], "doc_id long, source string, n long"
    )
    out = windows.sharded_running_sum(
        df, "n", ["source"], "doc_id", shard=F.floor(F.col("doc_id") / 256), out_col="cum"
    )
    # correctness on the skewed source: cum is 1..5000 in doc_id order
    assert sorted(r["cum"] for r in out.collect()) == list(range(1, 5001))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the heavy (per-row) window is keyed by the shard column, so the
    # 5000-row source spreads over ~20 hash partitions instead of 1
    assert "_prefix_shard" in plan


def _rank_fixture(spark, seed_rows=400):
    """Values with heavy ties (mod 17), NULLs sprinkled in, plus a
    unique id so results compare positionally."""
    data = [
        (i, None if i % 29 == 0 else float((i * 7) % 17)) for i in range(seed_rows)
    ]
    return spark.createDataFrame(data, "id long, v double")


def _naive_global_rank(spark, df, ascending, method="rank"):
    from pyspark.sql import Window

    oc = windows.order_col("v", ascending=ascending)
    fn = {"rank": F.rank, "row_number": F.row_number}[method]
    return df.withColumn("rnk", fn().over(Window.orderBy(oc)))


def test_global_rank_quantile_path_matches_naive(spark):
    """Numeric string key → quantile_shard path: exact vs the
    single-partition window, ties and NULLs included, both orders."""
    df = _rank_fixture(spark)
    for ascending in (True, False):
        got = rows(
            windows.global_rank(df, "v", ascending=ascending), "id", "rnk"
        )
        want = rows(_naive_global_rank(spark, df, ascending), "id", "rnk")
        assert got == want, f"ascending={ascending}"


def test_global_rank_row_number_total_order(spark):
    """row_number yields a permutation of 1..n consistent with the
    global order (ties may permute, so check order of v, not ids)."""
    df = _rank_fixture(spark, 200)
    out = windows.global_rank(df, "v", ascending=True, method="row_number").collect()
    assert sorted(r["rnk"] for r in out) == list(range(1, 201))
    by_rnk = sorted(out, key=lambda r: r["rnk"])
    vals = [r["v"] for r in by_rnk]
    non_null = [v for v in vals if v is not None]
    assert non_null == sorted(non_null)
    assert all(v is None for v in vals[len(non_null):])  # NULLS LAST


def test_global_rank_range_fallback_path(spark):
    """Column-expression key (non-numeric-string) → repartitionByRange
    fallback; still exact."""
    df = _rank_fixture(spark)
    got = rows(
        windows.global_rank(df, F.col("v") * 2, ascending=True), "id", "rnk"
    )
    want = rows(_naive_global_rank(spark, df, True), "id", "rnk")
    assert got == want


def test_global_rank_explicit_shard(spark):
    df = _rank_fixture(spark)
    shard = windows.monotone_value_shard("v", span=3.0, ascending=False)
    got = rows(
        windows.global_rank(df, "v", ascending=False, shard=shard), "id", "rnk"
    )
    want = rows(_naive_global_rank(spark, df, False), "id", "rnk")
    assert got == want


def test_global_rank_degenerate_inputs(spark):
    # all-NULL key and single-value key: quantile boundaries are empty
    all_null = spark.createDataFrame(
        [(1, None), (2, None)], "id long, v double"
    )
    assert sorted(
        r["rnk"] for r in windows.global_rank(all_null, "v").collect()
    ) == [1, 1]
    one_val = spark.createDataFrame([(1, 5.0), (2, 5.0), (3, 5.0)], "id long, v double")
    assert sorted(
        r["rnk"] for r in windows.global_rank(one_val, "v").collect()
    ) == [1, 1, 1]


def test_global_rank_no_single_partition_window_over_input(spark):
    """The whole point: the windowed full-table pass must be
    partitioned. Only the bounded shard-count frame (post-aggregate)
    may use an unpartitioned window."""
    df = _rank_fixture(spark)
    good = windows.global_rank(df, "v")._jdf.queryExecution().sparkPlan()
    assert not _unbounded_global_windows(good)
    # and the walker itself must catch the naive shape (not vacuous)
    naive = (
        windows.ranked(df, {"r": windows.order_col("v")})
        ._jdf.queryExecution()
        .sparkPlan()
    )
    assert _unbounded_global_windows(naive)


def _unbounded_global_windows(plan) -> list[str]:
    """WindowExec nodes with an empty partitionSpec whose subtree has
    no Aggregate (i.e. unbounded input straight through one task).
    Pass ``queryExecution().sparkPlan()`` — the post-AQE
    ``executedPlan()`` wraps the tree in AdaptiveSparkPlanExec, whose
    ``children()`` is empty, which would make the walk vacuous."""
    out = []

    def subtree_has_agg(node) -> bool:
        if "Aggregate" in node.getClass().getSimpleName():
            return True
        return any(
            subtree_has_agg(node.children().apply(i))
            for i in range(node.children().size())
        )

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "WindowExec" and node.partitionSpec().size() == 0:
            if not subtree_has_agg(node):
                out.append(node.toString().splitlines()[0])
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(plan)
    return out


def test_global_ntile_matches_naive(spark):
    """Closed-form tile arithmetic vs Spark's ntile, across tile counts
    that do and don't divide n evenly, with ties broken by id."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, float((i * 3) % 5)) for i in range(103)], "id long, v double"
    )
    for k in (2, 4, 7, 103, 200):
        naive = df.withColumn(
            "tile",
            F.ntile(k)
            .over(Window.orderBy(F.col("v").asc(), F.col("id").asc()))
            .cast("bigint"),
        )
        got = windows.global_ntile(
            df, "v", n_tiles=k, extra_order=[F.col("id").asc()]
        )
        assert rows(got, "id", "tile") == rows(naive, "id", "tile"), k


def test_global_ntile_plan_has_no_unpartitioned_window(spark):
    df = spark.createDataFrame(
        [(i, float(i % 9)) for i in range(50)], "id long, v double"
    )
    out = windows.global_ntile(df, "v", n_tiles=4, extra_order=[F.col("id").asc()])
    assert not _unbounded_global_windows(out._jdf.queryExecution().sparkPlan())


def test_global_rank_dense_rank(spark):
    """dense_rank decomposition (distinct-key offsets, NULL group
    counted once) vs the naive window, both null placements."""
    from pyspark.sql import Window

    df = _rank_fixture(spark)
    for nulls_last in (True, False):
        oc = windows.order_col("v", ascending=True, nulls_last=nulls_last)
        want = rows(
            df.withColumn("rnk", F.dense_rank().over(Window.orderBy(oc))),
            "id",
            "rnk",
        )
        got = rows(
            windows.global_rank(
                df, "v", ascending=True, nulls_last=nulls_last, method="dense_rank"
            ),
            "id",
            "rnk",
        )
        assert got == want, f"nulls_last={nulls_last}"
    import pytest

    with pytest.raises(ValueError, match="dense_rank"):
        windows.global_rank(
            df, "v", method="dense_rank", extra_order=[F.col("id").asc()]
        )
