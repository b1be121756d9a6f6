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
    # one select, not chained withColumns: every Dataset op triggers a
    # full analysis pass, which is pure driver latency per plan build
    new_cols = {
        name: fn().over(Window.partitionBy(*partition_by).orderBy(ordering)).alias(name)
        for name, ordering in rank_cols.items()
    }
    # a rank name that collides with an existing column replaces it IN
    # PLACE (withColumn semantics) — moving it to the end would break
    # positional consumers and column-order-sensitive comparisons
    cols = [new_cols.pop(c) if c in new_cols else F.col(c) for c in df.columns]
    return df.select(*cols, *new_cols.values())


def monotone_value_shard(
    col_name: str,
    span: float,
    ascending: bool = True,
    nulls_last: bool = True,
) -> Column:
    """Shard expression for :func:`global_rank` over a numeric order
    key: bucket = floor(value / span), negated for DESC order so the
    bucket id stays monotone non-decreasing in the GLOBAL order, with
    NULL keys mapped to the extreme bucket matching their placement.
    Pick ``span`` so one bucket holds a comfortable task's worth of
    rows (10^5-10^6) at the target scale."""
    c = F.col(col_name)
    bucket = F.floor(c / F.lit(float(span))).cast("bigint")
    if not ascending:
        bucket = -bucket
    return F.when(c.isNull(), _null_extreme_bucket(nulls_last)).otherwise(bucket)


QUANTILE_SHARD_MAX = 4096

# Session-scoped cut-point cache: several rank queries over the same
# (input plan, key) — e.g. a bench run's ASC rank, ntile quartiles and
# dense rank on one fact table — would each pay the approxQuantile
# sampling job at plan-build time. Keyed on the input's semanticHash so
# semantically-equal plans share one job. Correctness-safe by
# construction even across a hash collision: cut points only steer
# shard BALANCE, never values (the bucket is a pure function of the
# row's key either way).
_QUANTILE_CUTS: dict[tuple, list[float]] = {}
# Bounded: one entry per distinct (plan, key, shards) would otherwise
# accumulate forever in a long-lived session issuing many ad-hoc rank
# plans (each entry is just n_shards-1 doubles, but the dict itself
# must not be an unbounded leak for callers that never touch
# release_shared_caches). FIFO eviction — a re-run after eviction
# repays one approxQuantile job, never changes results.
_QUANTILE_CUTS_MAX = 256


def clear_quantile_cache() -> None:
    """Free the cut-point cache. Safe any time; the next global_rank
    over a numeric key re-runs its sampling job. Also called by
    plans.queries_llm.release_shared_caches."""
    _QUANTILE_CUTS.clear()


def _null_extreme_bucket(nulls_last: bool) -> Column:
    """The shard id NULL keys map to: past every real bucket on the
    side their ordering places them (shared by every shard builder so
    null placement can never silently diverge)."""
    return F.lit((1 << 60) if nulls_last else -(1 << 60)).cast("bigint")


def quantile_shard(
    df: DataFrame,
    key: str,
    ascending: bool = True,
    nulls_last: bool = True,
    num_shards: int | None = None,
    relative_error: float | None = None,
) -> Column:
    """Deterministic, balanced shard expression for :func:`global_rank`
    over a NUMERIC key, learned from the data.

    One lightweight sampling job (``approxQuantile`` — Greenwald-Khanna,
    driver holds only ``num_shards - 1`` doubles) yields cut points;
    the returned Column buckets each row by counting boundaries ≤ value
    (≥ for DESC), a pure function of the value — so every evaluation
    site agrees, unlike ``spark_partition_id()`` after an independent
    range exchange. Equal keys always share a bucket and the bucket id
    is monotone in the requested global order; NULLs map to the extreme
    bucket matching their placement. Boundary quality only affects
    balance, never correctness.

    Per-row cost is O(num_shards) comparisons inside a JVM higher-order
    function — keep ``num_shards`` near cluster parallelism (default),
    not per-row-granular. Past :data:`QUANTILE_SHARD_MAX` shards the
    linear boundary scan stops paying for the saved exchange;
    :func:`global_rank` automatically switches to the
    ``repartitionByRange`` path there (Spark's RangePartitioner handles
    100k+ partitions natively)."""
    n = num_shards or df.sparkSession.sparkContext.defaultParallelism
    err = relative_error if relative_error is not None else max(0.001, 0.25 / n)
    probs = [i / n for i in range(1, n)]
    ck = (df.semanticHash(), key, n, err)  # ascending/nulls don't move cuts
    bounds = _QUANTILE_CUTS.get(ck)
    if bounds is None:
        bounds = sorted(set(df.stat.approxQuantile(key, probs, err))) if probs else []
        while len(_QUANTILE_CUTS) >= _QUANTILE_CUTS_MAX:
            _QUANTILE_CUTS.pop(next(iter(_QUANTILE_CUTS)))
        _QUANTILE_CUTS[ck] = bounds
    c = F.col(key)
    if not bounds:  # ≤1 distinct non-null value: a single bucket is exact
        bucket = F.lit(0).cast("bigint")
    else:
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        cmp = (lambda b: b <= c) if ascending else (lambda b: b >= c)
        bucket = F.size(F.filter(arr, cmp)).cast("bigint")
    return F.when(c.isNull(), _null_extreme_bucket(nulls_last)).otherwise(bucket)


def global_rank(
    df: DataFrame,
    key: str | Column,
    ascending: bool = True,
    nulls_last: bool = True,
    shard: Column | None = None,
    out_col: str = "rnk",
    method: str = "rank",
    num_partitions: int | None = None,
    extra_order: Sequence[Column] = (),
    total_col: str | None = None,
) -> DataFrame:
    """Scale-safe global ``rank()``/``row_number()`` — the fix for the
    classic ``WindowExec: No Partition Defined`` scale-killer: an
    unpartitioned window moves the WHOLE table through one task, fine
    for the reference's ≤200-county gold table (view_gold.py:94-113),
    fatal for a fact table at 100 TB.

    Decomposition (same two-pass shape as :func:`sharded_running_sum`):

    1. rank within shards — window partitioned by the shard key, so
       the heavy per-row pass spreads over #shards tasks;
    2. per-shard row counts → exclusive prefix over shard totals (a
       window over #shards rows — bounded by layout, not data);
    3. broadcast the shard→offset table back and add. Exact for
       ``rank``/``row_number`` because the shard key is monotone in
       the global order AND equal order keys always share a shard, so
       a row's global rank = rows in strictly-lower shards + its
       within-shard rank. ``dense_rank`` offsets by the count of
       DISTINCT primary keys in lower shards instead (same aggregate,
       ``count_distinct``) — exact for the same reason, provided the
       ordering is the primary key alone (``extra_order`` would change
       which rows tie, so it is rejected for dense_rank).

    Shard resolution, best first:

    - explicit ``shard`` Column (must be non-NULL, deterministic,
      monotone non-decreasing in the global order, ties on one shard —
      :func:`monotone_value_shard` builds one from a known domain with
      zero extra passes);
    - numeric ``key`` named by string → :func:`quantile_shard`
      (one sampling job, then a value-deterministic bucket expression).
      The full table shuffles ONCE (hash on shard for the window); the
      shard-count branch re-scans just the key column and partially
      aggregates map-side, so its shuffle is #shards rows;
    - otherwise ``repartitionByRange`` on the ordering +
      ``spark_partition_id()``. Domain-free, but each plan branch
      re-derives the range exchange (column pruning defeats
      ReuseExchange), so the key column crosses the wire twice, and
      consistency leans on RangePartitioner's deterministic sampling
      over identical input splits.

    ``extra_order`` appends tie-break orderings WITHIN the window only
    — sharding still keys on the primary alone, which stays exact
    because the shard is monotone in the composite order (primary
    monotone, primary-ties co-sharded).

    ``total_col``: also attach the TOTAL row count under this name,
    derived from the shard-count aggregate the decomposition already
    computes — callers needing n (:func:`global_ntile`) get it without
    a second pass over the input.
    """
    from pyspark.sql.types import NumericType  # noqa: PLC0415

    fn = {"rank": F.rank, "row_number": F.row_number, "dense_rank": F.dense_rank}[
        method
    ]
    if method == "dense_rank" and extra_order:
        raise ValueError(
            "global_rank: dense_rank offsets count distinct PRIMARY keys, "
            "so extra_order tie-breaks would corrupt the offset — rank on "
            "the composite key as a single expression instead"
        )
    shard_c, local_c, off_c = "_gr_shard", "_gr_local", "_gr_off"
    n_shards = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    if isinstance(key, str):
        ordering = order_col(key, ascending=ascending, nulls_last=nulls_last)
        # quantile sharding is a per-row O(n_shards) boundary scan: a
        # win while it dodges a full exchange, a loss once the giant
        # cluster's parallelism makes the scan itself the hot loop
        key_is_numeric = n_shards <= QUANTILE_SHARD_MAX and any(
            isinstance(f.dataType, NumericType)
            for f in df.schema.fields
            if f.name == key
        )
    else:
        if ascending:
            ordering = key.asc_nulls_last() if nulls_last else key.asc_nulls_first()
        else:
            ordering = key.desc_nulls_last() if nulls_last else key.desc_nulls_first()
        key_is_numeric = False
    if shard is not None:
        sh = df.withColumn(shard_c, shard)
    elif key_is_numeric:
        sh = df.withColumn(
            shard_c,
            quantile_shard(
                df,
                key,
                ascending=ascending,
                nulls_last=nulls_last,
                num_shards=num_partitions,
            ),
        )
    else:
        sh = df.repartitionByRange(n_shards, ordering, *extra_order).withColumn(
            shard_c, F.spark_partition_id().cast("bigint")
        )
    w_local = Window.partitionBy(shard_c).orderBy(ordering, *extra_order)
    local = sh.withColumn(local_c, fn().over(w_local))
    if method == "dense_rank":
        # offset = distinct primary keys in lower shards; NULL keys are
        # one tie group but count_distinct skips them, so add 1 for any
        # shard that holds NULLs (the extreme bucket)
        k_expr = F.col(key) if isinstance(key, str) else key
        counts = sh.groupBy(shard_c).agg(
            (
                F.count_distinct(k_expr)
                + F.max(F.when(k_expr.isNull(), F.lit(1)).otherwise(F.lit(0)))
            ).alias("_n")
        )
    else:
        counts = sh.groupBy(shard_c).agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.orderBy(shard_c).rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = [
        F.col(shard_c),
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias(off_c),
    ]
    if total_col is not None:
        w_all = Window.orderBy(shard_c).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("_n").over(w_all).alias(total_col))
    offsets = counts.select(*off_cols)
    return (
        local.join(F.broadcast(offsets), [shard_c])
        .withColumn(out_col, F.col(local_c) + F.col(off_c))
        .drop(shard_c, local_c, off_c)
    )


def global_ntile(
    df: DataFrame,
    key: str | Column,
    n_tiles: int,
    ascending: bool = True,
    nulls_last: bool = True,
    out_col: str = "tile",
    extra_order: Sequence[Column] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Scale-safe global ``ntile(k)`` — same scale-killer class as the
    unpartitioned rank (the whole table through one ``WindowExec``).

    ``ntile`` is a pure function of (global row_number, total count):
    with ``q = n div k`` and ``r = n mod k``, the first ``r`` tiles
    hold ``q + 1`` rows and the rest ``q`` — exactly Spark's and
    DuckDB's remainder placement. So: distributed row_number via
    :func:`global_rank` with the total count riding along on the
    shard-count aggregate it already computes (no second pass over the
    input), then closed-form arithmetic. No single-partition exchange
    anywhere.
    """
    rn_c, n_c = "_nt_rn", "_nt_n"
    ranked_df = global_rank(
        df,
        key,
        ascending=ascending,
        nulls_last=nulls_last,
        out_col=rn_c,
        method="row_number",
        num_partitions=num_partitions,
        extra_order=extra_order,
        total_col=n_c,
    )
    rn, n = F.col(rn_c), F.col(n_c)
    k = F.lit(n_tiles).cast("bigint")
    idiv = lambda a, b: F.floor(a / b).cast("bigint")  # noqa: E731 — operands ≥ 0
    q, r = idiv(n, k), n % k
    big_span = r * (q + F.lit(1))
    tile = F.when(rn <= big_span, idiv(rn + q, q + F.lit(1))).otherwise(
        # q = 0 implies rn <= n = big_span, so this branch never
        # divides by zero (floor(x/0) on doubles is NULL/Inf, never
        # taken — when/otherwise evaluates lazily per row)
        r + idiv(rn - big_span - F.lit(1), q) + F.lit(1)
    )
    return ranked_df.withColumn(out_col, tile.cast("bigint")).drop(rn_c, n_c)


def sharded_running_sum(
    df: DataFrame,
    value_col: str,
    partition_by: Sequence[str],
    order_by: str,
    shard: Column,
    out_col: str = "cum",
) -> DataFrame:
    """Distributed prefix sum: running ``SUM(value) OVER (PARTITION BY
    partition_by ORDER BY order_by ROWS UNBOUNDED PRECEDING)`` computed
    WITHOUT a single task per partition key — the giant-source guard
    for cumulative bucketing (sequence packing, cumulative quotas).

    ``shard`` must be deterministic and monotone non-decreasing in
    ``order_by`` within each partition (contiguous ranges — e.g.
    ``F.floor(F.col(order_by) / span)`` for roughly-dense ids), so
    that shard-local order concatenates to partition order.

    Exact two-pass decomposition (no approximation, so any SQL oracle
    of the plain window form matches bit-for-bit on integer sums):

    1. shard-local running sum — window partitioned by
       (partition_by…, shard): parallelism = #shards, not #sources;
    2. per-shard totals = ``SUM(value)`` grouped over the SAME
       windowed frame → per-partition exclusive prefix over shard
       totals — a window over #shards rows per partition key, tiny.
       Aggregating the frame that already carries the (partition,
       shard) exchange lets Spark reuse that one shuffle instead of
       scanning + deriving ``value_col`` twice. (A ``max_by(local_cum,
       order_by)`` variant would be wrong under duplicated ``order_by``
       values: ties make the arg-max row arbitrary and its running sum
       can exclude sibling tied rows, corrupting every later shard's
       offset — ``SUM`` is tie-safe and costs the same.)
    3. broadcast the (partition, shard) → offset table back and add.

    Pick the shard span so one shard ≈ one comfortable task (10^5-10^6
    rows); the offset table stays ≤ #partitions × #shards rows.
    """
    shard_c, local_c, off_c = "_prefix_shard", "_local_cum", "_shard_off"
    sh = df.withColumn(shard_c, shard)
    w_local = (
        Window.partitionBy(*partition_by, shard_c)
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sh.withColumn(local_c, F.sum(value_col).over(w_local))
    totals = local.groupBy(*partition_by, shard_c).agg(
        F.sum(value_col).alias("_tot")
    )
    w_off = (
        Window.partitionBy(*partition_by)
        .orderBy(shard_c)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *partition_by,
        shard_c,
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias(off_c),
    )
    # NULL-SAFE join back: a window's partitionBy groups NULL keys as
    # a partition of their own, so the decomposition must too — a
    # plain equi-join here silently DROPPED every NULL-partition-key
    # row (found by the pathological-corpus differential sweep)
    l, o = local.alias("l"), offsets.alias("o")
    cond = [
        F.col(f"l.{c}").eqNullSafe(F.col(f"o.{c}"))
        for c in [*partition_by, shard_c]
    ]
    return (
        l.join(F.broadcast(o), cond)
        .select(
            *[F.col(f"l.{c}") for c in local.columns],
            F.col(f"o.{off_c}").alias(off_c),
        )
        .withColumn(out_col, F.col(local_c) + F.col(off_c))
        .drop(shard_c, local_c, off_c)
    )


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
