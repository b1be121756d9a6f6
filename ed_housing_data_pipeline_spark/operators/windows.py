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
    null_bucket = F.lit((1 << 60) if nulls_last else -(1 << 60)).cast("bigint")
    return F.when(c.isNull(), null_bucket).otherwise(bucket)


def global_rank(
    df: DataFrame,
    ordering: Column,
    shard: Column | None = None,
    out_col: str = "rnk",
    method: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scale-safe global ``rank()``/``row_number()`` — the fix for the
    classic ``WindowExec: No Partition Defined`` scale-killer: an
    unpartitioned window moves the WHOLE table through one task, fine
    for the reference's ≤200-county gold table, fatal for a fact table
    at 100 TB.

    Decomposition (same two-pass shape as :func:`sharded_running_sum`):

    1. rank within shards — window partitioned by the shard key, so
       the heavy per-row pass spreads over #shards tasks;
    2. per-shard row counts → exclusive prefix over shard totals (a
       window over #shards rows — bounded by layout, not data);
    3. broadcast the shard→offset table back and add. Exact for
       ``rank``/``row_number`` because the shard key is monotone in
       the global order AND equal order keys always share a shard, so
       a row's global rank = rows in strictly-lower shards + its
       within-shard rank. (``dense_rank`` would need distinct-value
       offsets — unsupported here.)

    ``shard`` must be non-NULL, deterministic, and monotone
    non-decreasing in the global order, with ties mapped to one shard
    — :func:`monotone_value_shard` builds one from a numeric key with
    no extra pass over the data, so the whole plan costs ONE shuffle.
    With ``shard=None`` the shard key is derived by range
    repartitioning on the ordering + ``spark_partition_id()`` —
    domain-free, but that costs a second exchange (range + hash);
    prefer an explicit shard when the key's domain is known.
    """
    fn = {"rank": F.rank, "row_number": F.row_number}[method]
    shard_c, local_c, off_c = "_gr_shard", "_gr_local", "_gr_off"
    if shard is None:
        n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        # Range partitioning assigns equal keys to one partition, so
        # partition id is a valid tie-preserving monotone shard. Both
        # plan branches below hang off this same exchange and Spark's
        # ReuseExchange dedups them, so the sampled boundaries are
        # computed once and stay consistent.
        sh = df.repartitionByRange(n, ordering).withColumn(
            shard_c, F.spark_partition_id().cast("bigint")
        )
    else:
        sh = df.withColumn(shard_c, shard)
    w_local = Window.partitionBy(shard_c).orderBy(ordering)
    local = sh.withColumn(local_c, fn().over(w_local))
    counts = local.groupBy(shard_c).agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.orderBy(shard_c).rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        shard_c, F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias(off_c)
    )
    return (
        local.join(F.broadcast(offsets), [shard_c])
        .withColumn(out_col, F.col(local_c) + F.col(off_c))
        .drop(shard_c, local_c, off_c)
    )


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
    return (
        local.join(F.broadcast(offsets), [*partition_by, shard_c])
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
