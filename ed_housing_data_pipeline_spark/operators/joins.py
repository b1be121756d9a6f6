"""Join operators (SURVEY.md §2.3).

The reference does two joins (left equi-join on lea_id,
silver_to_gold.py:73-77; inner join on normalized county,
silver_to_gold.py:80-84) plus a keep-first dedup before the second
(silver_to_gold.py:81). Generalized here with explicit scale policy:

- ``broadcast=True`` marks a bounded dimension side — at 100 TB the
  fact side never shuffles for these joins.
- Un-broadcast joins rely on AQE (skew-join splitting + runtime
  strategy switch) configured in session.py.
- ``dedup_one_per_key`` is deterministic (row_number over an explicit
  order), unlike ``dropDuplicates`` whose survivor is partition-order
  dependent — nondeterminism is unacceptable under a hashing oracle
  and in reproducible pipelines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """EXISTS — rows of ``left`` with a match; no right columns, no fanout."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — rows of ``left`` without a match."""
    return left.join(right, on=on, how="left_anti")


def dedup_one_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per key, chosen by an explicit total order.

    Deterministic replacement for the reference's
    ``drop_duplicates(subset=["county"])`` keep-first-in-file-order
    (silver_to_gold.py:81). One shuffle on ``keys``; the window scan is
    partition-local after that.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_left: str,
    ts_right: str,
    value_cols: Sequence[str],
    tolerance_sec: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the most recent right row
    with ``ts_right <= ts_left`` within the same ``on`` key (backward
    as-of, ties take the right row).

    Spark-first formulation (no per-row Python, no range cross-join):
    union the two sides tagged, ONE shuffle on the key, then a
    partition-local window carries the latest right ROW forward onto
    left rows. The carried payload is a STRUCT of (ts, values): the
    struct is non-NULL for every right row even when individual value
    columns are NULL, so a matched row with NULL values is carried
    faithfully (never skipped in favor of an older row) and
    multi-column values always come from one single right row. Cost is
    a single exchange + sort — the same shape as sessionization, so it
    scales like any windowed fact-table op.

    ``tolerance_sec`` drops matches older than the tolerance (NULLs
    out the carried values), like pandas ``merge_asof(tolerance=...)``.

    Caveats (asserted / documented):
    - ``value_cols`` must not already exist on ``left`` (the union
      would silently merge them) — raises ValueError.
    - NULL-key left rows match NULL-key right rows (window partitions
      group NULLs), unlike a SQL ASOF equality join which drops them;
      pre-filter NULL keys for strict SQL parity.
    - Right-side ties at identical (key, ts) are resolved arbitrarily;
      dedup the right side first for determinism (see
      events_asof_last_view).
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: value_cols {sorted(clash)} already exist on the "
            "left side; rename them before joining"
        )
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        F.col(on),
        F.col(ts_right).alias(ts_left),
        *[F.col(c) for c in value_cols],
    ).withColumn("_side", F.lit(0))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal ts => ties match
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_left).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Carry the whole right row as one struct: non-NULL iff a right row
    # exists, regardless of NULLs inside its value columns.
    payload = F.when(
        F.col("_side") == 0,
        F.struct(F.col(ts_left).alias("_mts"), *[F.col(c) for c in value_cols]),
    )
    out = unioned.withColumn("_m", F.last(payload, ignorenulls=True).over(w))
    if tolerance_sec is not None:
        age = F.unix_micros(F.col(ts_left)) - F.unix_micros(F.col("_m._mts"))
        out = out.withColumn(
            "_m",
            F.when(age > int(tolerance_sec * 1e6), F.lit(None)).otherwise(
                F.col("_m")
            ),
        )
    out = out.withColumns({c: F.col(f"_m.{c}") for c in value_cols})
    return out.filter(F.col("_side") == 1).drop("_side", "_m")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_sec: int,
    upper_sec: int,
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Interval/range join: pair each left row with right rows whose
    ``right_ts`` falls in ``[left_ts + lower_sec, left_ts + upper_sec]``
    (plus optional equi-keys).

    Spark's naive plan for a pure inequality join is a nested-loop /
    cartesian — a scale-killer. This operator makes it an EQUI-join:
    timestamps are bucketed into bins of width ``upper-lower``; a right
    row lands in exactly one bin, a left interval overlaps at most two
    adjacent bins, so the left side explodes to ≤2 probe rows and the
    join runs as a plain (keys..., bin) hash join with the exact range
    re-checked afterwards. Shuffle volume: 2·|left| + |right| rows —
    O(n), never O(n²).
    """
    width = upper_sec - lower_sec
    if width <= 0:
        raise ValueError("range_join_binned: upper_sec must exceed lower_sec")
    overlap = (set(left.columns) & set(right.columns)) - set(extra_keys)
    if overlap:
        raise ValueError(
            f"range_join_binned: columns {sorted(overlap)} exist on both "
            "sides (only extra_keys may be shared) — rename one side, or "
            "the output would carry ambiguous duplicate columns"
        )

    def _us(name: str):
        # NTZ-tolerant epoch micros (parquet dates read as TIMESTAMP_NTZ;
        # the session tz is pinned UTC so the cast is deterministic)
        return F.unix_micros(F.col(name).cast("timestamp"))

    def _floor_div(x, w: int):
        # exact floor division on bigints: pmod keeps the subtraction an
        # exact multiple, decimal division avoids double rounding past
        # 2^53 (F.floor(x / w) would go through doubles)
        return (
            (x - F.pmod(x, F.lit(w))).cast("decimal(38,0)") / F.lit(w)
        ).cast("bigint")

    l_us = _us(left_ts)
    r_us = _us(right_ts)
    w_us = int(width * 1e6)
    lo_us = int(lower_sec * 1e6)
    up_us = int(upper_sec * 1e6)
    start_bin = _floor_div(l_us + F.lit(lo_us), w_us)
    end_bin = _floor_div(l_us + F.lit(up_us), w_us)
    lt = left.withColumn(
        "_bin", F.explode(F.sequence(start_bin, end_bin))
    )
    rt = right.withColumn("_bin", _floor_div(r_us, w_us))
    joined = lt.join(rt, on=[*extra_keys, "_bin"]).drop("_bin")
    in_range = (_us(right_ts) >= _us(left_ts) + lo_us) & (
        _us(right_ts) <= _us(left_ts) + up_us
    )
    return joined.filter(in_range)
