"""Event-time analytics over the events table (SURVEY.md §2.9).

The reference has no streaming, but batch re-runnability keyed by
ingest_date; the driver's ``events`` table (event_id, ts, user_id,
event_type, value, props JSON) motivates this surface. Everything here
is batch-expressible (DuckDB-oracle checkable); the Structured
Streaming twins live in ``streaming/``.

Scale notes: tumbling buckets are a plain groupBy (map-side partial
agg); sessionization shuffles once on user_id then runs partition-local
window scans — the standard lag+cumsum formulation, no Python state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def with_json_field(
    df: DataFrame, json_col: str, field: str, out: str, cast: str | None = None
) -> DataFrame:
    """Extract ``$.field`` from a JSON-string column (get_json_object —
    native Jackson parse, no UDF). ``try_cast`` so malformed values
    coerce to NULL instead of throwing under ANSI mode (Spark 4 default)."""
    c = F.get_json_object(F.col(json_col), f"$.{field}")
    if cast:
        c = c.try_cast(cast)
    return df.withColumn(out, c)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    unit: str,
    keys: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Tumbling event-time buckets via date_trunc (hour/day/week/...).

    date_trunc keeps the bucket a plain timestamp column — identical
    semantics in the DuckDB oracle, unlike Spark's struct-typed
    ``window()`` output.
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    return df.groupBy(bucket, *keys).agg(
        *[e.alias(n) for n, e in aggs.items()]
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Sliding event-time windows via Spark's ``window()``; bucket
    boundaries exposed as plain timestamps."""
    w = F.window(F.col(ts_col), duration, slide)
    out = df.groupBy(w.alias("w"), *keys).agg(*[e.alias(n) for n, e in aggs.items()])
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap_minutes: int,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Assign a session_id per user: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``.

    lag → gap flag → running sum, all partition-local after one shuffle
    on the user key. This is the batch twin of
    ``session_window``-based streaming sessionization.

    ``tiebreak_col`` makes the within-user order total when timestamps
    collide; pass ``None`` for DataFrames without a unique id column.
    """
    ordering = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        if tiebreak_col in df.columns:
            ordering.append(F.col(tiebreak_col).asc())
        elif tiebreak_col != "event_id":
            # The DEFAULT is allowed to be absent (convenience for
            # arbitrary frames); an explicitly requested column that
            # doesn't exist is a caller error — silently dropping it
            # would reintroduce nondeterministic session ids.
            raise ValueError(
                f"sessionize: tiebreak_col {tiebreak_col!r} not in columns "
                f"{df.columns}"
            )
    w = Window.partitionBy(user_col).orderBy(*ordering)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # unix_micros, not cast("double"): timestamp→numeric casts are
    # forbidden under ANSI mode (Spark 4 default), and µs-integer math
    # is exact where double seconds would round.
    gap_sec = (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) / F.lit(1e6)
    new_session = F.when(
        prev_ts.isNull() | (gap_sec > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("_new", new_session).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    ).drop("_new")


def session_stats(
    df: DataFrame, ts_col: str, user_col: str, gap_minutes: int
) -> DataFrame:
    """Per-session summary (event count, span seconds, total value)."""
    s = sessionize(df, ts_col, user_col, gap_minutes)
    span = (
        F.max(F.unix_micros(F.col(ts_col))) - F.min(F.unix_micros(F.col(ts_col)))
    ) / F.lit(1e6)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        span.alias("span_sec"),
        F.sum("value").alias("total_value"),
    )
