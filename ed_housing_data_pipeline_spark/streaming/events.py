"""Structured Streaming event analytics.

The reference is batch-only (SURVEY.md §2.9 — its closest notion is
re-runnable ingest_date batches), so this module is engine surface
beyond the reference: the streaming twins of operators/events.py,
built on ``readStream`` + watermarked event-time windows +
``session_window``. Each transformation takes a streaming DataFrame
and returns one, so the caller picks source, sink, trigger, and
checkpoint location.

Scale notes:
- Watermarks bound the state store: without one, a windowed agg keeps
  every window open forever (unbounded state at 100 TB/day rates).
- ``session_window`` state is per (user, open-session); the watermark
  closes sessions ``gap`` after their last event.
- These run identically in batch mode (a static DataFrame runs the
  same expressions) — that is how the unit tests cross-check results
  against the batch operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENTS_SCHEMA,
    fmt: str = "parquet",
) -> DataFrame:
    """File-source stream over an events directory: each new file is a
    micro-batch (the lake-ingestion pattern; at scale this is the same
    API over Kafka — swap ``format``)."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def stream_tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str = "2 hours",
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of
    ``operators.events.tumbling_agg``.

    Late rows beyond ``watermark`` are dropped and their windows
    finalized; state is bounded by (watermark / window) open windows
    per key.
    """
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    w = F.window(F.col(ts_col), window)
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *keys)
        .agg(*[e.alias(n) for n, e in aggs.items()])
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def stream_sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    keys: tuple[str, ...] = (),
    watermark: str = "2 hours",
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Watermarked sliding-window aggregation — the streaming twin of
    ``operators.events.sliding_window_agg``. Each event lands in
    duration/slide overlapping windows; the watermark finalizes a
    window ``watermark`` after its end, so open state is bounded by
    (watermark + duration)/slide windows per key."""
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    w = F.window(F.col(ts_col), duration, slide)
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *keys)
        .agg(*[e.alias(n) for n, e in aggs.items()])
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def stream_sessionize_stats(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session-window aggregation — the streaming twin of
    ``operators.events.session_stats``. A session closes when no event
    arrives within ``gap``; the watermark finalizes (and evicts) it."""
    sw = F.session_window(F.col(ts_col), gap)
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(sw.alias("s"), user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    return out.select(
        F.col("s.start").alias("session_start"),
        F.col("s.end").alias("session_end"),
        user_col,
        "n_events",
        "total_value",
    )


def run_available_now(
    stream_df: DataFrame,
    table_name: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
) -> None:
    """Drain everything currently available into an in-memory table and
    stop — the test/backfill trigger (``availableNow``). Production
    sinks swap ``format``/``trigger``; the transformation DataFrame is
    unchanged."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop repeats of ``id_cols`` arriving
    within the watermark (at-least-once sources → effectively-once
    downstream). State holds one entry per id seen inside the watermark
    horizon — bounded, unlike a naive dropDuplicates on a stream which
    keeps ALL ids forever."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [*id_cols]
    )


def stream_running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-user running (event count, value total) maintained across
    micro-batches — the arbitrary-state escape hatch for semantics the
    built-in windows can't express (here: monotone lifetime totals).

    State is one (bigint, bigint, double) triple per user — bounded by
    user cardinality, not event volume; Arrow batches move the rows, so
    the Python hop is vectorized. Output mode is ``update``: each user
    emits a refreshed row only in batches where it had events.
    ``total_value`` is NULL until a non-null value arrives — the same
    null-skipping semantics as batch ``F.sum``.
    """
    import pandas as pd  # noqa: PLC0415 - worker-side import

    def update_totals(key, pdfs, state):
        (user_id,) = key
        # GroupState.get is a PROPERTY in PySpark (returns the tuple).
        n, n_vals, total = state.get if state.exists else (0, 0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            n_vals += int(pdf["value"].notna().sum())
            total += float(pdf["value"].sum())  # pandas sum skips NaN
        state.update((n, n_vals, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total if n_vals > 0 else None],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_totals,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, n_vals bigint, total double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
) -> None:
    """Drain the stream into a parquet directory with availableNow —
    the production file-sink path. Spark's file sink commits written
    files through the checkpoint's file-manifest log, so a re-run with
    the SAME checkpoint resumes exactly-once: already-committed input
    files are never reprocessed and readers see no duplicates (the
    manifest, not directory listing, defines sink contents)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_upsert(
    stream_df: DataFrame,
    dataset_root: str,
    key_cols: list[str],
    checkpoint_dir: str,
    partition_col: str = "ingest_date",
    order_col: str | None = None,
) -> None:
    """Drain the stream with availableNow through a ``foreachBatch``
    keyed-upsert sink (:func:`sources.lake.upsert_partitions`): each
    micro-batch is merged into the Hive-partitioned parquet dataset by
    key, rewriting only the partitions that batch touches — the
    CDC-into-a-lake pattern without a table format.

    Semantics across batches: with ``order_col`` the greatest version
    wins no matter which batch carried it, so replays and out-of-order
    micro-batches converge to the same table. foreachBatch runs the
    merge ONCE per micro-batch (at-least-once on failure/retry — the
    merge is idempotent by key, which is exactly why this sink pattern
    requires keyed writes, not blind appends)."""
    from ed_housing_data_pipeline_spark.sources.lake import (  # noqa: PLC0415
        upsert_partitions,
    )

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_partitions(
            batch_df.sparkSession,
            dataset_root,
            batch_df,
            key_cols=key_cols,
            partition_col=partition_col,
            order_col=order_col,
        )

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
