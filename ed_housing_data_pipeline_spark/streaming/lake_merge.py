"""Continuous dimension maintenance: a stream of row-level changes
MERGEs into a segmented component exactly-once — the streaming twin of
:func:`lake.merge_rows` (the SCD-type-1 upkeep loop: upsert changed
keys, insert new ones, skip the unchanged bulk, optionally delete on a
predicate).

Replay discipline (foreachBatch is at-least-once on retry): the
micro-batch id rides the SAME manifest flip as the merge commit
(``merge_rows(extra_meta=...)`` — and a fully-no-op batch still
records its id with a meta-only flip), so a replayed batch is
recognized against the pinned manifest and skipped before any work.
A rival replayer racing the flip loses ``expected_base``; the retry
re-reads and sees the id. ``skip_unchanged`` additionally makes
whole-row replays semantic no-ops, but the id guard is what protects
non-idempotent patches (``update_set`` deltas).

Scale shape per micro-batch: one pruned read of the target's merged
view restricted to batch keys + an O(batch) decision fold + one
O(changed) commit — unchanged rows never churn the tombstone
component, so a mostly-stale dimension stream costs (almost) nothing
downstream and the merged-read fold stays at its floor.

Reference parity: the reference recomputes its whole LEA dimension
join per arrival (function_app.py:12-73, silver_to_gold.py:73-77);
this is the same keep-the-dimension-fresh intent as an incremental
exactly-once loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ed_housing_data_pipeline_spark.sources import lake

#: Manifest meta key carrying the last merged micro-batch id.
LAST_BATCH_KEY = "last_merge_sink_batch"


def sink_merge_batch(
    spark,
    root: str,
    component: str,
    id_col,
    batch_df: DataFrame,
    batch_id: int,
    max_attempts: int = 3,
    **merge_kwargs,
) -> dict:
    """MERGE one micro-batch into the component, exactly-once. The
    first batch of a fresh root bootstraps the component (plain
    append — nothing to merge against); every later batch goes through
    :func:`lake.merge_rows` with the batch id in ``extra_meta``.
    Returns the merge report plus ``{"committed": bool}`` (False = the
    id was already recorded: a replay, skipped untouched)."""
    last_err: BaseException | None = None
    for _attempt in range(max_attempts):
        try:
            meta, base = lake.segment_meta_versioned(spark, root)
            pins = lake.segment_pins(spark, root)
            init = component not in pins
        except FileNotFoundError:
            meta, base, init = {}, 0, True
        if int(meta.get(LAST_BATCH_KEY, -1)) >= int(batch_id):
            return {"committed": False, "applied": False, "replay": True}
        if init:
            try:
                lake.append_segments(
                    spark,
                    root,
                    {component: batch_df},
                    init=(base == 0 and not meta),
                    meta={**meta, LAST_BATCH_KEY: int(batch_id)},
                    expected_base=None if (base == 0 and not meta) else base,
                )
                return {
                    "committed": True, "applied": True, "bootstrap": True,
                }
            except lake.ConcurrentCommitError as e:
                last_err = e
                continue
        try:
            rep = lake.merge_rows(
                spark,
                root,
                component,
                id_col,
                batch_df,
                extra_meta={LAST_BATCH_KEY: int(batch_id)},
                max_attempts=1,  # recheck the id between attempts HERE
                **merge_kwargs,
            )
            return {"committed": True, **rep}
        except lake.ConcurrentCommitError as e:
            last_err = e  # rival flip: loop re-reads meta — the retry
            # may now recognize the id (a zombie replayer landed it)
    raise last_err


def run_stream_merge(
    stream_df: DataFrame,
    root: str,
    component: str,
    id_col,
    checkpoint_dir: str,
    **merge_kwargs,
) -> None:
    """Drain the stream with availableNow through the merge sink: the
    dimension takes each micro-batch's changes exactly once — updates
    replace, inserts land, unchanged rows skip without tombstone
    churn."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        sink_merge_batch(
            batch_df.sparkSession,
            root,
            component,
            id_col,
            batch_df,
            batch_id,
            **merge_kwargs,
        )

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
