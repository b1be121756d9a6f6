"""Continuous mirror maintenance: a stream of ingest batches lands in
a SOURCE segmented dataset and a MIRROR follows it through the
change-feed consumer, both exactly-once (r12 VERDICT #8 — the
streaming twin of ``lake.consume_changes``).

Each micro-batch runs TWO independently idempotent halves:

1. SOURCE commit — the transactional foreachBatch discipline every
   sink here uses (streaming/search.py, streaming/rollups.py): the
   micro-batch id rides the same manifest flip as the data, so a
   replayed batch (foreachBatch is at-least-once on retry) is
   recognized against the pinned manifest version and skipped, and a
   rival replayer racing the flip loses ``expected_base`` and its
   retry sees the id.
2. MIRROR cadence — one ``lake.consume_changes`` call, whose own
   watermark lives in the SINK's manifest meta and advances atomically
   with the mirror commit. A replay re-reads the same window into a
   no-op; ``merge=True`` keeps the mirror retraction-aware (upserts /
   deletes / resurrections applied through the source's revision
   axis).

Because both halves are exactly-once on their own ledgers, the
composition is exactly-once end to end: crash between the halves and
the next batch's cadence (or any external maintenance cadence) catches
the mirror up — the mirror needs no checkpoint of its own.

Reference parity: the reference pipeline re-runs its whole
bronze→silver→gold flow per arrival (function_app.py:12-73); this is
the same keep-downstream-fresh intent as an incremental, exactly-once
loop at lake scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ed_housing_data_pipeline_spark.sources import lake

#: Source-manifest meta key carrying the last committed micro-batch id.
LAST_BATCH_KEY = "last_mirror_ingest_batch"


def sink_mirror_batch(
    spark,
    src_root: str,
    dst_root: str,
    component: str,
    batch_df: DataFrame,
    batch_id: int,
    merge: bool = True,
    max_attempts: int = 3,
) -> dict:
    """Commit ONE micro-batch into the source (replay-guarded), then
    advance the mirror by one consumer cadence. Returns
    ``{"committed": bool, **consume_changes report}`` — ``committed``
    False means the batch id was already in the source manifest (a
    replay); the cadence still runs, so a crash-after-commit replay
    also heals a mirror that missed its window."""
    last_err: BaseException | None = None
    committed = False
    for _attempt in range(max_attempts):
        try:
            meta, base = lake.segment_meta_versioned(spark, src_root)
            init = False
        except FileNotFoundError:
            meta, base, init = {}, 0, True
        if int(meta.get(LAST_BATCH_KEY, -1)) >= int(batch_id):
            break  # replay after a crash-after-commit: skip half 1
        try:
            lake.append_segments(
                spark,
                src_root,
                {component: batch_df},
                init=init,
                meta={**meta, LAST_BATCH_KEY: int(batch_id)},
                expected_base=None if init else base,
            )
            committed = True
            break
        except lake.ConcurrentCommitError as e:
            last_err = e  # rival flip: re-read — the retry may now
            # recognize the id (a zombie replayer landed it) and skip
    else:
        raise last_err
    rep = lake.consume_changes(
        spark, src_root, component, dst_root, merge=merge
    )
    return {"committed": committed, **rep}


def run_stream_mirror(
    stream_df: DataFrame,
    src_root: str,
    dst_root: str,
    component: str,
    checkpoint_dir: str,
    merge: bool = True,
) -> None:
    """Drain the stream with availableNow through the mirror sink: the
    source ingests each micro-batch exactly once and the mirror follows
    it one consumer window behind, converging by the final batch."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        sink_mirror_batch(
            batch_df.sparkSession,
            src_root,
            dst_root,
            component,
            batch_df,
            batch_id,
            merge=merge,
        )

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
