"""Structured-Streaming maintenance of a continuous rollup
(operators/rollup) — the aggregate sibling of the streaming document
dedup loop (streaming/documents.py) and ANN ingest (streaming/
vectors.py).

Exactly-once is different here. The other two sinks restore
exactly-once content under at-least-once delivery by anti-joining the
batch's IDS against the committed index — a rollup's partial states
keep no fact ids, so a replayed micro-batch would silently double
every sum. Instead the sink is TRANSACTIONAL in the classic
foreachBatch sense: the micro-batch id is written into the manifest's
``_meta`` in the SAME atomic pointer flip that pins the batch's
partial segment, so "has this batch committed?" and the data commit
are one filesystem rename. A replay (same checkpoint, same batch id —
Spark re-delivers deterministically) reads the committed id and
skips; a crash BEFORE the flip left nothing visible, so its replay
commits normally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ed_housing_data_pipeline_spark.operators import rollup
from ed_housing_data_pipeline_spark.sources import lake

LAST_BATCH_KEY = "rollup_last_stream_batch"


def sink_rollup_batch(
    spark,
    root: str,
    batch_df: DataFrame,
    batch_id: int,
    segment_partitions: int | None = 1,
    keep_latest: int = 2,
    compact_every: int | None = 16,
    compact_max_bytes: int | None = None,
) -> bool:
    """Commit ONE micro-batch into the view, exactly once: skip when
    the committed manifest already records ``batch_id`` (replay after
    a crash-after-commit), else append the batch's partial segment
    with the id in the same manifest flip. Returns True when the
    batch was committed, False when recognized as a replay.

    ``compact_max_bytes`` opts into SIZE-TIERED maintenance (the LSM
    shape the other three sinks got first): once the partials
    component holds ``compact_every`` pinned segments, only segments
    under the byte threshold fold — graduated ones keep their pins —
    so a year-long continuous aggregate pays amortized-logarithmic
    rewrite work instead of O(view) every ``compact_every`` batches.
    Sound because the rollup compaction reducer keeps net-zero groups
    (subset-sound; see rollup.compact_rollup); a view with pending
    min/max resets transparently runs the full fold that round.

    The replay check and the commit are pinned to ONE manifest
    version (``expected_base``): a rival committer on the same root
    landing between the meta read and the flip raises
    :class:`lake.ConcurrentCommitError` instead of double-committing
    the batch id or clobbering the rival's meta — the commit retries
    from a fresh read, re-evaluating the replay check each time
    (mirrors text_index._commit_batch).

    Factored out of the foreachBatch closure so the replay contract
    is directly testable without driving a stream."""
    last_err: Exception | None = None
    for _attempt in range(3):
        meta, base = lake.segment_meta_versioned(spark, root)
        if batch_id <= meta.get(LAST_BATCH_KEY, -1):
            return False
        try:
            pins = rollup.append_rollup_batch(
                spark,
                root,
                batch_df,
                keep_manifests=keep_latest,
                # high-frequency committer: readers hold pins for one
                # micro-batch, so superseded manifests age out in minutes
                reader_grace_sec=600.0,
                segment_partitions=segment_partitions,
                meta={**meta, LAST_BATCH_KEY: int(batch_id)},
                expected_base=base,
            )
        except lake.ConcurrentCommitError as e:
            last_err = e
            continue
        if compact_every and len(pins[rollup.PARTIALS]) >= compact_every:
            rollup.compact_rollup(
                spark, root, max_segment_bytes=compact_max_bytes
            )
        return True
    raise last_err


def run_stream_rollup(
    stream_df: DataFrame,
    root: str,
    checkpoint_dir: str,
    segment_partitions: int | None = 1,
    keep_latest: int = 2,
    compact_every: int | None = 16,
    compact_max_bytes: int | None = None,
) -> None:
    """Drain the fact stream (availableNow) through the transactional
    rollup sink. ``bootstrap_rollup`` must have pinned the view spec
    first; every micro-batch then costs O(batch) — one partial agg,
    one segment write, one manifest flip — regardless of accumulated
    view history."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        sink_rollup_batch(
            batch_df.sparkSession,
            root,
            batch_df,
            batch_id,
            segment_partitions=segment_partitions,
            keep_latest=keep_latest,
            compact_every=compact_every,
            compact_max_bytes=compact_max_bytes,
        )

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
