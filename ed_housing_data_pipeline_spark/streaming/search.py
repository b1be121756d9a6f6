"""Structured-Streaming maintenance of the inverted text index
(operators/text_index) — the search sibling of the streaming rollup
(streaming/rollups.py), document-dedup (streaming/documents.py) and
ANN-ingest (streaming/vectors.py) sinks.

Exactly-once follows the rollup sink's TRANSACTIONAL pattern, not the
anti-join pattern: the index's termstats and corpus-count meta are
ADDITIVE state with no per-row id to dedup on (a doc with NULL text
contributes to N but writes no posting rows), so a replayed
micro-batch would double df/N even if the postings were deduped.
Instead the micro-batch id lands in the manifest ``_meta`` in the SAME
atomic pointer flip that pins the batch's postings + termstats
segments — "has this batch committed?" and the data commit are one
filesystem rename. A replay (same checkpoint → Spark re-delivers the
same batch id) reads the committed id and skips; a crash BEFORE the
flip left nothing visible, so its replay commits normally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ed_housing_data_pipeline_spark.operators import text_index
from ed_housing_data_pipeline_spark.sources import lake

LAST_BATCH_KEY = "text_index_last_stream_batch"


def sink_text_batch(
    spark,
    root: str,
    batch_df: DataFrame,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = 64,
    compact_dead: int | None = 100_000,
    compact_max_bytes: int | None = None,
) -> bool:
    """Commit ONE micro-batch into the index, exactly once: skip when
    the committed manifest already records ``batch_id`` (replay after
    a crash-after-commit), else append postings + termstats with the
    id riding the same manifest flip. Returns True when committed,
    False when recognized as a replay.

    ``compact_every`` is the threshold compaction policy every
    long-lived sink needs (a year-long ingest otherwise accumulates a
    segment per batch and read fan-in grows without bound): once the
    postings component holds that many pinned segments, the commit
    path folds the index back to one segment per component —
    content-neutral, snapshot-isolated, amortized
    O(index / compact_every) per batch. ``None`` leaves compaction to
    an external maintenance cadence.

    The replay check is enforced INSIDE the commit's retry loop, on
    the same manifest version the commit is pinned to (the
    ``replay_guard`` contract of text_index._commit_batch): a rival
    committer — a zombie driver replaying the same checkpoint — that
    lands this batch id between any read and the flip fails that
    attempt with ConcurrentCommitError, and the retry's fresh read
    recognizes the id and skips, instead of double-counting
    df/N/total_tokens (mirrors streaming/rollups.sink_rollup_batch).

    Factored out of the foreachBatch closure so the replay contract is
    directly testable without driving a stream (the rollup sink's
    pattern)."""
    pins = text_index.append_text_batch(
        spark,
        root,
        batch_df,
        id_col=id_col,
        text_col=text_col,
        extra_meta={LAST_BATCH_KEY: int(batch_id)},
        replay_guard=(LAST_BATCH_KEY, int(batch_id)),
    )
    if pins is None:
        return False
    if (compact_every and len(pins[text_index.COMPONENT]) >= compact_every) or (
        compact_dead and lake.tombstone_pressure(spark, root, compact_dead)
    ):
        # compact_max_bytes opts into SIZE-TIERED maintenance: only
        # small segments fold, graduated ones keep their pins (LSM
        # shape — see lake.compact_segments); the tombstone-pressure
        # path still applies deletes via the full rewrite inside
        # compact_text_index when tombstones are live
        text_index.compact_text_index(
            spark, root, max_segment_bytes=compact_max_bytes
        )
    return True


def sink_text_upsert_batch(
    spark,
    root: str,
    batch_df: DataFrame,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = 64,
    compact_dead: int | None = 100_000,
    compact_max_bytes: int | None = None,
) -> bool:
    """The CDC sibling of :func:`sink_text_batch`: each micro-batch is
    a wave of document REVISIONS (re-crawls, content corrections), not
    appends — committed through text_index.upsert_text_batch so every
    revised doc's prior rows die under the same manifest flip that
    serves the new ones. Exactly-once is the same transactional
    batch-id-in-meta contract (an upsert replayed after a
    crash-after-commit would otherwise tombstone its OWN rows' twin
    and re-count df deltas); the threshold compaction policy applies
    unchanged. As in :func:`sink_text_batch`, the replay check is
    re-evaluated inside the commit's retry loop against the pinned
    manifest version, so a rival replayer landing the same batch id
    mid-race is skipped on retry, never double-committed."""
    pins = text_index.upsert_text_batch(
        spark,
        root,
        batch_df,
        id_col=id_col,
        text_col=text_col,
        extra_meta={LAST_BATCH_KEY: int(batch_id)},
        replay_guard=(LAST_BATCH_KEY, int(batch_id)),
    )
    if pins is None:
        return False
    if (compact_every and len(pins[text_index.COMPONENT]) >= compact_every) or (
        compact_dead and lake.tombstone_pressure(spark, root, compact_dead)
    ):
        # compact_max_bytes opts into SIZE-TIERED maintenance: only
        # small segments fold, graduated ones keep their pins (LSM
        # shape — see lake.compact_segments); the tombstone-pressure
        # path still applies deletes via the full rewrite inside
        # compact_text_index when tombstones are live
        text_index.compact_text_index(
            spark, root, max_segment_bytes=compact_max_bytes
        )
    return True


def run_stream_search_upserts(
    stream_df: DataFrame,
    root: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = 64,
    compact_dead: int | None = 100_000,
    compact_max_bytes: int | None = None,
) -> None:
    """Drain a CDC stream of document revisions (availableNow) through
    the transactional upsert sink — the search index stays in lockstep
    with a mutating corpus at O(batch + revised docs' old postings)
    per micro-batch."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink_text_upsert_batch(
            batch_df.sparkSession,
            root,
            batch_df,
            batch_id,
            id_col=id_col,
            text_col=text_col,
            compact_every=compact_every,
            compact_dead=compact_dead,
            compact_max_bytes=compact_max_bytes,
        )

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_search_ingest(
    stream_df: DataFrame,
    root: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = 64,
    compact_dead: int | None = 100_000,
    compact_max_bytes: int | None = None,
) -> None:
    """Drain the document stream (availableNow) through the
    transactional text-index sink. ``bootstrap_text_index`` must have
    committed manifest v1 first; every micro-batch then costs
    O(batch) — one tokenize/agg pass, two segment writes, one manifest
    flip — regardless of accumulated index size, and searches between
    batches always see a consistent committed index."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink_text_batch(
            batch_df.sparkSession,
            root,
            batch_df,
            batch_id,
            id_col=id_col,
            text_col=text_col,
            compact_every=compact_every,
            compact_dead=compact_dead,
            compact_max_bytes=compact_max_bytes,
        )

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
