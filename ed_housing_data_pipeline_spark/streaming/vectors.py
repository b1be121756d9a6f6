"""Structured-Streaming ingest into the incremental ANN index
(operators/ann_index) — the vector sibling of the streaming document
dedup loop (streaming/documents.py).

Shape: ``bootstrap_ann_index`` commits the model + first segments;
the embedding stream drains through a ``foreachBatch`` sink that
encodes each micro-batch with the PINNED model and appends O(batch)
``vectors``/``cellcounts`` segments under one manifest flip per batch.
Readers (probes) always see the last committed manifest — never a
partially ingested batch. At-least-once sources are tolerated: each
batch drops ids the committed index already holds, so a replayed
micro-batch converges to exactly-once index content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ed_housing_data_pipeline_spark.operators import ann_index
from ed_housing_data_pipeline_spark.sources import lake


def run_stream_ann_ingest(
    stream_df: DataFrame,
    index_root: str,
    checkpoint_dir: str,
    vec_col: str,
    id_col: str,
    keep_latest: int = 2,
    compact_every: int | None = 64,
    compact_dead: int | None = 100_000,
    compact_max_bytes: int | None = None,
    segment_partitions: int | None = 8,
) -> None:
    """Drain the embedding stream (availableNow) through the
    foreachBatch ANN-ingest sink. ``bootstrap_ann_index`` must have
    committed the model + manifest v1 first (the model is immutable;
    every micro-batch encodes with it). Every ``compact_every``-th
    commit folds the accumulated segments to one (amortized
    O(index / compact_every) per batch); ``compact_dead`` additionally
    fires compaction on tombstone pressure (concurrent GDPR deletes /
    re-embedding upserts against the same root pinning that many
    tombstone rows), which physically applies the deletes and resets
    the counter — the liveness fold stays bounded under churn even
    when few segments accumulate; ``segment_partitions`` caps
    per-commit file counts exactly as in the document sink."""

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # exactly-once index content under at-least-once delivery:
        # drop within-batch id repeats, then ids the committed index
        # already holds (the anti-join reads only the pinned `id`
        # column — pushdown prunes `codes` out of the scan)
        committed = ann_index.read_ann_vectors(spark, index_root).select(
            F.col("id").alias(id_col)
        )
        fresh = batch_df.dropDuplicates([id_col]).join(
            committed, on=id_col, how="left_anti"
        )
        pins = ann_index.append_ann_batch(
            spark,
            index_root,
            fresh,
            vec_col=vec_col,
            id_col=id_col,
            keep_manifests=keep_latest,
            # high-frequency committer: readers hold pins for one
            # micro-batch, so superseded manifests age out in minutes
            reader_grace_sec=600.0,
            segment_partitions=segment_partitions,
        )
        if (
            compact_every and len(pins[ann_index.VECTORS]) >= compact_every
        ) or (
            compact_dead
            and lake.tombstone_pressure(spark, index_root, compact_dead)
        ):
            ann_index.compact_ann_index(
                spark, index_root, max_segment_bytes=compact_max_bytes
            )

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
