"""Continuous denormalized-view maintenance: a stream of FACT batches
lands in the fact source and the joined view (fact ⋈ dim) follows it
through :func:`~..sources.join_view.sync_join_view`, both halves
exactly-once — the streaming twin of the incremental join view, built
on the same two-ledger argument as streaming/lake_mirror:

1. SOURCE commit — the transactional foreachBatch discipline (the
   micro-batch id rides the fact manifest flip, so replays are
   recognized and skipped, rivals lose ``expected_base``);
2. VIEW cadence — one ``sync_join_view`` cycle, whose OWN two
   watermarks (fact + dim) live in the sink's manifest meta and
   advance atomically with the sink commit. A replayed cadence
   re-reads the same windows into a no-op.

Crash between the halves and the next batch's cadence (or any batch
``sync_join_view`` call — e.g. a dim-churn cadence) catches the view
up; the view needs no checkpoint of its own. Dim churn committed by
OTHER writers between micro-batches is absorbed by the same cadence —
the view converges to fact ⋈ dim as of both heads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ed_housing_data_pipeline_spark.sources import join_view, lake

#: Fact-manifest meta key carrying the last committed micro-batch id.
LAST_BATCH_KEY = "last_join_view_ingest_batch"


def sink_join_view_batch(
    spark,
    fact_root: str,
    fact_component: str,
    fact_key,
    dim_root: str,
    dim_component: str,
    dim_key: str,
    sink_root: str,
    batch_df: DataFrame,
    batch_id: int,
    how: str = "left",
    max_attempts: int = 3,
    **sync_kwargs,
) -> dict:
    """Commit ONE fact micro-batch (replay-guarded), then advance the
    joined view by one sync cycle. ``committed`` False in the report
    means the batch id was already in the fact manifest (a replay);
    the cadence still runs, healing a view that missed its window."""
    last_err: BaseException | None = None
    committed = False
    for _attempt in range(max_attempts):
        try:
            meta, base = lake.segment_meta_versioned(spark, fact_root)
            init = False
        except FileNotFoundError:
            meta, base, init = {}, 0, True
        if int(meta.get(LAST_BATCH_KEY, -1)) >= int(batch_id):
            break  # crash-after-commit replay: skip half 1
        try:
            lake.append_segments(
                spark,
                fact_root,
                {fact_component: batch_df},
                init=init,
                meta={**meta, LAST_BATCH_KEY: int(batch_id)},
                expected_base=None if init else base,
            )
            committed = True
            break
        except lake.ConcurrentCommitError as e:
            last_err = e  # rival flip: re-read, maybe recognize the id
    else:
        raise last_err
    rep = join_view.sync_join_view(
        spark, fact_root, fact_component, fact_key,
        dim_root, dim_component, dim_key, sink_root,
        how=how, **sync_kwargs,
    )
    return {"committed": committed, **rep}


def run_stream_join_view(
    stream_df: DataFrame,
    fact_root: str,
    fact_component: str,
    fact_key,
    dim_root: str,
    dim_component: str,
    dim_key: str,
    sink_root: str,
    checkpoint_dir: str,
    how: str = "left",
    **sync_kwargs,
) -> None:
    """Drain the stream with availableNow through the join-view sink:
    the fact source ingests each micro-batch exactly once and the
    denormalized view follows one cadence behind, converging by the
    final batch."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        sink_join_view_batch(
            batch_df.sparkSession,
            fact_root, fact_component, fact_key,
            dim_root, dim_component, dim_key, sink_root,
            batch_df, batch_id, how=how, **sync_kwargs,
        )

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
