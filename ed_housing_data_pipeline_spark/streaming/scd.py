"""Continuous SCD TYPE 2 maintenance: a stream of dimension SNAPSHOT
batches drives :func:`~..sources.scd.scd2_apply`, exactly-once — the
streaming twin of the type-2 dimension (the same transactional
foreachBatch discipline as streaming/lake_merge: the micro-batch id
rides the apply's own manifest flip, so replays are recognized and
skipped; a fully-unchanged snapshot still records its id via
scd2_apply's meta-only no-op flip).

Event time: each batch applies at a caller-derived ``ts`` (default:
``1 + batch_id`` — foreachBatch ids are monotone, so intervals stay
ordered across restarts). Pass ``ts_of`` to stamp real event times
(e.g. the max of a snapshot-time column); scd2_apply fails closed if
a derived ts ever runs backwards for an affected key.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ed_housing_data_pipeline_spark.sources import lake, scd

#: Manifest meta key carrying the last applied micro-batch id.
LAST_BATCH_KEY = "last_scd2_sink_batch"


def sink_scd2_batch(
    spark,
    root: str,
    component: str,
    key_cols,
    batch_df: DataFrame,
    batch_id: int,
    ts_of: Callable[[DataFrame, int], int] | None = None,
    max_attempts: int = 3,
    **apply_kwargs,
) -> dict:
    """Apply ONE snapshot micro-batch as an SCD2 cadence, exactly-once.
    The first batch of a fresh root bootstraps via :func:`scd.scd2_init`
    (batch id atomic with the init commit); every later batch goes
    through :func:`scd.scd2_apply` with the id in ``extra_meta``.
    Returns the apply report plus ``{"committed": bool, "ts": int}``
    (committed False = a replay, skipped untouched)."""
    ts = int(ts_of(batch_df, batch_id)) if ts_of else int(batch_id) + 1
    last_err: BaseException | None = None
    for _attempt in range(max_attempts):
        try:
            meta, base = lake.segment_meta_versioned(spark, root)
            init = component not in lake.segment_pins(spark, root)
        except FileNotFoundError:
            meta, base, init = {}, 0, True
        if int(meta.get(LAST_BATCH_KEY, -1)) >= int(batch_id):
            return {"committed": False, "applied": False, "replay": True,
                    "ts": ts}
        if init:
            try:
                scd.scd2_init(
                    spark, root, component, key_cols, batch_df, ts=ts,
                    init=(base == 0 and not meta),
                    meta={**meta, LAST_BATCH_KEY: int(batch_id)},
                    expected_base=None if (base == 0 and not meta) else base,
                )
                return {"committed": True, "applied": True,
                        "bootstrap": True, "ts": ts}
            except lake.ConcurrentCommitError as e:
                last_err = e
                continue
        try:
            rep = scd.scd2_apply(
                spark, root, component, key_cols, batch_df, ts=ts,
                extra_meta={LAST_BATCH_KEY: int(batch_id)},
                max_attempts=1,  # recheck the id between attempts HERE
                **apply_kwargs,
            )
            return {"committed": True, "ts": ts, **rep}
        except lake.ConcurrentCommitError as e:
            last_err = e  # rival flip: loop re-reads meta — the retry
            # may now recognize the id (a zombie replayer landed it)
    raise last_err


def run_stream_scd2(
    stream_df: DataFrame,
    root: str,
    component: str,
    key_cols,
    checkpoint_dir: str,
    ts_of: Callable[[DataFrame, int], int] | None = None,
    **apply_kwargs,
) -> None:
    """Drain the stream with availableNow through the SCD2 sink: each
    micro-batch is one snapshot cadence — changed keys close + reopen,
    new keys open, unchanged keys contribute nothing."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        sink_scd2_batch(
            batch_df.sparkSession, root, component, key_cols,
            batch_df, batch_id, ts_of=ts_of, **apply_kwargs,
        )

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
