"""Shared attempt-state helpers for the index families' pinned-commit
protocols (text_index / incr_index / ann_index all retry a delete or
maintenance commit from fresh manifest pins on ConcurrentCommitError,
and any frame derived DURING one attempt — a predicate's delete set,
a liveness-folded id list — must stay pinned in memory for exactly
that attempt, win or lose, never collected to the driver)."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def persist_for_attempt(st: dict, df: DataFrame) -> DataFrame:
    """Persist a frame for the lifetime of one commit attempt:
    registered in the attempt state ``st`` (under ``"_persisted"``)
    so the attempt loop unpersists it when the attempt ends, win or
    lose. Keeps predicate-derived delete sets STABLE across the jobs
    of one attempt (the tombstone write and the stats fold must see
    the same rows) without ever collecting ids driver-side."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    st["_persisted"].append(df)
    return df
