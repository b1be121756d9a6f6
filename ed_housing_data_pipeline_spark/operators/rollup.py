"""Incrementally-maintained aggregate view (continuous rollup) over
the segmented-commit protocol (sources/lake) — the third artifact
family on that protocol after the LSH dedup index
(operators/incr_index) and the IVF-PQ ANN index (operators/ann_index).

The 100 TB problem this solves: a dashboard/monitoring aggregate
(``GROUP BY key, time_bucket``) over an append-only fact stream must
not re-scan the accumulated corpus per refresh. Because every kept
statistic is ASSOCIATIVE (sum, non-null count, min, max, row count),
each ingest batch contributes one O(batch) *partial-aggregate* segment,
and the served view is a merge of partial segments — O(unique keys ×
segments), never O(facts). This is the continuous-aggregate /
materialized-rollup design hypertable stores and streaming OLAP
engines use (partial aggregation states + merge-on-read), expressed
as plain DataFrame aggs so Catalyst map-side-combines both halves.

Artifact layout under ``root``:

- ``spec/`` — a JSON blob snapshot (lake.write_snapshot_blob) pinning
  the view definition: group keys, measures (output name → source
  column), and which keys carry zonemap stats. Immutable at version 1
  (partials from different specs must never merge — a new definition
  is a new root).
- ``partials/`` — append-only partial-aggregate segments, one per
  ingest commit: ``keys…, _rows, {m}_sum, {m}_cnt, {m}_min, {m}_max``.
  MERGEABLE BY CONSTRUCTION: partial(union) == merge(partials), so a
  compacted segment is just the merged frame re-written.
- ``manifest/`` — the atomic commit point (JSON blob pin map), with
  zonemap stats on the declared keys riding in the same blob: a
  time-ranged read of the view prunes whole segments driver-side
  before any job is scheduled (hypertable chunk exclusion).

Derived statistics that are NOT associative under this state (avg —
derivable as sum/cnt; exact distinct counts would need per-key value
sets) are computed at read time or out of scope; see
:func:`read_rollup`'s ``derive_avg``.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ed_housing_data_pipeline_spark.sources import lake

PARTIALS = "partials"


def partial_rollup(
    df: DataFrame, keys: Sequence[str], measures: dict[str, str]
) -> DataFrame:
    """One batch's partial-aggregate frame: per key group, ``_rows``
    plus sum/non-null-count/min/max of every measure — one
    map-side-combined shuffle on the keys, O(batch)."""
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for name, col in measures.items():
        aggs += [
            F.sum(col).alias(f"{name}_sum"),
            F.count(col).alias(f"{name}_cnt"),
            F.min(col).alias(f"{name}_min"),
            F.max(col).alias(f"{name}_max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_rollup(
    partials: DataFrame, keys: Sequence[str], measures: dict[str, str]
) -> DataFrame:
    """Fold partial states: sums and counts add, min/max fold — the
    associativity that makes ``merge(partials) == partial(union)``
    exactly (F.sum/min/max skip NULLs on both levels). Groups whose
    merged ``_rows`` reaches 0 — every fact retracted
    (:func:`retract_rollup_batch`) — drop out, exactly as a GROUP BY
    over the corrected facts would produce no row for them (the
    filter is a no-op on retraction-free views: every batch partial
    carries ``_rows >= 1``)."""
    aggs = [F.sum("_rows").alias("_rows")]
    for name in measures:
        aggs += [
            F.sum(f"{name}_sum").alias(f"{name}_sum"),
            F.sum(f"{name}_cnt").alias(f"{name}_cnt"),
            F.min(f"{name}_min").alias(f"{name}_min"),
            F.max(f"{name}_max").alias(f"{name}_max"),
        ]
    return partials.groupBy(*keys).agg(*aggs).filter(F.col("_rows") > 0)


def _spec_root(root: str) -> str:
    return f"{root.rstrip('/')}/spec"


def read_rollup_spec(
    spark: SparkSession, root: str
) -> tuple[list[str], dict[str, str], list[str]]:
    """The pinned (keys, measures, zone_keys) — filesystem read, no
    job (the metadata plane stays off the job queue)."""
    d = json.loads(lake.read_snapshot_blob(spark, _spec_root(root), version=1))
    return d["keys"], d["measures"], d.get("zone_keys", [])


def bootstrap_rollup(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, str],
    zone_keys: Sequence[str] | None = None,
    segment_partitions: int | None = None,
) -> dict[str, list[int]]:
    """First commit: pin the view spec as the exclusive version-1 blob
    (a second bootstrap raises instead of splitting the view across
    two definitions), then commit the bootstrap corpus's partial
    segment. ``zone_keys`` (subset of ``keys``, e.g. the time bucket)
    get per-segment min/max manifest stats for range-pruned reads."""
    keys = list(keys)
    zone_keys = list(zone_keys or [])
    if unknown := set(zone_keys) - set(keys):
        raise ValueError(f"bootstrap_rollup: zone_keys not in keys: {unknown}")
    spec = json.dumps(
        {"keys": keys, "measures": measures, "zone_keys": zone_keys},
        sort_keys=True,
    )
    lake.write_snapshot_blob(spark, spec, _spec_root(root), version=1)
    part = partial_rollup(df, keys, measures)
    if segment_partitions:
        part = part.coalesce(segment_partitions)
    return lake.append_segments(
        spark,
        root,
        appends={PARTIALS: part},
        init=True,
        zone_cols={PARTIALS: zone_keys} if zone_keys else None,
    )


def append_rollup_batch(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    keep_manifests: int = 2,
    orphan_grace_sec: float = 24 * 3600,
    reader_grace_sec: float | None = None,
    segment_partitions: int | None = None,
    meta: dict | None = None,
    expected_base: int | None = None,
) -> dict[str, list[int]]:
    """One O(batch) view refresh: partial-aggregate the batch under
    the PINNED spec, append one segment, flip the manifest, age out
    unpinned segments. Committed segments are never rewritten —
    per-refresh cost is independent of how much history the view
    holds. ``meta`` replaces the manifest's application metadata
    atomically with the commit (the streaming sink's exactly-once
    batch-id hook); callers whose ``meta`` was DERIVED from committed
    state must pass the manifest version it was read from as
    ``expected_base`` so a rival committer conflicts loudly instead of
    being clobbered (mirrors text_index._commit_batch)."""
    keys, measures, zone_keys = read_rollup_spec(spark, root)
    part = partial_rollup(df, keys, measures)
    if segment_partitions:
        part = part.coalesce(segment_partitions)
    pins = lake.append_segments(
        spark,
        root,
        appends={PARTIALS: part},
        zone_cols={PARTIALS: zone_keys} if zone_keys else None,
        meta=meta,
        expected_base=expected_base,
    )
    lake.expire_segments(
        spark,
        root,
        keep_manifests=keep_manifests,
        orphan_grace_sec=orphan_grace_sec,
        reader_grace_sec=reader_grace_sec,
    )
    return pins


def retract_rollup_batch(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    keep_manifests: int = 2,
    orphan_grace_sec: float = 24 * 3600,
    reader_grace_sec: float | None = None,
    segment_partitions: int | None = None,
) -> dict[str, list[int]]:
    """Remove FACTS from the served view in O(retraction batch) — the
    correction/backfill path every continuous aggregate needs (a
    mis-ingested file, a GDPR order touching fact rows): append one
    NEGATED partial segment (``_rows``, sums, and counts negative) and
    flip the manifest; the merge's additive fold then cancels the
    retracted contribution exactly, and fully-retracted groups drop
    out of the served view (merge_rollup's ``_rows > 0``). Committed
    segments are never rewritten, so a correction costs the same as an
    ingest.

    ``df`` must be (a subset of) facts that were actually ingested —
    the protocol is additive algebra, not reconciliation; retracting a
    never-ingested fact leaves the view inconsistent the same way
    double-ingesting one does.

    EXACTNESS CONTRACT: ``_rows``, ``{m}_sum``, ``{m}_cnt`` (and the
    derived avg) are exact after retraction. ``{m}_min`` / ``{m}_max``
    are NOT invertible from partial state — the negated segment
    carries NULL min/max (the merge skips NULLs), so after a
    retraction they are conservative BOUNDS: still valid envelopes of
    the live values unless the retracted fact WAS the extreme, in
    which case they over-cover until the view is rebuilt
    (bootstrap_rollup on corrected facts). This is the standard
    deletable-aggregate limitation; readers needing exact extremes
    after corrections should not select them."""
    keys, measures, zone_keys = read_rollup_spec(spark, root)
    part = partial_rollup(df, keys, measures)
    neg_cols = [F.col(k) for k in keys] + [(-F.col("_rows")).alias("_rows")]
    for name in measures:
        neg_cols += [
            (-F.col(f"{name}_sum")).alias(f"{name}_sum"),
            (-F.col(f"{name}_cnt")).alias(f"{name}_cnt"),
            F.lit(None).cast("double").alias(f"{name}_min"),
            F.lit(None).cast("double").alias(f"{name}_max"),
        ]
    neg = part.select(*neg_cols)
    # align the NULL min/max to the partial schema's exact types so
    # multi-segment parquet scans see one schema
    neg = neg.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in part.schema.fields
        ]
    )
    if segment_partitions:
        neg = neg.coalesce(segment_partitions)
    pins = lake.append_segments(
        spark,
        root,
        appends={PARTIALS: neg},
        zone_cols={PARTIALS: zone_keys} if zone_keys else None,
    )
    lake.expire_segments(
        spark,
        root,
        keep_manifests=keep_manifests,
        orphan_grace_sec=orphan_grace_sec,
        reader_grace_sec=reader_grace_sec,
    )
    return pins


def read_rollup(
    spark: SparkSession,
    root: str,
    derive_avg: bool = True,
) -> DataFrame:
    """The served view: merge the manifest-pinned partial segments.
    ``derive_avg`` adds ``{m}_avg = {m}_sum / {m}_cnt`` (NULL when the
    group has no non-null values — never a divide-by-zero under ANSI
    mode)."""
    keys, measures, _zk = read_rollup_spec(spark, root)
    parts = lake.read_segmented_components(spark, root, [PARTIALS])[PARTIALS]
    out = merge_rollup(parts, keys, measures)
    if derive_avg:
        for name in measures:
            out = out.withColumn(
                f"{name}_avg",
                F.when(
                    F.col(f"{name}_cnt") > 0,
                    F.col(f"{name}_sum") / F.col(f"{name}_cnt"),
                ),
            )
    return out


def read_rollup_range(
    spark: SparkSession,
    root: str,
    key: str,
    lo=None,
    hi=None,
    derive_avg: bool = True,
) -> DataFrame:
    """The view restricted to ``lo <= key <= hi`` where ``key`` is a
    zone-mapped group key: segments whose recorded range misses the
    predicate are excluded DRIVER-SIDE from the scan (chunk
    exclusion — at 100 TB a month-window read of a years-deep rollup
    touches only that month's segments), then the row predicate
    applies to whatever remains."""
    keys, measures, zone_keys = read_rollup_spec(spark, root)
    if key not in zone_keys:
        raise ValueError(
            f"read_rollup_range: {key!r} is not a zone key of this view "
            f"(zone_keys={zone_keys})"
        )
    parts = lake.read_segments_zone_pruned(spark, root, PARTIALS, key, lo, hi)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(key) >= F.lit(lo))
    if hi is not None:
        pred = pred & (F.col(key) <= F.lit(hi))
    out = merge_rollup(parts.filter(pred), keys, measures)
    if derive_avg:
        for name in measures:
            out = out.withColumn(
                f"{name}_avg",
                F.when(
                    F.col(f"{name}_cnt") > 0,
                    F.col(f"{name}_sum") / F.col(f"{name}_cnt"),
                ),
            )
    return out


def compact_rollup(
    spark: SparkSession, root: str, min_segments: int = 2
) -> dict[str, list[int]]:
    """Fold the partial segments into one by running the merge as the
    compaction reducer — valid precisely because merged partials ARE
    partials (same schema, same associativity). Bounds the
    segments-per-read fan-in of a long-running view; zonemap coverage
    is recomputed by compact_segments from manifest metadata."""
    keys, measures, _zk = read_rollup_spec(spark, root)
    return lake.compact_segments(
        spark,
        root,
        reducers={PARTIALS: lambda df: merge_rollup(df, keys, measures)},
        min_segments=min_segments,
    )
