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
# manifest-meta flag a REPAIRING retraction sets: only then do the
# serving merges need the min/max reset fold (a window pass that
# forfeits map-side combine); reset-free views — the overwhelmingly
# common state — keep the plain partial-aggregated fold
MM_RESETS_KEY = "rollup_minmax_resets"


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
    partials: DataFrame,
    keys: Sequence[str],
    measures: dict[str, str],
    keep_state: bool = False,
    keep_zero: bool = False,
) -> DataFrame:
    """Fold partial states: sums and counts add, min/max fold — the
    associativity that makes ``merge(partials) == partial(union)``
    exactly (F.sum/min/max skip NULLs on both levels). Groups whose
    merged ``_rows`` reaches 0 — every fact retracted
    (:func:`retract_rollup_batch`) — drop out, exactly as a GROUP BY
    over the corrected facts would produce no row for them (the
    filter is a no-op on retraction-free views: every batch partial
    carries ``_rows >= 1``).

    ``keep_zero=True`` retains those net-zero/negative groups — the
    SUBSET-SOUNDNESS switch compaction reducers need: a size-tiered
    fold sees only SOME segments, so a retraction's negative partial
    may fold apart from its positive twin and the group's partial sum
    legitimately passes through ≤ 0; dropping it there would lose the
    retraction (the served total would resurrect the deleted facts
    once the graduated twin folds back in). Serving reads keep the
    default: the net-zero drop is a VIEW rule, applied once at the
    final full merge, never inside a partial fold.

    MIN/MAX RESET semantics (exact extremes through retraction): when
    the frame carries the ``_useq``/``_mm_reset`` state columns the
    persisted protocol stamps, a reset row — written by a repairing
    retraction, holding the EXACT re-aggregated min/max of its group
    as of commit sequence ``_useq`` — supersedes every older row's
    min/max for that group: the fold takes min/max only over the
    highest reset row and rows committed strictly AFTER it (new
    ingests keep folding in). Sums/counts fold over everything (reset
    rows carry zeros). This stays associative: a merged row stamped
    (max ``_useq``, OR of ``_mm_reset``) re-merges with later partials
    to the same result, which is what lets compaction use this very
    fold as its reducer (``keep_state=True`` keeps the stamp columns;
    the default drops them for serving). Frames without the state
    columns (ad-hoc merges of raw :func:`partial_rollup` outputs) get
    the plain fold."""
    has_state = "_useq" in partials.columns
    if has_state:
        from pyspark.sql import Window  # noqa: PLC0415

        useq = F.coalesce(F.col("_useq"), F.lit(0))
        reset = F.coalesce(F.col("_mm_reset"), F.lit(False))
        # the window's hash partitioning on the keys is reused by the
        # groupBy below — one shuffle total, same as the plain fold
        w = Window.partitionBy(*keys)
        s_star = F.max(F.when(reset, useq)).over(w)
        mm_ok = (
            s_star.isNull()
            | (useq > s_star)
            | (reset & (useq == s_star))
        )
        eff = partials.select(
            *keys,
            "_rows",
            useq.alias("_useq"),
            reset.alias("_mm_reset"),
            *[
                c
                for name in measures
                for c in (
                    F.col(f"{name}_sum"),
                    F.col(f"{name}_cnt"),
                    F.when(mm_ok, F.col(f"{name}_min")).alias(f"{name}_min"),
                    F.when(mm_ok, F.col(f"{name}_max")).alias(f"{name}_max"),
                )
            ],
        )
    else:
        eff = partials
    aggs = [F.sum("_rows").alias("_rows")]
    for name in measures:
        aggs += [
            F.sum(f"{name}_sum").alias(f"{name}_sum"),
            F.sum(f"{name}_cnt").alias(f"{name}_cnt"),
            F.min(f"{name}_min").alias(f"{name}_min"),
            F.max(f"{name}_max").alias(f"{name}_max"),
        ]
    if has_state and keep_state:
        aggs += [
            F.max("_useq").alias("_useq"),
            F.max("_mm_reset").alias("_mm_reset"),
        ]
    out = eff.groupBy(*keys).agg(*aggs)
    return out if keep_zero else out.filter(F.col("_rows") > 0)


def _spec_root(root: str) -> str:
    return f"{root.rstrip('/')}/spec"


def _stamp(part: DataFrame, seq: int, mm_reset: bool = False) -> DataFrame:
    """Stamp a partial frame with the manifest sequence committing it
    (``_useq``) and the min/max-reset flag — the state columns
    :func:`merge_rollup`'s reset semantics fold on. Ordinary ingests
    and retractions stamp ``mm_reset=False``; only a repairing
    retraction's re-aggregated override rows carry True."""
    return part.withColumn("_useq", F.lit(int(seq)).cast("bigint")).withColumn(
        "_mm_reset", F.lit(bool(mm_reset))
    )


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
    part = _stamp(partial_rollup(df, keys, measures), 1)
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
    being clobbered (mirrors text_index._commit_batch).

    Partials are stamped with the committing manifest sequence (the
    merge's min/max-reset axis), so the commit is always PINNED: with
    ``expected_base`` the caller owns retries; without, a bounded
    internal retry re-reads and re-stamps — a row stamped with a stale
    sequence could otherwise be wrongly superseded by a concurrent
    repair's reset."""
    keys, measures, zone_keys = read_rollup_spec(spark, root)
    part = partial_rollup(df, keys, measures)
    if segment_partitions:
        part = part.coalesce(segment_partitions)

    def _commit(base: int) -> dict[str, list[int]]:
        return lake.append_segments(
            spark,
            root,
            appends={PARTIALS: _stamp(part, base + 1)},
            zone_cols={PARTIALS: zone_keys} if zone_keys else None,
            meta=meta,
            expected_base=base,
        )

    if expected_base is not None:
        pins = _commit(expected_base)
    else:
        last_err: Exception | None = None
        for _attempt in range(3):
            _p, base = lake.segment_pins_versioned(spark, root)
            try:
                pins = _commit(base)
                break
            except lake.ConcurrentCommitError as e:
                last_err = e
        else:
            raise last_err
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
    remaining_facts: DataFrame | None = None,
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
    derived avg) are always exact after retraction. MIN/MAX are not
    invertible from partial state, so:

    - With ``remaining_facts`` (the corrected fact source — at least
      every live fact of the groups being touched), min/max stay
      EXACT: the commit detects DIRTY groups (the retracted batch's
      extreme ties the group's served extreme — the only groups whose
      bounds can move), re-aggregates min/max for exactly those groups
      from ``remaining_facts`` (one semi-joined O(dirty groups' facts)
      agg, never a view rebuild), and appends the results as
      ``_mm_reset`` override rows the merge's reset fold honors
      (r9 VERDICT #8). The whole correction — negation + overrides —
      is ONE segment under one pinned flip.
    - Without it, min/max degrade to conservative BOUNDS: still valid
      envelopes unless the retracted fact WAS the extreme, in which
      case they over-cover until a repairing retraction or a rebuild
      (the classic deletable-aggregate limitation)."""
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
    last_err: Exception | None = None
    for _attempt in range(3):
        pins0, meta0, base = lake.segment_state(spark, root)
        seq = base + 1
        seg = _stamp(neg, seq)
        new_meta = None
        if remaining_facts is not None:
            new_meta = {**meta0, MM_RESETS_KEY: True}
            served = merge_rollup(
                lake.read_segmented_components(spark, root, [PARTIALS])[
                    PARTIALS
                ],
                keys,
                measures,
            )
            # a group is DIRTY iff the retracted batch's extreme
            # reaches the served extreme — only then can the true
            # extreme move (<=/>= instead of == for float safety;
            # over-marking only costs a harmless re-aggregation)
            dirty_pred = F.lit(False)
            for name in measures:
                dirty_pred = (
                    dirty_pred
                    | (F.col(f"r.{name}_min") <= F.col(f"s.{name}_min"))
                    | (F.col(f"r.{name}_max") >= F.col(f"s.{name}_max"))
                )
            dirty = (
                part.alias("r")
                .join(served.alias("s"), on=list(keys))
                .filter(dirty_pred)
                .select(*keys)
            )
            repair = partial_rollup(
                remaining_facts.join(dirty, on=list(keys), how="left_semi"),
                keys,
                measures,
            )
            # override rows: exact min/max, ZERO additive state (the
            # negation already balanced the books)
            over_cols = [F.col(k) for k in keys] + [
                F.lit(0).cast("bigint").alias("_rows")
            ]
            for name in measures:
                over_cols += [
                    (F.col(f"{name}_sum") * 0).alias(f"{name}_sum"),
                    F.lit(0).cast("bigint").alias(f"{name}_cnt"),
                    F.col(f"{name}_min"),
                    F.col(f"{name}_max"),
                ]
            override = repair.select(*over_cols).select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in part.schema.fields
                ]
            )
            seg = seg.unionByName(_stamp(override, seq, mm_reset=True))
        if segment_partitions:
            seg = seg.coalesce(segment_partitions)
        try:
            pins = lake.append_segments(
                spark,
                root,
                appends={PARTIALS: seg},
                zone_cols={PARTIALS: zone_keys} if zone_keys else None,
                meta=new_meta,
                # the override rows are derived from the served view at
                # `base`; a rival commit in between must conflict, not
                # be silently rebased under a stale repair
                expected_base=base,
            )
            break
        except lake.ConcurrentCommitError as e:
            last_err = e
    else:
        raise last_err
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
    if not lake.segment_meta(spark, root).get(MM_RESETS_KEY):
        # no repair ever committed: the state columns are inert — drop
        # them so the merge keeps its map-side partial aggregation
        parts = parts.drop("_useq", "_mm_reset")
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
    if not lake.segment_meta(spark, root).get(MM_RESETS_KEY):
        parts = parts.drop("_useq", "_mm_reset")
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
    spark: SparkSession,
    root: str,
    min_segments: int = 2,
    max_segment_bytes: int | None = None,
) -> dict[str, list[int]]:
    """Fold partial segments by running the merge as the compaction
    reducer — valid precisely because merged partials ARE partials
    (same schema, same associativity). Bounds the segments-per-read
    fan-in of a long-running view; zonemap coverage is recomputed by
    compact_segments from manifest metadata.

    With ``max_segment_bytes`` (SIZE-TIERED maintenance — see
    lake.compact_segments) the reducer folds with ``keep_zero=True``:
    net-zero groups stay in the compacted PARTIAL and drop only at
    serve time, which is what makes the fold SUBSET-SOUND — a tiered
    pass may fold a retraction's negative partial apart from its
    graduated positive twin, and the kept ≤0 group still cancels the
    twin at serve. A year-long continuous aggregate then pays
    amortized-logarithmic rewrite work instead of O(dataset) per pass,
    with serving byte-identical to the uncompacted view. FULL folds
    (``max_segment_bytes=None``) keep the net-zero drop: with every
    segment in the fold the cancellation is already complete, so
    fully-retracted groups leave the physical segment — the pass that
    eventually sweeps any zero rows a tiered pass parked.

    Views whose manifest carries the min/max-reset flag (a repairing
    retraction committed — :func:`retract_rollup_batch`) are the one
    exception: the reset fold is NOT subset-sound (a tier holding pre-
    and post-reset rows of a group whose reset row already graduated
    would fold superseded extremes back in), so such a pass ignores
    ``max_segment_bytes`` and folds EVERYTHING — and, having applied
    every reset, retires the flag and the state columns in the same
    commit: the compacted min/max are plain exact values again, the
    view returns to the map-side-combined serve fold, and the NEXT
    pass regains size-tiering. The reducer decision and the fold are
    pinned to ONE manifest version (``expected_base``): a retraction
    landing between the meta read and the fold conflicts loudly and
    the bounded retry re-decides from fresh state, instead of running
    the no-reset reducer over state that now contains reset rows."""
    keys, measures, _zk = read_rollup_spec(spark, root)
    last_err: Exception | None = None
    for _attempt in range(3):
        meta, version = lake.segment_meta_versioned(spark, root)
        has_resets = bool(meta.get(MM_RESETS_KEY))
        if has_resets:
            # reset-aware FULL fold: masking applied, stamps dropped —
            # the output rows are plain exact partials, so the flag
            # retires with the same flip (meta override below)
            def _reduce(df: DataFrame) -> DataFrame:
                return merge_rollup(df, keys, measures)

        else:
            # reset-free: inert state columns drop and the fold keeps
            # its map-side combine; later rows' sequences only matter
            # RELATIVE to reset rows, so compacting them away is sound.
            # keep_zero only under size-tiering, where the fold may be
            # a subset; a full fold sweeps net-zero groups physically
            def _reduce(df: DataFrame) -> DataFrame:
                return merge_rollup(
                    df.drop("_useq", "_mm_reset"), keys, measures,
                    keep_zero=max_segment_bytes is not None,
                )

        try:
            return lake.compact_segments(
                spark,
                root,
                reducers={PARTIALS: _reduce},
                min_segments=min_segments,
                max_segment_bytes=None if has_resets else max_segment_bytes,
                expected_base=version,
                meta={**meta, MM_RESETS_KEY: False} if has_resets else None,
            )
        except lake.ConcurrentCommitError as e:
            last_err = e
    raise last_err
