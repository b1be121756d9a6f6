"""Z-order-clustered segment layout: multi-column data skipping.

Writes a fact frame as segmented-lake segments RANGE-SLICED on the
Morton interleave of N columns (functions/zorder), with zonemaps on
the RAW columns — so a multi-dimensional box predicate prunes segments
on every dimension driver-side (:func:`box_pruned_pins` intersects the
per-column zonemap keeps). With one-column sorting the off-sort
predicates keep every segment; with z-clustering all predicates cut,
which is the whole point of space-filling-curve layouts at 100 TB.

Both the bootstrap writer and the recluster maintenance verb are
SINGLE-PASS: the z-keyed frame is range-partitioned on its slice and
written as N segments by ONE Spark job (lake.stage_segments /
the (frame, slice_col) staged form of append_segments), never one
filter-pass per slice. All manifest choreography — snapshot, carry,
re-zone, re-bloom, schema subset, ``expected_base`` flip, bounded
commit-race retry — is owned by lake.rewrite_segments; this module
only decides WHAT to fold and HOW to slice it.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F

from ed_housing_data_pipeline_spark.functions.zorder import zorderN
from ed_housing_data_pipeline_spark.sources import lake


def write_zorder_clustered(
    spark,
    root: str,
    df: DataFrame,
    component: str,
    x_expr: str,
    y_expr: str,
    zone_cols: Sequence[str],
    n_segments: int = 8,
    bits: int = 10,
) -> dict[str, list[int]]:
    """The 2-D calling convention of
    :func:`write_zorder_clustered_n` (kept for the common case)."""
    return write_zorder_clustered_n(
        spark,
        root,
        df,
        component,
        [x_expr, y_expr],
        zone_cols,
        n_segments=n_segments,
        bits=bits,
    )


def write_zorder_clustered_n(
    spark,
    root: str,
    df: DataFrame,
    component: str,
    exprs: Sequence[str],
    zone_cols: Sequence[str],
    n_segments: int = 8,
    bits: int = 10,
) -> dict[str, list[int]]:
    """Cluster ``df`` into ``n_segments`` z-contiguous segments on the
    N-dim Morton interleave of ``exprs`` (N·bits ≤ 63 — 3-4 dimension
    clustering like date × key × region at the default 10 bits/dim),
    as ONE staged write job + ONE manifest commit.

    Slice boundaries come from approximate z-quantiles (one agg pass);
    duplicate cut points (skewed z) collapse, so fewer, fuller
    segments — never empty ones. Rows whose z is NULL (out-of-range
    inputs, see functions/zorder) land in the LAST slice so no row is
    lost; their segment keeps zone stats, it's just less tight."""
    zed = df.withColumn("_z", zorderN(exprs, bits))
    zed.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        staged = _z_staged(zed, n_segments)
        return lake.append_segments(
            spark,
            root,
            appends={component: (staged, "_slice")},
            init=True,
            zone_cols={component: list(zone_cols)},
        )
    finally:
        zed.unpersist()


# exact cuts up to this many rows (the percentile sketch degrades
# gracefully to approximate — but still 63-bit-precise — beyond it)
_Z_QUANTILE_ACCURACY = 1_000_000


def _z_slices(zed: DataFrame, n_segments: int) -> tuple[DataFrame, int]:
    """``(frame with an int ``_slice`` column, slice count)`` from a
    persisted z-keyed frame — the slice assignment shared by the
    bootstrap writer and :func:`recluster_zorder`. Boundaries come
    from ``approx_percentile`` ON THE BIGINT z itself (one agg pass,
    fused with the z-max probe), so cut literals are exact 64-bit
    integers — a float64 round-trip would collapse distinct z values above
    2^53 (possible at n·bits > 53) and smear boundary rows across
    slices. Duplicate cuts (skewed z) collapse, so fewer, fuller
    segments — never empty ones; rows whose z is NULL (out-of-range
    inputs, see functions/zorder) land in the LAST slice so no row is
    lost."""
    cuts: list[int] = []
    if n_segments > 1:
        probs = ", ".join(
            repr(i / n_segments) for i in range(1, n_segments)
        )
        row = zed.agg(
            F.expr(
                f"approx_percentile(_z, array({probs}), "
                f"{_Z_QUANTILE_ACCURACY})"
            ).alias("cuts"),
            F.max("_z").alias("zmax"),
        ).collect()[0]
        zmax = row["zmax"]
        raw = row["cuts"]
        if zmax is not None and int(zmax) >= (1 << 53):
            # the percentile sketch holds doubles internally, so cut
            # PLACEMENT above 2^53 would be float-rounded: recompute on
            # the shifted key (exact in double space) and map back with
            # exact integer boundaries — placement granularity degrades
            # to 2^shift (≪ the z range), assignment stays exact
            shift = int(zmax).bit_length() - 53
            srow = zed.agg(
                F.expr(
                    f"approx_percentile(shiftright(_z, {shift}), "
                    f"array({probs}), {_Z_QUANTILE_ACCURACY})"
                ).alias("cuts")
            ).collect()[0]
            raw = (
                None
                if srow["cuts"] is None
                else [((int(c) + 1) << shift) - 1 for c in srow["cuts"]]
            )
        if zmax is not None and raw is not None:
            # drop duplicate cuts and any cut at the max (its upper
            # slice would be empty); all-NULL z → no cuts, one slice
            cuts = sorted({int(c) for c in raw if int(c) < int(zmax)})
    # slice id = number of cuts strictly below z; NULL z → last slice
    slice_sql = " + ".join(
        f"CAST(_z > CAST({c} AS BIGINT) AS INT)" for c in cuts
    ) or "0"
    return (
        zed.withColumn(
            "_slice",
            F.coalesce(F.expr(slice_sql), F.lit(len(cuts))).cast("int"),
        ),
        len(cuts) + 1,
    )


def _z_staged(zed: DataFrame, n_segments: int) -> DataFrame:
    """The staged single-write-job form of the slice assignment:
    range-partitioned so each task holds one z-contiguous slice,
    z-sorted within partitions for file-internal locality, ``_z``
    dropped (the raw columns carry the zonemaps). Feed to
    lake.stage_segments / the staged append with slice_col='_slice'."""
    zed_s, n_slices = _z_slices(zed, n_segments)
    return (
        zed_s.repartitionByRange(n_slices, "_slice", "_z")
        .sortWithinPartitions("_slice", "_z")
        .drop("_z")
    )


def plan_recluster(
    spark,
    root: str,
    component: str,
    exprs: Sequence[str],
    bits: int | str = 10,  # "sort" = recluster_sorted's marker sentinel
    min_segments: int = 2,
    max_segment_bytes: int | None = None,
    force: bool = False,
    max_waves: int | None = 8,
    snap: lake.ManifestSnapshot | None = None,
) -> dict:
    """The fold-set decision of :func:`recluster_zorder`, callable on
    its own (one implementation — the verb's plan closure and
    lake.maintain's dry-run report both use it): reads the layout
    marker, applies the size tier, and decides a level-merge. Returns
    ``{"fold": [segs], "level_merge": bool, "waves": next_count,
    "base": [graduated segs carried in the next marker]}``; an empty
    ``fold`` means the pass would be a no-op. Driver-side metadata
    plus the size probe — no Spark jobs."""
    if snap is None:
        snap = lake.manifest_snapshot(spark, root)
    pins = snap.pins[component]
    marker = (snap.meta or {}).get(f"zcluster_{component}") or {}
    already: set[int] = set()
    waves = 0
    if (
        not force
        and marker.get("exprs") == list(exprs)
        and marker.get("bits") == bits
    ):
        already = set(marker.get("segs", [])) & set(pins)
        if already:
            waves = int(marker.get("waves", 1))
    candidates = [s for s in pins if s not in already]
    if force:
        return {
            "fold": list(pins),
            "level_merge": True,
            "waves": 1,
            "base": [],
        }
    if max_segment_bytes is None:
        small = candidates
    else:
        sizes = lake.segment_sizes(spark, root, component, candidates)
        small = [s for s in candidates if sizes[s] < max_segment_bytes]
    if len(small) < min_segments:
        return {"fold": [], "level_merge": False, "waves": waves, "base": sorted(already)}
    if max_waves is not None and waves >= max_waves:
        # automatic level-merge: this wave would exceed the budget, so
        # the graduated waves fold back in with it
        return {
            "fold": sorted(set(small) | already),
            "level_merge": True,
            "waves": 1,
            "base": [],
        }
    return {
        "fold": small,
        "level_merge": False,
        "waves": waves + 1,
        "base": sorted(already),
    }


def recluster_zorder(
    spark,
    root: str,
    component: str,
    exprs: Sequence[str],
    zone_cols: Sequence[str],
    n_segments: int = 8,
    bits: int = 10,
    min_segments: int = 2,
    max_segment_bytes: int | None = None,
    force: bool = False,
    max_waves: int | None = 8,
    max_attempts: int = 3,
) -> dict[str, list[int]]:
    """OPTIMIZE … ZORDER BY as a maintenance verb over an EXISTING
    segmented component: fold the pinned segments (or, with
    ``max_segment_bytes``, only the small tail — the LSM shape) into
    z-contiguous slices under ONE pinned manifest flip, with zonemaps
    recomputed on the raw columns. This is what a long-ingested table
    runs on a cadence so compound-predicate pruning stays tight after
    thousands of append commits wrote arrival-ordered segments.

    CONVERGENT by construction: the committed manifest meta records
    this layout's own output slices (keyed by the expr/bits
    signature), and later passes fold only segments OUTSIDE that set —
    a cadence job with no new ingests is a no-op (no jobs beyond the
    size probe, no commit), never a perpetual O(tail) rewrite. New
    ingests since the last pass get their own slice wave (pins grow by
    ≤ n_segments per wave, z-ranges may overlap across waves — zonemap
    pruning doesn't require disjointness). BOUNDED GROWTH: the marker
    counts graduated waves, and once a pass would start wave
    ``max_waves + 1`` it instead folds every candidate AND the prior
    waves' slices as one clean level-merge (wave count resets to 1) —
    read fan-in is capped at ~``max_waves × n_segments`` without an
    operator remembering to schedule force passes. ``force=True``
    triggers that whole-component level-merge explicitly and overrides
    the size filter; changing ``exprs``/``bits`` invalidates the
    marker automatically.

    Execution rides lake.rewrite_segments: the fold set is planned
    against one manifest snapshot, the slices land from ONE staged
    write job, untouched segments keep their pins/zonemaps/blooms,
    bloom coverage is rebuilt on the fresh slices (batched), and a
    rival ingest landing mid-pass triggers a replan-from-fresh-pins
    retry (up to ``max_attempts``; the failed attempt's slices are
    unpinned debris for the orphan sweep) before the typed conflict
    propagates. Content-neutral by construction: the rows are
    re-sliced, never transformed."""
    zone_cols = list(zone_cols)
    marker_key = f"zcluster_{component}"
    ctx: dict = {}
    persisted: list[DataFrame] = []

    def plan(snap: lake.ManifestSnapshot) -> list[int]:
        p = plan_recluster(
            spark,
            root,
            component,
            exprs,
            bits=bits,
            min_segments=min_segments,
            max_segment_bytes=max_segment_bytes,
            force=force,
            max_waves=max_waves,
            snap=snap,
        )
        ctx.update(base=set(p["base"]), waves=p["waves"])
        return p["fold"]

    def meta_update(prior_meta: dict, new_segs: list[int]) -> dict:
        return {
            **(prior_meta or {}),
            marker_key: {
                "exprs": list(exprs),
                "bits": bits,
                "segs": sorted(ctx["base"] | set(new_segs)),
                "waves": ctx["waves"],
            },
        }

    def rewrite(df: DataFrame):
        zed = df.withColumn("_z", zorderN(exprs, bits))
        zed.persist(StorageLevel.MEMORY_AND_DISK)
        persisted.append(zed)
        return (_z_staged(zed, n_segments), "_slice")

    try:
        return lake.rewrite_segments(
            spark,
            root,
            component,
            rewrite=rewrite,
            plan=plan,
            min_segments=min_segments,
            zone_cols=zone_cols,
            meta_update=meta_update,
            max_attempts=max_attempts,
        )
    finally:
        for z in persisted:
            z.unpersist()


def recluster_sorted(
    spark,
    root: str,
    component: str,
    order_expr: str,
    zone_cols: Sequence[str],
    n_segments: int = 8,
    min_segments: int = 2,
    max_segment_bytes: int | None = None,
    force: bool = False,
    max_waves: int | None = 8,
    max_attempts: int = 3,
) -> dict[str, list[int]]:
    """OPTIMIZE … ORDER BY as a maintenance verb — the SINGLE-column
    sibling of :func:`recluster_zorder` for workloads whose predicates
    hit one dimension (time-series retention scans, id-range reads):
    fold the pinned tail into range-contiguous segments on
    ``order_expr`` (numeric — slice cuts come from approx_percentile)
    so that column's zonemaps become tight. Same machinery end to end
    — the layout marker (keyed by the expr with a ``"sort"`` bits
    sentinel, so switching between sorted and z-order layouts
    invalidates cleanly), the size tier, the wave budget with
    automatic level-merge, the ONE staged write job, and
    lake.rewrite_segments owning the manifest choreography — which is
    the point of the fold-to-N hook: a new layout verb is ~30 lines of
    WHAT, zero lines of manifest HOW."""
    zone_cols = list(zone_cols)
    marker_key = f"zcluster_{component}"
    ctx: dict = {}
    persisted: list[DataFrame] = []

    def plan(snap: lake.ManifestSnapshot) -> list[int]:
        p = plan_recluster(
            spark,
            root,
            component,
            [order_expr],
            bits="sort",
            min_segments=min_segments,
            max_segment_bytes=max_segment_bytes,
            force=force,
            max_waves=max_waves,
            snap=snap,
        )
        ctx.update(base=set(p["base"]), waves=p["waves"])
        return p["fold"]

    def meta_update(prior_meta: dict, new_segs: list[int]) -> dict:
        return {
            **(prior_meta or {}),
            marker_key: {
                "exprs": [order_expr],
                "bits": "sort",
                "segs": sorted(ctx["base"] | set(new_segs)),
                "waves": ctx["waves"],
            },
        }

    def rewrite(df: DataFrame):
        from pyspark.sql.types import NumericType  # noqa: PLC0415

        key_type = df.selectExpr(order_expr).schema[0].dataType
        if not isinstance(key_type, NumericType):
            # a silent cast('bigint') would NULL every key and fold the
            # whole component into ONE unsorted slice — an expensive
            # no-op wearing a success marker; reject typed instead
            raise ValueError(
                f"recluster_sorted: order_expr {order_expr!r} resolves to "
                f"{key_type.simpleString()}; range slicing needs a numeric "
                "key (cuts come from approx_percentile)"
            )
        zed = df.withColumn(
            "_z", F.expr(order_expr).cast("bigint")
        )
        zed.persist(StorageLevel.MEMORY_AND_DISK)
        persisted.append(zed)
        return (_z_staged(zed, n_segments), "_slice")

    try:
        return lake.rewrite_segments(
            spark,
            root,
            component,
            rewrite=rewrite,
            plan=plan,
            min_segments=min_segments,
            zone_cols=zone_cols,
            meta_update=meta_update,
            max_attempts=max_attempts,
        )
    finally:
        for z in persisted:
            z.unpersist()


def box_pruned_pins(
    spark, root: str, component: str, box: Mapping[str, tuple]
) -> tuple[list[int], list[int]]:
    """(kept, pinned) for a conjunctive multi-column range predicate
    ``{col: (lo, hi), ...}``: the intersection of each column's
    zonemap keeps, order-preserving. Driver-side metadata only."""
    if not box:
        # an empty box is almost certainly a caller bug (it would mean
        # "no predicate" — use the plain pinned read for that), and
        # silently returning ([], []) made read_box fail opaquely
        raise ValueError(
            "box_pruned_pins: empty box; use read_segmented_components "
            "for an unpredicated scan"
        )
    # ONE manifest snapshot for every dimension's prune (N separate
    # reads could straddle a rival commit and intersect pin lists from
    # different versions)
    snap = lake.manifest_snapshot(spark, root)
    kept, pinned, _schema = _box_pruned_from_state(
        component, box, snap.pins, snap.zones, None
    )
    return kept, pinned


def _box_pruned_from_state(component, box, pins, zones, schemas):
    """(kept, pinned, manifest schema) from one already-read manifest
    state — shared by box_pruned_pins and read_box so both resolve
    pins AND schema from the same snapshot."""
    kept_sets = []
    pinned: list[int] = []
    for col, (lo, hi) in box.items():
        kept, pinned = lake.zone_pruned_pins_from_state(
            component, col, lo, hi, pins, zones
        )
        kept_sets.append(set(kept))
    kept_all = set.intersection(*kept_sets) if kept_sets else set(pinned)
    schema = (
        lake.schema_from_json(schemas.get(component))
        if schemas is not None
        else None
    )
    return [s for s in pinned if s in kept_all], pinned, schema


def read_box(
    spark, root: str, component: str, box: Mapping[str, tuple]
) -> DataFrame:
    """The component's manifest-pinned scan restricted to segments
    whose zonemaps may intersect the box — the caller still applies
    the row-level predicates (skipping only shrinks the file set).
    Schema-reconciled like every manifest read: kept segments may span
    schema vintages (add-column appends, in-place type widening), and
    the scan must not inherit whichever file's footer Spark samples
    first; pins and schema resolve from ONE manifest snapshot."""
    if not box:
        raise ValueError(
            "read_box: empty box; use read_segmented_components for an "
            "unpredicated scan"
        )
    snap = lake.manifest_snapshot(spark, root)
    kept, pinned, schema = _box_pruned_from_state(
        component, box, snap.pins, snap.zones, snap.schemas
    )
    comp_root = f"{root.rstrip('/')}/{component}"
    if not kept:
        return lake.read_segments(
            spark, comp_root, pinned[:1], schema=schema
        ).filter(F.lit(False))
    return lake.read_segments(spark, comp_root, kept, schema=schema)
