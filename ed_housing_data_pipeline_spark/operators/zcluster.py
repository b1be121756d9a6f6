"""Z-order-clustered segment layout: multi-column data skipping.

Writes a fact frame as segmented-lake segments RANGE-SLICED on the
Morton interleave of two columns (functions/zorder), with zonemaps on
the RAW columns — so a 2-D box predicate prunes segments on both
dimensions driver-side (:func:`box_pruned_pins` intersects the
per-column zonemap keeps). With one-column sorting the second
predicate keeps every segment; with z-clustering both predicates cut,
which is the whole point of space-filling-curve layouts at 100 TB.

Scale note on the writer: each z-slice becomes one ``append_segments``
commit, so the demo writer below makes ``n_segments`` passes over the
(persisted) input. At real scale you'd stage the z-keyed frame once
with ``repartitionByRange(n, z)`` and commit the already-materialized
slices — the read path and manifest layout are identical; only the
write amplification differs, and the input is persisted here so the
passes are memory-local at test scale.
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
    clustering like date × key × region at the default 10 bits/dim).

    Slice boundaries come from approximate z-quantiles (one pass);
    duplicate cut points (skewed z) collapse, so fewer, fuller
    segments — never empty ones. Rows whose z is NULL (out-of-range
    inputs, see functions/zorder) land in the LAST slice so no row is
    lost; their segment keeps zone stats, it's just less tight."""
    zed = df.withColumn("_z", zorderN(exprs, bits))
    zed.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        zed_s, n_slices = _z_slices(zed, n_segments)
        pins: dict[str, list[int]] = {}
        for i in range(n_slices):
            part = zed_s.filter(F.col("_slice") == i).drop("_z", "_slice")
            pins = lake.append_segments(
                spark,
                root,
                appends={component: part},
                init=(i == 0),
                zone_cols={component: list(zone_cols)},
            )
        return pins
    finally:
        zed.unpersist()


def _z_slices(zed: DataFrame, n_segments: int) -> tuple[DataFrame, int]:
    """``(frame with an int ``_slice`` column, slice count)`` from a
    persisted z-keyed frame — the slice assignment shared by the
    bootstrap writer and :func:`recluster_zorder` (one copy of the
    skewed-z and NULL-z edge handling). Boundaries come from
    approximate z-quantiles (one pass); duplicate cuts (skewed z)
    collapse, so fewer, fuller segments — never empty ones; rows whose
    z is NULL (out-of-range inputs, see functions/zorder) land in the
    LAST slice so no row is lost."""
    probs = [i / n_segments for i in range(1, n_segments)]
    cuts = zed.stat.approxQuantile("_z", probs, 0.0)
    # drop duplicate cuts and any cut at the max (its upper slice
    # would be empty); all-NULL z → no cuts, one slice
    zmax = zed.agg(F.max("_z")).collect()[0][0]
    cuts = sorted({c for c in cuts if zmax is not None and c < zmax})
    # slice id = number of cuts strictly below z; NULL z → last slice
    slice_sql = " + ".join(
        f"CAST(_z > {float(c)!r} AS INT)" for c in cuts
    ) or "0"
    return (
        zed.withColumn(
            "_slice",
            F.coalesce(F.expr(slice_sql), F.lit(len(cuts))).cast("int"),
        ),
        len(cuts) + 1,
    )


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
    pruning doesn't require disjointness); ``force=True`` ignores the
    marker and re-lays the whole component out as one clean wave (the
    periodic level-merge). Changing ``exprs``/``bits`` invalidates the
    marker automatically.

    Differences from :func:`write_zorder_clustered_n` (the bootstrap
    writer): the input is the component's own pinned scan
    (schema-reconciled), untouched segments keep their pins/zonemaps/
    blooms, all slices land as UNCOMMITTED segments first and ONE
    commit_segment_manifest flips them in with ``expected_base`` — a
    rival ingest conflicts loudly (retry from fresh pins) instead of
    being dropped, and a crash mid-pass leaves only unpinned debris
    for the orphan sweep. Content-neutral by construction: the rows
    are re-sliced, never transformed."""
    zone_cols = list(zone_cols)
    pins, zones, blooms, meta, schemas, base = lake._manifest_state(spark, root)
    if component not in pins:
        raise KeyError(f"recluster_zorder: no pinned component {component!r}")
    marker_key = f"zcluster_{component}"
    marker = meta.get(marker_key) or {}
    already: set[int] = set()
    if (
        not force
        and marker.get("exprs") == list(exprs)
        and marker.get("bits") == bits
    ):
        already = set(marker.get("segs", [])) & set(pins[component])
    candidates = [s for s in pins[component] if s not in already]
    if force or max_segment_bytes is None:
        # force IS the whole-component level-merge: it must override
        # the size filter too, else graduated prior waves would be
        # excluded forever and the merge the flag exists for never runs
        fold = candidates
    else:
        fold = [
            s
            for s in candidates
            if lake._segment_bytes(spark, f"{root}/{component}", s)
            < max_segment_bytes
        ]
    if len(fold) < min_segments:
        return pins
    comp_root = f"{root.rstrip('/')}/{component}"
    df = lake.read_segments(
        spark,
        comp_root,
        fold,
        schema=lake._schema_from_json(schemas.get(component)),
    )
    zed = df.withColumn("_z", zorderN(exprs, bits))
    zed.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        zed_s, n_slices = _z_slices(zed, n_segments)
        new_segs: list[int] = []
        for i in range(n_slices):
            part = zed_s.filter(F.col("_slice") == i).drop("_z", "_slice")
            new_segs.append(lake.write_segment(spark, part, comp_root))
        new_pins = dict(pins)
        new_pins[component] = sorted(
            [s for s in pins[component] if s not in fold] + new_segs
        )
        new_zones = lake._carry_zones(zones, new_pins)
        for seg in new_segs:
            new_zones.setdefault(component, {})[seg] = (
                lake._segment_zone_stats(spark, comp_root, seg, zone_cols)
            )
        new_blooms = lake._carry_blooms(blooms, new_pins)
        # bloom coverage follows the data: columns the component
        # advertises elsewhere are re-bloomed on the fresh slices (the
        # same self-describing carry compact_segments does)
        bloom_columns = sorted(
            {c for cols in blooms.get(component, {}).values() for c in cols}
        )
        for seg in new_segs:
            built = [
                c
                for c in bloom_columns
                if lake._write_segment_bloom(spark, comp_root, seg, c)
            ]
            if built:
                new_blooms.setdefault(component, {})[seg] = built
        kw: dict = {}
        if new_zones:
            kw["zones"] = new_zones
        if new_blooms:
            kw["blooms"] = new_blooms
        kw["meta"] = {
            **meta,
            marker_key: {
                "exprs": list(exprs),
                "bits": bits,
                "segs": sorted(already | set(new_segs)),
            },
        }
        if schemas:
            kw["schemas"] = {
                c: sj for c, sj in schemas.items() if c in new_pins
            }
        lake.commit_segment_manifest(
            spark, root, new_pins, expected_base=base, **kw
        )
        return new_pins
    finally:
        zed.unpersist()


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
    pins, zones, _blooms, _meta, _schemas, _version = lake._manifest_state(
        spark, root
    )
    kept, pinned, _schema = _box_pruned_from_state(
        component, box, pins, zones, None
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
        lake._schema_from_json(schemas.get(component))
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
    pins, zones, _blooms, _meta, schemas, _version = lake._manifest_state(
        spark, root
    )
    kept, pinned, schema = _box_pruned_from_state(
        component, box, pins, zones, schemas
    )
    comp_root = f"{root.rstrip('/')}/{component}"
    if not kept:
        return lake.read_segments(
            spark, comp_root, pinned[:1], schema=schema
        ).filter(F.lit(False))
    return lake.read_segments(spark, comp_root, kept, schema=schema)
