"""Incrementally-maintained denormalized JOIN view on the segmented
lake: ``sink = fact ⋈ dim``, kept in sync from BOTH sources' change
feeds with one atomic sink commit per cycle.

This is the enrichment shape every large training pipeline runs —
events joined to document/dimension metadata — where recomputing the
join per cadence is O(fact) and the right cost is O(changed): a fact
cadence re-derives only the changed fact keys; a dim cadence
re-derives only the fact rows that REFERENCE the changed dim keys.
(The reference's gold build is the full-recompute special case: its
LEA school agg ⟕ special-ed join, silver_to_gold.py:73-84, rebuilt
per run.)

Spark-first mechanics, all composed from verified lake verbs:

- change discovery is the typed CDF feed (:func:`lake.
  read_segment_changes` ``include_changes=True``) on each source —
  one pinned multi-dir scan per feed, exact while the window's
  manifests are retained (the consume_changes retention contract);
- the fact re-read is RESTRICTED to affected keys; bounded dim churn
  (≤ ``dim_probe_cap`` distinct keys, detected by a sketch before any
  collect) additionally pushes an IN-filter on the dim-key column
  into the fact scan (Catalyst pushes it through the merged view's
  liveness join to the parquet row groups);
- the sink mutation is ONE :func:`lake.merge_rows` commit in the
  CDC-apply shape: re-derived rows upsert (skip-if-unchanged — dim
  churn that doesn't change the joined content commits nothing for
  those keys), vanished keys ride a scratch ``_gone`` marker into
  ``WHEN MATCHED THEN DELETE`` (and are barred from inserting by
  ``WHEN NOT MATCHED AND NOT _gone``), and BOTH source watermarks
  land in ``extra_meta`` — atomic with the data flip, so a replayed
  cycle is exactly-once;
- rival sink writers are handled by the OUTER loop (re-read
  watermarks, replan, retry) — never by blind merge retries, which
  could regress a rival sync's already-advanced watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ed_housing_data_pipeline_spark.sources import lake

_GONE = "_jv_gone"


def _wm_key(src_root: str, component: str, sink_component: str) -> str:
    # same key shape as consume_changes: per (source, component, sink)
    return f"cdf_watermark:{src_root.rstrip('/')}:{component}:{sink_component}"


def sync_join_view(
    spark,
    fact_root: str,
    fact_component: str,
    fact_key,
    dim_root: str,
    dim_component: str,
    dim_key: str,
    sink_root: str,
    sink_component: str | None = None,
    how: str = "left",
    dim_filter=None,
    dim_merge_key=None,
    dim_drop=(),
    dim_probe_cap: int = 10_000,
    max_attempts: int = 3,
    **merge_kwargs,
) -> dict:
    """Run one sync cycle of the denormalized view (bootstraps on the
    first call). ``fact_key`` is the fact's row key (the sink's merge
    key; composite allowed); ``dim_key`` is the join column, present
    in both sources (a 1:N dim multiplies fact rows into multiple
    sink rows per fact key — merge_rows' whole-key replace handles
    that, but the usual shape is a proper dimension: one live row per
    ``dim_key``). ``how`` is ``"left"`` (facts with no dim match keep
    a NULL-dim row) or ``"inner"`` (they drop from the view — and are
    DELETED from it when a dim delete orphans them).

    Non-key column names must be disjoint between fact and dim
    (raises otherwise — project the sources first).

    ``dim_filter`` (SQL string or Column) restricts the dim rows that
    JOIN, and ``dim_merge_key`` overrides the key the dim's liveness
    fold uses (default: ``dim_key``). Together they are the SCD2
    composition: point the view at a type-2 dimension with
    ``dim_merge_key=[bk, "valid_from"]`` (the dim's real revision key
    — folding on the bare business key would wrongly kill closed
    history rows) and ``dim_filter="is_current"`` so facts enrich
    against the CURRENT version only. Any churn on a dim key still
    re-derives its facts; the filter applies at join time.
    ``dim_drop`` drops dim columns after the filter (e.g. the SCD meta
    columns), keeping the sink's schema lean.

    STAR SCHEMAS chain: the sink is itself a segmented component with
    a CDF feed (merge commits stamp ``_useq`` + tombstones), so
    ``fact ⋈ dim1 ⋈ dim2`` is a view over a view — each link
    maintains its own pair of watermarks and the composition stays
    exactly-once end to end.

    Returns ``{"from_fact", "to_fact", "from_dim", "to_dim",
    "applied", "version", ...merge counts}``."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    if how not in ("left", "inner"):
        raise ValueError(f"sync_join_view: how must be left|inner, not {how!r}")
    fkey = lake._id_cols(fact_key)
    sink_component = sink_component or f"{fact_component}__joined"
    fwm_key = _wm_key(fact_root, fact_component, sink_component)
    dwm_key = _wm_key(dim_root, dim_component, sink_component)
    f_head = lake._committed_version(
        spark, f"{fact_root.rstrip('/')}/manifest"
    )
    d_head = lake._committed_version(spark, f"{dim_root.rstrip('/')}/manifest")
    if f_head is None or d_head is None:
        raise FileNotFoundError(
            "sync_join_view: both sources need a committed manifest"
        )

    dflt = F.expr(dim_filter) if isinstance(dim_filter, str) else dim_filter
    dmk = dim_merge_key if dim_merge_key is not None else dim_key

    def _dim_current() -> DataFrame:
        d = lake.read_segmented_merged(
            spark, dim_root, dim_component, dmk
        ).drop(lake.UPSERT_SEQ_COL)
        if dflt is not None:
            d = d.filter(dflt)
        return d.drop(*dim_drop) if dim_drop else d

    def _fact_merged() -> DataFrame:
        return lake.read_segmented_merged(
            spark, fact_root, fact_component, fkey
        ).drop(lake.UPSERT_SEQ_COL)

    def _fact_merged_bloom_pruned(col: str, keys) -> DataFrame | None:
        """The fact's merged view with its DATA pins bloom-pruned to
        the segments that can contain ``keys`` in ``col`` — driver-side
        whole-segment skipping on top of the IN-filter's row-group
        stats. None when the fact carries no bloom sidecars for the
        column (caller falls back to the plain merged read)."""
        st = lake.manifest_snapshot(spark, fact_root)
        if not any(
            col in cols
            for cols in st.blooms.get(fact_component, {}).values()
        ):
            return None
        kept, _pinned = lake.bloom_pruned_pins_from_state(
            spark, fact_root, fact_component, col, list(keys),
            st.pins, st.blooms,
        )
        if not kept:
            return lake.read_segments(
                spark,
                f"{fact_root.rstrip('/')}/{fact_component}",
                st.pins[fact_component],
                schema=lake._schema_from_json(
                    st.schemas.get(fact_component)
                ),
            ).limit(0).drop(lake.UPSERT_SEQ_COL)
        return lake._merged_from_state(
            spark, fact_root, fact_component, fkey,
            {**st.pins, fact_component: kept}, st.schemas,
        ).drop(lake.UPSERT_SEQ_COL)

    def _join(fact_df: DataFrame) -> DataFrame:
        dim_df = _dim_current()
        clash = (set(fact_df.columns) & set(dim_df.columns)) - {dim_key}
        if clash:
            raise ValueError(
                f"sync_join_view: non-key column(s) {sorted(clash)} exist "
                "in both sources — project them apart first"
            )
        return fact_df.join(dim_df, on=dim_key, how=how)

    last_err: BaseException | None = None
    for attempt in range(max_attempts):
        try:
            state = lake.manifest_snapshot(spark, sink_root)
            sink_meta, sink_exists = state.meta, True
        except FileNotFoundError:
            sink_meta, sink_exists = {}, False
        wm_f = int(sink_meta.get(fwm_key, 0))
        wm_d = int(sink_meta.get(dwm_key, 0))
        rep = {
            "from_fact": wm_f, "to_fact": f_head,
            "from_dim": wm_d, "to_dim": d_head,
        }
        marks = {fwm_key: f_head, dwm_key: d_head}
        if not sink_exists:
            # bootstrap: full join, watermarks atomic with the init
            joined = _join(_fact_merged())
            kw = dict(merge_kwargs)
            zc, bc = kw.pop("zone_cols", None), kw.pop("bloom_cols", None)
            try:
                pins = lake.append_segments(
                    spark, sink_root, {sink_component: joined},
                    init=True, meta=marks,
                    zone_cols={sink_component: list(zc)} if zc else None,
                    bloom_cols={sink_component: list(bc)} if bc else None,
                )
            except lake.ConcurrentCommitError as e:
                last_err = e
                continue
            return {**rep, "applied": True, "bootstrapped": True,
                    "pins": pins, "version": 1}
        if f_head <= wm_f and d_head <= wm_d:
            return {**rep, "applied": False}
        # maintenance-only windows (rewrites, no appends) on BOTH
        # sources: advance the watermarks with a meta-only flip, ZERO
        # Spark jobs — the same driver-side walk consume_changes does
        def _window_empty(src_root, comp, lo, hi) -> bool:
            if hi <= lo:
                return True
            multi = lake._changed_segments_multi(
                spark, src_root,
                [comp, lake.tombstone_component(comp)], lo, hi,
            )
            return all(not pairs for pairs, _sj in multi.values())

        if _window_empty(
            fact_root, fact_component, wm_f, f_head
        ) and _window_empty(dim_root, dim_component, wm_d, d_head):
            kw: dict = {"meta": {**sink_meta, **marks}}
            if state.zones:
                kw["zones"] = state.zones
            if state.blooms:
                kw["blooms"] = state.blooms
            if state.schemas:
                kw["schemas"] = state.schemas
            if state.counts:
                kw["counts"] = state.counts
            try:
                ver = lake.commit_segment_manifest(
                    spark, sink_root, state.pins,
                    expected_base=state.version, **kw,
                )
            except lake.ConcurrentCommitError as e:
                last_err = e
                continue
            return {**rep, "applied": False, "meta_only": True,
                    "version": ver}
        # ---- change discovery (each feed: one pinned multi-dir scan)
        dirty_f = None
        if f_head > wm_f:
            feed = lake.read_segment_changes(
                spark, fact_root, fact_component, wm_f, f_head,
                include_changes=True,
            )
            dirty_f = feed.select(*fkey).distinct()
        changed_d = None
        if d_head > wm_d:
            dfeed = lake.read_segment_changes(
                spark, dim_root, dim_component, wm_d, d_head,
                include_changes=True,
            )
            changed_d = (
                dfeed.select(dim_key).where(F.col(dim_key).isNotNull())
                .distinct()
            )
        fact_m = _fact_merged()
        # affected keys: the fact's own churn, plus every live fact row
        # referencing a churned dim key
        parts = []
        if dirty_f is not None:
            parts.append(dirty_f)
        if changed_d is not None:
            by_dim = fact_m
            n_dim = changed_d.agg(
                F.approx_count_distinct(dim_key).alias("n")
            ).collect()[0]["n"]
            if dim_probe_cap and int(n_dim or 0) <= dim_probe_cap:
                keys = [
                    r[0]
                    for r in changed_d.limit(dim_probe_cap + 1).collect()
                ]
                if len(keys) <= dim_probe_cap:
                    # bounded churn: a pushable IN-filter beats the
                    # semi-join shuffle AND reaches the parquet scan;
                    # bloom sidecars on the fact's dim-key column
                    # additionally skip whole segments driver-side
                    base = _fact_merged_bloom_pruned(dim_key, keys)
                    by_dim = (base if base is not None else fact_m).filter(
                        F.col(dim_key).isin(keys)
                    )
                else:
                    by_dim = fact_m.join(
                        changed_d, on=dim_key, how="left_semi"
                    )
            else:
                by_dim = fact_m.join(changed_d, on=dim_key, how="left_semi")
            parts.append(by_dim.select(*fkey).distinct())
        affected = parts[0]
        for p in parts[1:]:
            affected = affected.unionByName(p)
        affected = affected.distinct().persist()
        try:
            # re-derive: live fact rows for affected keys, joined
            # fresh. A bounded affected set on a single-column key
            # pushes an IN-filter to the fact scan (symmetric to the
            # dim-churn path) instead of the semi-join shuffle.
            fact_live = fact_m.join(affected, on=fkey, how="left_semi")
            if len(fkey) == 1 and dim_probe_cap:
                n_aff = affected.limit(dim_probe_cap + 1).count()
                if n_aff <= dim_probe_cap:
                    keys = [r[0] for r in affected.collect()]
                    base = _fact_merged_bloom_pruned(fkey[0], keys)
                    fact_live = (
                        base if base is not None else fact_m
                    ).filter(F.col(fkey[0]).isin(keys))
            joined = _join(fact_live)
            gone = affected.join(
                joined.select(*fkey).distinct(), on=fkey, how="left_anti"
            )
            # the merge references its batch many times — persist so
            # the re-derive join computes once, not per reference
            batch = joined.withColumn(_GONE, F.lit(False)).unionByName(
                gone.withColumn(_GONE, F.lit(True)),
                allowMissingColumns=True,
            ).persist()
            try:
                mrep = lake.merge_rows(
                    spark, sink_root, sink_component, fkey, batch,
                    when_matched_delete=f"source.{_GONE}",
                    when_not_matched_insert=f"not source.{_GONE}",
                    source_scratch_cols=[_GONE],
                    extra_meta=marks,
                    max_attempts=1,  # rivals replan HERE w/ fresh marks
                    **merge_kwargs,
                )
            finally:
                batch.unpersist()
        except lake.ConcurrentCommitError as e:
            last_err = e
            continue
        finally:
            affected.unpersist()
        keep = ("updated", "inserted", "deleted", "skipped", "applied",
                "version", "meta_only", "probe")
        return {**rep, **{k: v for k, v in mrep.items() if k in keep},
                "attempts": attempt + 1}
    raise last_err
