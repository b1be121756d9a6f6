"""SCD Type 2 dimension maintenance on a segmented lake component.

The reference's gold layer keeps ONLY the latest dimension state (its
LEA join, silver_to_gold.py:73-77, overwrites per run — SCD type 1).
A 100 TB training-data pipeline needs the type-2 form as well: every
attribute change CLOSES the old row (``valid_to`` stamped, no longer
current) and opens a new one, so any historical training run can be
reproduced against the dimension AS OF its snapshot time.

Spark-first design: one :func:`~.lake.merge_rows` commit per applied
snapshot. The SCD row key is the COMPOSITE (business key, valid_from)
— closing an old version is a whole-key REPLACE of its (bk, old
valid_from) row, opening the new version is an INSERT of (bk, ts), and
both land in the merge's single ``expected_base`` manifest flip
(atomic, optimistic-concurrency, retry-safe). Change detection is an
xxhash64 fingerprint over the attribute columns, computed on the
CURRENT rows restricted to the batch's business keys (a pruned read —
blooms/zonemaps on the business key keep it O(touched segments)), so
an unchanged snapshot contributes NOTHING to the merge batch and a
fully-unchanged cadence commits nothing at all.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ed_housing_data_pipeline_spark.sources import lake

VALID_FROM = "valid_from"
VALID_TO = "valid_to"
IS_CURRENT = "is_current"
_META = (VALID_FROM, VALID_TO, IS_CURRENT)


def _bk(key_cols) -> list[str]:
    out = lake._id_cols(key_cols)
    bad = sorted(set(out) & set(_META))
    if bad:
        raise ValueError(f"scd2: business key cannot use reserved {bad}")
    return out


def scd2_init(
    spark,
    root: str,
    component: str,
    key_cols,
    snapshot: DataFrame,
    ts: int,
    **append_kwargs,
) -> dict[str, list[int]]:
    """Bootstrap an SCD2 component from the first snapshot: every row
    opens at ``ts`` (``valid_from=ts, valid_to=NULL, is_current=True``).
    ``append_kwargs`` pass through to :func:`lake.append_segments`
    (``init=True`` is implied; pass ``bloom_cols``/``zone_cols`` on the
    business key so later applies prune their current-row reads)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    _bk(key_cols)
    df = (
        snapshot.withColumn(VALID_FROM, F.lit(int(ts)).cast("bigint"))
        .withColumn(VALID_TO, F.lit(None).cast("bigint"))
        .withColumn(IS_CURRENT, F.lit(True))
    )
    append_kwargs.setdefault("init", True)
    return lake.append_segments(spark, root, {component: df}, **append_kwargs)


def scd2_apply(
    spark,
    root: str,
    component: str,
    key_cols,
    snapshot: DataFrame,
    ts: int,
    allow_new_columns: bool = False,
    probe_cap: int = 10_000,
    **merge_kwargs,
) -> dict:
    """Apply one dimension snapshot at event time ``ts`` (SCD type 2):

    - a business key whose attributes CHANGED closes its current row
      (``valid_to=ts, is_current=False`` — a whole-key replace of the
      (bk, old valid_from) SCD row) and opens a new current row at
      ``ts`` — both in ONE merge commit;
    - a brand-new business key opens its first row at ``ts``;
    - an UNCHANGED key contributes nothing (it never enters the merge
      batch), so a fully-unchanged snapshot commits NOTHING;
    - a ``ts`` at or before an affected key's current ``valid_from``
      RAISES (out-of-order snapshots would corrupt the intervals);
      keys the snapshot doesn't mention are untouched (a PARTIAL
      snapshot is a valid cadence);
    - a snapshot carrying attribute columns the dimension doesn't have
      RAISES unless ``allow_new_columns=True`` — then the apply
      EVOLVES the dimension schema (add-column, via the merge's
      append): prior intervals serve NULL for the new attribute, and
      a key whose only change is NULL → value still opens a version.

    ``merge_kwargs`` pass through to :func:`lake.merge_rows`
    (``zone_cols``/``bloom_cols`` keep the SCD component itself
    prunable; ``extra_meta`` makes a streaming committer exactly-once).
    Returns the merge report plus ``{"opened", "closed",
    "unchanged_keys"}``."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    bk = _bk(key_cols)
    missing = [c for c in bk if c not in snapshot.columns]
    if missing:
        raise ValueError(f"scd2_apply: snapshot lacks key column(s) {missing}")
    carried = sorted(set(snapshot.columns) & set(_META))
    if carried:
        raise ValueError(
            f"scd2_apply: snapshot must not carry SCD meta column(s) "
            f"{carried} — they are derived from ts"
        )
    ts = int(ts)
    attrs = [c for c in snapshot.columns if c not in bk]

    # current rows for the batch's business keys: bloom sidecars on a
    # single-column business key bound the DATA read to the segments
    # that can contain the batch's keys (driver-side pin pruning, the
    # same probe shape merge_rows uses internally); composite or
    # unbounded batches fall back to the full merged read + semi-join
    cur = None
    if len(bk) == 1 and probe_cap:
        snap_st = lake.manifest_snapshot(spark, root)
        has_bloom = any(
            bk[0] in cols
            for cols in snap_st.blooms.get(component, {}).values()
        )
        if has_bloom:
            n = int(
                snapshot.agg(
                    F.approx_count_distinct(bk[0]).alias("n")
                ).collect()[0]["n"] or 0
            )
            if n <= probe_cap:
                keys = [
                    r[0]
                    for r in snapshot.select(bk[0])
                    .where(F.col(bk[0]).isNotNull())
                    .distinct()
                    .limit(probe_cap + 1)
                    .collect()
                ]
                if len(keys) <= probe_cap:
                    kept, _pinned = lake.bloom_pruned_pins_from_state(
                        spark, root, component, bk[0], keys,
                        snap_st.pins, snap_st.blooms,
                    )
                    read_pins = {**snap_st.pins, component: kept}
                    if kept:
                        cur = lake._merged_from_state(
                            spark, root, component, bk + [VALID_FROM],
                            read_pins, snap_st.schemas,
                        )
                    else:
                        cur = lake.read_segments(
                            spark,
                            f"{root.rstrip('/')}/{component}",
                            snap_st.pins[component],
                            schema=lake._schema_from_json(
                                snap_st.schemas.get(component)
                            ),
                        ).limit(0)
    if cur is None:
        cur = lake.read_segmented_merged(
            spark, root, component, bk + [VALID_FROM]
        )
    cur = (
        cur.drop(lake.UPSERT_SEQ_COL)
        .filter(F.col(IS_CURRENT))
        .join(snapshot.select(*bk).distinct(), on=bk, how="left_semi")
    )
    tgt_types = {f.name: f.dataType for f in cur.schema.fields}
    unknown = sorted(c for c in attrs if c not in tgt_types)
    if unknown and not allow_new_columns:
        raise ValueError(
            f"scd2_apply: snapshot column(s) {unknown} not in the SCD "
            "component — pass allow_new_columns=True to evolve the "
            "dimension schema with this apply"
        )
    for f in snapshot.schema.fields:
        tgt_types.setdefault(f.name, f.dataType)

    def _fp(df: DataFrame):
        # a column missing on one side (pre-evolution current rows)
        # compares as NULL at the agreed type, so NULL -> value is a
        # real version change
        have = set(df.columns)
        return F.xxhash64(
            *[
                (F.col(c) if c in have else F.lit(None)).cast(tgt_types[c])
                for c in sorted(attrs)
            ]
        )

    sfp, cfp = "_scd_src_fp", "_scd_cur_fp"
    # batch must be unique per business key: one snapshot, one state
    src = snapshot.groupBy(*bk).agg(
        F.count(F.lit(1)).alias("_scd_n"),
        F.first(_fp(snapshot)).alias(sfp),
        *[F.first(c).alias(c) for c in attrs],
    )
    paired = src.join(
        cur.select(
            *bk,
            F.col(VALID_FROM).alias("_scd_cur_from"),
            _fp(cur).alias(cfp),
        ),
        on=bk,
        how="left",
    ).persist()
    try:
        tal = paired.agg(
            F.max("_scd_n").alias("m"),
            F.sum(
                (F.col(cfp).isNotNull() & (F.col(sfp) != F.col(cfp)))
                .cast("int")
            ).alias("chg"),
            F.sum(F.col(cfp).isNull().cast("int")).alias("new"),
            F.count(F.lit(1)).alias("n"),
            F.max(
                F.when(
                    F.col(cfp).isNotNull() & (F.col(sfp) != F.col(cfp)),
                    F.col("_scd_cur_from"),
                )
            ).alias("max_from"),
        ).collect()[0]
        if int(tal["m"] or 0) > 1:
            raise ValueError(
                "scd2_apply: snapshot carries multiple rows for one "
                "business key — one snapshot, one state per key"
            )
        n_chg, n_new = int(tal["chg"] or 0), int(tal["new"] or 0)
        n_same = int(tal["n"]) - n_chg - n_new
        if n_chg and int(tal["max_from"]) >= ts:
            raise ValueError(
                f"scd2_apply: ts {ts} is not after an affected key's "
                f"current valid_from {int(tal['max_from'])} — snapshots "
                "must apply in event-time order"
            )
        rep = {"opened": n_chg + n_new, "closed": n_chg,
               "unchanged_keys": n_same}
        if n_chg == 0 and n_new == 0:
            extra = merge_kwargs.get("extra_meta")
            if extra:
                # a streaming committer's batch id must land even on a
                # fully-unchanged snapshot: meta-only flip, full plane
                # carry (the same contract merge_rows' no-op path has)
                snap = lake.manifest_snapshot(spark, root)
                kw: dict = {"meta": {**snap.meta, **extra}}
                if snap.zones:
                    kw["zones"] = snap.zones
                if snap.blooms:
                    kw["blooms"] = snap.blooms
                if snap.schemas:
                    kw["schemas"] = snap.schemas
                if snap.counts:
                    kw["counts"] = snap.counts
                ver = lake.commit_segment_manifest(
                    spark, root, snap.pins,
                    expected_base=snap.version, **kw,
                )
                return {**rep, "applied": False, "meta_only": True,
                        "version": ver}
            base = lake.segment_pins_versioned(spark, root)[1]
            return {**rep, "applied": False, "version": base}
        changed = paired.filter(
            F.col(cfp).isNotNull() & (F.col(sfp) != F.col(cfp))
        )
        # CLOSE: whole-key replace of (bk, old valid_from) — the full
        # current row with valid_to/is_current rewritten
        closing = (
            cur.join(
                changed.select(
                    *bk, F.col("_scd_cur_from").alias(VALID_FROM)
                ),
                on=bk + [VALID_FROM],
                how="left_semi",
            )
            .withColumn(VALID_TO, F.lit(ts).cast("bigint"))
            .withColumn(IS_CURRENT, F.lit(False))
        )
        # OPEN: new current rows at ts for changed + brand-new keys
        opening = (
            paired.filter(F.col(cfp).isNull() | (F.col(sfp) != F.col(cfp)))
            .select(*bk, *[F.col(c).cast(tgt_types[c]).alias(c) for c in attrs])
            .withColumn(VALID_FROM, F.lit(ts).cast("bigint"))
            .withColumn(VALID_TO, F.lit(None).cast("bigint"))
            .withColumn(IS_CURRENT, F.lit(True))
        )
        # the merge references its batch many times (probe, fingerprints,
        # decision, writes) — persist so the close/open lineage (itself
        # a join over the pruned current read) computes once
        batch = closing.unionByName(
            opening, allowMissingColumns=True
        ).persist()
        try:
            mrep = lake.merge_rows(
                spark, root, component, bk + [VALID_FROM], batch,
                **merge_kwargs,
            )
        finally:
            batch.unpersist()
        return {**rep, **{k: v for k, v in mrep.items()
                          if k in ("applied", "version", "pins", "attempts")}}
    finally:
        paired.unpersist()


def scd2_current(spark, root: str, component: str, key_cols) -> DataFrame:
    """The dimension's CURRENT state (SCD type 1 view of the type-2
    table): one row per live business key."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    bk = _bk(key_cols)
    return (
        lake.read_segmented_merged(spark, root, component, bk + [VALID_FROM])
        .drop(lake.UPSERT_SEQ_COL)
        .filter(F.col(IS_CURRENT))
    )


def scd2_asof(
    spark, root: str, component: str, key_cols, ts: int
) -> DataFrame:
    """The dimension AS OF event time ``ts``: rows whose validity
    interval covers it (``valid_from <= ts < valid_to``, open
    intervals unbounded). This is the reproducibility read a training
    run pins itself to."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    bk = _bk(key_cols)
    ts = int(ts)
    return (
        lake.read_segmented_merged(spark, root, component, bk + [VALID_FROM])
        .drop(lake.UPSERT_SEQ_COL)
        .filter(
            (F.col(VALID_FROM) <= F.lit(ts))
            & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > F.lit(ts)))
        )
    )


def scd2_validate(
    spark, root: str, component: str, key_cols
) -> DataFrame:
    """Invariant audit of an SCD2 component — returns a frame of
    violations (empty = healthy), one row per (business key, check):

    - ``multiple_current``: more than one ``is_current`` row for a key;
    - ``open_not_current`` / ``current_not_open``: ``valid_to IS NULL``
      must coincide exactly with ``is_current``;
    - ``overlap``: consecutive intervals (by ``valid_from``) overlap —
      a closed row's ``valid_to`` exceeds the next row's
      ``valid_from``;
    - ``gap_inverted``: an interval closes before it opens
      (``valid_to < valid_from``).

    One window pass over the component — run it after restores,
    repairs, or suspected out-of-order applies. The engine's own
    verbs cannot produce violations (scd2_apply fails closed on
    ordering), so any row here points at external writes."""
    from pyspark.sql import Window, functions as F  # noqa: PLC0415

    bk = _bk(key_cols)
    df = (
        lake.read_segmented_merged(spark, root, component, bk + [VALID_FROM])
        .drop(lake.UPSERT_SEQ_COL)
    )
    w = Window.partitionBy(*bk).orderBy(VALID_FROM)
    nxt = F.lead(VALID_FROM).over(w)
    cur_n = F.sum(F.col(IS_CURRENT).cast("int")).over(
        Window.partitionBy(*bk)
    )
    checks = df.select(
        *bk,
        F.col(VALID_FROM),
        F.when(F.col(IS_CURRENT) & (cur_n > 1), "multiple_current")
        .when(F.col(VALID_TO).isNull() & ~F.col(IS_CURRENT),
              "open_not_current")
        .when(F.col(VALID_TO).isNotNull() & F.col(IS_CURRENT),
              "current_not_open")
        .when(F.col(VALID_TO).isNotNull()
              & (F.col(VALID_TO) < F.col(VALID_FROM)), "gap_inverted")
        .when(nxt.isNotNull()
              & (F.coalesce(F.col(VALID_TO), nxt + 1) > nxt), "overlap")
        .alias("violation"),
    )
    return checks.filter(F.col("violation").isNotNull())
