"""Append-only multi-component LSH index over the segmented-commit
protocol (sources/lake.append_segments).

The persisted artifact the incremental dedup loops probe — both the
batch ingest (plans/queries_llm.incr_index_ingest) and the streaming
sink (streaming/documents) — made O(batch) per commit:

- DATA components (optional ``docs``, plus ``bands`` = the (id, band,
  key) LSH band table and ``shingles`` = the (id, _sh) verification
  store) are append-only: each commit writes ONLY the batch's rows as
  new segments. No copy of the accumulated index, ever — the
  full-copy snapshot commit did O(index) writes per batch, O(n²)
  total over a long-running stream.
- ``bucketcounts`` holds cumulative per-(band, key) bucket widths as
  additive count segments: each commit appends the batch's O(batch)
  per-bucket counts; compaction re-aggregates (sum is associative).
- ``stopbands`` — the oversized buckets probes must skip
  (operators.similarity.lsh_probe_pairs) — is a DERIVED table, tiny
  by construction (at most n_rows / cap buckets), re-pinned whole
  each commit. Because the index is append-only, bucket widths only
  grow and the stop set only grows, so the per-commit update is exact
  without any O(index) aggregation: refresh the widths of existing
  stop rows with the batch's deltas, and find newly-crossed buckets
  among the TOUCHED buckets only, reading their prior widths from the
  count segments through a broadcast semi-join on the (micro-batch-
  bounded) touched key set.

Atomicity is the manifest commit (lake.commit_segment_manifest): a
crash mid-commit leaves orphan segments no reader resolves; a retried
commit re-derives the same content from the last committed manifest.
"""

from __future__ import annotations

from collections.abc import Sequence
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession, functions as F

from ed_housing_data_pipeline_spark.operators import similarity as sim
from ed_housing_data_pipeline_spark.sources import lake

DATA_COMPONENTS = ("docs", "bands", "shingles")
DERIVED_COMPONENTS = ("bucketcounts", "stopbands")
TOMBSTONES = "deleted_docs"
META_CAP_KEY = "max_bucket_width"
# below this many ids the delete scan pushes `doc_id IN (...)` into
# the parquet reader (same budget as the text/ANN indexes)
_DELETE_LITERAL_BUDGET = 256
# broadcast bound for the liveness-watermark fold (see text_index's
# twin constant): ~2M (id, long) rows ≈ 50 MB serialized
_LIVE_BROADCAST_MAX_ROWS = 2_000_000


def _meta_cap(meta: dict, override: int | None, op: str) -> int:
    """The bucket-width cap for a maintenance op: the explicit override
    wins, else the manifest meta pinned at bootstrap. An index whose
    manifest lost the cap (bootstrapped before the meta-carried cap, or
    committed by a writer that dropped it) raises an actionable typed
    error instead of a bare KeyError."""
    if override is not None:
        return int(override)
    cap = meta.get(META_CAP_KEY)
    if cap is None:
        raise ValueError(
            f"{op}: manifest meta carries no {META_CAP_KEY!r} (index "
            "bootstrapped before the cap rode the manifest, or a committer "
            "dropped it) — pass max_bucket_width explicitly"
        )
    return int(cap)


def bucket_counts(bands_df: DataFrame) -> DataFrame:
    """Per-(band, key) widths of a band frame — one map-side-combined
    agg over the frame (O(batch) when fed a batch's bands)."""
    return bands_df.groupBy("band", "key").agg(F.count(F.lit(1)).alias("_n"))


def stop_from_counts(counts: DataFrame, max_bucket_width: int) -> DataFrame:
    """The stop-band table a count frame implies: buckets over the cap,
    with the width and shard-count columns oversized_bucket_stats
    emits (same schema, so probes and audits are agnostic to whether
    stats came from a full aggregation or the incremental path)."""
    total = counts.groupBy("band", "key").agg(F.sum("_n").alias("_bw"))
    return total.filter(F.col("_bw") > max_bucket_width).withColumn(
        "_ns",
        F.ceil(F.col("_bw") / F.lit(float(max_bucket_width))).cast("bigint"),
    )


def merged_stop(
    old_stop: DataFrame,
    committed_counts: DataFrame,
    batch_counts: DataFrame,
    max_bucket_width: int,
) -> DataFrame:
    """The exact next stop-band table without an O(index) pass.

    Sound in BOTH width directions: a NEW stop row can only be a
    bucket the batch touched — whose prior width is read from the
    committed count segments via a broadcast semi-join on the touched
    key set (bounded by batch size × bands), never a full
    re-aggregation — and a refreshed old stop row is re-checked
    against the cap, so a NEGATIVE delta (a delete's retracted bucket
    counts) un-stops a bucket whose width fell back under the cap.
    For append-only deltas the re-check is a no-op (widths only
    grow). Differentially pinned against the full recompute in
    tests/test_streaming.py and the delete tests."""
    cap = max_bucket_width
    touched = batch_counts.select("band", "key", F.col("_n").alias("_add"))
    prior = (
        committed_counts.join(
            F.broadcast(touched.select("band", "key")), ["band", "key"]
        )
        .groupBy("band", "key")
        .agg(F.sum("_n").alias("_prior"))
    )
    crossed = (
        touched.join(prior, ["band", "key"], "left")
        .withColumn("_bw", F.col("_add") + F.coalesce("_prior", F.lit(0)))
        .filter(F.col("_bw") > cap)
        .join(old_stop.select("band", "key"), ["band", "key"], "left_anti")
        .select("band", "key", "_bw")
    )
    refreshed = (
        old_stop.select("band", "key", "_bw")
        .join(touched, ["band", "key"], "left")
        .withColumn("_bw", F.col("_bw") + F.coalesce("_add", F.lit(0)))
        .filter(F.col("_bw") > cap)  # negative deltas can un-stop
        .select("band", "key", "_bw")
    )
    return refreshed.unionByName(crossed).withColumn(
        "_ns", F.ceil(F.col("_bw") / F.lit(float(cap))).cast("bigint")
    )


def bootstrap_index(
    spark: SparkSession,
    root: str,
    frames: dict[str, DataFrame],
    max_bucket_width: int,
) -> dict[str, list[int]]:
    """First commit: the data components (``bands`` + ``shingles``,
    optionally ``docs``) land as their first segments; bucket counts
    and the stop table derive from the PASSED ``bands`` frame (the
    same deterministic-content-or-persisted contract append_batch
    documents — both production callers hold the signature frame
    persisted, so the derived aggs scan cache, not lineage), and one
    manifest pins it all. The five segment writes run as CONCURRENT
    Spark jobs (they are mutually independent given that contract),
    so bootstrap wall latency is the slowest write, not a five-job
    serial chain — the r8/r9 cold-commit lever applied to the
    bootstrap path too. Returns the committed pin map."""
    unknown = set(frames) - set(DATA_COMPONENTS)
    if "bands" not in frames or "shingles" not in frames or unknown:
        raise ValueError(
            f"bootstrap_index: need bands+shingles (docs optional), got "
            f"{sorted(frames)}"
        )
    from pyspark import StorageLevel  # noqa: PLC0415

    counts = bucket_counts(frames["bands"]).persist(StorageLevel.MEMORY_AND_DISK)

    def _write_data(name: str) -> tuple[str, int]:
        # rows carry the manifest sequence that commits them (the
        # delete/re-ingest liveness axis — see _tombstone_watermarks)
        return name, lake.write_segment(
            spark,
            frames[name].withColumn("useq", F.lit(1).cast("bigint")),
            f"{root}/{name}",
        )

    def _write_counts() -> int:
        return lake.write_segment(spark, counts, f"{root}/bucketcounts")

    def _write_stop() -> int:
        return lake.write_segment(
            spark,
            stop_from_counts(counts, max_bucket_width),
            f"{root}/stopbands",
        )

    try:
        with ThreadPoolExecutor(max_workers=len(frames) + 2) as pool:
            data_futs = [pool.submit(_write_data, name) for name in frames]
            counts_fut = pool.submit(_write_counts)
            stop_fut = pool.submit(_write_stop)
            pins = {name: [seg] for name, seg in (f.result() for f in data_futs)}
            pins["bucketcounts"] = [counts_fut.result()]
            pins["stopbands"] = [stop_fut.result()]
    finally:
        counts.unpersist()
    # first commit pinned at version 1: bootstrapping over an already-
    # committed index raises instead of silently replacing it. The
    # bucket cap rides the manifest meta so maintenance (delete's stop
    # refresh, compaction's physical apply) never needs it re-supplied
    lake.commit_segment_manifest(
        spark, root, pins, expected_base=0,
        meta={META_CAP_KEY: int(max_bucket_width)},
    )
    return pins


def append_batch(
    spark: SparkSession,
    root: str,
    frames: dict[str, DataFrame],
    max_bucket_width: int,
    keep_manifests: int = 2,
    orphan_grace_sec: float = 24 * 3600,
    reader_grace_sec: float | None = None,
    segment_partitions: int | None = None,
) -> dict[str, list[int]]:
    """One O(batch) index commit: append the batch's data-component
    rows as new segments, append its per-bucket counts, re-derive the
    (tiny) stop table incrementally, flip the manifest, run segment
    retention. Returns the committed pin map.

    The batch's bucket counts derive from the PASSED ``bands`` frame,
    not from a read-back of the just-written segment — one fewer
    filesystem round-trip per commit, and with the caller holding the
    batch persisted (both production callers do) the counts job scans
    cache instead of parquet. The contract that makes this sound: the
    frames must be deterministic-content under recompute (or persisted)
    so the written segment and the derived counts cannot diverge; the
    committed-side inputs still come only from manifest-pinned
    segments, so a crash at any point leaves only unpinned debris.

    ``segment_partitions`` caps each segment's file count (a plain
    ``coalesce``) — an OPTIONAL extra cap since r16: the shared write
    path already sizes every segment to ~target-size files from the
    frame's byte estimate (lake.sized_for_segment_write), so a
    micro-batch lands as one file per component and a bulk backfill
    keeps its parallelism with ``None``.

    The five segment writes run as CONCURRENT Spark jobs (data
    components + the counts→stop chain are mutually independent given
    a persisted batch), so per-commit wall latency is the slowest
    chain, not the sum of five serial job round-trips. Nothing about
    the crash model changes: the manifest flip still happens only
    after every write returns, and a failure in any job leaves all
    written segments as unpinned debris for the age-gated sweep."""
    unknown = set(frames) - set(DATA_COMPONENTS)
    if "bands" not in frames or "shingles" not in frames or unknown:
        raise ValueError(
            f"append_batch: need bands+shingles (docs optional), got "
            f"{sorted(frames)}"
        )

    def _cap(df: DataFrame) -> DataFrame:
        # derived tables sit just past a shuffle: coalesce folds the
        # tiny agg output without adding one
        return df.coalesce(segment_partitions) if segment_partitions else df

    def _cap_wide(df: DataFrame) -> DataFrame:
        # data components carry the batch's full lineage (shingle/
        # minhash pass when the caller's cache is cold): repartition,
        # not coalesce — coalesce would drag the UPSTREAM compute down
        # to segment_partitions-way parallelism; the round-robin
        # shuffle of a micro-batch is cheap
        return df.repartition(segment_partitions) if segment_partitions else df

    pins, meta, base = lake.segment_state(spark, root)
    new_pins = dict(pins)
    seq = base + 1  # liveness stamp (see _tombstone_watermarks)

    def _write_data(name: str) -> tuple[str, int]:
        return name, lake.write_segment(
            spark,
            _cap_wide(frames[name]).withColumn(
                "useq", F.lit(seq).cast("bigint")
            ),
            f"{root}/{name}",
        )

    # the batch's bucket counts feed BOTH derived writes (the counts
    # segment, and the stop merge which references them twice) — a
    # persisted tiny agg lets those two segment writes run as
    # CONCURRENT jobs instead of the r8 write-counts-then-read-back
    # serial chain (one fewer serial job round-trip per commit;
    # r8 VERDICT #4)
    from pyspark import StorageLevel  # noqa: PLC0415

    counts = _cap(bucket_counts(frames["bands"])).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    def _write_counts() -> int:
        return lake.write_segment(spark, counts, f"{root}/bucketcounts")

    def _write_stop() -> int:
        committed_counts = lake.read_segments(
            spark, f"{root}/bucketcounts", pins["bucketcounts"]
        )
        old_stop = lake.read_segments(
            spark, f"{root}/stopbands", pins["stopbands"]
        )
        return lake.write_segment(
            spark,
            _cap(
                merged_stop(
                    old_stop, committed_counts, counts, max_bucket_width
                )
            ),
            f"{root}/stopbands",
        )

    try:
        with ThreadPoolExecutor(max_workers=len(frames) + 2) as pool:
            data_futs = [pool.submit(_write_data, name) for name in frames]
            counts_fut = pool.submit(_write_counts)
            stop_fut = pool.submit(_write_stop)
            for fut in data_futs:
                name, seg = fut.result()
                new_pins[name] = [*pins[name], seg]
            cseg, sseg = counts_fut.result(), stop_fut.result()
    finally:
        counts.unpersist()
    new_pins["bucketcounts"] = [*pins["bucketcounts"], cseg]
    new_pins["stopbands"] = [sseg]
    # optimistic concurrency: pinned at base+1, so a concurrent
    # committer cannot be silently dropped — the loser raises
    # ConcurrentCommitError and retries from fresh pins (its written
    # segments stay unpinned debris for the age-gated sweep)
    meta_kw = {"meta": meta} if meta else {}
    lake.commit_segment_manifest(
        spark, root, new_pins, expected_base=base, **meta_kw
    )
    lake.expire_segments(
        spark, root, keep_manifests=keep_manifests,
        orphan_grace_sec=orphan_grace_sec,
        reader_grace_sec=reader_grace_sec,
    )
    return new_pins


def _tombstone_watermarks(spark, root: str, pins: dict) -> DataFrame | None:
    """Pinned tombstone state folded to one (doc_id, _dead) watermark
    per doc — the same liveness axis as the text/ANN indexes: a data
    row is LIVE iff its ``useq`` ≥ the watermark, so deletes kill all
    prior rows and a later re-ingest (whose rows carry a newer
    sequence) resurrects the id cleanly."""
    if TOMBSTONES not in pins:
        return None
    return (
        lake.read_segments(spark, f"{root}/{TOMBSTONES}", pins[TOMBSTONES])
        .groupBy("doc_id")
        .agg(F.max("dead_below").alias("_dead"))
    )


def _live(
    spark, root: str, df: DataFrame, pins: dict, meta: dict | None = None
) -> DataFrame:
    """Liveness filter on the sequence-watermark axis; the fold is
    broadcast only while the pinned tombstone row count (manifest
    meta, maintained by every delete commit) stays under the shared
    bound — past it, the join degrades to a shuffle instead of an
    unbounded broadcast (same policy as text_index._live)."""
    marks = _tombstone_watermarks(spark, root, pins)
    if marks is None:
        return df
    if (
        meta is None
        or int(meta.get(lake.TOMBSTONE_ROWS_KEY, 0)) <= _LIVE_BROADCAST_MAX_ROWS
    ):
        marks = F.broadcast(marks)
    return (
        df.join(marks, on="doc_id", how="left")
        .filter(F.col("_dead").isNull() | (F.col("useq") >= F.col("_dead")))
        .drop("_dead")
    )


def read_index(
    spark: SparkSession, root: str, components: Sequence[str] | None = None
) -> dict[str, DataFrame]:
    """Manifest-pinned component frames (each a multi-segment union
    scan), LIVENESS-FILTERED for the doc-keyed data components once a
    delete has committed — the only read path, so a deleted document
    stops being a dedup blocker / candidate the instant the flip
    lands. Derived stats components pass through (bucketcounts fold
    their negative delete rows additively; stopbands were refreshed at
    delete time)."""
    snap = lake.manifest_snapshot(spark, root)
    pins, meta = snap.pins, snap.meta
    names = list(components) if components is not None else [
        n for n in pins if n != TOMBSTONES
    ]
    out: dict[str, DataFrame] = {}
    for name in names:
        df = lake.read_segments(spark, f"{root}/{name}", pins[name])
        if name in DATA_COMPONENTS:
            # useq is protocol plumbing, not index content — served
            # frames keep the pre-liveness public schema
            df = _live(spark, root, df, pins, meta).drop("useq")
        out[name] = df
    return out


def delete_docs(
    spark: SparkSession,
    root: str,
    doc_ids: Sequence,
    max_bucket_width: int | None = None,
) -> dict[str, list[int]]:
    """LOGICAL delete from the dedup index (the GDPR take-down / the
    un-block that lets a near-dup of a removed document be accepted
    later): ONE expected_base commit lands —

    - a ``(doc_id, dead_below)`` tombstone segment (reads liveness-
      filter the doc-keyed components against it);
    - a NEGATIVE bucketcounts segment for the deleted docs' live band
      buckets (widths are additive, so committed count segments are
      never rewritten);
    - a REPLACED stop-band table: merged_stop with the negative delta
      re-checks refreshed widths against the cap, so buckets whose
      width fell back under it UN-STOP — candidate generation resumes
      exactly where the width math says it should.

    O(delete-set + the deleted docs' band rows); replayed deletes are
    idempotent (only live rows contribute negatives). The cap comes
    from the manifest meta pinned at bootstrap unless overridden."""
    ids = sorted(set(doc_ids))
    if not ids:
        return lake.segment_pins(spark, root)
    if len(ids) <= _DELETE_LITERAL_BUDGET:
        pred = F.col("doc_id").isin(ids)
        return _delete_commit(
            spark,
            root,
            hit_fn=lambda df, st: df.filter(pred),
            tomb_fn=lambda spark, seq, st: spark.createDataFrame(
                [(i, seq) for i in ids], ["doc_id", "dead_below"]
            ).coalesce(1),
            n_tomb_fn=lambda st: len(ids),
            max_bucket_width=max_bucket_width,
            op="delete_docs",
        )
    return delete_from(
        spark,
        root,
        spark.createDataFrame([(i,) for i in ids], ["doc_id"]),
        max_bucket_width=max_bucket_width,
    )


def delete_from(
    spark: SparkSession,
    root: str,
    ids_df: DataFrame,
    id_col: str = "doc_id",
    max_bucket_width: int | None = None,
    segment_partitions: int | None = 1,
) -> dict[str, list[int]]:
    """DataFrame-scale take-down: :func:`delete_docs` semantics with
    the delete set as a DataFrame of ids — the "delete every doc from
    source X" shape, where the set is millions of rows and must never
    materialize on the driver. Tombstones are written FROM the frame,
    the negative bucket counts come from semi-joining the pinned bands
    against it, and the stop-band refresh uses the same incremental
    merge as the list path — one ``expected_base`` flip. ``ids_df``
    must be deterministic under recomputation (it is persisted for the
    commit's duration so all three jobs see one content)."""
    from pyspark import StorageLevel  # noqa: PLC0415

    ids = (
        ids_df.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        n_tomb = ids.count()
        if not n_tomb:
            return lake.segment_pins(spark, root)

        def _capp(df: DataFrame) -> DataFrame:
            return df.coalesce(segment_partitions) if segment_partitions else df

        return _delete_commit(
            spark,
            root,
            hit_fn=lambda df, st: df.join(ids, on="doc_id", how="left_semi"),
            tomb_fn=lambda spark, seq, st: _capp(
                ids.select(
                    "doc_id", F.lit(seq).cast("bigint").alias("dead_below")
                )
            ),
            n_tomb_fn=lambda st: n_tomb,
            max_bucket_width=max_bucket_width,
            op="delete_from",
        )
    finally:
        ids.unpersist()


def delete_where(
    spark: SparkSession,
    root: str,
    predicate,
    max_bucket_width: int | None = None,
) -> dict[str, list[int]]:
    """Predicate take-down over the index's own ``docs`` component
    (requires the index to carry one): tombstone every live document
    whose stored row matches ``predicate`` — e.g.
    ``F.col("source") == "revoked-crawl"``. The delete set is derived
    per attempt from the pinned docs (filter + distinct, never
    collected), computed ONCE per attempt and persisted for the
    commit's duration, with its liveness fold run under the attempt's
    manifest meta (bounded-broadcast policy — see
    text_index.delete_where). Indexes without a docs component should
    filter their corpus table and call :func:`delete_from`."""
    from ed_housing_data_pipeline_spark.operators._commit import (  # noqa: PLC0415
        persist_for_attempt as _persist_for_attempt,
    )

    def _ids(st: dict) -> DataFrame:
        if "docs" not in st["pins"]:
            raise ValueError(
                "delete_where: index has no 'docs' component — filter the "
                "corpus table and pass ids to delete_from instead"
            )
        if "ids" not in st:
            docs = lake.read_segments(spark, f"{root}/docs", st["pins"]["docs"])
            st["ids"] = _persist_for_attempt(
                st,
                _live(
                    spark, root, docs.filter(predicate), st["pins"], st["meta"]
                )
                .select("doc_id")
                .distinct(),
            )
        return st["ids"]

    return _delete_commit(
        spark,
        root,
        hit_fn=lambda df, st: df.join(
            _ids(st), on="doc_id", how="left_semi"
        ),
        tomb_fn=lambda spark, seq, st: _ids(st)
        .select("doc_id", F.lit(seq).cast("bigint").alias("dead_below"))
        .coalesce(1),
        n_tomb_fn=None,
        max_bucket_width=max_bucket_width,
        op="delete_where",
    )


def _delete_commit(
    spark: SparkSession,
    root: str,
    hit_fn,
    tomb_fn,
    n_tomb_fn,
    max_bucket_width: int | None,
    op: str,
) -> dict[str, list[int]]:
    """Shared logical-delete commit (see text_index._delete_commit —
    same attempt-state contract): ``hit_fn(bands_df, st)`` restricts
    the pinned bands scan to the delete set, ``tomb_fn(spark, seq,
    st)`` builds the tombstone frame, ``n_tomb_fn(st)`` supplies the
    tombstone row count for the pressure counter (None → count the
    frame, one tiny job). Hooks may stash attempt-scoped persisted
    frames in ``st`` (unpersisted when the attempt ends)."""
    last_err: Exception | None = None
    for _attempt in range(3):
        pins, meta, base = lake.segment_state(spark, root)
        cap = _meta_cap(meta, max_bucket_width, op)
        seq = base + 1
        st: dict = {"pins": pins, "meta": meta, "seq": seq, "_persisted": []}
        try:
            bands = lake.read_segments(spark, f"{root}/bands", pins["bands"])
            dead_bands = _live(spark, root, hit_fn(bands, st), pins, meta)
            neg = dead_bands.groupBy("band", "key").agg(
                (-F.count(F.lit(1))).alias("_n")
            )
            committed_counts = lake.read_segments(
                spark, f"{root}/bucketcounts", pins["bucketcounts"]
            )
            old_stop = lake.read_segments(
                spark, f"{root}/stopbands", pins["stopbands"]
            )
            new_stop = merged_stop(old_stop, committed_counts, neg, cap)
            tomb = tomb_fn(spark, seq, st)
            n_tomb = int(n_tomb_fn(st)) if n_tomb_fn is not None else tomb.count()
            return lake.append_segments(
                spark,
                root,
                appends={
                    TOMBSTONES: tomb,
                    "bucketcounts": neg.coalesce(1),
                },
                replaces={"stopbands": new_stop.coalesce(1)},
                meta={
                    **meta,
                    lake.TOMBSTONE_ROWS_KEY: int(
                        meta.get(lake.TOMBSTONE_ROWS_KEY, 0)
                    )
                    + n_tomb,
                },
                expected_base=base,
            )
        except lake.ConcurrentCommitError as e:
            last_err = e
        finally:
            for cached in st["_persisted"]:
                cached.unpersist()
    raise last_err


def apply_index_deletes(
    spark: SparkSession, root: str, max_bucket_width: int | None = None
) -> dict[str, list[int]]:
    """PHYSICAL delete completion: rewrite every doc-keyed component
    live-rows-only, recompute bucket counts and the stop table from
    the live bands (the O(index) ground truth — apply is already a
    full rewrite), reset the tombstones — one expected_base manifest
    flip. Dedup decisions before and after are identical."""
    pins, meta, base = lake.segment_state(spark, root)
    if TOMBSTONES not in pins:
        return pins
    cap = _meta_cap(meta, max_bucket_width, "apply_index_deletes")
    replaces: dict[str, DataFrame] = {}
    for name in DATA_COMPONENTS:
        if name not in pins:
            continue
        replaces[name] = _live(
            spark,
            root,
            lake.read_segments(spark, f"{root}/{name}", pins[name]),
            pins,
            meta,
        )
    live_bands = replaces["bands"]
    replaces["bucketcounts"] = bucket_counts(live_bands)
    replaces["stopbands"] = stop_from_counts(
        bucket_counts(live_bands), cap
    )
    replaces[TOMBSTONES] = (
        lake.read_segments(spark, f"{root}/{TOMBSTONES}", pins[TOMBSTONES])
        .limit(0)
        .coalesce(1)
    )
    return lake.append_segments(
        spark,
        root,
        appends={},
        replaces=replaces,
        # the tombstone component empties with this flip — the
        # liveness-fold pressure counter resets with it
        meta={**meta, lake.TOMBSTONE_ROWS_KEY: 0},
        expected_base=base,
    )


def compact_index(
    spark: SparkSession,
    root: str,
    min_segments: int = 2,
    max_segment_bytes: int | None = None,
) -> dict[str, list[int]]:
    """Fold every multi-segment component to one segment — plain
    union rewrite for the data components, sum re-aggregation for
    ``bucketcounts`` (additive). One O(index) rewrite that amortizes
    over the K O(batch) commits between compactions; run on a cadence
    (streaming sink's ``compact_every``, or a maintenance cron). With
    live tombstones pinned, compaction IS the physical delete apply
    (:func:`apply_index_deletes`)."""
    pins = lake.segment_pins(spark, root)
    if TOMBSTONES in pins and (
        lake.read_segments(spark, f"{root}/{TOMBSTONES}", pins[TOMBSTONES])
        .limit(1)
        .count()
    ):
        return apply_index_deletes(spark, root)
    # subset-sound reducer (pure additive sum) -> size-tiered legal
    return lake.compact_segments(
        spark,
        root,
        reducers={
            "bucketcounts": lambda df: df.groupBy("band", "key").agg(
                F.sum("_n").alias("_n")
            )
        },
        min_segments=min_segments,
        max_segment_bytes=max_segment_bytes,
    )


def signature_index_frames(
    docs_sig: DataFrame,
    id_col: str,
    n_hashes: int,
    bands: int,
    doc_cols: Sequence[str] | None = None,
) -> dict[str, DataFrame]:
    """The data-component frames of a signature frame (one with the
    ``_sh`` shingle array + MinHash columns): the band table, the
    shingle store, and — when ``doc_cols`` is given — the raw doc
    projection. The ONE shingle/hash pass everything derives from."""
    frames = {
        "bands": sim.band_keys(docs_sig, id_col, n_hashes=n_hashes, bands=bands),
        "shingles": docs_sig.select(id_col, "_sh"),
    }
    if doc_cols is not None:
        frames["docs"] = docs_sig.select(*doc_cols)
    return frames
