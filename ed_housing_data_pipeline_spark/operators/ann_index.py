"""Incrementally-maintained IVF-PQ (IVFADC) ANN index over the
segmented-commit protocol (sources/lake) — the vector sibling of the
LSH dedup index (operators/incr_index).

A 100 TB embedding corpus is not re-encoded per query wave: the coarse
quantizer + PQ codebooks are trained ONCE (on a bootstrap sample) and
pinned, the corpus is persisted as ``(id, cell, m codes)`` — the
compressed representation IVFADC actually searches — and every later
ingest batch is encoded with the pinned model and appended in O(batch).
Probes never touch raw corpus vectors.

Artifact layout under ``root``:

- ``model/`` — a JSON blob snapshot (lake.write_snapshot_blob) holding
  the coarse centroids and PQ codebooks. Written exactly once, at
  version 1, by bootstrap: the model is IMMUTABLE for the index's
  lifetime (appended segments are only comparable if encoded by the
  same quantizers — re-training means building a new index root). The
  exclusive version-1 claim makes a second bootstrap raise instead of
  silently splitting the index across two models.
- ``vectors/`` — append-only (id, cell, codes) segments: each ingest
  commits ONLY its batch's rows. Reading is a manifest-pinned
  multi-segment parquet scan.
- ``cellcounts/`` — additive (cell, _n) count segments (the
  bucketcounts pattern): per-cell inverted-list widths for imbalance
  monitoring / probe planning, appended per batch in O(batch) and
  re-aggregated only at compaction (sum is associative).
- ``manifest/`` — JSON-blob snapshots pinning component→segment lists
  (lake.commit_segment_manifest); the atomic commit point. A crash
  anywhere before the flip leaves only unpinned debris for the
  age-gated sweep; concurrent appenders serialize through optimistic
  concurrency (ConcurrentCommitError → retry from fresh pins).

Design references (public): FAISS's IVFADC layout (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011) for
the search shape; log-structured table formats for the append-only
segment + manifest commit protocol.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ed_housing_data_pipeline_spark.operators import similarity as sim
from ed_housing_data_pipeline_spark.sources import lake

VECTORS = "vectors"
CELLCOUNTS = "cellcounts"
TOMBSTONES = "deleted_ids"
# below this many ids, delete pushes `id IN (...)` into the parquet
# scan instead of a broadcast semi-join (same budget as text_index)
_DELETE_LITERAL_BUDGET = 256
# broadcast bound for the liveness-watermark fold (see text_index's
# twin constant): ~2M (id, long) rows ≈ 50 MB serialized
_LIVE_BROADCAST_MAX_ROWS = 2_000_000


def write_ann_model(
    spark: SparkSession,
    root: str,
    cents: list[list[float]],
    codebooks: list[list[list[float]]],
) -> None:
    """Pin the index's quantization model as the exclusive version-1
    blob snapshot — a filesystem commit, never a Spark job. Raises
    (via the snapshot claim protocol) if a model is already pinned."""
    m, sub, dim = sim._pq_shape(codebooks)
    if len(cents[0]) != dim:
        raise ValueError(
            f"ann model: coarse dim {len(cents[0])} != pq dim {m}x{sub}={dim}"
        )
    payload = json.dumps(
        {"cents": cents, "codebooks": codebooks, "dim": dim, "m": m},
        sort_keys=True,
    )
    lake.write_snapshot_blob(spark, payload, f"{root.rstrip('/')}/model", version=1)


def read_ann_model(
    spark: SparkSession, root: str
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """The pinned (cents, codebooks) — a filesystem read, no job."""
    d = json.loads(
        lake.read_snapshot_blob(spark, f"{root.rstrip('/')}/model", version=1)
    )
    return d["cents"], d["codebooks"]


def encoded_frame(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cents: list[list[float]],
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """A batch's index rows: (id, cell, codes). NULL / wrong-dim
    vectors encode to NULL codes and are EXCLUDED — the index stores
    only searchable rows (the quarantine split happens upstream, in
    the callers' malformed-embedding handling)."""
    enc = sim.ivfpq_encode(df, vec_col, cents, codebooks)
    return enc.filter(
        F.col("_cell").isNotNull() & F.col("_codes").isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col("_cell").alias("cell"),
        F.col("_codes").alias("codes"),
    )


def cell_counts(enc: DataFrame) -> DataFrame:
    """Per-cell inverted-list widths of an encoded frame — one
    map-side-combined agg (O(batch) when fed a batch)."""
    return enc.groupBy("cell").agg(F.count(F.lit(1)).alias("_n"))


def _cap(df: DataFrame, segment_partitions: int | None) -> DataFrame:
    # tiny post-shuffle derived tables: fold without adding a shuffle
    return df.coalesce(segment_partitions) if segment_partitions else df


def _cap_wide(df: DataFrame, segment_partitions: int | None) -> DataFrame:
    # data rows carry the batch's encode lineage: repartition keeps the
    # upstream encode at full parallelism (micro-batch shuffle is cheap)
    return df.repartition(segment_partitions) if segment_partitions else df


def bootstrap_ann_index(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cents: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    coarse_k: int = 8,
    m: int = 4,
    pq_k: int = 8,
    iters: int = 2,
    seed: int = 42,
    segment_partitions: int | None = None,
) -> dict[str, list[int]]:
    """First commit: train the model on ``df`` (or accept fixed
    ``cents``/``codebooks`` — the oracle-twin path), pin it as the
    version-1 model blob, encode the bootstrap corpus, and commit the
    first ``vectors`` + ``cellcounts`` segments under one manifest.
    Returns the committed pin map.

    At 100 TB the training input is a sample (k-means and per-subspace
    PQ training converge on far less data than the corpus); the encode
    pass is one narrow map over the bootstrap corpus either way."""
    if (cents is None) != (codebooks is None):
        raise ValueError(
            "bootstrap_ann_index: pass both cents and codebooks or neither"
        )
    if cents is None:
        _assigned, cents = sim.kmeans_blocks(
            df, vec_col=vec_col, id_col=id_col, k=coarse_k, iters=iters,
            seed=seed,
        )
        codebooks = sim.pq_train_codebooks(
            df, vec_col=vec_col, id_col=id_col, m=m, k=pq_k, iters=iters,
            seed=seed,
        )
    # model first: encode determinism of every later append depends on
    # it, and the exclusive v1 claim is the double-bootstrap guard
    write_ann_model(spark, root, cents, codebooks)
    enc = encoded_frame(df, vec_col, id_col, cents, codebooks).persist()
    try:
        return lake.append_segments(
            spark,
            root,
            appends={
                VECTORS: _cap_wide(
                    enc.withColumn("useq", F.lit(1).cast("bigint")),
                    segment_partitions,
                ),
                CELLCOUNTS: _cap(cell_counts(enc), segment_partitions),
            },
            init=True,
        )
    finally:
        enc.unpersist()


def append_ann_batch(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    keep_manifests: int = 2,
    orphan_grace_sec: float = 24 * 3600,
    reader_grace_sec: float | None = None,
    segment_partitions: int | None = None,
) -> dict[str, list[int]]:
    """One O(batch) index commit: encode the batch with the PINNED
    model, append one ``vectors`` segment and one additive
    ``cellcounts`` segment, flip the manifest, run segment retention.
    Never touches committed segments — per-commit cost is O(batch)
    regardless of index size. Returns the committed pin map."""
    cents, codebooks = read_ann_model(spark, root)
    enc = encoded_frame(df, vec_col, id_col, cents, codebooks).persist()
    try:
        last_err: Exception | None = None
        for _attempt in range(3):
            _pins, base = lake.segment_pins_versioned(spark, root)
            # rows carry the manifest sequence that commits them — the
            # liveness axis deletes/upserts tombstone against (see
            # read_ann_vectors); pinning to base keeps the stamp honest
            try:
                pins = lake.append_segments(
                    spark,
                    root,
                    appends={
                        VECTORS: _cap_wide(
                            enc.withColumn(
                                "useq", F.lit(base + 1).cast("bigint")
                            ),
                            segment_partitions,
                        ),
                        CELLCOUNTS: _cap(
                            cell_counts(enc), segment_partitions
                        ),
                    },
                    expected_base=base,
                )
                break
            except lake.ConcurrentCommitError as e:
                last_err = e
        else:
            raise last_err
    finally:
        enc.unpersist()
    lake.expire_segments(
        spark,
        root,
        keep_manifests=keep_manifests,
        orphan_grace_sec=orphan_grace_sec,
        reader_grace_sec=reader_grace_sec,
    )
    return pins


def _tombstone_watermarks(spark, root: str, pins: dict) -> DataFrame | None:
    """Pinned tombstone state folded to one watermark per id —
    ``(id, _dead)``, the highest ``dead_below`` committed. A vectors
    row is LIVE iff its ``useq`` ≥ the watermark: deletes and
    re-embedding upserts both tombstone at their own commit sequence,
    so "kill everything older than me" composes under MAX (same
    liveness axis as the text index's revisions)."""
    if TOMBSTONES not in pins:
        return None
    return (
        lake.read_segments(spark, f"{root}/{TOMBSTONES}", pins[TOMBSTONES])
        .groupBy("id")
        .agg(F.max("dead_below").alias("_dead"))
    )


def _live(
    spark, root: str, df: DataFrame, pins: dict, meta: dict | None = None
) -> DataFrame:
    """Liveness filter on the sequence-watermark axis; broadcast only
    while the pinned tombstone row count (manifest meta) stays under
    the shared bound, shuffle join past it (text_index._live policy)."""
    marks = _tombstone_watermarks(spark, root, pins)
    if marks is None:
        return df
    if (
        meta is None
        or int(meta.get(lake.TOMBSTONE_ROWS_KEY, 0)) <= _LIVE_BROADCAST_MAX_ROWS
    ):
        marks = F.broadcast(marks)
    return (
        df.join(marks, on="id", how="left")
        .filter(F.col("_dead").isNull() | (F.col("useq") >= F.col("_dead")))
        .drop("_dead")
    )


def read_ann_vectors(spark: SparkSession, root: str) -> DataFrame:
    """The committed LIVE encoded corpus (id, cell, codes) — a
    manifest-pinned multi-segment parquet scan, liveness-filtered
    against the watermark set once a delete or re-embedding upsert has
    committed (broadcast while small, shuffle join past the meta-
    tracked bound). The only read path, so a dead vector stops being
    probe-able the instant the flip lands."""
    pins, meta, _base = lake.segment_state(spark, root)
    vecs = lake.read_segments(spark, f"{root}/{VECTORS}", pins[VECTORS])
    out = _live(spark, root, vecs, pins, meta)
    return out.drop("useq") if "useq" in out.columns else out


def delete_ann_vectors(
    spark: SparkSession, root: str, ids
) -> dict[str, list[int]]:
    """LOGICAL delete (the GDPR take-down for embeddings): one
    O(delete-set) commit after which the vectors are un-probe-able —
    a ``(id, dead_below)`` tombstone segment (probes liveness-filter
    against it) plus a NEGATIVE cellcounts segment (per dead vector's
    cell, ``_n = -count``; valid because cellcounts are additive, so
    :func:`ann_cell_stats` stays exact without rewriting any count
    segment), both under ONE expected_base manifest flip. Ids absent
    from the corpus tombstone harmlessly; replayed deletes are
    idempotent (only LIVE rows contribute negative counts). Physical
    removal rides the next :func:`compact_ann_index` rewrite."""
    ids = sorted(set(ids))
    if not ids:
        return lake.segment_pins(spark, root)
    if len(ids) <= _DELETE_LITERAL_BUDGET:
        pred = F.col("id").isin(ids)
        return _delete_commit(
            spark,
            root,
            hit_fn=lambda df, st: df.filter(pred),
            tomb_fn=lambda spark, seq, st: spark.createDataFrame(
                [(i, seq) for i in ids], ["id", "dead_below"]
            ).coalesce(1),
            n_tomb_fn=lambda st: len(ids),
        )
    return delete_from(
        spark, root, spark.createDataFrame([(i,) for i in ids], ["id"])
    )


def delete_from(
    spark: SparkSession,
    root: str,
    ids_df: DataFrame,
    id_col: str = "id",
    segment_partitions: int | None = 1,
) -> dict[str, list[int]]:
    """DataFrame-scale take-down: :func:`delete_ann_vectors` semantics
    with the delete set as a DataFrame of ids ("delete every vector
    whose document came from source X") — tombstones written FROM the
    frame, negative cellcounts from semi-joining the pinned vectors
    against it, nothing collected to the driver. ``ids_df`` must be
    deterministic under recomputation (persisted for the commit's
    duration so all jobs see one content)."""
    from pyspark import StorageLevel  # noqa: PLC0415

    ids = (
        ids_df.select(F.col(id_col).alias("id"))
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
            hit_fn=lambda df, st: df.join(ids, on="id", how="left_semi"),
            tomb_fn=lambda spark, seq, st: _capp(
                ids.select("id", F.lit(seq).cast("bigint").alias("dead_below"))
            ),
            n_tomb_fn=lambda st: n_tomb,
        )
    finally:
        ids.unpersist()


def delete_where(
    spark: SparkSession, root: str, predicate
) -> dict[str, list[int]]:
    """Predicate take-down over the index's own rows (id, cell,
    codes) — e.g. ``F.col("cell") == 3`` retires a whole inverted
    list. The delete set derives per attempt from the pinned vectors
    (filter + distinct, never collected), computed ONCE per attempt
    and persisted for the commit's duration, with its liveness fold
    run under the attempt's manifest meta (bounded-broadcast policy —
    see text_index.delete_where); corpus-attribute predicates belong
    on the corpus table → :func:`delete_from`."""
    from ed_housing_data_pipeline_spark.operators._commit import (  # noqa: PLC0415
        persist_for_attempt as _persist_for_attempt,
    )

    def _ids(st: dict) -> DataFrame:
        if "ids" not in st:
            vecs = lake.read_segments(
                spark, f"{root}/{VECTORS}", st["pins"][VECTORS]
            )
            st["ids"] = _persist_for_attempt(
                st,
                _live(
                    spark, root, vecs.filter(predicate), st["pins"], st["meta"]
                )
                .select("id")
                .distinct(),
            )
        return st["ids"]

    return _delete_commit(
        spark,
        root,
        hit_fn=lambda df, st: df.join(_ids(st), on="id", how="left_semi"),
        tomb_fn=lambda spark, seq, st: _ids(st)
        .select("id", F.lit(seq).cast("bigint").alias("dead_below"))
        .coalesce(1),
        n_tomb_fn=None,
    )


def _delete_commit(
    spark: SparkSession, root: str, hit_fn, tomb_fn, n_tomb_fn
) -> dict[str, list[int]]:
    """Shared logical-delete commit (see text_index._delete_commit —
    same attempt-state contract: hooks take ``st`` with pins/meta/seq
    and may stash attempt-scoped persisted frames in it)."""
    last_err: Exception | None = None
    for _attempt in range(3):
        pins, meta, base = lake.segment_state(spark, root)
        seq = base + 1
        st: dict = {"pins": pins, "meta": meta, "seq": seq, "_persisted": []}
        try:
            vecs = lake.read_segments(spark, f"{root}/{VECTORS}", pins[VECTORS])
            dead_vecs = _live(spark, root, hit_fn(vecs, st), pins, meta)
            neg = dead_vecs.groupBy("cell").agg(
                (-F.count(F.lit(1))).cast("bigint").alias("_n")
            )
            tomb = tomb_fn(spark, seq, st)
            n_tomb = int(n_tomb_fn(st)) if n_tomb_fn is not None else tomb.count()
            return lake.append_segments(
                spark,
                root,
                appends={
                    TOMBSTONES: tomb,
                    CELLCOUNTS: neg.coalesce(1),
                },
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


def upsert_ann_vectors(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    segment_partitions: int | None = None,
) -> dict[str, list[int]]:
    """Vector REVISION in one atomic commit — the re-embedding wave
    when a document's content changes: each batch id's prior vector
    dies and the freshly encoded one becomes probe-able under the SAME
    manifest flip. Mechanics mirror text_index.upsert_text_batch on
    the liveness axis: new (id, cell, codes) rows stamped with the
    committing sequence, a ``(id, dead_below=seq)`` tombstone per
    batch id (prior rows die, same-sequence rows live, deleted ids
    resurrect), and ONE cellcounts segment carrying the new cells'
    positive counts and the old live cells' negatives — so
    :func:`ann_cell_stats` stays exact as vectors migrate between
    cells. The model is pinned; only the batch re-encodes."""
    cents, codebooks = read_ann_model(spark, root)
    enc = encoded_frame(df, vec_col, id_col, cents, codebooks).persist()
    try:
        ids_df = enc.select("id").distinct()
        # tombstone rows this commit appends (pressure counter) — a
        # tiny count over the cached encode
        n_tomb = ids_df.count()
        last_err: Exception | None = None
        for _attempt in range(3):
            pins, meta, base = lake.segment_state(spark, root)
            seq = base + 1
            old_live = _live(
                spark,
                root,
                lake.read_segments(
                    spark, f"{root}/{VECTORS}", pins[VECTORS]
                ).join(F.broadcast(ids_df), on="id", how="left_semi"),
                pins,
                meta,
            )
            neg = old_live.groupBy("cell").agg(
                (-F.count(F.lit(1))).cast("bigint").alias("_n")
            )
            counts = cell_counts(enc).unionByName(neg)
            tomb = ids_df.select(
                "id", F.lit(seq).cast("bigint").alias("dead_below")
            )
            try:
                return lake.append_segments(
                    spark,
                    root,
                    appends={
                        VECTORS: _cap_wide(
                            enc.withColumn(
                                "useq", F.lit(seq).cast("bigint")
                            ),
                            segment_partitions,
                        ),
                        CELLCOUNTS: _cap(counts, segment_partitions),
                        TOMBSTONES: tomb.coalesce(1),
                    },
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
        raise last_err
    finally:
        enc.unpersist()


def _counts_sum_reduce(df: DataFrame) -> DataFrame:
    """Additive cellcounts fold: negative delete rows cancel; cells
    with no live vectors left keep no row."""
    return (
        df.groupBy("cell")
        .agg(F.sum("_n").cast("bigint").alias("_n"))
        .filter(F.col("_n") > 0)
    )


def apply_ann_deletes(spark: SparkSession, root: str) -> dict[str, list[int]]:
    """PHYSICAL delete/revision completion: rewrite ``vectors``
    live-rows-only (watermark rule, so superseded re-embeddings leave
    disk with deleted ids), fold the negative counts, reset the
    tombstone component — one atomic manifest flip
    (lake.apply_segment_tombstones). Probe results before and after
    are identical."""

    def _live_rows(vecs: DataFrame, tomb: DataFrame) -> DataFrame:
        marks = tomb.groupBy("id").agg(F.max("dead_below").alias("_dead"))
        return (
            vecs.join(F.broadcast(marks), on="id", how="left")
            .filter(
                F.col("_dead").isNull() | (F.col("useq") >= F.col("_dead"))
            )
            .drop("_dead")
        )

    return lake.apply_segment_tombstones(
        spark,
        root,
        tombstones=TOMBSTONES,
        id_col="id",
        transforms={VECTORS: _live_rows},
        reducers={CELLCOUNTS: _counts_sum_reduce},
        # the tombstone component empties with this flip — the
        # liveness-fold pressure counter resets with it
        meta_fn=lambda m: {**m, lake.TOMBSTONE_ROWS_KEY: 0},
    )


def ann_cell_stats(spark: SparkSession, root: str) -> DataFrame:
    """Aggregated per-cell widths (cell, n_vectors) from the additive
    count segments — the imbalance monitor (a skewed cell is a slow
    probe; persistent skew is the re-train/split signal). O(cells)
    after a sum over segment counts, never a scan of ``vectors``.
    Delete-time negative rows fold in; cells with no live vectors
    keep no row."""
    counts = lake.read_segmented_components(spark, root, [CELLCOUNTS])[CELLCOUNTS]
    return (
        counts.groupBy("cell")
        .agg(F.sum("_n").alias("n_vectors"))
        .filter(F.col("n_vectors") > 0)
    )


def probe_ann_index(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    nprobe: int = 1,
    query_filter: Column | None = None,
) -> DataFrame:
    """IVFADC search against the committed index: queries get the
    probe-list + ADC-LUT treatment under the pinned model, then
    equi-join the manifest-pinned (cell, codes) scan on the cell id —
    a bounded query set (``query_filter``) broadcasts, the corpus
    never re-encodes, and per-candidate math is m lookups. Returns
    (q_id, nn_id, adc, rn), adc ascending."""
    cents, codebooks = read_ann_model(spark, root)
    # the stored id column is always ``id``; align it with the query
    # frame's id column so the output (q_id, nn_id) pair is uniform
    corpus = read_ann_vectors(spark, root).select(
        F.col("id").alias(id_col), "cell", "codes"
    )
    return sim.knn_ivf_pq_encoded(
        corpus,
        queries,
        vec_col=vec_col,
        id_col=id_col,
        cents=cents,
        codebooks=codebooks,
        k=k,
        nprobe=nprobe,
        cell_col="cell",
        codes_col="codes",
        query_filter=query_filter,
    )


def compact_ann_index(
    spark: SparkSession,
    root: str,
    min_segments: int = 2,
    max_segment_bytes: int | None = None,
) -> dict[str, list[int]]:
    """Fold multi-segment components back to one segment — plain union
    rewrite for ``vectors``, sum re-aggregation for the additive
    ``cellcounts``. One O(index) rewrite amortized over the K O(batch)
    commits between compactions (bounds read fan-in / small files).
    With tombstones pinned, compaction IS the physical delete apply
    (:func:`apply_ann_deletes`) — the rewrite drops dead rows and
    resets the tombstone component in the same flip."""
    pins = lake.segment_pins(spark, root)
    if TOMBSTONES in pins and (
        lake.read_segments(spark, f"{root}/{TOMBSTONES}", pins[TOMBSTONES])
        .limit(1)
        .count()
    ):
        return apply_ann_deletes(spark, root)
    # subset-sound reducer (pure additive sum) -> size-tiered legal
    return lake.compact_segments(
        spark,
        root,
        reducers={
            CELLCOUNTS: lambda df: df.groupBy("cell").agg(
                F.sum("_n").alias("_n")
            )
        },
        min_segments=min_segments,
        max_segment_bytes=max_segment_bytes,
    )
