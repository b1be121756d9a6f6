"""Streaming document ingest with incremental near-dup dedup.

The Structured Streaming twin of the batch incremental loop
(plans/queries_llm.q_doc_incremental_neardup + incr_index_ingest):
documents arrive as a file stream, and each micro-batch is

1. exact-id deduped against the accepted set (replay/idempotence),
2. near-dup probed against the PERSISTED LSH band index
   (operators.similarity.lsh_probe_pairs — the corpus is never
   re-shingled; stop-band stats come precomputed from the index),
3. near-dup deduped within itself (band self-join, keep-lowest-id
   survivor per verified pair — the deterministic greedy policy),
4. committed O(batch): accepted docs AND their bands/shingles/bucket
   counts land as NEW SEGMENTS of the append-only index
   (operators.incr_index over sources/lake.append_segments — never a
   copy of the accumulated dataset), the tiny stop-band table is
   re-derived incrementally, and one manifest commit makes it all
   visible atomically.

Exactly-once story: foreachBatch is at-least-once on retry, so the
sink must be idempotent — and it is, structurally: a replayed batch's
doc_ids are already in the accepted set, the exact-id anti-join
empties it, and an empty batch commits nothing. A crash between
segment writes and the manifest commit leaves orphan segments that no
reader resolves (the manifest IS the atomic commit point); the
retried batch re-runs from the last committed manifest and converges.
Accepted docs are read back through the same manifest pin, never by
directory listing.

Scale shape per batch: ONE O(batch) shingle/sign pass (the signature
frame is persisted and feeds the dedup decision and every component
write), one (band, key) equi-join against the index band table, one
anti-join against the (tiny) stop-band table, shingle-store joins
only on candidate ids — and O(batch) bytes WRITTEN (the full-copy
snapshot commit this replaced wrote O(index) per batch, O(n²) over a
stream's lifetime). ``compact_every`` folds the accumulated segments
back to one on a cadence, bounding read fan-in and small files;
``expire_segments`` retention runs inside every commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ed_housing_data_pipeline_spark.operators import incr_index
from ed_housing_data_pipeline_spark.operators import similarity as sim
from ed_housing_data_pipeline_spark.sources import lake

DOC_STREAM_SCHEMA = "doc_id BIGINT, text STRING, source STRING"
_DOC_COLS = ("doc_id", "text", "source")


def read_documents_stream(
    spark: SparkSession,
    path: str,
    schema: str = DOC_STREAM_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """JSONL file-source document stream (the format
    sources/export.py ships); ``maxFilesPerTrigger`` bounds each
    micro-batch to a file's worth of work."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def _signed(docs: DataFrame, n_hashes: int, shingle_k: int) -> DataFrame:
    """Attach the dedup signature (``_sh`` shingle array + MinHash
    columns) — the one shingle/hash pass everything else derives from."""
    from ed_housing_data_pipeline_spark.functions.text import word_shingles

    return sim.with_minhash_signature(
        docs.withColumn("_sh", F.array_distinct(word_shingles("text", k=shingle_k))),
        "text",
        n_hashes=n_hashes,
        shingles_col="_sh",
    )


def _batch_frames(
    docs_sig: DataFrame, n_hashes: int, bands: int
) -> dict[str, DataFrame]:
    """A signature frame's data-component frames (docs + bands +
    shingles) — what bootstrap and each per-batch commit append."""
    return incr_index.signature_index_frames(
        docs_sig, "doc_id", n_hashes=n_hashes, bands=bands, doc_cols=_DOC_COLS
    )


def _require_uninitialized(spark: SparkSession, root: str) -> None:
    """Refuse to (re)initialize over a committed index: a bootstrap
    re-run would otherwise commit a fresh version WITHOUT the docs
    accepted by streaming since — silently forgetting them, so future
    replays would re-accept their duplicates."""
    try:
        lake.segment_pins(spark, root)
    except FileNotFoundError:
        return
    raise ValueError(
        f"doc index at {root!r} already has a committed manifest; "
        "refusing to reset it (expire/remove the root explicitly first)"
    )


def init_doc_index(spark: SparkSession, root: str) -> None:
    """Commit v1 = the EMPTY accepted-set index (docs, bands,
    shingles, bucketcounts, stopbands + manifest). Streaming ingest
    needs a committed starting point; to start from an existing corpus
    use :func:`bootstrap_doc_index`."""
    _require_uninitialized(spark, root)
    incr_index.bootstrap_index(
        spark,
        root,
        {
            "docs": spark.createDataFrame([], DOC_STREAM_SCHEMA),
            "bands": spark.createDataFrame(
                [], "doc_id bigint, band int, key string"
            ),
            "shingles": spark.createDataFrame(
                [], "doc_id bigint, _sh array<string>"
            ),
        },
        max_bucket_width=1,  # no buckets yet; real cap applies per commit
    )


def bootstrap_doc_index(
    spark: SparkSession,
    corpus: DataFrame,
    root: str,
    n_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_width: int = 4096,
) -> None:
    """Commit v1 = an EXISTING corpus's accepted set + signatures —
    start streaming ingest against an already-curated corpus instead
    of :func:`init_doc_index`'s empty one. ``corpus`` must carry the
    ``DOC_STREAM_SCHEMA`` columns and unique doc_ids (it is taken as
    already deduplicated — run the batch dedup family first if not).
    The signature frame is persisted across the component writes so
    the corpus is shingled/hashed once, not once per component."""
    _require_uninitialized(spark, root)
    # small/single-file corpora otherwise run the CPU-bound shingle +
    # md5 pass on one input split (scale_out is a no-op once the scan
    # has ≥cores splits — the 100 TB case)
    sig = _signed(sim.scale_out(corpus), n_hashes, shingle_k).persist()
    try:
        # materialize the cache at full parallelism BEFORE the
        # concurrent component writes: bootstrap_index runs its five
        # segment writes as parallel jobs, and each would otherwise
        # race to compute the shingle/hash pass into the cache
        sig.count()
        incr_index.bootstrap_index(
            spark,
            root,
            _batch_frames(sig, n_hashes, bands),
            max_bucket_width=max_bucket_width,
        )
    finally:
        sig.unpersist()


def _pinned(spark: SparkSession, root: str) -> dict[str, DataFrame]:
    """Every component at the segments the last committed manifest
    pins — the only read path (segments alone can be torn-commit
    debris; the manifest cannot)."""
    return incr_index.read_index(spark, root)


def read_accepted_docs(spark: SparkSession, root: str) -> DataFrame:
    """The accepted (deduplicated) document set as of the last
    committed manifest."""
    return _pinned(spark, root)["docs"]


def compact_doc_index(spark: SparkSession, root: str) -> None:
    """Maintenance: fold each component's accumulated segments back to
    one (incr_index.compact_index) — content-neutral, bounds read
    fan-in and small files after many streaming commits."""
    incr_index.compact_index(spark, root)


def _verified_dup_ids(
    cand: DataFrame,
    probe_col: str,
    other_col: str,
    probe_sh: DataFrame,
    other_sh: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs: join the shingle
    arrays onto both sides, keep pairs at/above ``threshold``, return
    the distinct ``probe_col`` ids (the side to DROP) as ``doc_id``.
    ``probe_sh``/``other_sh`` are (doc_id, _sh) frames."""
    return (
        cand.join(
            probe_sh.select(
                F.col("doc_id").alias(probe_col), F.col("_sh").alias("_sh_p")
            ),
            probe_col,
        )
        .join(
            other_sh.select(
                F.col("doc_id").alias(other_col), F.col("_sh").alias("_sh_o")
            ),
            other_col,
        )
        .filter(sim.jaccard_shingles(F.col("_sh_p"), F.col("_sh_o")) >= threshold)
        .select(F.col(probe_col).alias("doc_id"))
        .distinct()
    )


def dedup_batch_against_index(
    batch: DataFrame,
    index: dict[str, DataFrame],
    n_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.7,
    max_bucket_width: int = 4096,
) -> DataFrame:
    """The pure dedup decision for one batch: drop exact-id replays,
    drop docs near-dup (Jaccard >= threshold) of the accepted set,
    then keep the lowest doc_id of each verified near-dup pair WITHIN
    the batch (``max_bucket_width`` bounds that self-join's buckets,
    same guard as the committed stop-band stats). Returns the accepted
    subset of ``batch`` WITH its signature columns (``_sh``, ``mh_*``)
    so callers never recompute the shingle pass — PERSISTED and
    materialized (callers unpersist when done committing): the batch
    signature feeds ~6 branches of the decision DAG, and without the
    internal cache each branch re-ran the scan → dropDuplicates
    shuffle → anti-join → shingle/hash chain, which dominated the
    micro-batch latency. Deterministic for a given (batch, index)."""
    # within-batch id repeats would sail past every near-dup check
    # (a pair needs id_a < id_b); at-least-once sources can produce them
    fresh = batch.dropDuplicates(["doc_id"]).join(
        index["shingles"].select("doc_id"), on="doc_id", how="left_anti"
    )
    sig = _signed(fresh, n_hashes, shingle_k).persist()
    probe_bands = sim.band_keys(sig, "doc_id", n_hashes=n_hashes, bands=bands)
    cand = sim.lsh_probe_pairs(
        probe_bands, index["bands"], "doc_id", stop_bands=index["stopbands"]
    )
    batch_sh = sig.select("doc_id", "_sh")
    corpus_dups = _verified_dup_ids(
        cand, "id_probe", "id_index", batch_sh, index["shingles"], threshold
    )
    survivors_sig = sig.join(corpus_dups, "doc_id", "left_anti")
    pairs = sim.lsh_candidate_pairs(
        survivors_sig,
        "doc_id",
        n_hashes=n_hashes,
        bands=bands,
        max_bucket_width=max_bucket_width,
    )
    # id_a < id_b: dropping every id_b keeps the lowest id per pair
    batch_dups = _verified_dup_ids(
        pairs, "id_b", "id_a", batch_sh, batch_sh, threshold
    )
    out = survivors_sig.join(batch_dups, "doc_id", "left_anti").persist()
    # materialize the decision, then drop the intermediate signature
    # cache — the accepted frame's cached partitions carry everything
    # downstream writes need
    out.count()
    sig.unpersist()
    return out


def run_stream_incremental_dedup(
    stream_df: DataFrame,
    index_root: str,
    checkpoint_dir: str,
    n_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.7,
    max_bucket_width: int = 4096,
    keep_latest: int = 2,
    compact_every: int | None = 64,
    compact_dead: int | None = 100_000,
    compact_max_bytes: int | None = None,
    segment_partitions: int | None = 8,
) -> None:
    """Drain the document stream (availableNow) through the
    foreachBatch incremental-dedup sink described in the module
    docstring. ``init_doc_index`` / :func:`bootstrap_doc_index` must
    have committed manifest v1 first. Every ``compact_every``-th
    commit additionally folds the accumulated segments to one
    (amortized O(index / compact_every) per batch; ``None`` leaves
    compaction to an external maintenance cadence). ``compact_dead``
    is the TOMBSTONE-pressure trigger: when concurrent take-downs
    (incr_index.delete_docs/delete_from against the same root) have
    pinned that many tombstone rows, the next commit compacts — which
    physically applies the deletes and resets the counter — so the
    liveness-watermark fold stays bounded even when the segment-count
    policy alone would never fire (heavy churn, few segments).
    ``segment_partitions`` caps each committed segment's file count —
    micro-batches are small relative to the session's parallelism, and
    5 components × 32 task files per commit is both the dominant
    per-commit fixed cost and a small-file flood; ``None`` preserves
    upstream partitioning for bulk backfill drains."""

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        index = _pinned(spark, index_root)
        # accepted carries its signature columns — persist it so the
        # ONE shingle/hash pass feeds all the component writes
        accepted = dedup_batch_against_index(
            batch_df,
            index,
            n_hashes=n_hashes,
            bands=bands,
            shingle_k=shingle_k,
            threshold=threshold,
            max_bucket_width=max_bucket_width,
        ).persist()
        try:
            # count(), not isEmpty(): isEmpty materializes only one
            # partition, so the first (file-count-capped) segment write
            # would re-run the whole dedup pipeline under its narrowed
            # write parallelism; count() fills the cache at full width
            # and every component write below is then a cache scan
            n_accepted = accepted.count()
            if n_accepted == 0:  # full replay / all dups
                return
            # the count is free here, so size the per-segment file cap
            # to the MEASURED batch: a few-hundred-doc micro-batch has
            # no business writing segment_partitions files per
            # component (5 components deep, each file pays a task
            # launch + the parquet committer's temp-rename) — scale
            # the cap at ~512 rows/file up to the configured ceiling
            sp = segment_partitions
            if sp is not None:
                sp = max(1, min(sp, -(-n_accepted // 512)))
            pins = incr_index.append_batch(
                spark,
                index_root,
                _batch_frames(accepted, n_hashes, bands),
                max_bucket_width=max_bucket_width,
                keep_manifests=keep_latest,
                # a high-frequency committer: bound superseded-manifest
                # accumulation to minutes (readers here hold pins for
                # one micro-batch), not the 24 h crash-debris grace
                reader_grace_sec=600.0,
                segment_partitions=sp,
            )
            if (compact_every and len(pins["bands"]) >= compact_every) or (
                compact_dead
                and lake.tombstone_pressure(spark, index_root, compact_dead)
            ):
                # compact_max_bytes -> size-tiered folding of the
                # micro-batch tail (lake.compact_segments); the
                # delete-apply branch inside compact_index still runs
                # the full rewrite when tombstones are live
                incr_index.compact_index(
                    spark, index_root, max_segment_bytes=compact_max_bytes
                )
        finally:
            accepted.unpersist()

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
