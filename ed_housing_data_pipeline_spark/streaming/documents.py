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
4. committed: accepted docs AND their bands/shingles/bucket-stats
   land as the next snapshot version of a single MANIFEST-committed
   index (sources/lake.write_snapshot), so later batches dedup
   against everything accepted before them.

Exactly-once story: foreachBatch is at-least-once on retry, so the
sink must be idempotent — and it is, structurally: a replayed batch's
doc_ids are already in the accepted set, the exact-id anti-join
empties it, and an empty batch commits nothing. A crash between
component writes and the manifest commit leaves orphan snapshot
versions that no reader resolves (the manifest IS the atomic commit
point); the retried batch re-runs from the last committed manifest
and converges. Accepted docs are read back through the same manifest
pin, never by directory listing.

Scale shape per batch: O(batch) shingle/sign compute, one
(band, key) equi-join against the index band table, one anti-join
against the (tiny) stop-band table, shingle-store joins only on
candidate ids. The index copy per commit is the snapshot-isolation
price (see incr_index_ingest's docstring for the partition-append
trade); expire_snapshots bounds disk to ``keep_latest`` versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ed_housing_data_pipeline_spark.operators import similarity as sim
from ed_housing_data_pipeline_spark.sources import lake

DOC_STREAM_SCHEMA = "doc_id BIGINT, text STRING, source STRING"
_COMPONENTS = ("docs", "bands", "shingles", "stopbands")
_MANIFEST_SCHEMA = "docs bigint, bands bigint, shingles bigint, stopbands bigint"


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


def init_doc_index(spark: SparkSession, root: str) -> None:
    """Commit v1 = the EMPTY accepted-set index (docs, bands,
    shingles, stopbands + manifest). Streaming ingest needs a
    committed starting point; bootstrapping from an existing corpus
    instead is one ``_commit`` of its signature frames."""
    empty = {
        "docs": spark.createDataFrame([], DOC_STREAM_SCHEMA),
        "bands": spark.createDataFrame([], "doc_id bigint, band int, key string"),
        "shingles": spark.createDataFrame(
            [], "doc_id bigint, _sh array<string>"
        ),
        "stopbands": spark.createDataFrame(
            [], "band int, key string, _bw bigint, _ns bigint"
        ),
    }
    _commit(spark, root, {c: empty[c] for c in _COMPONENTS})


def _commit(spark: SparkSession, root: str, frames: dict[str, DataFrame]) -> None:
    versions = {
        c: lake.write_snapshot(spark, frames[c], f"{root}/{c}") for c in _COMPONENTS
    }
    mdf = spark.createDataFrame(
        [tuple(versions[c] for c in _COMPONENTS)], _MANIFEST_SCHEMA
    )
    lake.write_snapshot(spark, mdf, f"{root}/manifest")


def _pinned(spark: SparkSession, root: str) -> dict[str, DataFrame]:
    """Every component at the versions the last committed manifest
    records — the only read path (component pointers alone can be
    torn by a crashed commit; the manifest cannot)."""
    row = lake.read_snapshot(spark, f"{root}/manifest").collect()[0]
    return {
        c: lake.read_snapshot(spark, f"{root}/{c}", version=row[c])
        for c in _COMPONENTS
    }


def read_accepted_docs(spark: SparkSession, root: str) -> DataFrame:
    """The accepted (deduplicated) document set as of the last
    committed manifest."""
    return _pinned(spark, root)["docs"]


def dedup_batch_against_index(
    batch: DataFrame,
    index: dict[str, DataFrame],
    n_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """The pure dedup decision for one batch: drop exact-id replays,
    drop docs near-dup (Jaccard >= threshold) of the accepted set,
    then keep the lowest doc_id of each verified near-dup pair WITHIN
    the batch. Returns the accepted subset of ``batch`` (original
    columns), deterministic for a given (batch, index)."""
    from ed_housing_data_pipeline_spark.functions.text import word_shingles

    # within-batch id repeats would sail past every near-dup check
    # (a pair needs id_a < id_b); at-least-once sources can produce them
    fresh = batch.dropDuplicates(["doc_id"]).join(
        index["shingles"].select("doc_id"), on="doc_id", how="left_anti"
    )
    sig = sim.with_minhash_signature(
        fresh.withColumn(
            "_sh", F.array_distinct(word_shingles("text", k=shingle_k))
        ),
        "text",
        n_hashes=n_hashes,
        shingles_col="_sh",
    )
    probe_bands = sim.band_keys(sig, "doc_id", n_hashes=n_hashes, bands=bands)
    cand = sim.lsh_probe_pairs(
        probe_bands, index["bands"], "doc_id", stop_bands=index["stopbands"]
    )
    batch_sh = sig.select("doc_id", "_sh")
    corpus_dups = (
        cand.join(
            batch_sh.select(
                F.col("doc_id").alias("id_probe"), F.col("_sh").alias("sh_a")
            ),
            "id_probe",
        )
        .join(
            index["shingles"].select(
                F.col("doc_id").alias("id_index"), F.col("_sh").alias("sh_b")
            ),
            "id_index",
        )
        .filter(sim.jaccard_shingles(F.col("sh_a"), F.col("sh_b")) >= threshold)
        .select(F.col("id_probe").alias("doc_id"))
        .distinct()
    )
    survivors_sig = sig.join(corpus_dups, "doc_id", "left_anti")
    pairs = sim.lsh_candidate_pairs(
        survivors_sig, "doc_id", n_hashes=n_hashes, bands=bands
    )
    sh_a = batch_sh.select(F.col("doc_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    sh_b = batch_sh.select(F.col("doc_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    batch_dups = (
        pairs.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .filter(sim.jaccard_shingles(F.col("sh_a"), F.col("sh_b")) >= threshold)
        .select(F.col("id_b").alias("doc_id"))  # id_a < id_b: lowest id survives
        .distinct()
    )
    return fresh.join(corpus_dups, "doc_id", "left_anti").join(
        batch_dups, "doc_id", "left_anti"
    )


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
) -> None:
    """Drain the document stream (availableNow) through the
    foreachBatch incremental-dedup sink described in the module
    docstring. ``init_doc_index`` (or a corpus bootstrap) must have
    committed manifest v1 first."""

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        index = _pinned(spark, index_root)
        accepted = dedup_batch_against_index(
            batch_df,
            index,
            n_hashes=n_hashes,
            bands=bands,
            shingle_k=shingle_k,
            threshold=threshold,
        )
        # the accepted set feeds four component writes — materialize it
        # once (tiny: one micro-batch minus dups), release after commit
        accepted = accepted.persist()
        try:
            if accepted.isEmpty():  # full replay / all dups: nothing to commit
                return
            from ed_housing_data_pipeline_spark.functions.text import word_shingles

            sig = sim.with_minhash_signature(
                accepted.withColumn(
                    "_sh", F.array_distinct(word_shingles("text", k=shingle_k))
                ),
                "text",
                n_hashes=n_hashes,
                shingles_col="_sh",
            )
            new_bands = index["bands"].unionByName(
                sim.band_keys(sig, "doc_id", n_hashes=n_hashes, bands=bands)
            )
            frames = {
                "docs": index["docs"].unionByName(
                    accepted.select("doc_id", "text", "source")
                ),
                "bands": new_bands,
                "shingles": index["shingles"].unionByName(
                    sig.select("doc_id", "_sh")
                ),
                # bucket stats track the NEW committed band table so
                # the next batch's probe stays free of the O(index) agg
                "stopbands": sim.oversized_bucket_stats(
                    new_bands, ["band", "key"], max_bucket_width
                ),
            }
            _commit(spark, index_root, frames)
            for c in (*_COMPONENTS, "manifest"):
                lake.expire_snapshots(
                    spark, f"{index_root}/{c}", keep_latest=keep_latest
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
