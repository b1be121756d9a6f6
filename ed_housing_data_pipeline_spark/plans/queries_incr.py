"""Incremental (batch-vs-persisted-index) near-dup dedup family.

The production cross-snapshot pattern: the corpus's LSH band table is
PERSISTED once (an append-only segmented index artifact —
operators/incr_index over sources/lake.append_segments), and each new
ingest batch probes it, never re-shingling the corpus. Split out of
plans/queries_llm.py (which re-exports these names for back-compat);
the session cache machinery lives in plans/_caches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ed_housing_data_pipeline_spark.operators import similarity as sim
from ed_housing_data_pipeline_spark.plans import _caches
from ed_housing_data_pipeline_spark.plans._caches import (
    _INCR_FRAMES,
    _INCR_INDEX,
    _INCR_PIN,
    _SHARED_PAIRS,
    _SHARED_SIG,
    BANDS,
    N_HASHES,
    SHINGLE_K,
    _audit,
    _safe_unpersist,
    _session_mismatch,
    shared_signatures,
)
from ed_housing_data_pipeline_spark.plans.queries_llm import (
    _bands_cte,
    _minhash_sql_cols,
    _shingles_cte,
)
from ed_housing_data_pipeline_spark.plans.registry import register
from ed_housing_data_pipeline_spark.sources import lake


# ------------------------------------- incremental (batch-vs-index) dedup
# The production cross-snapshot pattern: the corpus's LSH band table is
# PERSISTED once (an index artifact), and each new ingest batch probes
# it — never re-shingling the corpus. Here the "new batch" is one
# source bucket of the documents table and the index is everything
# else, written to parquet on first use and memoized per session.
INCR_BATCH_SOURCE = "src0"
INCR_MAX_BUCKET = 1024
INCR_THRESHOLD = 0.2


def _corpus_index_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The lazy (bands, shingles, stopbands) expressions of the corpus
    index — what v1 of the persisted index materializes. ``stopbands``
    is the index's own bucket-statistics artifact: the (band, key)
    buckets wider than ``INCR_MAX_BUCKET``, computed at build/ingest
    time so probes never re-aggregate the whole band table."""
    corpus = shared_signatures(spark, sf_dir).filter(
        F.col("source") != INCR_BATCH_SOURCE
    )
    bands = sim.band_keys(corpus, "doc_id", n_hashes=N_HASHES, bands=BANDS)
    stop = sim.oversized_bucket_stats(bands, ["band", "key"], INCR_MAX_BUCKET)
    return bands, corpus.select("doc_id", "_sh"), stop


def _ensure_incr_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The persisted LSH index of the corpus (everything except the
    batch source) as (bands, shingles, stopbands) DataFrames — an
    APPEND-ONLY segmented dataset (operators.incr_index over
    sources/lake.append_segments): ``bands/`` = the (doc_id, band,
    key) band table, ``shingles/`` = the (doc_id, _sh) store the
    verification join reads, ``bucketcounts/`` = additive per-bucket
    width segments, ``stopbands/`` = the oversized-bucket keys probes
    must skip (bucket stats belong to the index artifact — maintained
    incrementally per ingest, never per probe). Built once per sf_dir
    per session; each ingest appends the batch's rows as NEW SEGMENTS
    (:func:`incr_index_ingest` — O(batch) written, never a copy of
    the accumulated index) and unpinned segments age out via
    ``expire_segments``. A ``manifest/`` snapshot records which
    segment set forms a consistent index; its commit is the ingest's
    atomic commit point and probes always read through it.

    Under ``AUDIT_LAZY_PLANS`` this function never executes a job
    (the plan-shape suite's "plans are built, not executed" contract):
    a pre-built index (``ensure_incr_index_built`` from the audit
    fixture) is served as the real parquet-segment read; if none was
    built, the lazy un-persisted expressions stand in."""
    from ed_housing_data_pipeline_spark.operators import (  # noqa: PLC0415
        incr_index,
    )

    key = (sf_dir, SHINGLE_K, N_HASHES)
    tmp = _INCR_INDEX.get(key)
    if tmp is None:
        if _audit():
            return _corpus_index_frames(spark, sf_dir)
        import tempfile

        tmp = tempfile.TemporaryDirectory(prefix="incr_lsh_index_")
        bands, shingles, _stop = _corpus_index_frames(spark, sf_dir)
        _INCR_PIN[key] = incr_index.bootstrap_index(
            spark,
            tmp.name,
            {"bands": bands, "shingles": shingles},
            max_bucket_width=INCR_MAX_BUCKET,
        )
        # memoize ONLY after the manifest commit: a failed build must
        # not leave a tempdir memo with no readable manifest (the next
        # call would then skip the build branch forever); on failure
        # `tmp` goes out of scope and its finalizer removes the debris
        _INCR_INDEX[key] = tmp
    # Segments alone can be torn-commit debris, so probes pin every
    # component to the segment lists recorded by the last committed
    # MANIFEST, the index's single atomic commit point. The pin is
    # memoized at build/ingest time so plan construction schedules no
    # job.
    pins = _INCR_PIN.get(key)
    if pins is None:
        pins = lake.segment_pins(spark, tmp.name)
        _INCR_PIN[key] = pins
    token = tuple(sorted((c, tuple(s)) for c, s in pins.items()))
    # memoize the three analyzed relations per pin: each read is a
    # driver-side file listing + footer read per probe BUILD, and the
    # pinned segment dirs are immutable — invalidated whenever the pin
    # moves (incr_index_ingest) or the caller session changes
    # (relations execute with their creating session's state)
    frames = _INCR_FRAMES.get(key)
    if frames is None or frames[0] != token or _session_mismatch(frames[1][0], spark):
        frames = (
            token,
            tuple(
                lake.read_segments(spark, f"{tmp.name}/{ds}", pins[ds])
                for ds in ("bands", "shingles", "stopbands")
            ),
        )
        _INCR_FRAMES[key] = frames
    return frames[1]


def ensure_incr_index_built(spark: SparkSession, sf_dir: str) -> None:
    """Eagerly materialize the v1 index snapshot. Audit entry points
    (tests' plans fixture, scripts/plan_audit.py) call this BEFORE
    flipping AUDIT_LAZY_PLANS so the audited plan shows the production
    shape (parquet snapshot scans) while the plan build itself stays
    job-free. The shared signature cache the build persisted is dropped
    again (index kept): a live cached plan would be auto-substituted by
    the cache manager into every audited plan, hiding the real scans."""
    _ensure_incr_index(spark, sf_dir)
    key = (sf_dir, SHINGLE_K, N_HASHES)
    sig = _SHARED_SIG.pop(key, None)
    if sig is not None:
        _safe_unpersist(sig)
    # same substitution hazard for the shared pair tables: any live
    # persisted pair DataFrame would appear as an InMemoryRelation
    # inside every audited consumer plan
    for k in list(_SHARED_PAIRS):
        _safe_unpersist(_SHARED_PAIRS.pop(k))


def incr_index_ingest(
    spark: SparkSession,
    sf_dir: str,
    source: str = INCR_BATCH_SOURCE,
    keep_latest: int = 2,
    orphan_grace_sec: float = 24 * 3600,
) -> dict[str, list[int]]:
    """Merge an ingested batch into the persisted LSH index: append
    the batch's band/shingle rows as NEW SEGMENTS, append its
    per-bucket counts, update the (tiny) stop-band table incrementally
    and flip the manifest (operators.incr_index.append_batch — readers
    see the old pin or the new one, never a partial write), then age
    out unpinned segments. Returns the committed pin map.

    This is the other half of :func:`q_doc_incremental_neardup`'s
    production loop: probe the committed index, then fold the batch in
    so the NEXT ingest dedups against it. Cost is O(batch) compute AND
    O(batch) bytes written — the full-copy snapshot commit this
    replaced paid an O(index) copy per ingest.

    Retries are safe: the merge bases itself on the last
    fully-committed manifest pin and skips batch docs the index
    already holds, so re-running after a torn ingest (or re-running a
    completed one) converges to the same content."""
    from ed_housing_data_pipeline_spark.operators import (  # noqa: PLC0415
        incr_index,
    )

    # IDEMPOTENT merge: the base is the manifest-pinned (last fully
    # committed) index state — never a torn ingest's half-advanced
    # segments — and the batch is anti-joined on doc_ids the index
    # already holds. A retry after a crash re-derives the same
    # next-ingest content instead of doubling the batch, and re-running
    # a completed ingest commits an empty batch (same content).
    _base_bands, base_shingles, _base_stop = _ensure_incr_index(spark, sf_dir)
    key = (sf_dir, SHINGLE_K, N_HASHES)
    tmp = _INCR_INDEX[key]
    batch = shared_signatures(spark, sf_dir).filter(F.col("source") == source)
    batch = batch.join(base_shingles.select("doc_id"), on="doc_id", how="left_anti")
    pins = incr_index.append_batch(
        spark,
        tmp.name,
        {
            "bands": sim.band_keys(batch, "doc_id", n_hashes=N_HASHES, bands=BANDS),
            "shingles": batch.select("doc_id", "_sh"),
        },
        max_bucket_width=INCR_MAX_BUCKET,
        keep_manifests=keep_latest,
        orphan_grace_sec=orphan_grace_sec,
        # no fixed segment_partitions cap (r16): the write path itself
        # sizes every segment to ~target-size files from the frame's
        # byte estimate (lake.sized_for_segment_write) — a micro-batch
        # lands as one file, a 100 TB batch keeps its parallelism; the
        # old local-tuned 8 forced a repartition shuffle AND was wrong
        # at both extremes
    )
    _INCR_PIN[key] = pins
    return pins


INCR_NEARDUP_ORACLE = f"""
WITH {_shingles_cte()},
sig AS (
    SELECT s.doc_id, s.sh,
           {_minhash_sql_cols()}
    FROM sh s
),
bands AS ({_bands_cte()}),
cb AS (
    SELECT b.doc_id, b.band, b.key
    FROM bands b JOIN documents d ON d.doc_id = b.doc_id
    WHERE d.source <> '{INCR_BATCH_SOURCE}'
),
pb AS (
    SELECT b.doc_id, b.band, b.key
    FROM bands b JOIN documents d ON d.doc_id = b.doc_id
    WHERE d.source = '{INCR_BATCH_SOURCE}'
),
kept AS (
    SELECT band, key FROM cb GROUP BY band, key
    HAVING COUNT(*) <= {INCR_MAX_BUCKET}
),
cand AS (
    SELECT DISTINCT p.doc_id AS batch_id, c.doc_id AS corpus_id
    FROM pb p
    JOIN kept k ON k.band = p.band AND k.key = p.key
    JOIN cb c ON c.band = p.band AND c.key = p.key
)
SELECT batch_id, corpus_id,
       ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / NULLIF(CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE), 0),
             4) AS jaccard
FROM cand
JOIN sig sa ON sa.doc_id = cand.batch_id
JOIN sig sb ON sb.doc_id = cand.corpus_id
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      / NULLIF(CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE), 0)
      >= {INCR_THRESHOLD}
"""


@register("doc_incremental_neardup", oracle=INCR_NEARDUP_ORACLE)
def q_doc_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: a new ingest batch (one source bucket)
    probed against the corpus's PERSISTED LSH band index — the
    cross-snapshot dedup a 100 TB pipeline runs per ingest, where
    re-shingling the accumulated corpus every batch would be O(corpus)
    per batch instead of O(batch).

    Plan shape: batch docs are shingled/signed (small side), the index
    side is parquet scans (band table + shingle store + stop-band
    stats) — the full corpus text is never re-read, and the stop-band
    width cap (mirrored in the oracle's HAVING clause) is served from
    the index's own precomputed bucket statistics, so no per-probe
    O(index) aggregation either. Exact-Jaccard verification joins the
    batch's shingles against the index's shingle store."""
    def _build() -> DataFrame:
        index_bands, index_shingles, stop_bands = _ensure_incr_index(
            spark, sf_dir
        )
        batch_sig = shared_signatures(spark, sf_dir).filter(
            F.col("source") == INCR_BATCH_SOURCE
        )
        probe_bands = sim.band_keys(
            batch_sig, "doc_id", n_hashes=N_HASHES, bands=BANDS
        )
        cand = sim.lsh_probe_pairs(
            probe_bands,
            index_bands,
            "doc_id",
            stop_bands=stop_bands,
        )
        batch_sh = batch_sig.select(
            F.col("doc_id").alias("batch_id"), F.col("_sh").alias("sh_a")
        )
        index_sh = index_shingles.select(
            F.col("doc_id").alias("corpus_id"), F.col("_sh").alias("sh_b")
        )
        return (
            cand.withColumnRenamed("id_probe", "batch_id")
            .withColumnRenamed("id_index", "corpus_id")
            .join(batch_sh, "batch_id")
            .join(index_sh, "corpus_id")
            .withColumn(
                "jaccard", sim.jaccard_shingles(F.col("sh_a"), F.col("sh_b"))
            )
            .filter(F.col("jaccard") >= INCR_THRESHOLD)
            .select(
                "batch_id", "corpus_id", F.round("jaccard", 4).alias("jaccard")
            )
        )

    # memo_plan skips the per-call driver plan build only (see
    # plans/_caches.py) — but THIS index is mutable within a session
    # (incr_index_ingest moves the manifest pin; expire_segments sweeps
    # unpinned stopbands), so the memo is keyed on the committed pin
    # map: any ingest rebuilds the plan and the probe → ingest → probe
    # loop always reads the newly committed segments (r16, r15 ADVICE
    # #1 — the previous "immutable session snapshot" comment was wrong
    # for this index). First call (index not yet built) passes a None
    # token; the build memoizes the pin, so the second call re-keys
    # once and stays memoized until the pin moves.
    key = (sf_dir, SHINGLE_K, N_HASHES)
    pins = _INCR_PIN.get(key)
    token = (
        None
        if pins is None
        else tuple(sorted((c, tuple(s)) for c, s in pins.items()))
    )
    return _caches.memo_plan(
        "doc_incremental_neardup", spark, sf_dir, _build, token=token
    )


