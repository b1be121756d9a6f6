"""Persisted inverted text index on the segmented lake.

The 100 TB text-search primitive a training-data pipeline needs: the
corpus's posting lists — (term, doc_id, tf, positions) — are PERSISTED
once as an append-only segmented component (sources/lake.append_segments,
the same commit protocol the LSH and ANN indexes ride), and every
search probes the pinned segments instead of re-tokenizing the corpus.

Scale shape:
- **Build** is one posexplode + one (term_h, doc_id) partial-agg
  shuffle per ingest batch — O(batch tokens), never a corpus pass.
  The shuffle keys on ``xxhash64(term)`` (8 bytes), not the term
  string, per the r8 shuffle-key A/B (PLANS.md).
- **Search** pushes ``term IN (...)`` into the parquet scan of the
  pinned segments (dictionary-encoded string column → row-group
  skipping), and bloom sidecars on ``term`` drop whole segments whose
  ingest batch never saw a probe term — driver-side, before Spark
  plans anything.
- **AND query** is one groupBy(doc_id) over the k filtered posting
  lists; **phrase query** is a doc_id equi-join of two posting lists
  with a position-set intersection (``array_intersect`` of shifted
  positions) — both tiny after the term filter, broadcast at small
  stats, shuffle-hash at scale.

Contract shared with the LSH/ANN index artifacts: each document's
postings live in exactly one ingest segment (batches partition the
corpus by doc_id), so per-(term, doc) rows never straddle segments and
merging search results across segments is a plain union.

The reference has no search surface (its query layer is
duckdb_viewer/view_gold.py:37-118); this module is part of the
beyond-reference large-corpus battery the build brief mandates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ed_housing_data_pipeline_spark.functions.text import tokens
from ed_housing_data_pipeline_spark.sources import lake

COMPONENT = "postings"
TERMSTATS = "termstats"
DOCLENS = "doclens"
TOMBSTONES = "deleted_docs"
TERM_SEED = 42
# below this many ids the delete scan uses an IN literal (pushed to
# the parquet reader for row-group skipping); above it, a broadcast
# semi-join (same plan class the bounded-query ANN probe uses)
_DELETE_LITERAL_BUDGET = 256
# rarest-first conjunction broadcasts the rarest term's doc set only
# while it stays executor-memory friendly (8 B/doc → ~8 MB at the cap);
# wider rare lists fall back to the plain one-shuffle plan
_RAREST_BROADCAST_MAX_DF = 1_000_000
# ... and only when the corpus is big enough that trimming the shuffle
# can possibly repay the df-stats probe job (corpus size is manifest
# meta — the gate itself is a driver-side read, no job)
_RAREST_MIN_CORPUS = 1_000_000
# the liveness-watermark fold broadcasts only while the pinned
# tombstone row count (manifest meta, driver-side read) stays under
# this — ~2M (id, long) rows ≈ 50 MB serialized, comfortably inside
# executor broadcast budgets; past it the fold joins as a shuffle
# (AQE may still broadcast if the MAX-fold collapses it) so a
# churn-heavy CDC stream between compactions cannot balloon a
# broadcast without bound
_LIVE_BROADCAST_MAX_ROWS = 2_000_000
# Segment file sizing (guide §6: aim for large output files). A
# posting-segment write coalesces to ceil(token_total × est-bytes ÷
# target): a small ingest batch lands as ONE file instead of
# shuffle-partition-many ~10 KiB files (probes then pay one scan task
# per segment, not per shuffle partition), while a 100 TB batch still
# writes thousands of near-target files. 24 B/token approximates the
# on-disk posting row (hash + id + term + tf + positions, zstd);
# sizing only affects file granularity, never content.
_POSTING_BYTES_PER_TOKEN = 24
_SEGMENT_FILE_TARGET = 128 << 20


def posting_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term_h, doc_id, term, tf, positions) posting rows of a corpus
    batch. Tokenization is the engine-wide whitespace ``tokens`` on
    lowercased text (identical to every doc_* oracle twin); positions
    are 0-based token offsets, sorted, unique per (term, doc). The
    aggregation keys on the 8-byte ``term_h`` with the term string
    carried as a payload column (bloom sidecars and the row-level
    ``term IN`` predicate want the exact string)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "term"),
    )
    return (
        tok.groupBy(
            F.xxhash64("term", F.lit(TERM_SEED)).alias("term_h"),
            "doc_id",
        )
        .agg(
            F.first("term").alias("term"),
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def _commit_batch(
    spark,
    root: str,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    init: bool,
    extra_meta: dict | None = None,
    replay_guard: tuple[str, int] | None = None,
) -> dict[str, list[int]] | None:
    """One O(batch) index commit: a postings segment (+ term bloom), a
    termstats segment — the batch's per-term document frequency, which
    is ADDITIVE across segments because each doc lives in exactly one
    batch — and the cumulative corpus doc count folded into the
    manifest meta atomically with the data (the ranked-retrieval idf
    numerator, read back driver-side with no job). Prior meta keys
    carry forward; ``extra_meta`` lets a transactional committer (the
    streaming sink's batch id) ride the same atomic flip.

    The meta counters are read-modify-write state, so the commit is
    pinned to the manifest version the counters were read from
    (``expected_base``): a rival committer landing between the read
    and the flip raises ConcurrentCommitError instead of silently
    rebasing n_docs/total_tokens onto a stale value, and the commit is
    retried from a fresh read (batch-derived frames are unchanged; the
    failed attempt's segment files stay unpinned debris for the
    age-gated sweep, the protocol's normal loser path).

    ``replay_guard`` = (meta_key, batch_id) makes the commit a
    transactional streaming-sink step: on EVERY attempt, the guard is
    re-checked against the freshly read meta — the same manifest
    version the commit is pinned to — and the commit returns None
    (no-op) when ``meta[meta_key] >= batch_id``. Checking inside the
    retry loop is what closes the zombie-driver double-commit: a rival
    replaying the same checkpoint that lands this batch id between our
    read and flip fails our attempt with ConcurrentCommitError, and
    the NEXT attempt's fresh read sees the id and skips (mirrors
    streaming/rollups.sink_rollup_batch)."""
    from pyspark import StorageLevel  # noqa: PLC0415

    from ed_housing_data_pipeline_spark.functions.text import (  # noqa: PLC0415
        token_count,
    )

    p = posting_table(batch, id_col, text_col)
    p.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        stats = p.groupBy("term_h").agg(
            F.first("term").alias("term"),
            # postings are unique per (term, doc) within the batch, so
            # a plain count IS the batch document frequency
            F.count(F.lit(1)).cast("bigint").alias("df"),
        )
        # per-doc token length (BM25's dl) straight off the batch — a
        # NARROW map (token_count == sum of the doc's posting tfs by
        # construction: both count the same whitespace tokens), so the
        # doclens segment write carries no shuffle, and ONE tiny agg
        # over it yields BOTH meta counters (n_docs including
        # zero-token docs, total tokens) — replacing the separate
        # batch.count() and lens-sum jobs the r8 commit path paid
        # (r8 VERDICT #4: fold per-commit jobs into the writes)
        all_lens = batch.select(
            F.col(id_col).alias("doc_id"),
            token_count(F.col(text_col)).alias("dl"),
        )
        row = all_lens.agg(
            F.count(F.lit(1)).alias("_n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("_tot"),
        ).collect()[0]
        n_batch, tot_batch = int(row["_n"]), int(row["_tot"])
        # zero-token docs keep no doclens row (they can't match a
        # term), but they DID count toward n_docs above
        lens = all_lens.filter(F.col("dl") > 0)
        # Segment file sizing (r15 opt, guide §6): the posting frame
        # leaves its aggregation with shuffle-partition-many tiny
        # files (AQE cannot re-coalesce a persisted plan), so every
        # probe paid one scan task per file (measured: 3 segments ×
        # 32 × ~11 KiB files → 64+ scan tasks per search at sf0.1).
        # Coalesce the WRITE to ceil(estimated bytes / target) — the
        # count derives from the batch's measured token total, so a
        # 100 TB ingest still writes hundreds of full-size files while
        # a small batch writes one. coalesce() never raises the
        # partition count, so large batches keep their parallelism.
        n_files = max(
            1, -(-tot_batch * _POSTING_BYTES_PER_TOKEN // _SEGMENT_FILE_TARGET)
        )
        p_write = p.coalesce(int(n_files))
        last_err: Exception | None = None
        for _attempt in range(3):
            if init:
                prior, base = {}, 0
            else:
                prior, base = lake.segment_meta_versioned(spark, root)
            if replay_guard is not None:
                key, bid = replay_guard
                if bid <= int(prior.get(key, -1)):
                    return None
            # rows carry the manifest sequence that commits them: the
            # liveness axis deletes/upserts tombstone against (a row is
            # live iff useq >= its doc's highest dead_below watermark)
            seq = base + 1
            try:
                return lake.append_segments(
                    spark,
                    root,
                    # TERMSTATS first (writes run in dict order, and a
                    # commit's components are order-independent): its
                    # aggregation populates the persisted posting cache
                    # at the batch's FULL shuffle parallelism, so the
                    # coalesced postings write that follows merges the
                    # already-cached partitions instead of squashing
                    # the posting aggregation itself down to n_files
                    # tasks (r15 ADVICE #4 — coalesce() propagates
                    # upstream through an unmaterialized plan).
                    appends={
                        TERMSTATS: stats,
                        COMPONENT: p_write.withColumn(
                            "useq", F.lit(seq).cast("bigint")
                        ),
                        DOCLENS: lens.withColumn(
                            "useq", F.lit(seq).cast("bigint")
                        ),
                    },
                    init=init,
                    bloom_cols={COMPONENT: ["term"]},
                    meta={
                        **prior,
                        "n_docs": int(prior.get("n_docs", 0)) + n_batch,
                        "total_tokens": int(prior.get("total_tokens", 0))
                        + int(tot_batch),
                        **(extra_meta or {}),
                    },
                    expected_base=base,
                )
            except lake.ConcurrentCommitError as e:
                last_err = e
        raise last_err
    finally:
        p.unpersist()


def bootstrap_text_index(
    spark, root: str, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> dict[str, list[int]]:
    """First commit of the index: postings + termstats segments for
    the bootstrap corpus, bloom sidecar on ``term``, manifest v1."""
    return _commit_batch(spark, root, docs, id_col, text_col, init=True)


def append_text_batch(
    spark,
    root: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_meta: dict | None = None,
    replay_guard: tuple[str, int] | None = None,
) -> dict[str, list[int]] | None:
    """Fold an ingest batch into the index: O(batch) — new postings +
    termstats segments, one manifest flip. The accumulated index is
    never rewritten; readers see the old pin or the new one, never a
    partial write. With ``replay_guard`` (see :func:`_commit_batch`)
    returns None when the guarded batch id is already committed."""
    return _commit_batch(
        spark,
        root,
        batch,
        id_col,
        text_col,
        init=False,
        extra_meta=extra_meta,
        replay_guard=replay_guard,
    )


def _tombstone_watermarks(spark, root: str, pins: dict) -> DataFrame | None:
    """The pinned tombstone state folded to one watermark per doc —
    ``(doc_id, _dead)`` where ``_dead`` is the highest ``dead_below``
    committed for the doc — or None when no delete/upsert ever
    committed. A row of a versioned component is LIVE iff its ``useq``
    (the manifest sequence that committed it) is ≥ the watermark:
    deletes and upserts both tombstone at their own commit sequence,
    so "kill everything older than me" composes under MAX — a delete
    kills all prior revisions, an upsert kills them while its own
    rows (stamped with the same sequence) survive, and a later upsert
    RESURRECTS a deleted id because its sequence outranks the
    delete's."""
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
    """Versioned-row liveness filter: join the per-doc watermark and
    keep rows committed at-or-after it. No tombstones → the frame
    passes through untouched (and need not carry useq). The fold is
    broadcast while the pinned tombstone row count (``meta``'s
    :data:`lake.TOMBSTONE_ROWS_KEY`, maintained by every delete/upsert
    commit) stays under :data:`_LIVE_BROADCAST_MAX_ROWS`; past it — a
    churn-heavy stream between compactions — it degrades to a shuffle
    join instead of an unbounded broadcast. ``meta=None`` (legacy
    callers) keeps the broadcast hint."""
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


def delete_docs(spark, root: str, doc_ids: Sequence) -> dict[str, list[int]]:
    """LOGICAL delete (the GDPR take-down): one O(delete-set) commit
    after which the documents are unsearchable through every query
    path — conjunctive, phrase, prefix, tf-idf, BM25 — while committed
    segments stay untouched. Three artifacts land under ONE
    expected_base manifest flip, so rival ingests conflict loudly and
    readers see pre- or post-delete state, never half:

    - a ``deleted_docs`` tombstone segment (readers anti-join it);
    - a NEGATIVE termstats segment — per term of the deleted docs,
      ``df = -count`` — valid precisely because termstats are additive
      (term_stats sums across segments, so corpus df is exact without
      rewriting any stats segment);
    - adjusted ``n_docs`` / ``total_tokens`` meta counters (BM25's N
      and avgdl), derived from the deleted docs' doclens rows.

    Finding the deleted docs' terms needs one pass over the pinned
    postings (an inverted index maps term→doc, not doc→term); small
    delete sets push ``doc_id IN (...)`` into the parquet scan for
    row-group skipping. Batch take-downs amortize this exactly like
    compaction. Ids absent from the corpus are tombstoned harmlessly
    and adjust no counter; already-deleted ids are dropped (so a
    replayed delete is idempotent). Physical removal happens at
    :func:`compact_text_index` / :func:`apply_text_deletes`.

    Zero-token documents (no postings, no doclens row) count toward
    n_docs at ingest but cannot be recognized at delete time — their
    tombstone lands (correct: they match no search anyway) but n_docs
    keeps counting them; an idf bias of at most the corpus's
    zero-token-doc count, zero on any corpus without empty texts."""
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
        )
    return delete_from(
        spark, root, spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    )


def delete_from(
    spark,
    root: str,
    ids_df: DataFrame,
    id_col: str = "doc_id",
    segment_partitions: int | None = 1,
) -> dict[str, list[int]]:
    """The DataFrame-scale take-down: :func:`delete_docs` semantics
    with the delete set expressed as a DataFrame of ids — "delete
    every document from source X" at 100 TB, where the set is itself
    millions of rows and must NEVER materialize on the driver. The
    tombstone segment is written FROM the frame (a select, no
    collect), the negative termstats come from semi-joining the pinned
    postings against it (AQE broadcasts the build side only while it
    is actually small), and the n_docs/total_tokens/n_tombstones meta
    adjustments ride the same single ``expected_base`` flip.

    ``ids_df`` must be deterministic under recomputation (e.g. a
    filter over a committed table) — the same contract every segment
    writer carries; it is persisted for the duration of the commit so
    the tombstone write, the stats job, and the counters all see one
    content. ``segment_partitions`` caps the tombstone segment's file
    count (None preserves the frame's partitioning for very large
    delete sets)."""
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

        def _cap(df: DataFrame) -> DataFrame:
            return df.coalesce(segment_partitions) if segment_partitions else df

        return _delete_commit(
            spark,
            root,
            hit_fn=lambda df, st: df.join(ids, on="doc_id", how="left_semi"),
            tomb_fn=lambda spark, seq, st: _cap(
                ids.select(
                    "doc_id", F.lit(seq).cast("bigint").alias("dead_below")
                )
            ),
            n_tomb_fn=lambda st: n_tomb,
        )
    finally:
        ids.unpersist()


def delete_where(spark, root: str, predicate) -> dict[str, list[int]]:
    """Predicate take-down over the index's OWN rows: tombstone every
    live document whose posting rows match ``predicate`` (a Column
    over the posting schema term/doc_id/tf/positions — e.g.
    ``F.col("term") == "leaked-secret-token"`` removes every document
    containing a term). The delete set is derived per attempt from the
    pinned postings (a filter + distinct, never collected), computed
    ONCE per attempt and persisted for the commit's duration — every
    downstream job (negative stats, tombstone write, counters) sees
    one content instead of re-running the corpus filter; its liveness
    fold runs under the attempt's manifest meta, so it honors the same
    bounded-broadcast policy as every other read. For corpus-attribute
    predicates ("source = X") filter the corpus table instead and pass
    the ids to :func:`delete_from`."""

    def _ids(st: dict) -> DataFrame:
        if "ids" not in st:
            posts = lake.read_segments(
                spark, f"{root}/{COMPONENT}", st["pins"][COMPONENT]
            )
            st["ids"] = _persist_for_attempt(
                st,
                _live(
                    spark, root, posts.filter(predicate), st["pins"], st["meta"]
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
    )


# the attempt-scoped persist contract is shared by all three index
# families; the canonical copy lives in operators/_commit.py
from ed_housing_data_pipeline_spark.operators._commit import (  # noqa: E402
    persist_for_attempt as _persist_for_attempt,
)


def _delete_commit(
    spark,
    root: str,
    hit_fn,
    tomb_fn,
    n_tomb_fn,
) -> dict[str, list[int]]:
    """The shared logical-delete commit. Each attempt reads ONE
    manifest snapshot and exposes it to the hooks as the attempt state
    ``st`` (``st["pins"]``, ``st["meta"]``, ``st["seq"]``):
    ``hit_fn(component_df, st)`` restricts a pinned scan to the delete
    set, ``tomb_fn(spark, seq, st)`` builds the tombstone segment
    frame, ``n_tomb_fn(st)`` returns the tombstone row count for the
    pressure counter (None → count the tombstone frame itself, one
    tiny job). Hooks may stash attempt-scoped derived frames in ``st``
    (see :func:`_persist_for_attempt`); they are unpersisted when the
    attempt ends. Retries from fresh state on ConcurrentCommitError
    like every pinned commit."""
    last_err: Exception | None = None
    for _attempt in range(3):
        pins, meta, base = lake.segment_state(spark, root)
        seq = base + 1
        st: dict = {"pins": pins, "meta": meta, "seq": seq, "_persisted": []}
        try:
            posts = lake.read_segments(
                spark, f"{root}/{COMPONENT}", pins[COMPONENT]
            )
            lens = lake.read_segments(spark, f"{root}/{DOCLENS}", pins[DOCLENS])
            # only rows still LIVE contribute negative stats — re-deleting
            # a dead doc (or deleting a superseded revision) is a no-op on
            # every counter, which is what makes replayed deletes idempotent
            dead_posts = _live(spark, root, hit_fn(posts, st), pins, meta)
            dead_lens = _live(spark, root, hit_fn(lens, st), pins, meta)
            neg_stats = dead_posts.groupBy("term_h").agg(
                F.first("term").alias("term"),
                (-F.count(F.lit(1))).cast("bigint").alias("df"),
            )
            row = dead_lens.agg(
                F.count(F.lit(1)).alias("_n"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("_tot"),
            ).collect()[0]
            n_dead, tok_dead = int(row["_n"]), int(row["_tot"])
            tomb = tomb_fn(spark, seq, st)
            n_tomb = int(n_tomb_fn(st)) if n_tomb_fn is not None else tomb.count()
            return lake.append_segments(
                spark,
                root,
                appends={
                    TOMBSTONES: tomb,
                    TERMSTATS: neg_stats.coalesce(1),
                },
                meta={
                    **meta,
                    "n_docs": int(meta.get("n_docs", 0)) - n_dead,
                    "total_tokens": int(meta.get("total_tokens", 0))
                    - tok_dead,
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


def upsert_text_batch(
    spark,
    root: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_meta: dict | None = None,
    replay_guard: tuple[str, int] | None = None,
) -> dict[str, list[int]] | None:
    """Document REVISION in one atomic commit (the re-crawl / content-
    correction path): every batch doc's prior revision dies and its
    new content becomes searchable under the SAME manifest flip —
    readers see the old revision or the new one, never both, never
    neither. O(batch + the revised docs' old postings), committed
    segments untouched.

    Mechanics on the liveness axis (see :func:`_tombstone_watermarks`):
    the commit lands at sequence ``seq = base + 1`` and writes, in one
    ``expected_base``-pinned flip —

    - new postings + doclens rows stamped ``useq = seq``;
    - a tombstone ``(doc_id, dead_below=seq)`` per batch id: prior
      revisions (useq < seq) die, the new rows (useq = seq) live, and
      an id deleted earlier is RESURRECTED (this commit's sequence
      outranks the delete's watermark);
    - one termstats segment carrying the batch's positive df rows AND
      the old live revisions' negative rows, so corpus df is exact for
      both the vanished and the arriving terms;
    - n_docs grows only by the genuinely NEW ids (batch size minus
      live prior revisions); total_tokens moves by new minus old.

    Ids never seen before upsert like a plain ingest (their tombstone
    kills nothing). The per-doc contract ("postings in exactly one
    segment") holds for LIVE rows — exactly what merging relies on."""
    from pyspark import StorageLevel  # noqa: PLC0415

    from ed_housing_data_pipeline_spark.functions.text import (  # noqa: PLC0415
        token_count,
    )

    p = posting_table(batch, id_col, text_col)
    p.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        new_stats = p.groupBy("term_h").agg(
            F.first("term").alias("term"),
            F.count(F.lit(1)).cast("bigint").alias("df"),
        )
        all_lens = batch.select(
            F.col(id_col).alias("doc_id"),
            token_count(F.col(text_col)).alias("dl"),
        )
        row = all_lens.agg(
            F.count(F.lit(1)).alias("_n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("_tot"),
            # tombstone rows this commit will append (= distinct batch
            # ids) — the liveness-fold pressure counter rides the same
            # agg, no extra job
            F.count_distinct(F.col("doc_id")).alias("_nid"),
        ).collect()[0]
        n_batch, tot_new = int(row["_n"]), int(row["_tot"])
        n_tomb = int(row["_nid"])
        lens = all_lens.filter(F.col("dl") > 0)
        # same size-derived segment file count as _commit_batch
        n_files = max(
            1, -(-tot_new * _POSTING_BYTES_PER_TOKEN // _SEGMENT_FILE_TARGET)
        )
        p_write = p.coalesce(int(n_files))
        ids_df = batch.select(F.col(id_col).alias("doc_id")).distinct()
        last_err: Exception | None = None
        for _attempt in range(3):
            pins, meta, base = lake.segment_state(spark, root)
            if replay_guard is not None:
                # re-checked on the SAME manifest version the commit is
                # pinned to, every attempt — a rival checkpoint replayer
                # landing this batch id mid-race is seen on the next
                # fresh read instead of double-tombstoning the batch's
                # own rows (see _commit_batch)
                key, bid = replay_guard
                if bid <= int(meta.get(key, -1)):
                    return None
            seq = base + 1
            old_posts = _live(
                spark,
                root,
                lake.read_segments(
                    spark, f"{root}/{COMPONENT}", pins[COMPONENT]
                ).join(F.broadcast(ids_df), on="doc_id", how="left_semi"),
                pins,
                meta,
            )
            old_lens = _live(
                spark,
                root,
                lake.read_segments(
                    spark, f"{root}/{DOCLENS}", pins[DOCLENS]
                ).join(F.broadcast(ids_df), on="doc_id", how="left_semi"),
                pins,
                meta,
            )
            neg_stats = old_posts.groupBy("term_h").agg(
                F.first("term").alias("term"),
                (-F.count(F.lit(1))).cast("bigint").alias("df"),
            )
            orow = old_lens.agg(
                F.count(F.lit(1)).alias("_n"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("_tot"),
            ).collect()[0]
            n_old, tot_old = int(orow["_n"]), int(orow["_tot"])
            tomb = ids_df.select(
                "doc_id", F.lit(seq).cast("bigint").alias("dead_below")
            )
            try:
                return lake.append_segments(
                    spark,
                    root,
                    # TERMSTATS first: the stats union's new_stats leg
                    # scans the persisted posting frame at full
                    # parallelism, populating its cache BEFORE the
                    # coalesced postings write merges the cached
                    # partitions (same r15 ADVICE #4 fix as
                    # _commit_batch)
                    appends={
                        TERMSTATS: new_stats.unionByName(neg_stats),
                        COMPONENT: p_write.withColumn(
                            "useq", F.lit(seq).cast("bigint")
                        ),
                        DOCLENS: lens.withColumn(
                            "useq", F.lit(seq).cast("bigint")
                        ),
                        TOMBSTONES: tomb.coalesce(1),
                    },
                    bloom_cols={COMPONENT: ["term"]},
                    meta={
                        **meta,
                        "n_docs": int(meta.get("n_docs", 0))
                        + n_batch
                        - n_old,
                        "total_tokens": int(meta.get("total_tokens", 0))
                        + tot_new
                        - tot_old,
                        lake.TOMBSTONE_ROWS_KEY: int(
                            meta.get(lake.TOMBSTONE_ROWS_KEY, 0)
                        )
                        + n_tomb,
                        **(extra_meta or {}),
                    },
                    expected_base=base,
                )
            except lake.ConcurrentCommitError as e:
                last_err = e
        raise last_err
    finally:
        p.unpersist()


def apply_text_deletes(spark, root: str) -> dict[str, list[int]]:
    """PHYSICAL delete/revision completion: rewrite postings and
    doclens as live-rows-only single segments (liveness = the
    sequence-watermark rule, so superseded upsert revisions leave disk
    together with deleted docs), fold the negative stats into one
    re-summed termstats segment (dropping fully-deleted terms), and
    reset the tombstone component — one atomic manifest flip
    (lake.apply_segment_tombstones), after which the dead bytes leave
    disk as old segments age out of retention. Search results before
    and after are identical (pinned in tests/test_text_index). Meta
    counters were already adjusted at delete/upsert time and carry
    through unchanged."""

    def _live_rows(df: DataFrame, tomb: DataFrame) -> DataFrame:
        marks = tomb.groupBy("doc_id").agg(
            F.max("dead_below").alias("_dead")
        )
        return (
            df.join(F.broadcast(marks), on="doc_id", how="left")
            .filter(
                F.col("_dead").isNull() | (F.col("useq") >= F.col("_dead"))
            )
            .drop("_dead")
        )

    return lake.apply_segment_tombstones(
        spark,
        root,
        tombstones=TOMBSTONES,
        id_col="doc_id",
        transforms={COMPONENT: _live_rows, DOCLENS: _live_rows},
        reducers={TERMSTATS: _stats_sum_reduce},
        # the physical apply empties the tombstone component, so the
        # liveness-fold pressure counter resets with it
        meta_fn=lambda m: {**m, lake.TOMBSTONE_ROWS_KEY: 0},
    )


def _stats_sum_reduce(df: DataFrame) -> DataFrame:
    """Additive termstats fold: sum df per term (negative delete rows
    cancel), dropping terms with no live documents left."""
    return (
        df.groupBy("term_h")
        .agg(
            F.first("term").alias("term"),
            F.sum("df").cast("bigint").alias("df"),
        )
        .filter(F.col("df") > 0)
    )


def _index_state(spark, root: str) -> tuple[dict, dict, dict]:
    """(pins, blooms, meta) of the last committed manifest — ONE
    filesystem read, internally consistent (resolved at one version).
    Every search entry point reads this once and threads it through
    its posting scan, doclens read, term stats, and corpus-size meta,
    so a commit landing mid-search can never mix snapshots (e.g.
    post-upsert doclens joined to pre-upsert postings)."""
    snap = lake.manifest_snapshot(spark, root)
    return snap.pins, snap.blooms, snap.meta


def pinned_postings(
    spark,
    root: str,
    terms: Sequence[str],
    at_version: int | None = None,
    state: tuple[dict, dict, dict] | None = None,
) -> DataFrame:
    """The manifest-pinned postings scan restricted (a) driver-side to
    segments whose term bloom may hold one of ``terms`` and (b)
    row-level to ``term IN terms`` — the IN predicate reaches the
    parquet scan (PushedFilters) so row groups without the probe terms
    never decode. ``at_version`` time-travels to a retained historical
    manifest (pinned segments are immutable, so the read is
    byte-stable); historical reads skip bloom pruning — correctness
    over driver-side skipping for audit-style queries. ``state`` (a
    :func:`_index_state` snapshot) lets a composite search serve every
    read from one manifest version."""
    probe = sorted(set(terms))
    meta: dict | None = None
    if at_version is None:
        # ONE manifest read serves pins + bloom coverage + tombstone
        # state — a consistent snapshot, and no repeat FS round-trips
        # on the per-search hot path
        pins, blooms, meta = state if state is not None else _index_state(
            spark, root
        )
        kept, pinned = lake.bloom_pruned_pins_from_state(
            spark, root, COMPONENT, "term", probe, pins, blooms
        )
        comp_root = f"{root}/{COMPONENT}"
        if kept:
            hits = lake.read_segments(spark, comp_root, kept)
        else:
            hits = lake.read_segments(spark, comp_root, pinned[:1]).filter(
                F.lit(False)
            )
    else:
        pins = lake.segment_pins_at(spark, root, at_version)
        hits = lake.read_segments(spark, f"{root}/{COMPONENT}", pins[COMPONENT])
    # tombstone subtraction AS OF the read's manifest: current searches
    # exclude deleted docs; a time-travel read sees exactly the
    # tombstone state of that commit (a pre-delete version still serves
    # the doc — that is what the audit query asks)
    return _live(spark, root, hits.filter(F.col("term").isin(probe)), pins, meta)


def search_all_terms(
    spark, root: str, terms: Sequence[str], at_version: int | None = None
) -> DataFrame:
    """Documents containing EVERY term in ``terms`` (conjunctive /
    AND-of-terms search) as (doc_id, total_tf) where total_tf sums the
    matched terms' frequencies — the usual retrieval pre-rank score.
    One groupBy(doc_id) over the term-filtered posting union; HAVING
    count(distinct term) = k keeps conjunction exact even when a term
    repeats in ``terms``. ``at_version`` searches the corpus AS OF a
    retained index commit — the what-did-we-serve-then audit query.

    RAREST-FIRST pruning (the classic term-ordering plan): the
    per-term corpus df is already incremental index state
    (termstats — k tiny rows, one driver read), so the conjunction
    broadcasts the RAREST term's doc set and semi-joins it into the
    other posting lists map-side BEFORE the groupBy — the shuffle
    carries at most k × df(rarest) rows instead of the union of all
    k lists, which on skewed vocabularies ("the" AND "zyzzyva") is
    the difference between a broadcast-trim and a corpus-sized
    shuffle. A probe term with no live df short-circuits the whole
    conjunction to empty. Falls back to the plain one-shuffle plan
    when the rarest list is too wide to broadcast or for historical
    reads (termstats time-travel isn't worth the audit path's
    complexity)."""
    probe = sorted(set(terms))
    state = _index_state(spark, root) if at_version is None else None
    p = pinned_postings(spark, root, probe, at_version=at_version, state=state)
    if (
        at_version is None
        and len(probe) > 1
        and int(state[2].get("n_docs", 0)) >= _RAREST_MIN_CORPUS
    ):
        dfs = {
            r.term: r.df
            for r in term_stats(spark, root, probe, state=state).collect()
        }
        rarest = min(probe, key=lambda w: dfs.get(w, 0))
        if dfs.get(rarest, 0) <= _RAREST_BROADCAST_MAX_DF:
            rare_docs = (
                p.filter(F.col("term") == rarest).select("doc_id")
            )
            p = p.join(F.broadcast(rare_docs), on="doc_id", how="left_semi")
    # (term, doc_id) rows are UNIQUE index-wide (each doc's postings
    # live in exactly one ingest segment — the module contract), so a
    # plain count equals the distinct-term count without the second
    # shuffle a countDistinct expansion would pay.
    return (
        p.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("_k"),
            F.sum("tf").cast("bigint").alias("total_tf"),
        )
        .filter(F.col("_k") == len(probe))
        .drop("_k")
    )


def term_stats(
    spark,
    root: str,
    terms: Sequence[str],
    state: tuple[dict, dict, dict] | None = None,
) -> DataFrame:
    """(term, df) corpus document frequency of the probe terms: the
    SUM of the per-segment additive stats — O(probe terms × segments)
    rows ever touched, never a postings pass."""
    probe = sorted(set(terms))
    if state is None:
        state = _index_state(spark, root)
    pins = state[0][TERMSTATS]
    seg = lake.read_segments(spark, f"{root}/{TERMSTATS}", pins)
    return (
        seg.filter(F.col("term").isin(probe))
        .groupBy("term")
        .agg(F.sum("df").cast("bigint").alias("df"))
        # delete_docs appends NEGATIVE df rows; a term whose documents
        # were all deleted sums to 0 — no live docs, no stats row
        .filter(F.col("df") > 0)
    )


def corpus_size(spark, root: str) -> int:
    """Documents ingested so far — a manifest-meta read, no job."""
    return int(lake.segment_meta(spark, root).get("n_docs", 0))


def search_ranked(spark, root: str, terms: Sequence[str], k: int = 15) -> DataFrame:
    """TF-IDF-ranked (disjunctive) retrieval: documents containing ANY
    probe term, scored sum(tf × ln(N/df)) over their matched terms and
    cut to the top k by (score DESC, doc_id ASC) — the deterministic
    total order TakeOrderedAndProject needs. idf follows the engine's
    doc_word_idf convention (ln(N/df), df ≥ 1 for matched terms); N is
    the manifest-meta corpus count (no job) and df comes from the
    additive termstats segments, so scoring never aggregates the
    postings beyond the probe terms. One :func:`_index_state` snapshot
    serves N, df, and the postings — a commit landing mid-search can't
    mix manifest versions."""
    state = _index_state(spark, root)
    n_docs = int(state[2].get("n_docs", 0))
    stats = term_stats(spark, root, terms, state=state).withColumn(
        "_idf", F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
    )
    p = pinned_postings(spark, root, terms, state=state)
    return (
        p.join(F.broadcast(stats.select("term", "_idf")), "term")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("tf") * F.col("_idf")), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def search_phrase_n(spark, root: str, words: Sequence[str]) -> DataFrame:
    """Documents containing the exact n-word phrase (adjacent tokens)
    as (doc_id, n_occ). Classic positional-index phrase query,
    generalized: fold left over the words, carrying the set of END
    positions of the matched prefix — step i joins word i's posting
    list on doc_id and intersects ``prefix_ends + 1`` with its
    positions (``array_intersect`` of the shifted set; no explode, no
    re-scan of text). n−1 keyed joins of term-filtered (tiny) posting
    lists; repeated words self-join the same list correctly because
    position sets, not rows, carry the state."""
    words = list(words)
    if len(words) < 2:
        raise ValueError(f"search_phrase_n: need >= 2 words, got {words!r}")
    p = pinned_postings(spark, root, words)
    cur = p.filter(F.col("term") == words[0]).select(
        "doc_id", F.col("positions").alias("_m")
    )
    for w in words[1:]:
        nxt = p.filter(F.col("term") == w).select(
            "doc_id", F.col("positions").alias("_p")
        )
        cur = (
            cur.join(nxt, "doc_id")
            .select(
                "doc_id",
                F.array_intersect(
                    F.transform("_m", lambda x: x + F.lit(1)), "_p"
                ).alias("_m"),
            )
            .filter(F.size("_m") > 0)
        )
    return cur.select("doc_id", F.size("_m").cast("bigint").alias("n_occ"))


def search_phrase(spark, root: str, first: str, second: str) -> DataFrame:
    """Two-word phrase search — the n = 2 case of
    :func:`search_phrase_n` (kept as the named binary API)."""
    return search_phrase_n(spark, root, [first, second])


def compact_text_index(
    spark,
    root: str,
    min_segments: int = 2,
    max_segment_bytes: int | None = None,
) -> dict[str, list[int]]:
    """Fold a long-ingest index back to one segment per component:
    postings compact by plain union (rows are unique per (term, doc)
    across batches), termstats re-aggregate through a sum reducer —
    valid precisely because the stats are additive. Bloom/zonemap
    coverage and the manifest meta (n_docs, stream batch id) carry
    through unchanged; searches before and after must serve identical
    results (pinned in tests/test_text_index.py).

    When a delete has tombstones pinned, compaction IS the physical
    apply (:func:`apply_text_deletes`): the rewrite it pays anyway
    drops the dead rows, folds the negative stats, and resets the
    tombstone component — the Iceberg/Delta "rewrite applies deletes"
    maintenance shape."""
    pins = lake.segment_pins(spark, root)
    if TOMBSTONES in pins and (
        lake.read_segments(spark, f"{root}/{TOMBSTONES}", pins[TOMBSTONES])
        .limit(1)
        .count()
    ):
        return apply_text_deletes(spark, root)
    # no (live) tombstones: plain fold — an already-applied empty
    # tombstone component folds by union like any other

    def _stats_reduce(df: DataFrame) -> DataFrame:
        return df.groupBy("term_h").agg(
            F.first("term").alias("term"),
            F.sum("df").cast("bigint").alias("df"),
        )

    # the plain-path reducer is subset-sound (pure additive sum, no
    # liveness filter), so size-tiered compaction is legal here; the
    # delete-apply branch above always runs the full rewrite
    return lake.compact_segments(
        spark,
        root,
        reducers={TERMSTATS: _stats_reduce},
        min_segments=min_segments,
        max_segment_bytes=max_segment_bytes,
    )


BM25_K1 = 1.2
BM25_B = 0.75


def search_bm25(
    spark,
    root: str,
    terms: Sequence[str],
    k: int = 15,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25-ranked (disjunctive) retrieval — the production ranking
    function tf-idf approximates: per matched term,
    ``idf × tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` with the
    Robertson-Sparck-Jones smoothed idf ``ln(1 + (N − df + ½)/(df + ½))``.
    Every corpus-level input is incrementally maintained index state:
    df from the additive termstats segments, dl from the per-batch
    doclens segments (a keyed join the filtered postings broadcast
    into at small stats), N and total-token count (→ avgdl) from the
    manifest meta — serving never aggregates the corpus. Top-k is cut
    on the deterministic (score DESC, doc_id ASC) order. All arithmetic
    except ln is exactly-rounded IEEE, same determinism class as the
    tf-idf ranker (both engines round to 4 decimals)."""
    # ONE _index_state snapshot serves meta, stats, doclens, and the
    # postings, so df/N/dl always come from the same manifest version
    # as the posting rows they score
    state = _index_state(spark, root)
    pins, _blooms, meta = state
    n_docs = float(int(meta.get("n_docs", 0)))
    # empty corpus: no postings → empty result whatever avgdl is; any
    # finite placeholder degrades gracefully instead of dividing by 0
    avgdl = float(int(meta.get("total_tokens", 0))) / n_docs if n_docs else 1.0
    stats = term_stats(spark, root, terms, state=state).withColumn(
        "_idf",
        F.log(
            F.lit(1.0)
            + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ),
    )
    # liveness-filtered: after an upsert a doc has one dl row per
    # revision — only the live one may normalize its BM25 scores
    lens = _live(
        spark,
        root,
        lake.read_segments(spark, f"{root}/{DOCLENS}", pins[DOCLENS]),
        pins,
        meta,
    ).drop("useq")
    p = pinned_postings(spark, root, terms, state=state)
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
    )
    contrib = F.col("_idf") * (
        F.col("tf") * F.lit(k1 + 1.0) / (F.col("tf") + norm)
    )
    return (
        p.join(F.broadcast(stats.select("term", "_idf")), "term")
        .join(lens, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def search_prefix(spark, root: str, prefix: str) -> DataFrame:
    """Prefix (wildcard ``prefix*``) search: documents containing ANY
    term starting with ``prefix``, as (doc_id, n_terms, total_tf) —
    the autocomplete / stemming-lite surface. Bloom sidecars are
    equality-only so every pinned segment is scanned, but the
    StartsWith predicate reaches the parquet reader (string min/max
    row-group stats prune on prefixes) and only matching posting rows
    leave the scan. n_terms counts distinct matched terms via a plain
    count — (term, doc) rows are unique index-wide."""
    if not prefix:
        raise ValueError("search_prefix: empty prefix")
    pins, _blooms, meta = _index_state(spark, root)
    p = _live(
        spark,
        root,
        lake.read_segments(spark, f"{root}/{COMPONENT}", pins[COMPONENT]).filter(
            F.col("term").startswith(prefix)
        ),
        pins,
        meta,
    )
    return (
        p.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("tf").cast("bigint").alias("total_tf"),
        )
    )
