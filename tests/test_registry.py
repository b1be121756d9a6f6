"""Contract tests for the query registry / driver surface."""

from __future__ import annotations

from ed_housing_data_pipeline_spark.plans.registry import oracle_sql_map, query_map


def test_registry_complete_and_paired():
    q, o = query_map(), oracle_sql_map()
    assert len(q) >= 40
    assert set(o) <= set(q), "orphan oracles"
    # iterative algorithms (k-means / PQ-codebook training) are the
    # documented rows-only exceptions; everything else must carry a SQL
    # twin. Each rows-only query is value-pinned instead by a FIXED
    # oracle twin (embedding_knn_ivf_fixed / embedding_knn_ivfpq_fixed)
    # plus recall + structural-invariant pytest harnesses
    # (tests/test_operators_similarity.py).
    missing = set(q) - set(o)
    assert missing <= {"embedding_knn_ivf", "embedding_knn_ivfpq"}, (
        f"queries without oracle: {missing}"
    )
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_driver_window_covers_every_family():
    """The driver's correctness harness checks the FIRST 50 registered
    queries; pin the window so every operator family has a hard
    driver-verified row. The window ROTATES between rounds; a name may
    rotate OUT only if it is unchanged and already driver-green in a
    prior round's CORRECTNESS file. The r15 window: the SIX r15-new
    queries enter (lake_merge_insert_values — the explicit INSERT
    VALUES clause + narrow-patch guard; lake_describe_segmented — the
    counts plane's zero-job DESCRIBE/COUNT(*) surface;
    lake_merge_nmbs — WHEN NOT MATCHED BY SOURCE; lake_restore_version
    — Delta-style RESTORE; lake_scd2_dimension — SCD type 2;
    lake_join_view_sync — the incremental denormalized join view +
    the CDC-apply merge clauses), every lake-core surface REWIRED in
    r15 keeps a representative (counts on every commit path,
    bloom-backed merge probe pruning, rows-ratio auto-apply, feed-scan
    meta columns, watermark retirement sweep), the ENTIRE r11
    staleness tail fills the middle, and 3 r12 rows start draining
    that tail — after this round no registered query's driver row is
    older than r12 (the four r12-green family-spread picks that were
    provisionally windowed rotated back out for the second-half
    queries; their families keep in-window reps)."""
    from ed_housing_data_pipeline_spark.plans.registry import _PRIORITY_ORDER

    names = list(query_map())
    assert len(_PRIORITY_ORDER) == 50
    assert names[:50] == list(_PRIORITY_ORDER)
    window = set(names[:50])
    must_have = {
        # r15-new — never driver-verified before
        "lake_merge_insert_values",
        "lake_describe_segmented",
        "lake_merge_nmbs",
        "lake_restore_version",
        "lake_scd2_dimension",
        "lake_join_view_sync",
        # rewired-in-r15 lake-core representatives
        "lake_merge_conditional",   # merge probe (bloom pruning, report)
        "lake_merge_patch",         # update_set + the new guard path
        "lake_stream_merge_dim",    # no-op meta flip version report
        "lake_upsert_roundtrip",    # append/commit path carries counts
        "lake_changes_typed_feed",  # feed-scan meta-column fix
        "lake_cdf_merged_mirror",   # consumer loop carries sink counts
        "lake_mirror_consume",      # exactly-once consumer + sweep
        "lake_maintain_cycle",      # maintain (retire sweep added)
        "doc_delete_point_lookup",  # delete path commits counts
        "lake_schema_evolution",    # rename/drop commits carry counts
        "lake_type_widening",
        "orders_zorder_box3",       # recluster rides rewrite_components
        # the flagship (entry())
        "rank_sum_top1",
        # staleness tails (r11 fully in -> bound becomes r12)
        "doc_train_split",
        "doc_pack_assignment",
        "events_funnel_signup_purchase",
        "orders_stream_rollup",
        "embedding_knn_ivf_recall",
        "embedding_knn_ivfpq_recall",
        # r12-tail family-spread picks
        "lake_schema_evolution",
        "lake_type_widening",
    }
    assert must_have <= window, f"family anchors outside window: {must_have - window}"


def test_entry_contract_importable():
    import __spark_entry__ as e

    assert callable(e.entry)
    assert set(e.queries()) == set(query_map())
    assert set(e.oracle_sql()) == set(oracle_sql_map())


def test_sql_over_registered_views(spark):
    """The reference's usage pattern — ad-hoc SQL over parquet views
    (duckdb_viewer/sample_queries.sql) — works verbatim modulo the
    documented NULLS LAST dialect note."""
    from ed_housing_data_pipeline_spark.sources.tables import register_views

    register_views(spark, "/root/testdata/sf0.001")
    n = spark.sql("SELECT COUNT(*) AS n_rows FROM lineitem").first()["n_rows"]
    assert n == 6000
    top = spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice IS NOT NULL
        ORDER BY o_totalprice DESC NULLS LAST LIMIT 5
        """
    ).collect()
    assert len(top) == 5
    assert top[0]["o_totalprice"] >= top[-1]["o_totalprice"]
    ranked = spark.sql(
        """
        WITH ranked AS (
            SELECT n_name,
                   rank() OVER (ORDER BY n_nationkey ASC NULLS LAST) AS r
            FROM nation
        )
        SELECT * FROM ranked ORDER BY r LIMIT 1
        """
    ).first()
    assert ranked["r"] == 1


def test_incremental_neardup_survives_audit_then_execute(spark):
    """Regression: building the query under AUDIT_LAZY_PLANS must run
    no jobs (it serves lazy stand-in expressions when no index snapshot
    exists); the later REAL run builds + memoizes the snapshot index,
    and a repeat run must reuse (not evict) it — cache eviction keyed
    per sf_dir must spare the current key."""
    from ed_housing_data_pipeline_spark.plans import queries_llm as qll

    sf = "/root/testdata/sf0.001"
    fn = query_map()["doc_incremental_neardup"]
    qll.release_shared_caches()
    qll.AUDIT_LAZY_PLANS = True
    try:
        fn(spark, sf)  # lazy: must not write any index artifact
        assert (sf, qll.SHINGLE_K, qll.N_HASHES) not in qll._INCR_INDEX
    finally:
        qll.AUDIT_LAZY_PLANS = False
    # real run: builds the v1 snapshot, then reuses it
    assert fn(spark, sf).count() >= 0
    assert (sf, qll.SHINGLE_K, qll.N_HASHES) in qll._INCR_INDEX
    assert fn(spark, sf).count() >= 0
    qll.release_shared_caches()


def test_incr_index_ingest_appends_only_batch_rows(spark):
    """The O(batch) commit contract: after ``incr_index_ingest``, the
    pinned band table is EXACTLY base ∪ batch-bands (set equality both
    ways), the shingle store grows by the batch's docs — and, the
    scale property the segmented protocol exists for, the NEW segments
    hold ONLY the batch's rows (write cost per commit ≈ batch size,
    never a copy of the accumulated index), across consecutive
    ingests. Retention with grace 0 sweeps unpinned segments."""
    from pyspark.sql import functions as F

    from ed_housing_data_pipeline_spark.operators import similarity as sim
    from ed_housing_data_pipeline_spark.plans import queries_llm as qll
    from ed_housing_data_pipeline_spark.sources import lake

    sf = "/root/testdata/sf0.001"
    qll.release_shared_caches()
    try:
        qll.ensure_incr_index_built(spark, sf)
        tmp = qll._INCR_INDEX[(sf, qll.SHINGLE_K, qll.N_HASHES)]
        pins1 = lake.segment_pins(spark, tmp.name)
        # drop the liveness-protocol stamp: content comparison only
        base_bands = lake.read_segments(
            spark, f"{tmp.name}/bands", pins1["bands"]
        ).drop("useq")
        base_bands_n = base_bands.count()
        base_sh_n = lake.read_segments(
            spark, f"{tmp.name}/shingles", pins1["shingles"]
        ).count()
        batch = qll.shared_signatures(spark, sf).filter(
            F.col("source") == qll.INCR_BATCH_SOURCE
        )
        batch_bands = sim.band_keys(
            batch, "doc_id", n_hashes=qll.N_HASHES, bands=qll.BANDS
        )
        batch_n = batch.count()
        batch_bands_n = batch_bands.count()
        pins2 = qll.incr_index_ingest(spark, sf)
        # content: pinned = base ∪ batch exactly
        now = lake.read_segments(
            spark, f"{tmp.name}/bands", pins2["bands"]
        ).drop("useq")
        expected = base_bands.unionByName(batch_bands)
        assert now.exceptAll(expected).count() == 0
        assert expected.exceptAll(now).count() == 0
        assert (
            lake.read_segments(spark, f"{tmp.name}/shingles", pins2["shingles"]).count()
            == base_sh_n + batch_n
        )
        # O(batch) writes: the appended segments hold ONLY batch rows
        new_band_segs = [s for s in pins2["bands"] if s not in pins1["bands"]]
        assert (
            lake.read_segments(spark, f"{tmp.name}/bands", new_band_segs).count()
            == batch_bands_n
        )
        new_sh_segs = [s for s in pins2["shingles"] if s not in pins1["shingles"]]
        assert (
            lake.read_segments(spark, f"{tmp.name}/shingles", new_sh_segs).count()
            == batch_n
        )
        # second consecutive ingest: base segments are REUSED, not
        # rewritten — the pin list only grows. src1 docs are already
        # in the corpus index, so the idempotence anti-join empties
        # the batch and the appended segment holds ZERO rows (an
        # already-ingested source re-ingests for free)
        assert pins2["bands"][: len(pins1["bands"])] == pins1["bands"]
        pins3 = qll.incr_index_ingest(spark, sf, source="src1")
        seg3 = [s for s in pins3["bands"] if s not in pins2["bands"]]
        assert lake.read_segments(spark, f"{tmp.name}/bands", seg3).count() == 0
        assert (
            lake.read_segments(spark, f"{tmp.name}/bands", pins3["bands"]).count()
            == base_bands_n + batch_bands_n
        )
        # retention: grace 0 sweeps segments no retained manifest pins
        lake.expire_segments(spark, tmp.name, keep_manifests=1, orphan_grace_sec=0)
        kept = set(lake.segment_numbers(spark, f"{tmp.name}/stopbands"))
        assert kept == set(pins3["stopbands"])  # old stop segments swept
        # pinned data segments all survive
        assert set(pins3["bands"]) <= set(
            lake.segment_numbers(spark, f"{tmp.name}/bands")
        )
    finally:
        qll.release_shared_caches()


def test_incr_index_probe_survives_torn_ingest(spark):
    """A crash between segment writes and the manifest commit must not
    poison probes: segments written without a manifest commit are
    invisible (probes read through the last committed manifest — the
    atomic commit point), and the RETRIED ingest re-derives the same
    content instead of doubling the batch; a duplicate complete ingest
    is content-idempotent."""
    from pyspark.sql import functions as F

    from ed_housing_data_pipeline_spark.operators import similarity as sim
    from ed_housing_data_pipeline_spark.plans import queries_llm as qll
    from ed_housing_data_pipeline_spark.sources import lake

    sf = "/root/testdata/sf0.001"
    qll.release_shared_caches()
    try:
        fn = query_map()["doc_incremental_neardup"]
        before = {tuple(r) for r in fn(spark, sf).collect()}
        tmp = qll._INCR_INDEX[(sf, qll.SHINGLE_K, qll.N_HASHES)]
        pins1 = lake.segment_pins(spark, tmp.name)
        # drop the liveness-protocol stamp: content comparison only
        base_bands = lake.read_segments(
            spark, f"{tmp.name}/bands", pins1["bands"]
        ).drop("useq")
        # torn ingest: batch band segment lands UNPINNED — probing a
        # band table that included it would match batch docs to
        # themselves, so any leak of the orphan segment shows up
        batch = qll.shared_signatures(spark, sf).filter(
            F.col("source") == qll.INCR_BATCH_SOURCE
        )
        batch_bands = sim.band_keys(
            batch, "doc_id", n_hashes=qll.N_HASHES, bands=qll.BANDS
        )
        lake.write_segment(spark, batch_bands, f"{tmp.name}/bands")
        after = {tuple(r) for r in fn(spark, sf).collect()}
        assert after == before
        # retried ingest: pinned content = base ∪ batch exactly (no
        # doubling — the orphan segment stays unpinned forever)
        pins2 = qll.incr_index_ingest(spark, sf)
        merged = lake.read_segments(
            spark, f"{tmp.name}/bands", pins2["bands"]
        ).drop("useq")
        expected = base_bands.unionByName(batch_bands)
        assert merged.exceptAll(expected).count() == 0
        assert expected.exceptAll(merged).count() == 0
        # duplicate COMPLETE ingest: content-idempotent (the replayed
        # batch anti-joins empty; its empty segments add no rows)
        n_before = merged.count()
        pins3 = qll.incr_index_ingest(spark, sf)
        assert (
            lake.read_segments(spark, f"{tmp.name}/bands", pins3["bands"]).count()
            == n_before
        )
    finally:
        qll.release_shared_caches()


def test_family_caches_are_session_scoped(spark):
    """A memoized family frame must be served only to the session that
    built it: a DataFrame executes with its creating session's state,
    so another session (e.g. a fresh harness session in the same JVM
    application) gets a rebuild, never a foreign-session plan."""
    from ed_housing_data_pipeline_spark.plans import queries_llm as qll

    sf = "/root/testdata/sf0.001"
    qll.release_shared_caches()
    try:
        a = qll.shared_signatures(spark, sf)
        assert qll.shared_signatures(spark, sf) is a  # same-session memo hit
        other = spark.newSession()
        b = qll.shared_signatures(other, sf)
        assert b is not a
        assert b.sparkSession is other
    finally:
        qll.release_shared_caches()


def test_incremental_neardup_probe_reflects_ingest(spark):
    """Probe → ingest → probe in ONE session must serve a plan over the
    NEWLY committed pin (r15 ADVICE #1: the plan memo is keyed on the
    manifest pin map, so any ingest rebuilds it). Folding the probe
    batch itself into the index makes its docs corpus members, so the
    next probe must match them to THEMSELVES (jaccard-1.0 self-pairs)
    — impossible under a stale pre-ingest plan."""
    from ed_housing_data_pipeline_spark.plans import queries_llm as qll

    sf = "/root/testdata/sf0.001"
    qll.release_shared_caches()
    try:
        fn = query_map()["doc_incremental_neardup"]
        before = {tuple(r) for r in fn(spark, sf).collect()}
        assert not any(t[0] == t[1] for t in before)
        qll.incr_index_ingest(spark, sf)
        after = {tuple(r) for r in fn(spark, sf).collect()}
        self_pairs = {t for t in after if t[0] == t[1]}
        assert self_pairs, "ingested batch invisible to the memoized probe"
        assert all(t[2] == 1.0 for t in self_pairs)
    finally:
        qll.release_shared_caches()


def test_search_plan_memo_evicted_with_family_caches(spark):
    """release_shared_caches() must clear the search-probe plan memo
    (r15 ADVICE #3: stale-session entries keyed by dead tempdir roots
    accumulated unboundedly). After release the memo is empty, and the
    next probe rebuilds against the same committed index and returns
    identical results — the memo holds plans, never results."""
    from ed_housing_data_pipeline_spark.plans import queries_llm as qll
    from ed_housing_data_pipeline_spark.plans import queries_search as qs

    sf = "/root/testdata/sf0.001"
    fn = query_map()["doc_inverted_search_and"]
    before = {tuple(r) for r in fn(spark, sf).collect()}
    assert qs._SEARCH_PLAN_MEMO
    qll.release_shared_caches()
    assert not qs._SEARCH_PLAN_MEMO
    after = {tuple(r) for r in fn(spark, sf).collect()}
    assert after == before


def test_search_plan_memo_revalidates_on_commit(spark):
    """A memoized search plan must NOT survive an index commit: the
    memo is keyed on the committed manifest version, so an out-of-band
    append (version bump) rebuilds the plan and the next probe reads
    the newly committed segments from storage — pinning the
    no-result-caching property as a contract, not a convention."""
    from pyspark.sql import functions as F

    from ed_housing_data_pipeline_spark.operators import text_index
    from ed_housing_data_pipeline_spark.plans import queries_search as qs

    sf = "/root/testdata/sf0.001"
    fn = query_map()["doc_inverted_search_and"]
    try:
        before = {tuple(r) for r in fn(spark, sf).collect()}
        root = qs._TEXT_IDX_DIR[(sf,)].name
        new_id = 10_000_000
        assert not any(t[0] == new_id for t in before)
        doc = spark.createDataFrame(
            [(new_id, " ".join(qs.SEARCH_TERMS))], "doc_id long, text string"
        )
        text_index.append_text_batch(spark, root, doc)
        after = {tuple(r) for r in fn(spark, sf).collect()}
        hits = {t for t in after if t[0] == new_id}
        assert hits == {(new_id, len(qs.SEARCH_TERMS))}
        assert after - hits == before
    finally:
        # the session index now diverges from the corpus: drop it so
        # later tests rebuild a clean one
        tmp = qs._TEXT_IDX_DIR.pop((sf,), None)
        if tmp is not None:
            tmp.cleanup()
        qs._SEARCH_PLAN_MEMO.clear()
