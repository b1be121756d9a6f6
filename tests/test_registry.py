"""Contract tests for the query registry / driver surface."""

from __future__ import annotations

from ed_housing_data_pipeline_spark.plans.registry import oracle_sql_map, query_map


def test_registry_complete_and_paired():
    q, o = query_map(), oracle_sql_map()
    assert len(q) >= 40
    assert set(o) <= set(q), "orphan oracles"
    # iterative algorithms (k-means training) are the documented
    # rows-only exception; everything else must carry a SQL twin
    missing = set(q) - set(o)
    assert missing <= {"embedding_knn_ivf"}, f"queries without oracle: {missing}"
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_driver_window_covers_every_family():
    """The driver's correctness harness checks the FIRST 50 registered
    queries; pin the window so every operator family — including all
    doc_/embedding_/streaming extension families — has a hard
    driver-verified row. The window ROTATES between rounds (r4 swapped
    ~12 r3-verified redundant-family slots for never-driver-verified
    queries so the r3+r4 union covers 62 distinct names), but one
    anchor per family may never leave."""
    from ed_housing_data_pipeline_spark.plans.registry import _PRIORITY_ORDER

    names = list(query_map())
    assert len(_PRIORITY_ORDER) == 50
    assert names[:50] == list(_PRIORITY_ORDER)
    window = set(names[:50])
    # One representative per extension family MUST hold a driver row;
    # as the surface grows past 50 queries, additional variants may
    # rotate outside the window but these anchors may not regress out.
    must_have = {
        "doc_exact_dedup",          # exact dedup
        "doc_minhash_signature",    # minhash sketch
        "doc_neardup_pairs",        # LSH banding + verify
        "doc_dedup_clusters",       # connected-components dedup
        "doc_simhash",              # simhash family
        "doc_simhash_neardup",      # simhash banding pairs (r4 in)
        "doc_fuzzy_pairs_levenshtein",  # edit-distance blocking
        "doc_lang_id_heuristic",    # text analysis
        "doc_quality_score",
        "doc_pii_scrub",            # PII redaction (r4 in)
        "doc_crosssource_contamination",  # decontamination (r4 in)
        "doc_pack_assignment",      # sequence packing (r4 in)
        "doc_binary_bytes",         # multimodal plumbing
        "embedding_knn_bruteforce", # ANN baseline
        "embedding_knn_srp",        # LSH-bucketed ANN
        "embedding_neardup_pairs",  # cosine near-dup
        "embedding_label_centroids",
        "events_stream_hourly",     # streaming twins
        "events_stream_dedup_count",
        "events_stream_sliding",            # (r4 in)
        "events_stream_join_view_purchase", # (r4 in)
        "events_funnel_signup_purchase",
        "events_retention_cohorts",
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
