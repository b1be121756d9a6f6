"""Unit tests for operators/similarity.py — dedup, MinHash/LSH,
SimHash, and vector search, including plan-shape (no cartesian)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.operators import similarity as sim
from tests.conftest import rows

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick  brown fox jumps over the lazy dog "),  # ws-variant of 1
    (3, "the quick brown fox jumps over the lazy cat today"),  # near-dup of 1
    (4, "completely different text about spark engines and shuffles"),
    (5, ""),
    (6, None),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_min_survivor(spark):
    out = sim.exact_dedup(_docs(spark), "text", "doc_id", keep="min")
    got = {r["doc_id"]: r["dup_count"] for r in out.collect()}
    # 1 and 2 normalize identically -> survivor 1 with count 2
    assert got[1] == 2
    assert 2 not in got
    # empty and NULL both normalize to NULL -> one NULL group (5, 6)
    assert got[5] == 2


def test_minhash_identical_and_empty(spark):
    out = sim.with_minhash_signature(_docs(spark), "text", n_hashes=4).collect()
    r = {row["doc_id"]: [row[f"mh_{i}"] for i in range(4)] for row in out}
    assert r[1] == r[2]  # whitespace variants share every family min
    assert r[1] != r[4]
    assert r[5] == [None] * 4 and r[6] == [None] * 4
    assert all(0 <= v < sim.MINHASH_P for v in r[1])


def test_lsh_candidates_exclude_empty_docs(spark):
    sig = sim.with_minhash_signature(_docs(spark), "text", n_hashes=4)
    pairs = rows(sim.lsh_candidate_pairs(sig, "doc_id", n_hashes=4, bands=2))
    assert (1, 2) in pairs
    # empty/NULL docs must never pair up via the "" band key
    assert (5, 6) not in pairs


def test_near_dup_pairs_threshold(spark):
    out = sim.near_dup_pairs(
        _docs(spark), "text", "doc_id", threshold=0.5, n_hashes=4, bands=2
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert got[(1, 2)] == 1.0
    assert all(j >= 0.5 for j in got.values())
    assert not any(4 in p or 5 in p or 6 in p for p in got)


def test_near_dup_pairs_interleaved_calls_keep_caches(spark):
    """Two in-flight near_dup_pairs plans must not evict each other
    (round-2 module-global cache did); a CacheScope releases its own
    caches and only its own."""
    with sim.CacheScope() as scope:
        p1 = sim.near_dup_pairs(
            _docs(spark), "text", "doc_id", threshold=0.5, n_hashes=4, bands=2,
            cache=scope,
        )
        p2 = sim.near_dup_pairs(  # second call before p1 is consumed
            _docs(spark), "text", "doc_id", threshold=0.9, n_hashes=4, bands=2,
            cache=scope,
        )
        r1 = {(r["id_a"], r["id_b"]) for r in p1.collect()}
        r2 = {(r["id_a"], r["id_b"]) for r in p2.collect()}
        assert (1, 2) in r1 and (1, 2) in r2
        # 2 caches per call: the shingle projection + the exploded
        # band-key table (both multi-consumer)
        assert len(scope._dfs) == 4
        assert all(df.is_cached for df in scope._dfs)
    assert not any(df.is_cached for df in scope._dfs if scope._dfs)
    assert len(scope._dfs) == 0


def test_simhash_neardup_pairs(spark):
    out = sim.simhash_neardup_pairs(
        _docs(spark), "text", "doc_id", bits=32, bands=4, max_hamming=3
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert got[(1, 2)] == 0  # identical token stream -> identical fp
    assert all(h <= 3 for h in got.values())
    # token-less docs excluded: the all-zero fingerprints never pair
    assert not any(5 in p or 6 in p for p in got)


def test_simhash_neardup_rejects_bad_bands(spark):
    import pytest

    with pytest.raises(ValueError, match="evenly divide"):
        sim.simhash_neardup_pairs(_docs(spark), "text", "doc_id", bits=32, bands=5)


def test_neardup_clusters_min_label(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = sim.neardup_clusters(docs, pairs, "doc_id")
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    # chain 1-2-3 needs >1 propagation round to reach 3
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_neardup_clusters_local_matches_distributed(spark):
    """The size-gated driver union-find fast path must produce the
    EXACT labels of the distributed min-label loop on an awkward mix
    of chains, cliques and singletons."""
    docs = spark.createDataFrame([(i,) for i in range(1, 21)], "doc_id long")
    edge_list = (
        [(i, i + 1) for i in range(1, 6)]          # chain 1..6
        + [(8, 9), (9, 10), (8, 10)]               # triangle
        + [(12, 15), (15, 13), (13, 12), (14, 15)] # cycle + tail
    )
    pairs = spark.createDataFrame(edge_list, "id_a long, id_b long")
    local = sim.neardup_clusters(docs, pairs, "doc_id")
    dist = sim.neardup_clusters(docs, pairs, "doc_id", max_local_edges=0)
    assert sorted(map(tuple, local.collect())) == sorted(map(tuple, dist.collect()))


def test_neardup_clusters_deep_chain_pointer_jumping(spark):
    """A 40-vertex path has diameter 39: plain min-propagation would
    need 39 rounds, far past the default max_iters=10. Pointer jumping
    reaches the fixed point in ~log2(39) rounds — all vertices must
    land on cluster 1 without raising (forced onto the distributed
    loop; the default would take the local union-find fast path)."""
    n = 40
    docs = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    out = sim.neardup_clusters(docs, pairs, "doc_id", max_local_edges=0)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {i: 1 for i in range(1, n + 1)}


def test_neardup_clusters_raises_on_nonconvergence(spark):
    """Exhausting max_iters before the fixed point must raise, never
    silently return split components (ADVICE r03)."""
    import pytest

    n = 30
    docs = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        sim.neardup_clusters(docs, pairs, "doc_id", max_iters=2, max_local_edges=0)


def test_simhash_properties(spark):
    out = _docs(spark).select(
        "doc_id", sim.simhash("text", bits=16).alias("fp")
    ).collect()
    r = {row["doc_id"]: row["fp"] for row in out}
    assert r[1] == r[2]
    assert 0 <= r[1] < 2**16
    assert r[5] == 0 and r[6] == 0  # no tokens -> all bits 0


def _vectors(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (3, [0.0, 1.0], 0),
            (4, [0.0, 1.0], 1),
            (5, [0.1, 0.9], 1),
        ],
        "vec_id long, embedding array<double>, label int",
    )


def test_knn_bruteforce_nearest(spark):
    emb = _vectors(spark)
    out = sim.knn_bruteforce(
        queries=emb.filter(F.col("vec_id") == 1),
        corpus=emb,
        vec_col="embedding",
        id_col="vec_id",
        k=1,
    )
    r = out.collect()
    assert len(r) == 1
    assert r[0]["q_id"] == 1 and r[0]["nn_id"] == 2  # self excluded


def test_knn_within_block_plan_and_result(spark):
    emb = _vectors(spark)
    out = sim.knn_within_block(
        emb, vec_col="embedding", id_col="vec_id", block_col="label", k=1
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = {r["q_id"]: r["nn_id"] for r in out.collect()}
    assert got[1] == 2
    assert got[4] == 5  # candidates restricted to label 1, not global 3


def test_cosine_pandas_matches_native(spark):
    from ed_housing_data_pipeline_spark.functions.vectors import cosine_similarity

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
            (2, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
            (3, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),  # zero norm -> NULL
            (4, None, [1.0, 1.0, 1.0]),  # NULL side -> NULL
        ],
        "id long, a array<double>, b array<double>",
    )
    out = df.select(
        "id",
        cosine_similarity("a", "b").alias("native"),
        sim.cosine_similarity_pandas("a", "b").alias("arrow"),
    ).collect()
    for r in out:
        if r["native"] is None:
            assert r["arrow"] is None
        else:
            assert abs(r["native"] - r["arrow"]) < 1e-12


def test_scale_out_only_upscales(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "x int")
    n0 = df.rdd.getNumPartitions()
    out = sim.scale_out(df)
    n1 = out.rdd.getNumPartitions()
    assert n1 >= n0
    assert n1 >= min(spark.sparkContext.defaultParallelism, n0)


def test_kmeans_blocks_recovers_clusters(spark):
    import random

    random.seed(3)
    pts = []
    centers = [(0.0, 0.0), (10.0, 10.0), (-10.0, 10.0)]
    for i in range(90):
        cx, cy = centers[i % 3]
        pts.append((i, [cx + random.uniform(-1, 1), cy + random.uniform(-1, 1)]))
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    blocked, cents = sim.kmeans_blocks(df, "embedding", "vec_id", k=3, iters=4)
    assert len(cents) == 3 and all(len(c) == 2 for c in cents)
    got = blocked.collect()
    # every true cluster maps to exactly one block label
    by_true = {}
    for r in got:
        by_true.setdefault(r["vec_id"] % 3, set()).add(r["block"])
    assert all(len(s) == 1 for s in by_true.values())
    assert len({next(iter(s)) for s in by_true.values()}) == 3
    # blocks compose with the ANN search path
    out = sim.knn_within_block(blocked, "embedding", "vec_id", "block", k=1)
    r0 = {r["q_id"]: r["nn_id"] for r in out.collect()}
    assert r0[0] % 3 == 0  # nearest neighbor of point 0 is in its cluster


def test_lsh_rejects_bad_band_config(spark):
    import pytest

    sig = sim.with_minhash_signature(_docs(spark), "text", n_hashes=4)
    with pytest.raises(ValueError, match="evenly divide"):
        sim.lsh_candidate_pairs(sig, "doc_id", n_hashes=4, bands=8)
    with pytest.raises(ValueError, match="evenly divide"):
        sim.lsh_candidate_pairs(sig, "doc_id", n_hashes=4, bands=3)


def test_lsh_bucket_cap_bounds_boilerplate_corpus(spark):
    """1k identical docs share every band key; uncapped that is
    C(1000,2)≈500k candidate pairs. The shard guard must bound the
    pair count to ~shards·C(cap,2) and still finish fast."""
    docs = spark.createDataFrame(
        [(i, "common boilerplate header repeated verbatim in every doc") for i in range(1000)],
        "doc_id long, text string",
    )
    sig = sim.with_minhash_signature(docs, "text", n_hashes=4)
    capped = sim.lsh_candidate_pairs(
        sig, "doc_id", n_hashes=4, bands=2, max_bucket_width=32, oversize="shard"
    )
    n = capped.count()
    # 32 shards of ~32 docs -> at most ~32*C(32,2)=15.9k pairs, far
    # below the 499.5k of the unguarded plan
    assert 0 < n < 50_000
    dropped = sim.lsh_candidate_pairs(
        sig, "doc_id", n_hashes=4, bands=2, max_bucket_width=32, oversize="drop"
    )
    assert dropped.count() == 0  # every bucket is oversized -> all dropped


def test_lsh_bucket_cap_noop_on_normal_data(spark):
    """When no bucket exceeds the cap the guarded plan returns exactly
    the unguarded result (salt is constant 0)."""
    sig = sim.with_minhash_signature(_docs(spark), "text", n_hashes=4)
    base = rows(sim.lsh_candidate_pairs(sig, "doc_id", n_hashes=4, bands=2,
                                        max_bucket_width=None))
    guarded = rows(sim.lsh_candidate_pairs(sig, "doc_id", n_hashes=4, bands=2,
                                           max_bucket_width=4096))
    assert base == guarded


def test_oversized_bucket_stats(spark):
    docs = spark.createDataFrame(
        [(i, "same text") for i in range(100)] + [(100, "unique snowflake words")],
        "doc_id long, text string",
    )
    sig = sim.with_minhash_signature(docs, "text", n_hashes=4)
    exploded = (
        sig.filter(F.col("mh_0").isNotNull())
        .select("doc_id", F.concat_ws(":", "mh_0", "mh_1").alias("key"))
    )
    stats = sim.oversized_bucket_stats(exploded, ["key"], 10).collect()
    assert len(stats) == 1
    assert stats[0]["_bw"] == 100 and stats[0]["_ns"] == 10


def test_cosine_neardup_block_cap(spark):
    """One giant block: shard guard bounds pairs; identical vectors
    still pair within shards; no-trigger case returns the full set."""
    df = spark.createDataFrame(
        [(i, [1.0, 2.0], 0) for i in range(300)],
        "vec_id long, embedding array<double>, label int",
    )
    full = sim.cosine_neardup_pairs(
        df, "embedding", "vec_id", "label", threshold=0.99, max_block_width=None
    ).count()
    assert full == 300 * 299 // 2
    capped = sim.cosine_neardup_pairs(
        df, "embedding", "vec_id", "label", threshold=0.99, max_block_width=30
    ).count()
    assert 0 < capped < full / 3
    dropped = sim.cosine_neardup_pairs(
        df, "embedding", "vec_id", "label", threshold=0.99,
        max_block_width=30, oversize="drop",
    ).count()
    assert dropped == 0


def test_kmeans_fewer_rows_than_k(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [9.0, 9.0])], "vec_id long, embedding array<double>"
    )
    blocked, cents = sim.kmeans_blocks(df, "embedding", "vec_id", k=5, iters=2)
    assert len(cents) == 2  # degraded to the available rows
    assert blocked.count() == 2


def test_kmeans_null_vectors_guarded(spark):
    """NULL/empty/wrong-dim vectors never seed, never vote, and get a
    NULL block (ADVICE r02: previously a TypeError on NULL seeds)."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.1, 0.1]), (3, [9.0, 9.0]), (4, [9.1, 9.1]),
         (5, None), (6, []), (7, [1.0])],
        "vec_id long, embedding array<double>",
    )
    blocked, cents = sim.kmeans_blocks(df, "embedding", "vec_id", k=2, iters=2)
    got = {r["vec_id"]: r["block"] for r in blocked.collect()}
    assert got[5] is None and got[6] is None and got[7] is None
    assert got[1] == got[2] and got[3] == got[4] and got[1] != got[3]
    assert all(all(x is not None for x in c) for c in cents)


def test_kmeans_arrow_path_large_k(spark):
    """k·dim over the literal budget must route through the Arrow
    mapInPandas argmin — bounded plan size — and still recover
    structure: 64-dim one-hot blobs, k=64 (k·dim=4096 > 2048)."""
    import random

    random.seed(7)
    dim, k, per = 64, 64, 4
    pts = []
    for c in range(k):
        for j in range(per):
            v = [0.0] * dim
            v[c] = 10.0
            v[(c + 1) % dim] += random.uniform(-0.1, 0.1)
            pts.append((c * per + j, v))
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    blocked, cents = sim.kmeans_blocks(df, "embedding", "vec_id", k=k, iters=2)
    assert len(cents) == k and len(cents[0]) == dim
    got = blocked.collect()
    # same-blob points land in the same cluster
    by_blob = {}
    for r in got:
        by_blob.setdefault(r["vec_id"] // per, set()).add(r["block"])
    assert all(len(s) == 1 for s in by_blob.values())
    # the arrow plan is O(1) literals: the executed plan must not
    # contain a km-sized when-chain (spot-check string length)
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" in plan or "MapInPandas" in plan


def test_crosssource_contamination_and_stop_shingle_cap(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "a"),
            (2, "alpha beta gamma epsilon", "b"),   # overlaps 1 cross-source
            (3, "zeta eta theta iota", "a"),        # clean
            (4, "common footer text here", "a"),
            (5, "common footer text here too", "b"),
        ],
        "doc_id long, text string, source string",
    )
    out = sim.crosssource_contamination(docs, "text", "doc_id", "source")
    got = {r["source"]: (r["n_docs"], r["n_contaminated"]) for r in out.collect()}
    assert got == {"a": (3, 2), "b": (2, 2)}
    # cap=1: every cross-source shingle here appears in exactly 2 docs,
    # so all overlap signal is dropped -> zero contamination
    capped = sim.crosssource_contamination(
        docs, "text", "doc_id", "source", max_doc_freq=1
    )
    cgot = {r["source"]: r["n_contaminated"] for r in capped.collect()}
    assert cgot == {"a": 0, "b": 0}


def test_contamination_cap_bounds_boilerplate_corpus(spark):
    """1k docs all sharing one boilerplate shingle across two sources:
    uncapped, that shingle alone marks every doc contaminated (and at
    scale fans the postings join out quadratically in its doc
    frequency). With the stop-shingle cap the boilerplate is dropped
    from the postings table entirely, so only the one genuine
    cross-source overlap survives."""
    rows_in = [
        (i, f"common boilerplate footer | unique{i} token{i} word{i}",
         "train" if i % 2 == 0 else "eval")
        for i in range(1000)
    ]
    # one genuine pair: docs 1000/1001 share a rare shingle cross-source
    rows_in += [
        (1000, "rare overlap shingle here", "train"),
        (1001, "rare overlap shingle there", "eval"),
    ]
    docs = spark.createDataFrame(rows_in, "doc_id long, text string, source string")
    uncapped = sim.crosssource_contamination(docs, "text", "doc_id", "source")
    ug = {r["source"]: r["n_contaminated"] for r in uncapped.collect()}
    assert ug == {"train": 501, "eval": 501}  # boilerplate taints everything
    capped = sim.crosssource_contamination(
        docs, "text", "doc_id", "source", max_doc_freq=10
    )
    cg = {r["source"]: r["n_contaminated"] for r in capped.collect()}
    assert cg == {"train": 1, "eval": 1}  # only the genuine overlap
    # the guard is a left-anti join against the stop-shingle set —
    # assert it is actually in the plan (postings fan-out bounded at
    # the source, not post-filtered)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan


# -------------------------------------------- IVF value-level pinning
SF001 = "/root/testdata/sf0.01"


def test_knn_ivf_recall_vs_bruteforce(spark):
    """Value-level verification for the rows-only registered query
    ``embedding_knn_ivf`` (iterative k-means has no SQL twin): recall@3
    vs the exact brute-force ground truth at sf0.01 must hold ≥ 0.7.

    Context for the bound: the synthetic embeddings are uniform random
    64-dim vectors — no cluster structure — so IVF recall is
    theoretically ≈ the corpus fraction probed (measured 0.78 at
    nprobe=4 of k=8 cells). On real, clustered embeddings the same
    nprobe recovers far more. A wrong-sign cosine or off-by-one cell
    assignment craters this number, which is what the test pins."""
    from ed_housing_data_pipeline_spark.plans.queries_llm import q_embedding_knn_ivf

    ivf_pairs = {(r["q_id"], r["nn_id"]) for r in q_embedding_knn_ivf(spark, SF001).collect()}
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    bf = sim.knn_bruteforce(
        emb.filter(F.col("vec_id") < 20), emb, "embedding", "vec_id", k=3
    )
    bf_pairs = {(r["q_id"], r["nn_id"]) for r in bf.collect()}
    assert len(bf_pairs) == 60  # 20 queries × 3
    recall = len(ivf_pairs & bf_pairs) / len(bf_pairs)
    assert recall >= 0.7, f"IVF recall@3 collapsed to {recall}"


def test_knn_ivf_cell_membership_invariant(spark):
    """Every neighbor returned by multi-probe IVF must live in one of
    the query's nprobe probed cells — the structural invariant that
    holds even where float-ulp cell boundaries make exact neighbor
    sets fragile. kmeans_blocks is deterministic for a fixed seed, so
    recomputing the quantizer reproduces the query's cells exactly."""
    from ed_housing_data_pipeline_spark.plans.queries_llm import (
        IVF_K,
        IVF_NPROBE,
        q_embedding_knn_ivf,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    _blocked, cents = sim.kmeans_blocks(
        emb, vec_col="embedding", id_col="vec_id", k=IVF_K, iters=2
    )
    probed = emb.withColumn(
        "_probes", sim._probe_expr("embedding", cents, IVF_NPROBE)
    ).withColumn("_cell", sim._assign_expr("embedding", cents))
    info = {
        r["vec_id"]: (r["_probes"], r["_cell"])
        for r in probed.select("vec_id", "_probes", "_cell").collect()
    }
    out = q_embedding_knn_ivf(spark, SF001).collect()
    assert len(out) == 60
    for r in out:
        q_probes = info[r["q_id"]][0]
        nn_cell = info[r["nn_id"]][1]
        assert nn_cell in q_probes, (r["q_id"], r["nn_id"], q_probes, nn_cell)


def test_probe_arrow_matches_expr(spark):
    """The Arrow multi-probe path (taken past the literal budget) must
    produce the identical probe lists as the native-expression path,
    including deterministic distance-tie ordering and NULL guards."""
    pts = [
        (1, [0.0, 0.0]), (2, [5.0, 5.0]), (3, [10.0, 0.0]), (4, [0.0, 10.0]),
        (5, [2.0, 2.0]), (6, None), (7, [1.0]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    cents = [[0.0, 0.0], [5.0, 5.0], [10.0, 0.0], [0.0, 10.0]]
    expr = {
        r["vec_id"]: r["p"]
        for r in df.select(
            "vec_id", sim._probe_expr("embedding", cents, 2).alias("p")
        ).collect()
    }
    arrow = {
        r["vec_id"]: r["p"]
        for r in sim._probe_arrow(df, "embedding", "p", cents, 2)
        .select("vec_id", "p")
        .collect()
    }
    assert expr == arrow
    assert expr[6] is None and expr[7] is None
    assert expr[1] == [0, 1]  # nearest then next-nearest


def test_lsh_probe_pairs_batch_vs_index(spark, tmp_path):
    """Incremental probe join: candidates come ONLY from batch×index
    band-key matches (never index×index or batch×batch), and the
    stop-band cap drops oversized index buckets deterministically."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely unrelated corpus text about spark physical plans"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog tonight"),
            (101, "nothing like anything else in any corpus anywhere at all"),
        ],
        "doc_id long, text string",
    )
    csig = sim.with_minhash_signature(corpus, "text", n_hashes=8)
    bsig = sim.with_minhash_signature(batch, "text", n_hashes=8)
    idx_path = str(tmp_path / "bands")
    sim.band_keys(csig, "doc_id", n_hashes=8, bands=4).write.parquet(idx_path)
    pairs = sim.lsh_probe_pairs(
        sim.band_keys(bsig, "doc_id", n_hashes=8, bands=4),
        spark.read.parquet(idx_path),
        "doc_id",
    )
    got = {(r["id_probe"], r["id_index"]) for r in pairs.collect()}
    assert got == {(100, 1), (100, 2)}
    # corpus docs 1 and 2 are identical -> every band bucket holding
    # them has width 2; cap=1 treats them as stop-bands and drops all
    capped = sim.lsh_probe_pairs(
        sim.band_keys(bsig, "doc_id", n_hashes=8, bands=4),
        spark.read.parquet(idx_path),
        "doc_id",
        max_bucket_width=1,
    )
    assert capped.count() == 0


def test_near_dup_pairs_with_external_sig_matches_internal(spark):
    """The sig= reuse path (session-shared signature table) must give
    byte-identical pairs to the self-contained path."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "totally different words live in this document here"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    internal = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in sim.near_dup_pairs(
            docs, "text", "doc_id", threshold=0.1, n_hashes=8, bands=4
        ).collect()
    }
    from ed_housing_data_pipeline_spark.functions.text import word_shingles

    sh = docs.select(
        "doc_id", F.array_distinct(word_shingles("text", k=3)).alias("_sh")
    )
    sig = sim.with_minhash_signature(sh, "text", n_hashes=8, shingles_col="_sh")
    external = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in sim.near_dup_pairs(
            docs, "text", "doc_id", threshold=0.1, n_hashes=8, bands=4, sig=sig
        ).collect()
    }
    assert internal == external and internal


def test_neardup_clusters_string_ids_both_paths(spark):
    """The operator is generic over the id type: string ids must work
    through BOTH the driver union-find fast path (label frame schema is
    derived from the pair frame, not hard-coded bigint) and the
    distributed loop, with identical labels."""
    docs = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    expect = {"a": "a", "b": "a", "c": "a", "d": "d"}
    for max_local in (10_000, 0):
        out = sim.neardup_clusters(
            docs, pairs, "doc_id", max_local_edges=max_local
        )
        assert {r["doc_id"]: r["cluster_id"] for r in out.collect()} == expect


# ---------------------------------------- IVF-PQ value-level pinning
# The trained query (embedding_knn_ivfpq) is rows-only at the driver —
# k-means + PQ-codebook training has no SQL twin — so this block is
# its value-level verification, mirroring the IVF harnesses above:
# the code-assignment invariant, an exactness pin of the whole ADC
# search path with quantization noise removed, trained-path recall vs
# brute force, and the probe-membership structural invariant.


def test_pq_encode_code_assignment_invariant(spark):
    """Every PQ code must be the argmin (squared-L2) entry of its
    subspace codebook, ties to the LOWER index; NULL / wrong-dim
    vectors encode to NULL. Recomputed independently in numpy."""
    import numpy as np

    # m=2 subspaces of 2 dims, k=3 entries; entries 1 and 2 of book 0
    # are IDENTICAL -> any vector nearest them must pick index 1
    books = [
        [[0.0, 0.0], [5.0, 5.0], [5.0, 5.0]],
        [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]],
    ]
    vecs = [
        (1, [4.9, 5.1, 0.9, 0.1]),   # book0 tie between idx 1 and 2 -> 1
        (2, [0.1, -0.2, -0.8, 0.0]),
        (3, None),
        (4, [1.0, 2.0, 3.0]),        # wrong dim -> NULL
    ]
    df = spark.createDataFrame(vecs, "vec_id long, v array<double>")
    got = {
        r["vec_id"]: r["codes"]
        for r in df.select(
            "vec_id", sim.pq_encode_expr("v", books).alias("codes")
        ).collect()
    }
    assert got[3] is None and got[4] is None
    for vid, vec in [(1, vecs[0][1]), (2, vecs[1][1])]:
        v = np.asarray(vec)
        for mi, cb in enumerate(books):
            sub = v[mi * 2 : (mi + 1) * 2]
            d = ((np.asarray(cb) - sub[None, :]) ** 2).sum(axis=1)
            # ties to the lower index == numpy argmin's own tie rule
            assert got[vid][mi] == int(d.argmin()), (vid, mi, d)


def test_knn_ivfpq_exact_when_corpus_is_codebook_concat(spark):
    """Quantization-noise-free pin of the ENTIRE IVFADC search path:
    when every corpus vector is a concatenation of codebook entries,
    PQ encoding is lossless, so (a) each returned `adc` must equal the
    exact squared-L2 distance to that neighbor and (b) with every cell
    probed the top-k must equal brute-force squared-L2 top-k with the
    same (distance, id) tie order. A sign error, an off-by-one in the
    LUT indexing, or a subspace-order bug all break this exactly."""
    import itertools

    import numpy as np

    books = [
        [[0.0, 0.0], [3.0, 0.0], [0.0, 3.0]],
        [[1.0, 1.0], [-2.0, 0.5], [0.0, -1.0]],
    ]
    cents = [[0.0, 0.0, 0.0, 0.0], [2.0, 2.0, 0.0, 0.0]]
    corpus = [
        list(books[0][i]) + list(books[1][j])
        for i, j in itertools.product(range(3), range(3))
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(corpus)], "vec_id long, v array<double>"
    )
    out = sim.knn_ivf_pq(
        df, vec_col="v", id_col="vec_id", cents=cents, codebooks=books,
        k=3, nprobe=len(cents),  # probe ALL cells -> no IVF pruning
    ).collect()
    mat = np.asarray(corpus)
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == set(range(len(corpus)))
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rn"])
        d = ((mat - mat[qid][None, :]) ** 2).sum(axis=1)
        want = sorted(
            ((float(d[i]), i) for i in range(len(corpus)) if i != qid)
        )[:3]
        got = [(round(r["adc"], 9), r["nn_id"]) for r in rs]
        assert got == [(round(dv, 9), i) for dv, i in want], (qid, got, want)


def test_knn_ivfpq_trained_recall_vs_bruteforce(spark):
    """Trained-path recall: the registered rows-only query's @3
    neighbors vs exact brute-force top-10 at sf0.01. Context for the
    bound: the synthetic embeddings are uniform random unit vectors —
    NO cluster structure — so m=4 codes over 64 dims retain little
    (measured 0.18); chance is 10/499 ≈ 0.02, so ≥0.10 is ~5× above
    chance and craters on any wrong-sign/off-by-one regression while
    staying robust to k-means seed sensitivity. On real clustered
    embeddings PQ recall is far higher; this pins plumbing, not PQ's
    information-theoretic limit on noise."""
    from ed_housing_data_pipeline_spark.plans.queries_llm import (
        q_embedding_knn_ivfpq,
    )

    pq_pairs = {
        (r["q_id"], r["nn_id"])
        for r in q_embedding_knn_ivfpq(spark, SF001).collect()
    }
    assert len(pq_pairs) == 60  # 20 queries × 3
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    bf = sim.knn_bruteforce(
        emb.filter(F.col("vec_id") < 20), emb, "embedding", "vec_id", k=10
    )
    bf_pairs = {(r["q_id"], r["nn_id"]) for r in bf.collect()}
    recall = len(pq_pairs & bf_pairs) / len(pq_pairs)
    assert recall >= 0.10, f"IVF-PQ @3-in-top-10 collapsed to {recall}"


def test_knn_ivfpq_cell_membership_invariant(spark):
    """Every neighbor the trained IVF-PQ query returns must live in
    one of the query's nprobe probed cells (kmeans_blocks is
    seed-deterministic, so recomputing the quantizer reproduces the
    query's cells exactly) — same structural invariant as the IVF
    twin, robust to float-ulp neighbor-set fragility."""
    from ed_housing_data_pipeline_spark.plans.queries_llm import (
        IVF_K,
        IVF_NPROBE,
        q_embedding_knn_ivfpq,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    _blocked, cents = sim.kmeans_blocks(
        emb, vec_col="embedding", id_col="vec_id", k=IVF_K, iters=2
    )
    probed = emb.withColumn(
        "_probes", sim._probe_expr("embedding", cents, IVF_NPROBE)
    ).withColumn("_cell", sim._assign_expr("embedding", cents))
    info = {
        r["vec_id"]: (r["_probes"], r["_cell"])
        for r in probed.select("vec_id", "_probes", "_cell").collect()
    }
    out = q_embedding_knn_ivfpq(spark, SF001).collect()
    assert len(out) == 60
    for r in out:
        q_probes = info[r["q_id"]][0]
        nn_cell = info[r["nn_id"]][1]
        assert nn_cell in q_probes, (r["q_id"], r["nn_id"], q_probes, nn_cell)


def test_pq_train_codebooks_contracts(spark):
    """Training contracts: empty/all-NULL input raises (caller error,
    the empty-corpus carve-out twin); dim not divisible by m raises;
    a trained set has shape m × k × (dim/m) and encodes its own
    training vectors to valid code ranges."""
    import pytest

    empty = spark.createDataFrame([], "vec_id long, v array<double>")
    with pytest.raises(ValueError, match="no non-null vectors"):
        sim.pq_train_codebooks(empty, vec_col="v", id_col="vec_id", m=2)
    df = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0, -1.0]) for i in range(12)],
        "vec_id long, v array<double>",
    )
    with pytest.raises(ValueError, match="not divisible"):
        sim.pq_train_codebooks(df, vec_col="v", id_col="vec_id", m=3)
    books = sim.pq_train_codebooks(
        df, vec_col="v", id_col="vec_id", m=2, k=4, iters=1
    )
    assert len(books) == 2
    assert all(len(cb) == 4 for cb in books)
    assert all(len(e) == 2 for cb in books for e in cb)
    codes = df.select(sim.pq_encode_expr("v", books).alias("c")).collect()
    assert all(
        r["c"] is not None and all(0 <= ci < 4 for ci in r["c"]) for r in codes
    )


def test_pq_arrow_paths_match_expr(spark):
    """The Arrow encode/LUT twins (taken past the literal budget) must
    match the native-expression paths value-for-value, including NULL
    and wrong-dim guards."""
    books = [
        [[0.0, 0.0], [5.0, 5.0], [1.0, -1.0]],
        [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]],
    ]
    vecs = [
        (1, [4.9, 5.1, 0.9, 0.1]),
        (2, [0.1, -0.2, -0.8, 0.0]),
        (3, None),
        (4, [1.0, 2.0, 3.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, v array<double>")
    exp_codes = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id", sim.pq_encode_expr("v", books).alias("c")
        ).collect()
    }
    arr_codes = {
        r["vec_id"]: r["c"]
        for r in sim._pq_encode_arrow(df, "v", "c", books)
        .select("vec_id", "c")
        .collect()
    }
    assert exp_codes == arr_codes
    assert arr_codes[3] is None and arr_codes[4] is None
    exp_lut = {
        r["vec_id"]: r["l"]
        for r in df.select(
            "vec_id", sim.pq_query_lut_expr("v", books).alias("l")
        ).collect()
    }
    arr_lut = {
        r["vec_id"]: r["l"]
        for r in sim._pq_lut_arrow(df, "v", "l", books)
        .select("vec_id", "l")
        .collect()
    }
    assert set(exp_lut) == set(arr_lut)
    for vid, lut in exp_lut.items():
        if lut is None:
            assert arr_lut[vid] is None
            continue
        for row_e, row_a in zip(lut, arr_lut[vid]):
            for de, da in zip(row_e, row_a):
                assert abs(de - da) < 1e-9, (vid, de, da)


def test_knn_ivfpq_arrow_fallback_matches_expr_path(spark, monkeypatch):
    """Forcing the literal budget to 1 routes knn_ivf_pq through the
    Arrow coarse-assign/probe AND Arrow encode/LUT paths; the search
    result must be identical to the expression path (same neighbors,
    same adc to 1e-9, same ranks)."""
    import itertools

    books = [
        [[0.0, 0.0], [3.0, 0.0], [0.0, 3.0]],
        [[1.0, 1.0], [-2.0, 0.5], [0.0, -1.0]],
    ]
    cents = [[0.0, 0.0, 0.0, 0.0], [2.0, 2.0, 0.0, 0.0]]
    corpus = [
        list(books[0][i]) + list(books[1][j])
        for i, j in itertools.product(range(3), range(3))
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(corpus)], "vec_id long, v array<double>"
    )

    def run():
        return sorted(
            (r["q_id"], r["nn_id"], round(r["adc"], 9), r["rn"])
            for r in sim.knn_ivf_pq(
                df, vec_col="v", id_col="vec_id", cents=cents,
                codebooks=books, k=3, nprobe=2,
            ).collect()
        )

    via_expr = run()
    monkeypatch.setattr(sim, "_EXPR_ASSIGN_MAX_LITERALS", 1)
    via_arrow = run()
    assert via_expr == via_arrow
    assert len(via_arrow) == 9 * 3


def test_ivfpq_clustered_recall_gate_flips_on_broken_codebook(spark):
    """The quality gate can actually FAIL (r11 VERDICT #5): on the
    planted micro-group fixture a healthy trained IVF-PQ pipeline
    scores recall 1.0 (>= the 0.8 bound), and a deliberately-broken
    codebook — every centroid zeroed, so codes carry no information
    and ADC cannot rank — flips the oracle-checked row to 0."""
    from ed_housing_data_pipeline_spark.operators import similarity as sim_  # noqa: PLC0415
    from ed_housing_data_pipeline_spark.plans import queries_ann as qa  # noqa: PLC0415

    sf = "/root/testdata/sf0.001"
    healthy = qa.ivfpq_clustered_recall(spark, sf).collect()
    assert [r["ok"] for r in healthy] == [1]
    vecs = qa.clustered_emb(spark, sf)
    books = sim_.pq_train_codebooks(
        vecs, vec_col="embedding", id_col="vec_id", m=qa.PQ_M, k=qa.PQ_K, iters=2
    )
    broken = [[[0.0] * len(c0) for c0 in book] for book in books]
    flipped = qa.ivfpq_clustered_recall(spark, sf, codebooks=broken).collect()
    assert [r["ok"] for r in flipped] == [0]
