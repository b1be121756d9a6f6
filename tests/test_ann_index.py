"""Contract tests for the incrementally-maintained IVF-PQ ANN index
(operators/ann_index.py over the segmented-commit protocol).

Pinned properties: (1) the incremental path — bootstrap, O(batch)
appends, manifest-pinned probe — returns byte-identical results to the
one-shot ``knn_ivf_pq`` over the same corpus and model; (2) appends
write ONLY the batch's rows and never rewrite committed segments;
(3) the additive cellcounts segments aggregate to the true per-cell
widths; (4) compaction is content-neutral; (5) the model blob is
immutable (double bootstrap raises); (6) unpinned segment debris is
invisible to probes; (7) unsearchable (NULL / wrong-dim) vectors never
enter the index.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.operators import ann_index, similarity as sim
from ed_housing_data_pipeline_spark.sources import lake

# Tiny fixed model: dim=4, 3 coarse cells; PQ m=2 subspaces of 2 dims,
# 3 entries each — small enough that every expression stays native and
# tests run in seconds, structured enough that cells/codes differ.
CENTS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [-1.0, -1.0, 0.0, 0.0]]
CODEBOOKS = [
    [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
    [[0.0, 0.0], [1.0, 1.0], [-1.0, 0.0]],
]
SCHEMA = "vec_id bigint, embedding array<double>"


def _vecs(spark, ids):
    """Deterministic distinct 4-d vectors for the given ids."""
    rows = [
        (i, [((i * 7 + 3) % 11) / 5.0 - 1.0, ((i * 5 + 1) % 13) / 6.0 - 1.0,
             ((i * 3 + 2) % 7) / 3.0 - 1.0, (i % 5) / 2.0 - 1.0])
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _build(spark, root, ids_boot, batches):
    ann_index.bootstrap_ann_index(
        spark, root, _vecs(spark, ids_boot), "embedding", "vec_id",
        cents=CENTS, codebooks=CODEBOOKS, segment_partitions=2,
    )
    for ids in batches:
        ann_index.append_ann_batch(
            spark, root, _vecs(spark, ids), "embedding", "vec_id",
            segment_partitions=2,
        )


def _probe_rows(spark, root, all_ids, k=3, nprobe=2):
    out = ann_index.probe_ann_index(
        spark, root, _vecs(spark, all_ids), "embedding", "vec_id",
        k=k, nprobe=nprobe, query_filter=F.col("vec_id") < 6,
    )
    return sorted(map(tuple, out.collect()))


def test_incremental_equals_oneshot(spark, tmp_path):
    """bootstrap + two O(batch) appends + manifest-pinned probe must be
    byte-identical to the one-shot IVFADC search over the union corpus
    with the same model — the incremental path adds a persistence
    protocol, never different math."""
    root = str(tmp_path / "ann")
    boot, b1, b2 = list(range(0, 8)), list(range(8, 13)), list(range(13, 20))
    _build(spark, root, boot, [b1, b2])
    got = _probe_rows(spark, root, boot + b1 + b2)
    want = sim.knn_ivf_pq(
        _vecs(spark, boot + b1 + b2), "embedding", "vec_id",
        cents=CENTS, codebooks=CODEBOOKS, k=3, nprobe=2,
        query_filter=F.col("vec_id") < 6,
    )
    assert got == sorted(map(tuple, want.collect()))
    assert len(got) > 0


def test_append_writes_only_batch_rows_and_never_rewrites(spark, tmp_path):
    """O(batch) commits: each vectors segment holds exactly its batch's
    (valid) ids, and an append leaves every previously committed
    segment id pinned unchanged — never a rewrite of the accumulated
    index."""
    root = str(tmp_path / "ann")
    ann_index.bootstrap_ann_index(
        spark, root, _vecs(spark, range(0, 6)), "embedding", "vec_id",
        cents=CENTS, codebooks=CODEBOOKS, segment_partitions=2,
    )
    pins1 = lake.segment_pins(spark, root)
    ann_index.append_ann_batch(
        spark, root, _vecs(spark, range(6, 10)), "embedding", "vec_id",
        segment_partitions=2,
    )
    pins2 = lake.segment_pins(spark, root)
    for comp in (ann_index.VECTORS, ann_index.CELLCOUNTS):
        assert pins2[comp][: len(pins1[comp])] == pins1[comp]
        assert len(pins2[comp]) == len(pins1[comp]) + 1
    new_seg = pins2[ann_index.VECTORS][-1]
    seg_ids = {
        r["id"]
        for r in lake.read_segments(
            spark, f"{root}/{ann_index.VECTORS}", [new_seg]
        ).collect()
    }
    assert seg_ids == set(range(6, 10))


def test_cellcounts_additive_equals_direct_count(spark, tmp_path):
    """The additive count segments summed per cell must equal a direct
    count over the committed vectors — the O(batch)-maintained stats
    never drift from the data."""
    root = str(tmp_path / "ann")
    _build(spark, root, range(0, 7), [range(7, 12), range(12, 18)])
    stats = {
        (r["cell"], r["n_vectors"])
        for r in ann_index.ann_cell_stats(spark, root).collect()
    }
    direct = {
        (r["cell"], r["count"])
        for r in ann_index.read_ann_vectors(spark, root)
        .groupBy("cell")
        .count()
        .collect()
    }
    assert stats == direct
    assert sum(n for _, n in stats) == 18


def test_compaction_is_content_neutral(spark, tmp_path):
    """compact_ann_index folds every component to one segment without
    changing probe results or cell stats."""
    root = str(tmp_path / "ann")
    all_ids = list(range(0, 15))
    _build(spark, root, all_ids[:5], [all_ids[5:10], all_ids[10:]])
    before_probe = _probe_rows(spark, root, all_ids)
    before_stats = sorted(
        map(tuple, ann_index.ann_cell_stats(spark, root).collect())
    )
    pins = ann_index.compact_ann_index(spark, root)
    assert all(len(segs) == 1 for segs in pins.values())
    assert _probe_rows(spark, root, all_ids) == before_probe
    assert (
        sorted(map(tuple, ann_index.ann_cell_stats(spark, root).collect()))
        == before_stats
    )


def test_model_blob_is_immutable_double_bootstrap_raises(spark, tmp_path):
    """The model commits exactly at blob version 1; a second bootstrap
    over the same root must raise instead of silently splitting the
    index across two quantizers, and the model read back must be the
    exact constants pinned."""
    root = str(tmp_path / "ann")
    ann_index.bootstrap_ann_index(
        spark, root, _vecs(spark, range(0, 5)), "embedding", "vec_id",
        cents=CENTS, codebooks=CODEBOOKS,
    )
    assert ann_index.read_ann_model(spark, root) == (CENTS, CODEBOOKS)
    with pytest.raises(lake.ConcurrentCommitError):
        ann_index.bootstrap_ann_index(
            spark, root, _vecs(spark, range(5, 9)), "embedding", "vec_id",
            cents=CENTS, codebooks=CODEBOOKS,
        )


def test_unpinned_debris_is_invisible_and_append_still_works(spark, tmp_path):
    """A crash between segment write and manifest flip leaves unpinned
    debris: probes must not see it, and the next append must commit
    normally on top of the last good manifest."""
    root = str(tmp_path / "ann")
    _build(spark, root, range(0, 6), [range(6, 9)])
    before = _probe_rows(spark, root, range(0, 9))
    # simulate the torn commit: data segment written, no manifest flip
    cents, books = ann_index.read_ann_model(spark, root)
    debris = ann_index.encoded_frame(
        _vecs(spark, range(100, 105)), "embedding", "vec_id", cents, books
    )
    lake.write_segment(spark, debris, f"{root}/{ann_index.VECTORS}")
    assert _probe_rows(spark, root, range(0, 9)) == before
    committed_ids = {
        r["id"] for r in ann_index.read_ann_vectors(spark, root).collect()
    }
    assert committed_ids == set(range(0, 9))
    # recovery: the retried batch commits exactly once
    ann_index.append_ann_batch(
        spark, root, _vecs(spark, range(100, 105)), "embedding", "vec_id",
    )
    committed_ids = {
        r["id"] for r in ann_index.read_ann_vectors(spark, root).collect()
    }
    assert committed_ids == set(range(0, 9)) | set(range(100, 105))


def test_unsearchable_vectors_never_enter_the_index(spark, tmp_path):
    """NULL and wrong-dim vectors cannot be assigned a cell or codes:
    the encode pass excludes them, so the committed index holds only
    searchable rows and the cell stats count only those."""
    root = str(tmp_path / "ann")
    good = _vecs(spark, range(0, 4))
    bad = spark.createDataFrame(
        [(90, None), (91, [1.0, 2.0])], SCHEMA
    )
    ann_index.bootstrap_ann_index(
        spark, root, good.unionByName(bad), "embedding", "vec_id",
        cents=CENTS, codebooks=CODEBOOKS,
    )
    ids = {r["id"] for r in ann_index.read_ann_vectors(spark, root).collect()}
    assert ids == set(range(0, 4))
    assert (
        sum(
            r["n_vectors"]
            for r in ann_index.ann_cell_stats(spark, root).collect()
        )
        == 4
    )


def test_trained_bootstrap_recall_vs_bruteforce(spark, tmp_path):
    """The trained path (cents=None → k-means + PQ training on the
    bootstrap corpus) must produce an index whose top-1 ADC neighbor
    for most queries lands in the brute-force cosine top-3 — the same
    recall bar as the one-shot trained IVF-PQ harness, here exercised
    through the persisted artifact."""
    ids = list(range(0, 40))
    root = str(tmp_path / "ann")
    corpus = _vecs(spark, ids)
    ann_index.bootstrap_ann_index(
        spark, root, corpus, "embedding", "vec_id",
        coarse_k=3, m=2, pq_k=4, iters=2,
    )
    got = ann_index.probe_ann_index(
        spark, root, corpus, "embedding", "vec_id",
        k=1, nprobe=3, query_filter=F.col("vec_id") < 10,
    ).collect()
    truth = sim.knn_bruteforce(
        queries=corpus.filter(F.col("vec_id") < 10),
        corpus=corpus, vec_col="embedding", id_col="vec_id", k=3,
    ).collect()
    top3 = {}
    for r in truth:
        top3.setdefault(r["q_id"], set()).add(r["nn_id"])
    hits = sum(1 for r in got if r["nn_id"] in top3.get(r["q_id"], set()))
    assert len(got) == 10
    # nprobe=3 of 3 cells probes everything: ADC error is the only
    # approximation left, and top-1-in-exact-top-3 should mostly hold
    assert hits >= 7


def test_delete_vectors_excludes_from_probe_and_counts(spark, tmp_path):
    """A logical delete makes vectors un-probe-able in one commit:
    probe results equal the one-shot search over the live corpus,
    cellcounts fold the negative rows to exact live widths, replays
    and unknown ids are no-ops."""
    root = str(tmp_path / "ann")
    boot, b1 = list(range(0, 8)), list(range(8, 13))
    _build(spark, root, boot, [b1])
    dead = [2, 9, 11]
    ann_index.delete_ann_vectors(spark, root, dead)
    live = [i for i in boot + b1 if i not in dead]

    got = _probe_rows(spark, root, live)
    want = sim.knn_ivf_pq(
        _vecs(spark, live), "embedding", "vec_id",
        cents=CENTS, codebooks=CODEBOOKS, k=3, nprobe=2,
        query_filter=F.col("vec_id") < 6,
    )
    assert got == sorted(map(tuple, want.collect()))
    # a deleted id can still be a QUERY (queries are caller-side);
    # it just can never come back as a neighbor
    full = _probe_rows(spark, root, boot + b1)
    assert all(nn not in dead for (_q, nn, _adc, _rn) in full)
    assert any(q == 2 for (q, _nn, _adc, _rn) in full)

    # live widths equal a direct count over the live encoded corpus
    stats = {
        r.cell: r.n_vectors
        for r in ann_index.ann_cell_stats(spark, root).collect()
    }
    direct = {
        r.cell: r.n
        for r in ann_index.read_ann_vectors(spark, root)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert stats == direct
    assert sum(stats.values()) == len(live)

    # replay + unknown id: nothing changes
    ann_index.delete_ann_vectors(spark, root, [2, 999])
    stats2 = {
        r.cell: r.n_vectors
        for r in ann_index.ann_cell_stats(spark, root).collect()
    }
    assert stats2 == stats


def test_compaction_applies_ann_deletes_physically(spark, tmp_path):
    """With tombstones pinned, compact_ann_index rewrites the encoded
    corpus live-rows-only, folds the negative counts, resets the
    tombstones — probe results and cell stats identical before and
    after, and a later tombstone-free compaction takes the plain
    fold path."""
    root = str(tmp_path / "ann")
    boot, b1 = list(range(0, 8)), list(range(8, 13))
    _build(spark, root, boot, [b1])
    ann_index.delete_ann_vectors(spark, root, [2, 9])

    before = _probe_rows(spark, root, boot + b1)
    stats_before = sorted(
        map(tuple, ann_index.ann_cell_stats(spark, root).collect())
    )
    pins = ann_index.compact_ann_index(spark, root)
    assert _probe_rows(spark, root, boot + b1) == before
    assert sorted(
        map(tuple, ann_index.ann_cell_stats(spark, root).collect())
    ) == stats_before
    vecs = lake.read_segments(spark, f"{root}/vectors", pins["vectors"])
    assert vecs.filter(vecs.id.isin([2, 9])).count() == 0
    tomb = lake.read_segments(
        spark, f"{root}/deleted_ids", pins["deleted_ids"]
    )
    assert tomb.count() == 0
    counts = lake.read_segments(
        spark, f"{root}/cellcounts", pins["cellcounts"]
    )
    assert counts.filter("_n <= 0").count() == 0
    # tombstone-free follow-up compaction folds by plain union
    ann_index.append_ann_batch(
        spark, root, _vecs(spark, [30, 31]), "embedding", "vec_id",
        segment_partitions=2,
    )
    pins2 = ann_index.compact_ann_index(spark, root)
    assert len(pins2["vectors"]) == 1


def test_upsert_reembeds_and_keeps_counts_exact(spark, tmp_path):
    """A re-embedding upsert replaces the probed vector atomically:
    probe results equal the one-shot search over (untouched + revised)
    vectors, cell stats track the migration between cells exactly, and
    a deleted id resurrects with only its new vector."""
    root = str(tmp_path / "ann")
    boot, b1 = list(range(0, 8)), list(range(8, 13))
    _build(spark, root, boot, [b1])
    # revised vectors: a deterministic different embedding per id
    revised_ids = [1, 4, 9]

    def _revised(ids):
        return _vecs(spark, [i + 100 for i in ids]).select(
            (F.col("vec_id") - 100).alias("vec_id"), "embedding"
        )

    ann_index.upsert_ann_vectors(
        spark, root, _revised(revised_ids), "embedding", "vec_id",
        segment_partitions=2,
    )
    # the one-shot truth over the corpus with revisions applied
    plain = [i for i in boot + b1 if i not in revised_ids]
    truth = _vecs(spark, plain).unionByName(_revised(revised_ids))
    got = sorted(map(tuple, ann_index.probe_ann_index(
        spark, root, truth, "embedding", "vec_id",
        k=3, nprobe=2, query_filter=F.col("vec_id") < 6,
    ).collect()))
    want = sim.knn_ivf_pq(
        truth, "embedding", "vec_id",
        cents=CENTS, codebooks=CODEBOOKS, k=3, nprobe=2,
        query_filter=F.col("vec_id") < 6,
    )
    assert got == sorted(map(tuple, want.collect()))
    stats = {
        r.cell: r.n_vectors
        for r in ann_index.ann_cell_stats(spark, root).collect()
    }
    direct = {
        r.cell: r.n
        for r in ann_index.read_ann_vectors(spark, root)
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert stats == direct and sum(stats.values()) == len(boot + b1)

    # delete then re-embed: resurrection serves ONLY the new vector
    ann_index.delete_ann_vectors(spark, root, [2])
    ann_index.upsert_ann_vectors(
        spark, root, _revised([2]), "embedding", "vec_id",
        segment_partitions=2,
    )
    live = ann_index.read_ann_vectors(spark, root)
    assert live.filter("id = 2").count() == 1
    assert sum(
        r.n_vectors
        for r in ann_index.ann_cell_stats(spark, root).collect()
    ) == len(boot + b1)
    # physical apply keeps everything identical and drops dead rows
    before = sorted(map(tuple, ann_index.probe_ann_index(
        spark, root, truth, "embedding", "vec_id",
        k=3, nprobe=2, query_filter=F.col("vec_id") < 6,
    ).collect()))
    pins = ann_index.compact_ann_index(spark, root)
    after = sorted(map(tuple, ann_index.probe_ann_index(
        spark, root, truth, "embedding", "vec_id",
        k=3, nprobe=2, query_filter=F.col("vec_id") < 6,
    ).collect()))
    assert after == before
    vecs = lake.read_segments(spark, f"{root}/vectors", pins["vectors"])
    assert vecs.count() == len(boot + b1)  # one live row per id
