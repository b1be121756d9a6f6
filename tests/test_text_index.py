"""Inverted text index (operators/text_index): posting construction,
conjunctive and positional-phrase search, incremental appends, and
bloom-sidecar segment skipping on the term column."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from ed_housing_data_pipeline_spark.operators import text_index
from ed_housing_data_pipeline_spark.sources import lake

DOCS_A = [
    Row(doc_id=0, text="alpha beta gamma alpha"),
    Row(doc_id=1, text="beta beta beta"),
    Row(doc_id=2, text="Alpha  GAMMA\tbeta"),  # mixed case, runs of ws
]
DOCS_B = [
    Row(doc_id=10, text="delta epsilon delta delta"),
    Row(doc_id=11, text=None),  # NULL text → no postings
    Row(doc_id=12, text="   "),  # whitespace-only → no postings
]
DOCS_C = [
    Row(doc_id=20, text="alpha delta"),
    Row(doc_id=21, text="gamma gamma gamma gamma"),
]

SCHEMA = "doc_id bigint, text string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _build(spark, root):
    text_index.bootstrap_text_index(spark, root, _df(spark, DOCS_A))
    text_index.append_text_batch(spark, root, _df(spark, DOCS_B))
    text_index.append_text_batch(spark, root, _df(spark, DOCS_C))


@pytest.fixture(scope="module")
def _base_idx(spark, tmp_path_factory):
    """The canonical 3-commit index built ONCE per module. Tests get a
    private COPY (segment dirs + manifests are root-relative, so a
    copied tree is a fully independent index) — rebuilding the same
    three commits in ~20 tests dominated the module's wall clock."""
    root = str(tmp_path_factory.mktemp("text_idx_base") / "idx")
    _build(spark, root)
    return root


@pytest.fixture()
def built_root(_base_idx, tmp_path):
    import shutil

    root = str(tmp_path / "idx")
    shutil.copytree(_base_idx, root)
    return root


def test_posting_table_rows(spark):
    rows = {
        (r.term, r.doc_id): (r.tf, r.positions)
        for r in text_index.posting_table(_df(spark, DOCS_A)).collect()
    }
    assert rows[("alpha", 0)] == (2, [0, 3])
    assert rows[("beta", 1)] == (3, [0, 1, 2])
    # lowercased tokens; runs of whitespace produce no empty terms
    assert rows[("alpha", 2)] == (1, [0])
    assert rows[("gamma", 2)] == (1, [1])
    assert ("", 2) not in rows


def test_null_and_blank_docs_produce_no_postings(spark):
    got = text_index.posting_table(_df(spark, DOCS_B)).collect()
    assert {r.doc_id for r in got} == {10}


def test_search_all_terms_conjunction(spark, built_root):
    root = built_root
    got = {
        r.doc_id: r.total_tf
        for r in text_index.search_all_terms(spark, root, ["alpha", "gamma"]).collect()
    }
    # docs 0 and 2 hold both terms; 20 holds alpha only, 21 gamma only
    assert got == {0: 2 + 1, 2: 1 + 1}
    # duplicate probe terms must not weaken the conjunction
    dup = {
        r.doc_id
        for r in text_index.search_all_terms(
            spark, root, ["alpha", "alpha", "gamma"]
        ).collect()
    }
    assert dup == {0, 2}


def test_search_absent_term_is_empty(spark, built_root):
    root = built_root
    assert text_index.search_all_terms(spark, root, ["alpha", "zzz"]).count() == 0


def test_search_sees_appended_batches(spark, tmp_path):
    root = str(tmp_path / "idx")
    text_index.bootstrap_text_index(spark, root, _df(spark, DOCS_A))
    assert {
        r.doc_id
        for r in text_index.search_all_terms(spark, root, ["alpha"]).collect()
    } == {0, 2}
    text_index.append_text_batch(spark, root, _df(spark, DOCS_C))
    assert {
        r.doc_id
        for r in text_index.search_all_terms(spark, root, ["alpha"]).collect()
    } == {0, 2, 20}
    # each ingest added exactly one postings segment
    assert len(lake.segment_pins(spark, root)["postings"]) == 2


def test_phrase_adjacency_and_counts(spark, built_root):
    root = built_root
    got = {
        r.doc_id: r.n_occ
        for r in text_index.search_phrase(spark, root, "alpha", "beta").collect()
    }
    # doc 0: "alpha beta ..." once (the second alpha is followed by EOS)
    assert got == {0: 1}
    # reversed order is a different phrase
    rev = {
        r.doc_id: r.n_occ
        for r in text_index.search_phrase(spark, root, "beta", "alpha").collect()
    }
    # doc 0: "... beta gamma alpha" → no; doc 2 "alpha gamma beta" → no
    assert rev == {}
    # phrase never matches across documents (20 ends alpha, 21 starts gamma)
    assert (
        text_index.search_phrase(spark, root, "alpha", "epsilon").count() == 0
    )


def test_phrase_repeated_word(spark, built_root):
    root = built_root
    got = {
        r.doc_id: r.n_occ
        for r in text_index.search_phrase(spark, root, "beta", "beta").collect()
    }
    # doc 1 "beta beta beta" → positions {0,1,2}: adjacencies (0,1),(1,2)
    assert got == {1: 2}
    gg = {
        r.doc_id: r.n_occ
        for r in text_index.search_phrase(spark, root, "gamma", "gamma").collect()
    }
    assert gg == {21: 3}
    dd = {
        r.doc_id: r.n_occ
        for r in text_index.search_phrase(spark, root, "delta", "delta").collect()
    }
    # doc 10 "delta epsilon delta delta" → only (2,3)
    assert dd == {10: 1}


def test_bloom_prunes_segments_by_term(spark, built_root):
    """Each batch has a private vocabulary word; a probe for it must
    drop the other two segments driver-side (and never the holder)."""
    root = built_root
    pins = lake.segment_pins(spark, root)["postings"]
    assert len(pins) == 3
    kept, pinned = lake.bloom_pruned_pins(
        spark, root, "postings", "term", ["epsilon"]
    )
    assert pinned == pins
    assert len(kept) == 1  # only the DOCS_B segment may hold it
    got = {
        r.doc_id
        for r in text_index.search_all_terms(spark, root, ["epsilon"]).collect()
    }
    assert got == {10}


def test_termstats_additive_and_corpus_meta(spark, tmp_path):
    """df sums across segments equal the corpus document frequencies;
    the manifest-meta doc count accumulates per commit (incl. docs
    with no postings — NULL/blank text are still corpus members)."""
    root = str(tmp_path / "idx")
    text_index.bootstrap_text_index(spark, root, _df(spark, DOCS_A))
    assert text_index.corpus_size(spark, root) == 3
    text_index.append_text_batch(spark, root, _df(spark, DOCS_B))
    text_index.append_text_batch(spark, root, _df(spark, DOCS_C))
    assert text_index.corpus_size(spark, root) == 8
    assert len(lake.segment_pins(spark, root)["termstats"]) == 3
    got = {
        r.term: r.df
        for r in text_index.term_stats(
            spark, root, ["alpha", "beta", "gamma", "delta", "zzz"]
        ).collect()
    }
    # alpha: docs 0, 2, 20; beta: 0, 1, 2; gamma: 0, 2, 21; delta: 10, 20
    assert got == {"alpha": 3, "beta": 3, "gamma": 3, "delta": 2}


def test_search_ranked_scores_and_order(spark, built_root):
    """Hand-computed tf-idf on the tiny corpus: score, rounding, and
    the (score DESC, doc_id ASC) cut."""
    import math

    root = built_root
    n = 8.0
    idf_a, idf_d = math.log(n / 3), math.log(n / 2)  # alpha df=3, delta df=2
    got = [
        (r.doc_id, r.score)
        for r in text_index.search_ranked(
            spark, root, ["alpha", "delta"], k=3
        ).collect()
    ]
    want = {
        0: round(2 * idf_a, 4),          # alpha ×2
        2: round(1 * idf_a, 4),
        10: round(3 * idf_d, 4),         # delta ×3
        20: round(1 * idf_a + 1 * idf_d, 4),
    }
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == expect


def test_stream_sink_replay_and_out_of_order(spark, tmp_path):
    """Transactional replay contract: a re-delivered or stale batch id
    is skipped whole, so additive df / corpus-count state is never
    doubled (the reason this sink is batch-id transactional, not
    anti-join deduped: NULL-text docs produce no posting rows to dedup
    on, yet still count toward N)."""
    from ed_housing_data_pipeline_spark.streaming import search as ss

    root = str(tmp_path / "idx")
    text_index.bootstrap_text_index(spark, root, _df(spark, DOCS_A))
    assert ss.sink_text_batch(spark, root, _df(spark, DOCS_B), 0) is True
    pins1 = lake.segment_pins(spark, root)
    assert text_index.corpus_size(spark, root) == 6
    # crash-after-commit replay: same id → skipped, nothing moves
    assert ss.sink_text_batch(spark, root, _df(spark, DOCS_B), 0) is False
    assert text_index.corpus_size(spark, root) == 6
    assert lake.segment_pins(spark, root) == pins1
    # later batch commits; a stale lower id after it is also skipped
    assert ss.sink_text_batch(spark, root, _df(spark, DOCS_C), 1) is True
    assert ss.sink_text_batch(spark, root, _df(spark, DOCS_B), 0) is False
    assert text_index.corpus_size(spark, root) == 8
    got = {
        r.term: r.df
        for r in text_index.term_stats(spark, root, ["delta", "alpha"]).collect()
    }
    assert got == {"delta": 2, "alpha": 3}  # would be 4/4 if replayed


def test_compaction_preserves_search_and_stats(spark, built_root):
    """Compaction folds 3 postings + 3 termstats segments to 1 each
    (stats through the sum reducer); conjunctive, phrase, and ranked
    search results, corpus meta, and bloom-backed term pruning are all
    identical before and after."""
    root = built_root

    def _snapshot():
        return (
            sorted(
                (r.doc_id, r.total_tf)
                for r in text_index.search_all_terms(
                    spark, root, ["alpha", "gamma"]
                ).collect()
            ),
            sorted(
                (r.doc_id, r.n_occ)
                for r in text_index.search_phrase(spark, root, "beta", "beta").collect()
            ),
            [
                (r.doc_id, r.score)
                for r in text_index.search_ranked(
                    spark, root, ["alpha", "delta"], k=4
                ).collect()
            ],
            text_index.corpus_size(spark, root),
        )

    before = _snapshot()
    pins = text_index.compact_text_index(spark, root)
    assert len(pins["postings"]) == 1
    assert len(pins["termstats"]) == 1
    # termstats re-aggregated: still one row per term
    stats = lake.read_segments(spark, f"{root}/termstats", pins["termstats"])
    assert stats.groupBy("term_h").count().filter("count > 1").count() == 0
    assert _snapshot() == before
    # bloom sidecar recomputed for the compacted postings segment:
    # a never-ingested term still prunes everything
    kept, _ = lake.bloom_pruned_pins(spark, root, "postings", "term", ["zzz"])
    assert kept == []


def test_search_bm25_scores_and_order(spark, built_root):
    """Hand-computed BM25 on the tiny corpus: RSJ idf, length
    normalization from doclens + meta avgdl, rounding, and the cut."""
    import math

    root = built_root
    k1, b = text_index.BM25_K1, text_index.BM25_B
    n = 8.0
    # corpus token counts: doc0=4, doc1=3, doc2=3, doc10=4, doc20=2,
    # doc21=4 → total 20; NULL/blank docs are 0-length corpus members
    avgdl = 20.0 / n
    dls = {0: 4, 1: 3, 2: 3, 10: 4, 20: 2, 21: 4}
    tfs = {  # alpha (df=3), delta (df=2)
        0: {"alpha": 2},
        2: {"alpha": 1},
        10: {"delta": 3},
        20: {"alpha": 1, "delta": 1},
    }
    idf = {"alpha": math.log(1 + (n - 3 + 0.5) / (3 + 0.5)),
           "delta": math.log(1 + (n - 2 + 0.5) / (2 + 0.5))}

    def _score(doc):
        s = 0.0
        for term, tf in tfs[doc].items():
            norm = k1 * (1 - b + b * dls[doc] / avgdl)
            s += idf[term] * tf * (k1 + 1) / (tf + norm)
        return round(s, 4)

    want = sorted(
        ((d, _score(d)) for d in tfs), key=lambda kv: (-kv[1], kv[0])
    )[:3]
    got = [
        (r.doc_id, r.score)
        for r in text_index.search_bm25(spark, root, ["alpha", "delta"], k=3).collect()
    ]
    assert got == want


def test_phrase_n_three_words_and_overlap(spark, tmp_path):
    """n-ary phrase fold: 3-word match, overlapping repeats, and the
    n>=2 guard."""
    import pytest

    rows = [
        Row(doc_id=0, text="a b c a b c"),
        Row(doc_id=1, text="a b x c"),
        Row(doc_id=2, text="c c c c"),
    ]
    root = str(tmp_path / "idx")
    text_index.bootstrap_text_index(spark, root, _df(spark, rows))
    got = {
        r.doc_id: r.n_occ
        for r in text_index.search_phrase_n(spark, root, ["a", "b", "c"]).collect()
    }
    assert got == {0: 2}
    rep = {
        r.doc_id: r.n_occ
        for r in text_index.search_phrase_n(spark, root, ["c", "c", "c"]).collect()
    }
    assert rep == {2: 2}  # positions {0,1,2,3}: matches end at 2 and 3
    with pytest.raises(ValueError, match="need >= 2"):
        text_index.search_phrase_n(spark, root, ["a"])


def test_search_at_version_time_travel(spark, tmp_path):
    """Searching at_version=v1 sees exactly the bootstrap corpus, and
    keeps seeing it after more ingests AND compaction-free appends."""
    root = str(tmp_path / "idx")
    text_index.bootstrap_text_index(spark, root, _df(spark, DOCS_A))
    v1 = lake.segment_manifest_versions(spark, root)[0]
    text_index.append_text_batch(spark, root, _df(spark, DOCS_C))
    latest = {
        r.doc_id
        for r in text_index.search_all_terms(spark, root, ["alpha"]).collect()
    }
    assert latest == {0, 2, 20}
    asof = {
        r.doc_id
        for r in text_index.search_all_terms(
            spark, root, ["alpha"], at_version=v1
        ).collect()
    }
    assert asof == {0, 2}


def test_bm25_empty_corpus_degrades(spark, tmp_path):
    """An index bootstrapped on an empty corpus serves empty ranked
    results (no division by zero on avgdl) — the empty-corpus
    degradation contract every doc_* query carries."""
    root = str(tmp_path / "idx")
    text_index.bootstrap_text_index(spark, root, _df(spark, []))
    assert text_index.corpus_size(spark, root) == 0
    assert text_index.search_bm25(spark, root, ["alpha"]).count() == 0
    assert text_index.search_ranked(spark, root, ["alpha"]).count() == 0
    assert text_index.search_all_terms(spark, root, ["alpha"]).count() == 0


def test_concurrent_appenders_never_lose_meta_counts(spark, tmp_path):
    """Two threads append disjoint batches concurrently. The additive
    meta counters (n_docs, total_tokens) are read-modify-write state:
    the commit is pinned to the manifest version the counters were
    read from, so the interleaving loser retries from a fresh read
    instead of silently rebasing — final counts and df must be exact,
    both orderings, every run."""
    import threading

    root = str(tmp_path / "idx")
    text_index.bootstrap_text_index(spark, root, _df(spark, DOCS_A))
    errs = []

    def _append(rows):
        try:
            text_index.append_text_batch(spark, root, _df(spark, rows))
        except Exception as e:  # noqa: BLE001 - surface into the assert
            errs.append(e)

    t1 = threading.Thread(target=_append, args=(DOCS_B,))
    t2 = threading.Thread(target=_append, args=(DOCS_C,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    assert text_index.corpus_size(spark, root) == 8
    meta = lake.segment_meta(spark, root)
    # token totals: A=4+3+3, B=4, C=2+4 → 20
    assert int(meta["total_tokens"]) == 20
    got = {
        r.term: r.df
        for r in text_index.term_stats(
            spark, root, ["alpha", "delta", "gamma"]
        ).collect()
    }
    assert got == {"alpha": 3, "delta": 2, "gamma": 3}
    assert len(lake.segment_pins(spark, root)["postings"]) == 3


def test_search_prefix(spark, built_root):
    import pytest

    root = built_root
    got = {
        r.doc_id: (r.n_terms, r.total_tf)
        for r in text_index.search_prefix(spark, root, "de").collect()
    }
    assert got == {10: (1, 3), 20: (1, 1)}  # delta only
    # "b" matches beta only; "g" matches gamma only
    b = {r.doc_id: r.total_tf for r in text_index.search_prefix(spark, root, "b").collect()}
    assert b == {0: 1, 1: 3, 2: 1}
    multi = {
        r.doc_id: r.n_terms
        for r in text_index.search_prefix(spark, root, "a").collect()
    }
    assert multi == {0: 1, 2: 1, 20: 1}
    assert text_index.search_prefix(spark, root, "zz").count() == 0
    with pytest.raises(ValueError, match="empty prefix"):
        text_index.search_prefix(spark, root, "")


def test_delete_docs_excludes_everywhere_and_adjusts_stats(spark, built_root):
    """A logical delete makes the docs unsearchable through every
    query path in one commit, and keeps every corpus-level statistic
    exact: df (via negative termstats rows), N and total tokens (meta
    counters). Replays and unknown ids are no-ops."""
    root = built_root
    assert text_index.corpus_size(spark, root) == 8

    text_index.delete_docs(spark, root, [0, 21])

    got = {
        r.doc_id: r.total_tf
        for r in text_index.search_all_terms(spark, root, ["alpha", "gamma"]).collect()
    }
    assert got == {2: 2}  # doc 0 deleted; 20/21 never held both terms
    assert {
        r.doc_id for r in text_index.search_prefix(spark, root, "g").collect()
    } == {2}
    ranked = {
        r.doc_id
        for r in text_index.search_ranked(spark, root, ["alpha", "gamma"], k=10).collect()
    }
    assert 0 not in ranked and 21 not in ranked
    bm = {
        r.doc_id
        for r in text_index.search_bm25(spark, root, ["alpha", "gamma"], k=10).collect()
    }
    assert 0 not in bm and 21 not in bm

    # df drops by exactly the deleted docs' term presence
    stats = {
        r.term: r.df
        for r in text_index.term_stats(
            spark, root, ["alpha", "beta", "gamma", "delta", "epsilon"]
        ).collect()
    }
    assert stats == {"alpha": 2, "beta": 2, "gamma": 1, "delta": 2, "epsilon": 1}
    # meta counters: 8 docs - 2; 20 tokens - (4 + 4)
    assert text_index.corpus_size(spark, root) == 6
    assert int(lake.segment_meta(spark, root)["total_tokens"]) == 12

    # replayed delete and never-ingested id: counters unchanged
    text_index.delete_docs(spark, root, [0])
    text_index.delete_docs(spark, root, [999])
    assert text_index.corpus_size(spark, root) == 6
    assert int(lake.segment_meta(spark, root)["total_tokens"]) == 12


def test_delete_all_docs_of_a_term_removes_its_stats_row(spark, built_root):
    root = built_root
    # epsilon appears only in doc 10
    text_index.delete_docs(spark, root, [10])
    assert text_index.term_stats(spark, root, ["epsilon"]).count() == 0
    assert text_index.search_all_terms(spark, root, ["epsilon"]).count() == 0


def test_delete_then_time_travel_still_serves_old_version(spark, built_root):
    """Tombstones are manifest state: a pre-delete manifest version
    still serves the deleted doc (the what-did-we-serve-then audit),
    the committed head does not."""
    root = built_root
    pre = lake.segment_manifest_versions(spark, root)[-1]
    text_index.delete_docs(spark, root, [0])
    head = {
        r.doc_id
        for r in text_index.search_all_terms(spark, root, ["alpha"]).collect()
    }
    assert head == {2, 20}
    asof = {
        r.doc_id
        for r in text_index.search_all_terms(
            spark, root, ["alpha"], at_version=pre
        ).collect()
    }
    assert asof == {0, 2, 20}


def test_compaction_applies_deletes_physically(spark, built_root):
    """With tombstones pinned, compaction IS the physical apply: dead
    rows leave the postings/doclens segments, negative stats fold
    away, the tombstone component resets — and every search result is
    identical before and after (then again after a second, tombstone-
    free compaction)."""
    root = built_root
    text_index.delete_docs(spark, root, [0, 21])

    def _snapshot():
        return (
            sorted(
                (r.doc_id, r.total_tf)
                for r in text_index.search_all_terms(
                    spark, root, ["alpha", "gamma"]
                ).collect()
            ),
            [
                (r.doc_id, r.score)
                for r in text_index.search_bm25(
                    spark, root, ["alpha", "delta"], k=6
                ).collect()
            ],
            sorted(
                (r.doc_id, r.n_terms, r.total_tf)
                for r in text_index.search_prefix(spark, root, "d").collect()
            ),
            sorted(
                (r.term, r.df)
                for r in text_index.term_stats(
                    spark, root, ["alpha", "beta", "gamma", "delta", "epsilon"]
                ).collect()
            ),
            text_index.corpus_size(spark, root),
        )

    before = _snapshot()
    pins = text_index.compact_text_index(spark, root)
    assert _snapshot() == before
    # physically gone: the rewritten postings hold no deleted doc rows
    posts = lake.read_segments(spark, f"{root}/postings", pins["postings"])
    assert posts.filter(posts.doc_id.isin([0, 21])).count() == 0
    lens = lake.read_segments(spark, f"{root}/doclens", pins["doclens"])
    assert lens.filter(lens.doc_id.isin([0, 21])).count() == 0
    # tombstones reset; stats strictly positive, one row per term
    tomb = lake.read_segments(
        spark, f"{root}/deleted_docs", pins["deleted_docs"]
    )
    assert tomb.count() == 0
    stats = lake.read_segments(spark, f"{root}/termstats", pins["termstats"])
    assert stats.filter("df <= 0").count() == 0
    assert stats.groupBy("term_h").count().filter("count > 1").count() == 0
    # a later, tombstone-free compaction takes the plain fold path
    from pyspark.sql import Row as _Row

    text_index.append_text_batch(
        spark, root, _df(spark, [_Row(doc_id=30, text="zeta zeta")])
    )
    pins2 = text_index.compact_text_index(spark, root)
    assert len(pins2["postings"]) == 1
    assert text_index.corpus_size(spark, root) == 7
    assert _snapshot()[0] == before[0]  # new doc holds neither probe term


def test_stream_sink_threshold_compaction_bounds_segments(spark, tmp_path):
    """A long-lived ingest (10 micro-batches through the streaming
    sink's commit path) with compact_every=3 ends with a BOUNDED
    segment count — the threshold policy folds the index whenever the
    postings component reaches the cadence (three times across this
    ingest) — and every search result and statistic is identical to
    an uncompacted twin of the same ingest."""
    from pyspark.sql import Row as _Row

    from ed_housing_data_pipeline_spark.streaming import search as ss

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

    def _batch(i):
        rows = [
            _Row(
                doc_id=100 * i + j,
                text=" ".join(
                    words[(i + j + k) % len(words)] for k in range(3)
                ),
            )
            for j in range(2)
        ]
        return _df(spark, rows)

    compacted = str(tmp_path / "c")
    bulk = str(tmp_path / "p")
    text_index.bootstrap_text_index(spark, compacted, _batch(0))
    for i in range(1, 10):
        assert ss.sink_text_batch(
            spark, compacted, _batch(i), i, compact_every=3
        )
    # the twin is ONE bulk bootstrap over the union — ingest order
    # never affects index content, and a single commit keeps the
    # comparison build cheap (more commits taught nothing)
    union = _batch(0)
    for i in range(1, 10):
        union = union.unionByName(_batch(i))
    text_index.bootstrap_text_index(spark, bulk, union)

    pins_c = lake.segment_pins(spark, compacted)
    assert len(pins_c["postings"]) < 3 + 1  # folded at every threshold hit

    def _state(root):
        return (
            sorted(
                (r.doc_id, r.total_tf)
                for r in text_index.search_all_terms(
                    spark, root, ["alpha", "beta"]
                ).collect()
            ),
            sorted(
                (r.term, r.df)
                for r in text_index.term_stats(spark, root, words).collect()
            ),
            [
                (r.doc_id, r.score)
                for r in text_index.search_bm25(spark, root, words[:3], k=9).collect()
            ],
            text_index.corpus_size(spark, root),
            int(lake.segment_meta(spark, root)["total_tokens"]),
        )

    assert _state(compacted) == _state(bulk)


def test_rarest_first_conjunction_plan_and_results(spark, built_root, monkeypatch):
    """With the corpus-size gate lowered, the conjunction broadcasts
    the rarest term's doc set as a LeftSemi filter (visible in the
    executed plan) and returns exactly the plain plan's results —
    including the short-circuit when a probe term has no live df and
    the interplay with deletes (df read from termstats AFTER the
    negative rows fold in)."""
    root = built_root
    plain = rows_set = {
        (r.doc_id, r.total_tf)
        for r in text_index.search_all_terms(spark, root, ["alpha", "gamma"]).collect()
    }
    monkeypatch.setattr(text_index, "_RAREST_MIN_CORPUS", 1)
    df = text_index.search_all_terms(spark, root, ["alpha", "gamma"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert {(r.doc_id, r.total_tf) for r in df.collect()} == plain
    # zero-df probe term: rarest-first short-circuits to empty
    assert text_index.search_all_terms(spark, root, ["alpha", "zzz"]).count() == 0
    # after deleting every gamma doc but 2, df(gamma)=1 makes gamma the
    # rarest; the conjunction still returns exactly the live match
    text_index.delete_docs(spark, root, [0, 21])
    got = {
        (r.doc_id, r.total_tf)
        for r in text_index.search_all_terms(spark, root, ["alpha", "gamma"]).collect()
    }
    assert got == {(2, 2)}


def test_upsert_replaces_content_atomically(spark, built_root):
    """A revision upsert makes the new content searchable and the old
    unsearchable in ONE commit, with exact df / N / token counters:
    doc 0 ("alpha beta gamma alpha", 4 tokens) becomes "omega beta"
    (2 tokens) — alpha's df drops, omega's appears, beta's is
    unchanged, total_tokens moves by -2, n_docs not at all."""
    root = built_root
    text_index.upsert_text_batch(
        spark, root, _df(spark, [Row(doc_id=0, text="omega beta")])
    )
    assert {
        r.doc_id
        for r in text_index.search_all_terms(spark, root, ["alpha"]).collect()
    } == {2, 20}
    assert {
        r.doc_id
        for r in text_index.search_all_terms(spark, root, ["omega"]).collect()
    } == {0}
    got = {
        r.term: r.df
        for r in text_index.term_stats(
            spark, root, ["alpha", "beta", "omega", "gamma"]
        ).collect()
    }
    # gamma also drops: doc 0's OLD content held it ("…gamma…")
    assert got == {"alpha": 2, "beta": 3, "omega": 1, "gamma": 2}
    assert text_index.corpus_size(spark, root) == 8
    assert int(lake.segment_meta(spark, root)["total_tokens"]) == 18
    # the revised doc has exactly ONE live dl row (BM25's normalizer)
    bm = {
        r.doc_id
        for r in text_index.search_bm25(spark, root, ["omega"], k=5).collect()
    }
    assert bm == {0}


def test_upsert_of_new_id_is_an_ingest(spark, built_root):
    root = built_root
    text_index.upsert_text_batch(
        spark, root, _df(spark, [Row(doc_id=30, text="omega omega")])
    )
    assert text_index.corpus_size(spark, root) == 9
    assert int(lake.segment_meta(spark, root)["total_tokens"]) == 22
    assert {
        r.doc_id
        for r in text_index.search_all_terms(spark, root, ["omega"]).collect()
    } == {30}


def test_upsert_resurrects_a_deleted_id(spark, built_root):
    """delete then upsert: the upsert's sequence outranks the delete's
    watermark, so the NEW revision serves while the pre-delete rows
    stay dead (no resurrection of old content)."""
    root = built_root
    text_index.delete_docs(spark, root, [0])
    assert text_index.corpus_size(spark, root) == 7
    text_index.upsert_text_batch(
        spark, root, _df(spark, [Row(doc_id=0, text="omega")])
    )
    assert text_index.corpus_size(spark, root) == 8
    assert text_index.search_all_terms(spark, root, ["alpha"]).filter(
        "doc_id = 0"
    ).count() == 0  # the OLD content stays dead
    assert {
        r.doc_id
        for r in text_index.search_all_terms(spark, root, ["omega"]).collect()
    } == {0}
    got = {
        r.term: r.df
        for r in text_index.term_stats(spark, root, ["alpha", "omega"]).collect()
    }
    assert got == {"alpha": 2, "omega": 1}


def test_repeated_upserts_last_revision_wins(spark, built_root):
    root = built_root
    for txt in ("omega one", "omega two", "omega three four"):
        text_index.upsert_text_batch(
            spark, root, _df(spark, [Row(doc_id=1, text=txt)])
        )
    assert {
        r.doc_id
        for r in text_index.search_all_terms(spark, root, ["three", "four"]).collect()
    } == {1}
    assert text_index.search_all_terms(spark, root, ["one"]).count() == 0
    assert text_index.search_all_terms(spark, root, ["beta"]).filter(
        "doc_id = 1"
    ).count() == 0
    # tokens: base 20 - 3 (old doc1) + 3 (final "omega three four") = 20
    assert int(lake.segment_meta(spark, root)["total_tokens"]) == 20
    assert text_index.corpus_size(spark, root) == 8


def test_apply_drops_superseded_revisions_physically(spark, built_root):
    root = built_root
    text_index.upsert_text_batch(
        spark, root, _df(spark, [Row(doc_id=0, text="omega beta")])
    )
    text_index.delete_docs(spark, root, [21])

    def _snap():
        return (
            sorted(
                (r.doc_id, r.total_tf)
                for r in text_index.search_all_terms(
                    spark, root, ["beta"]
                ).collect()
            ),
            sorted(
                (r.term, r.df)
                for r in text_index.term_stats(
                    spark, root, ["alpha", "beta", "gamma", "omega"]
                ).collect()
            ),
            [
                (r.doc_id, r.score)
                for r in text_index.search_bm25(
                    spark, root, ["omega", "gamma"], k=6
                ).collect()
            ],
            text_index.corpus_size(spark, root),
        )

    before = _snap()
    pins = text_index.compact_text_index(spark, root)
    assert _snap() == before
    posts = lake.read_segments(spark, f"{root}/postings", pins["postings"])
    # doc 0's only physical rows are the revision's (omega, beta)
    assert sorted(
        r.term for r in posts.filter("doc_id = 0").collect()
    ) == ["beta", "omega"]
    assert posts.filter("doc_id = 21").count() == 0
    lens = lake.read_segments(spark, f"{root}/doclens", pins["doclens"])
    assert lens.filter("doc_id = 0").count() == 1


def test_stream_upsert_sink_replay_is_exactly_once(spark, built_root):
    """A replayed revision micro-batch is skipped WHOLE: an upsert
    re-run would tombstone its own prior commit's rows and re-apply
    the df/token deltas — the batch-id-in-meta transaction makes the
    decision and the data commit one rename, so counters and search
    results are byte-stable across re-delivery."""
    from ed_housing_data_pipeline_spark.streaming import search as ss

    root = built_root
    rev = _df(spark, [Row(doc_id=0, text="omega beta")])
    assert ss.sink_text_upsert_batch(spark, root, rev, 0) is True
    pins1 = lake.segment_pins(spark, root)
    meta1 = lake.segment_meta(spark, root)
    # crash-after-commit replay: same id -> skipped, nothing moves
    assert ss.sink_text_upsert_batch(spark, root, rev, 0) is False
    assert lake.segment_pins(spark, root) == pins1
    assert lake.segment_meta(spark, root) == meta1
    got = {
        r.term: r.df
        for r in text_index.term_stats(spark, root, ["alpha", "omega"]).collect()
    }
    assert got == {"alpha": 2, "omega": 1}  # not double-applied
    # a later revision commits; a stale lower id after it is skipped
    assert ss.sink_text_upsert_batch(
        spark, root, _df(spark, [Row(doc_id=0, text="zeta")]), 1
    ) is True
    assert ss.sink_text_upsert_batch(spark, root, rev, 0) is False
    assert {
        r.doc_id
        for r in text_index.search_all_terms(spark, root, ["zeta"]).collect()
    } == {0}
    assert text_index.search_all_terms(spark, root, ["omega"]).count() == 0
