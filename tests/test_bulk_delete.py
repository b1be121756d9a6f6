"""DataFrame-scale take-downs across the three id-keyed index
families (text_index / incr_index / ann_index) plus the shared
tombstone-pressure machinery.

Pinned properties:
- ``delete_from(ids_df)`` is value-identical to the list-path
  ``delete_docs`` over the same delete set — tombstones, negative
  stats, meta counters — with the delete set never collected to the
  driver (the tombstone segment is built FROM the frame).
- ``delete_where(predicate)`` derives its delete set from the pinned
  index rows, never a driver list.
- every delete/upsert commit maintains the shared
  ``lake.TOMBSTONE_ROWS_KEY`` meta counter; the physical apply resets
  it — so serving paths and sinks can bound the liveness fold and
  trigger compaction on tombstone pressure without a job.
- past the broadcast bound the liveness fold degrades to a non-
  broadcast join with identical results.
- the sinks' ``compact_dead`` policy compacts on tombstone pressure
  even when the segment-count policy would never fire (churn-heavy,
  few segments), keeping results byte-identical.
"""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from ed_housing_data_pipeline_spark.operators import (
    ann_index,
    incr_index,
    text_index,
)
from ed_housing_data_pipeline_spark.sources import lake
from ed_housing_data_pipeline_spark.streaming import search as ssearch

from tests.test_ann_index import CENTS, CODEBOOKS, _vecs
from tests.test_text_index import DOCS_A, DOCS_B, DOCS_C, _build, _df

import pytest


@pytest.fixture(scope="module")
def _base_text_idx(spark, tmp_path_factory):
    """The canonical 3-commit text index, built once; tests copy the
    tree (root-relative layout) before mutating it."""
    root = str(tmp_path_factory.mktemp("bulkdel_base") / "idx")
    _build(spark, root)
    return root


def _copy_idx(base: str, dest: str) -> str:
    import shutil

    shutil.copytree(base, dest)
    return dest


def _search_state(spark, root, terms=("alpha", "delta", "gamma", "beta")):
    """Order-insensitive snapshot of every text-search surface."""
    return {
        "and": sorted(
            tuple(r)
            for r in text_index.search_all_terms(
                spark, root, ["alpha", "gamma"]
            ).collect()
        ),
        "bm25": [
            tuple(r)
            for r in text_index.search_bm25(spark, root, list(terms)).collect()
        ],
        "stats": sorted(
            tuple(r)
            for r in text_index.term_stats(spark, root, list(terms)).collect()
        ),
        "prefix": sorted(
            tuple(r) for r in text_index.search_prefix(spark, root, "a").collect()
        ),
        "meta": {
            k: v
            for k, v in lake.segment_meta(spark, root).items()
            if k in ("n_docs", "total_tokens", lake.TOMBSTONE_ROWS_KEY)
        },
    }


def test_text_delete_from_matches_delete_docs(spark, tmp_path, _base_text_idx):
    """Same delete set through the list path and the DataFrame path →
    identical search results, stats, and meta counters."""
    root_list = _copy_idx(_base_text_idx, str(tmp_path / "a"))
    root_df = _copy_idx(_base_text_idx, str(tmp_path / "b"))
    dead = [0, 10, 20]
    text_index.delete_docs(spark, root_list, dead)
    ids_df = spark.createDataFrame([(i,) for i in dead], "doc_id bigint")
    text_index.delete_from(spark, root_df, ids_df)
    assert _search_state(spark, root_list) == _search_state(spark, root_df)
    meta = lake.segment_meta(spark, root_df)
    assert int(meta[lake.TOMBSTONE_ROWS_KEY]) == len(dead)


def test_text_delete_from_filter_over_corpus(spark, tmp_path, _base_text_idx):
    """The verdict shape: the delete set is a FILTER over the corpus
    table (doc_id % 2 == 0), tombstoned without any driver-side id
    list; results equal an index built from the surviving docs."""
    root = _copy_idx(_base_text_idx, str(tmp_path / "idx"))
    all_docs = _df(spark, DOCS_A + DOCS_B + DOCS_C)
    text_index.delete_from(
        spark, root, all_docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    )
    fresh = str(tmp_path / "fresh")
    text_index.bootstrap_text_index(
        spark, fresh, all_docs.filter(F.col("doc_id") % 2 != 0)
    )
    for terms in (["alpha", "gamma"], ["delta"]):
        assert sorted(
            tuple(r)
            for r in text_index.search_all_terms(spark, root, terms).collect()
        ) == sorted(
            tuple(r)
            for r in text_index.search_all_terms(spark, fresh, terms).collect()
        )
    # deleted-id tombstones cover exactly the filtered ids
    pins = lake.segment_pins(spark, root)
    tomb = lake.read_segments(
        spark, f"{root}/{text_index.TOMBSTONES}", pins[text_index.TOMBSTONES]
    )
    assert {r.doc_id for r in tomb.collect()} == {0, 2, 10, 12, 20}


def test_text_delete_where_by_term(spark, tmp_path, _base_text_idx):
    """Predicate take-down over the index's own posting rows: every
    live doc containing 'delta' dies; its stats rows vanish."""
    root = _copy_idx(_base_text_idx, str(tmp_path / "idx"))
    text_index.delete_where(spark, root, F.col("term") == "delta")
    assert text_index.search_all_terms(spark, root, ["delta"]).count() == 0
    stats = {
        r.term: r.df
        for r in text_index.term_stats(
            spark, root, ["delta", "alpha", "epsilon"]
        ).collect()
    }
    assert "delta" not in stats and "epsilon" not in stats
    # docs 10 (delta epsilon...) and 20 (alpha delta) died; alpha
    # survives only in docs 0 and 2
    assert stats["alpha"] == 2
    got = {
        r.doc_id
        for r in text_index.search_all_terms(spark, root, ["alpha"]).collect()
    }
    assert got == {0, 2}


def test_counter_lifecycle_reset_on_apply(spark, tmp_path, _base_text_idx):
    """n_tombstones accumulates across delete + upsert commits and
    resets to 0 when the physical apply empties the component."""
    root = _copy_idx(_base_text_idx, str(tmp_path / "idx"))
    text_index.delete_docs(spark, root, [0, 10])
    assert int(lake.segment_meta(spark, root)[lake.TOMBSTONE_ROWS_KEY]) == 2
    rev = spark.createDataFrame(
        [Row(doc_id=2, text="revised text here")], "doc_id bigint, text string"
    )
    text_index.upsert_text_batch(spark, root, rev)
    assert int(lake.segment_meta(spark, root)[lake.TOMBSTONE_ROWS_KEY]) == 3
    before = _search_state(spark, root)
    text_index.apply_text_deletes(spark, root)
    after = _search_state(spark, root)
    assert int(lake.segment_meta(spark, root)[lake.TOMBSTONE_ROWS_KEY]) == 0
    before.pop("meta")
    after.pop("meta")
    assert before == after


def test_live_fold_shuffle_fallback_identical_results(spark, tmp_path, monkeypatch, _base_text_idx):
    """Past the broadcast bound the liveness fold joins WITHOUT the
    broadcast hint (no BroadcastHashJoin on the watermark side is
    FORCED; AQE may still pick one at runtime, so we assert on the
    results and on the fold running at all) — results identical to the
    broadcast plan."""
    root = _copy_idx(_base_text_idx, str(tmp_path / "idx"))
    text_index.delete_docs(spark, root, [0, 10])
    broadcast_state = _search_state(spark, root)
    monkeypatch.setattr(text_index, "_LIVE_BROADCAST_MAX_ROWS", 0)
    shuffle_state = _search_state(spark, root)
    assert broadcast_state == shuffle_state
    # the gate actually reads the counter: with the bound at 0 the
    # logical plan must carry no broadcast hint on the watermark fold
    pins, _blooms, meta = text_index._index_state(spark, root)
    posts = lake.read_segments(
        spark, f"{root}/{text_index.COMPONENT}", pins[text_index.COMPONENT]
    )
    plan = text_index._live(
        spark, root, posts, pins, meta
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in plan  # hints are erased into join strategy
    monkeypatch.setattr(text_index, "_LIVE_BROADCAST_MAX_ROWS", 2_000_000)


# --- incr_index (LSH dedup) family -----------------------------------

DOC_ROWS = [(i, 0, f"k{i % 3}") for i in range(9)]


def _lsh_build(spark, root, with_docs=True):
    bands = spark.createDataFrame(DOC_ROWS, "doc_id bigint, band int, key string")
    shingles = spark.createDataFrame(
        [(i, [f"sh{i}"]) for i in range(9)], "doc_id bigint, _sh array<string>"
    )
    frames = {"bands": bands, "shingles": shingles}
    if with_docs:
        frames["docs"] = spark.createDataFrame(
            [(i, "web" if i % 2 == 0 else "books") for i in range(9)],
            "doc_id bigint, source string",
        )
    incr_index.bootstrap_index(spark, root, frames, max_bucket_width=2)


def _lsh_state(spark, root):
    idx = incr_index.read_index(spark, root)
    return {
        name: sorted(tuple(r) for r in df.collect()) for name, df in idx.items()
    }


def test_incr_delete_from_matches_delete_docs(spark, tmp_path):
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    _lsh_build(spark, ra)
    _lsh_build(spark, rb)
    dead = [0, 3, 6]
    incr_index.delete_docs(spark, ra, dead)
    incr_index.delete_from(
        spark, rb, spark.createDataFrame([(i,) for i in dead], "doc_id bigint")
    )
    assert _lsh_state(spark, ra) == _lsh_state(spark, rb)
    assert int(
        lake.segment_meta(spark, rb)[lake.TOMBSTONE_ROWS_KEY]
    ) == len(dead)


def test_incr_delete_where_over_docs_component(spark, tmp_path):
    """Predicate over the stored docs projection: 'delete every doc
    from source web' without a driver id list."""
    root = str(tmp_path / "idx")
    _lsh_build(spark, root)
    incr_index.delete_where(spark, root, F.col("source") == "web")
    idx = incr_index.read_index(spark, root)
    live = {r.doc_id for r in idx["docs"].collect()}
    assert live == {1, 3, 5, 7}
    assert {r.doc_id for r in idx["bands"].collect()} == live
    # stop set equals a full recompute over the live bands (negative
    # deltas un-stopped buckets whose width fell under the cap)
    from ed_housing_data_pipeline_spark.operators import similarity as sim

    expect = {
        (r["band"], r["key"], r["_bw"], r["_ns"])
        for r in sim.oversized_bucket_stats(
            idx["bands"], ["band", "key"], 2
        ).collect()
    }
    got = {
        (r["band"], r["key"], r["_bw"], r["_ns"])
        for r in idx["stopbands"].collect()
    }
    assert got == expect


def test_incr_delete_where_without_docs_raises(spark, tmp_path):
    root = str(tmp_path / "idx")
    _lsh_build(spark, root, with_docs=False)
    try:
        incr_index.delete_where(spark, root, F.col("source") == "web")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "docs" in str(e)


# --- ann_index (IVF-PQ) family ---------------------------------------


def _ann_build(spark, root):
    ann_index.bootstrap_ann_index(
        spark,
        root,
        _vecs(spark, range(12)),
        "embedding",
        "vec_id",
        cents=CENTS,
        codebooks=CODEBOOKS,
        segment_partitions=2,
    )


def _ann_state(spark, root):
    return {
        "vecs": sorted(
            (r.id, r.cell, tuple(r.codes))
            for r in ann_index.read_ann_vectors(spark, root).collect()
        ),
        "cells": sorted(
            tuple(r) for r in ann_index.ann_cell_stats(spark, root).collect()
        ),
    }


def test_ann_delete_from_matches_delete(spark, tmp_path):
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    _ann_build(spark, ra)
    _ann_build(spark, rb)
    dead = [0, 4, 8]
    ann_index.delete_ann_vectors(spark, ra, dead)
    ann_index.delete_from(
        spark, rb, spark.createDataFrame([(i,) for i in dead], "id bigint")
    )
    assert _ann_state(spark, ra) == _ann_state(spark, rb)
    assert int(
        lake.segment_meta(spark, rb)[lake.TOMBSTONE_ROWS_KEY]
    ) == len(dead)
    # physical apply resets the counter, content-neutrally
    before = _ann_state(spark, rb)
    ann_index.apply_ann_deletes(spark, rb)
    assert _ann_state(spark, rb) == before
    assert int(lake.segment_meta(spark, rb)[lake.TOMBSTONE_ROWS_KEY]) == 0


def test_ann_delete_where_by_cell(spark, tmp_path):
    """Retire a whole inverted list by predicate over the index rows."""
    root = str(tmp_path / "idx")
    _ann_build(spark, root)
    cells = {r.id: r.cell for r in ann_index.read_ann_vectors(spark, root).collect()}
    victim = cells[0]
    ann_index.delete_where(spark, root, F.col("cell") == victim)
    live = ann_index.read_ann_vectors(spark, root)
    assert live.filter(F.col("cell") == victim).count() == 0
    assert {r.id for r in live.collect()} == {
        i for i, c in cells.items() if c != victim
    }
    stats = {r.cell: r.n_vectors for r in ann_index.ann_cell_stats(spark, root).collect()}
    assert victim not in stats


# --- sink tombstone-pressure trigger ---------------------------------


def test_sink_compacts_on_tombstone_pressure(spark, tmp_path):
    """Churn-heavy, few segments: upsert micro-batches against a
    2-segment index with the segment policy OFF and compact_dead=4.
    The pressure trigger must fire, physically apply the deletes
    (tombstone component empty, counter reset) and keep results
    byte-identical to an index that never compacted."""
    root = str(tmp_path / "churn")
    ref = str(tmp_path / "ref")
    for r in (root, ref):
        text_index.bootstrap_text_index(spark, r, _df(spark, DOCS_A))
        text_index.append_text_batch(spark, r, _df(spark, DOCS_B))
    # 3 waves of 2-doc revisions: 6 tombstone rows total; trigger at 4
    waves = [
        [Row(doc_id=0, text="alpha rewritten"), Row(doc_id=1, text="beta kept")],
        [Row(doc_id=2, text="gamma only"), Row(doc_id=10, text="delta gone now")],
        [Row(doc_id=0, text="alpha final"), Row(doc_id=12, text="new words")],
    ]
    for i, wave in enumerate(waves):
        assert ssearch.sink_text_upsert_batch(
            spark, root, _df(spark, wave), i, compact_every=None, compact_dead=4
        )
        text_index.upsert_text_batch(spark, ref, _df(spark, wave))
    # pressure fired: counter reset, tombstones physically applied
    meta = lake.segment_meta(spark, root)
    assert int(meta[lake.TOMBSTONE_ROWS_KEY]) < 6
    a, b = _search_state(spark, root), _search_state(spark, ref)
    a["meta"].pop(lake.TOMBSTONE_ROWS_KEY)
    b["meta"].pop(lake.TOMBSTONE_ROWS_KEY)
    assert a == b
