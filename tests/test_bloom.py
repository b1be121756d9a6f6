"""Bloom-sidecar segment skipping: never false-negative point-lookup
pruning on the segmented-commit protocol, with sidecars that are
advertised in the manifest blob, recomputed by compaction, skipped
(conservatively) when over budget, and swept with their segments."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from ed_housing_data_pipeline_spark.sources import lake
from tests.conftest import rows


def _batch(spark, lo: int, hi: int):
    return spark.createDataFrame(
        [Row(doc_id=f"doc-{i:05d}", v=i) for i in range(lo, hi)],
        "doc_id string, v bigint",
    )


def _ingest(spark, root, ranges=((0, 50), (50, 100), (100, 150))):
    for i, (lo, hi) in enumerate(ranges):
        lake.append_segments(
            spark,
            root,
            appends={"docs": _batch(spark, lo, hi).coalesce(1)},
            init=(i == 0),
            bloom_cols={"docs": ["doc_id"]},
        )


def test_sidecars_written_and_advertised(spark, tmp_path):
    root = str(tmp_path / "bl")
    _ingest(spark, root)
    pins = lake.segment_pins(spark, root)
    blooms = lake.segment_blooms(spark, root)
    assert set(blooms["docs"]) == set(pins["docs"])
    assert all(cols == ["doc_id"] for cols in blooms["docs"].values())


def test_point_lookup_prunes_and_never_misses(spark, tmp_path):
    root = str(tmp_path / "bl")
    _ingest(spark, root)
    kept, pinned = lake.bloom_pruned_pins(
        spark, root, "docs", "doc_id", ["doc-00123"]
    )
    assert len(pinned) == 3
    # the owning segment MUST be kept (no false negative); at 1% fpp
    # the other two are almost surely dropped, but only the upper
    # bound is a hard contract
    assert 1 <= len(kept) < 3
    got = lake.read_segments_bloom_pruned(
        spark, root, "docs", "doc_id", ["doc-00123"]
    ).filter(F.col("doc_id") == "doc-00123")
    assert rows(got) == [("doc-00123", 123)]
    # every single id is findable through its pruned scan
    kept_all, _ = lake.bloom_pruned_pins(
        spark, root, "docs", "doc_id", [f"doc-{i:05d}" for i in range(0, 150, 10)]
    )
    assert len(kept_all) == 3  # probe set spans all segments


def test_absent_value_prunes_everything(spark, tmp_path):
    root = str(tmp_path / "bl")
    _ingest(spark, root, ranges=((0, 30), (30, 60)))
    kept, pinned = lake.bloom_pruned_pins(
        spark, root, "docs", "doc_id", ["no-such-document"]
    )
    assert len(pinned) == 2
    # 1% fpp per segment: overwhelmingly both pruned; hard contract is
    # only that the pruned read still returns the right (empty) answer
    got = lake.read_segments_bloom_pruned(
        spark, root, "docs", "doc_id", ["no-such-document"]
    ).filter(F.col("doc_id") == "no-such-document")
    assert got.count() == 0


def test_unbloomed_segments_are_kept(spark, tmp_path):
    root = str(tmp_path / "bl")
    lake.append_segments(  # committed WITHOUT bloom_cols
        spark, root, appends={"docs": _batch(spark, 0, 20).coalesce(1)}, init=True
    )
    lake.append_segments(
        spark,
        root,
        appends={"docs": _batch(spark, 20, 40).coalesce(1)},
        bloom_cols={"docs": ["doc_id"]},
    )
    kept, pinned = lake.bloom_pruned_pins(
        spark, root, "docs", "doc_id", ["zzz-absent"]
    )
    assert len(pinned) == 2 and len(kept) >= 1  # stat-less one stays


def test_over_budget_segment_stays_unadvertised(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(lake, "_BLOOM_MAX_ROWS", 10)
    root = str(tmp_path / "bl")
    _ingest(spark, root, ranges=((0, 50),))
    assert lake.segment_blooms(spark, root) == {}
    kept, pinned = lake.bloom_pruned_pins(
        spark, root, "docs", "doc_id", ["zzz-absent"]
    )
    assert kept == pinned  # conservative: no sidecar, no pruning


def test_compaction_rebloooms_the_folded_segment(spark, tmp_path):
    root = str(tmp_path / "bl")
    _ingest(spark, root)
    lake.compact_segments(spark, root)
    pins = lake.segment_pins(spark, root)
    blooms = lake.segment_blooms(spark, root)
    (seg,) = pins["docs"]
    assert set(blooms["docs"]) == {seg}
    got = lake.read_segments_bloom_pruned(
        spark, root, "docs", "doc_id", ["doc-00007"]
    ).filter(F.col("doc_id") == "doc-00007")
    assert rows(got) == [("doc-00007", 7)]


def test_expire_sweeps_sidecars_with_segments(spark, tmp_path):
    root = str(tmp_path / "bl")
    _ingest(spark, root)
    lake.compact_segments(spark, root)
    dropped = lake.expire_segments(
        spark, root, keep_manifests=1, orphan_grace_sec=0.0, reader_grace_sec=0.0
    )
    assert len(dropped.get("docs", [])) == 3
    import os

    leftover = [
        f
        for f in os.listdir(tmp_path / "bl" / "docs")
        if f.startswith("_BLOOM.s")
    ]
    pins = lake.segment_pins(spark, root)
    want = {f"_BLOOM.s{seg}.doc_id.json" for seg in pins["docs"]}
    assert set(leftover) == want  # only the live segment's sidecar


def test_all_null_column_gets_empty_always_pruning_bloom(spark, tmp_path):
    root = str(tmp_path / "bl")
    df = spark.createDataFrame(
        [Row(doc_id=None, v=i) for i in range(5)], "doc_id string, v bigint"
    )
    lake.append_segments(
        spark,
        root,
        appends={"docs": df.coalesce(1)},
        init=True,
        bloom_cols={"docs": ["doc_id"]},
    )
    kept, pinned = lake.bloom_pruned_pins(
        spark, root, "docs", "doc_id", ["anything"]
    )
    assert kept == [] and len(pinned) == 1


def test_registered_point_lookup_actually_prunes(spark):
    """Query-level pin of the skipping claim: the doc_point_lookup
    corpus (4 doc_id-ordered segments) must plan fewer segments than
    it pins for the fixed lookup ids."""
    from ed_housing_data_pipeline_spark.plans import queries_core as qc

    sf = "/root/testdata/sf0.001"
    got = rows(qc.q_doc_point_lookup(spark, sf), "doc_id")
    assert got == [(i,) for i in sorted(qc.LOOKUP_IDS)]
    root = qc._DOC_SEG_DIR[(sf,)].name
    kept, pinned = lake.bloom_pruned_pins(
        spark, root, "docs", "doc_id", list(qc.LOOKUP_IDS)
    )
    assert len(pinned) == 4
    assert len(kept) < len(pinned)
