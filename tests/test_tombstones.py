"""Tombstone deletes on append-only segments: logical delete =
O(delete-set) tombstone append, reads subtract, physical apply
rewrites atomically (data + tombstone reset in one manifest flip),
and the metadata planes (zonemaps, blooms, _meta) survive the apply.
Completes the GDPR shape: bloom point-lookup finds, tombstone delete
removes, apply + retention forget."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from ed_housing_data_pipeline_spark.sources import lake
from tests.conftest import rows


def _corpus(spark, root):
    for i, (lo, hi) in enumerate(((0, 40), (40, 80))):
        lake.append_segments(
            spark,
            root,
            appends={
                "docs": spark.createDataFrame(
                    [Row(doc_id=j, v=float(j)) for j in range(lo, hi)],
                    "doc_id bigint, v double",
                ).coalesce(1)
            },
            init=(i == 0),
            zone_cols={"docs": ["doc_id"]},
            bloom_cols={"docs": ["doc_id"]},
        )


def test_logical_delete_subtracts_without_touching_segments(spark, tmp_path):
    root = str(tmp_path / "t")
    _corpus(spark, root)
    before = lake.segment_pins(spark, root)["docs"]
    lake.delete_rows(spark, root, "docs", "doc_id", [3, 41, 77])
    assert lake.segment_pins(spark, root)["docs"] == before  # data untouched
    live = lake.read_segmented_live(spark, root, "docs", "doc_id")
    assert live.count() == 77
    assert rows(live.filter(F.col("doc_id").isin([3, 41, 77]))) == []
    # deleting again is additive and idempotent on content
    lake.delete_rows(spark, root, "docs", "doc_id", [77, 5])
    assert lake.read_segmented_live(spark, root, "docs", "doc_id").count() == 76


def test_no_tombstones_reads_passthrough(spark, tmp_path):
    root = str(tmp_path / "t")
    _corpus(spark, root)
    assert lake.read_segmented_live(spark, root, "docs", "doc_id").count() == 80


def test_apply_tombstones_rewrites_atomically_and_rebuilds_stats(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    _corpus(spark, root)
    lake.delete_rows(spark, root, "docs", "doc_id", [0, 39, 40, 79])
    lake.apply_tombstones(spark, root, "docs", "doc_id")
    pins = lake.segment_pins(spark, root)
    assert len(pins["docs"]) == 1
    data = lake.read_segmented_components(spark, root, ["docs"])["docs"]
    assert data.count() == 76  # physically gone from the pinned scan
    # zonemap recomputed for the live range, bloom rebuilt
    (seg,) = pins["docs"]
    assert lake.segment_zones(spark, root)["docs"][seg]["doc_id"][:2] == [1, 78]
    kept, pinned = lake.bloom_pruned_pins(spark, root, "docs", "doc_id", [39])
    # 39 is deleted; its bloom entry is gone from the rebuilt sidecar
    assert kept == []
    # tombstone component reset: live read equals raw read
    assert (
        lake.read_segmented_live(spark, root, "docs", "doc_id").count() == 76
    )
    # later deletes start a fresh tombstone set
    lake.delete_rows(spark, root, "docs", "doc_id", [50])
    assert (
        lake.read_segmented_live(spark, root, "docs", "doc_id").count() == 75
    )


def test_delete_races_ingest_loudly(spark, tmp_path, monkeypatch):
    """A delete whose manifest base moved (a concurrent ingest landed
    mid-delete) must conflict, not drop the ingest's pins."""
    import pytest

    root = str(tmp_path / "t")
    _corpus(spark, root)
    real_commit = lake.commit_segment_manifest
    state = {"armed": True}

    def ingest_lands_first(*args, **kwargs):
        if state["armed"]:
            state["armed"] = False
            lake.append_segments(
                spark,
                root,
                appends={
                    "docs": spark.createDataFrame(
                        [Row(doc_id=900, v=9.0)], "doc_id bigint, v double"
                    ).coalesce(1)
                },
            )
        return real_commit(*args, **kwargs)

    monkeypatch.setattr(lake, "commit_segment_manifest", ingest_lands_first)
    with pytest.raises(lake.ConcurrentCommitError):
        lake.delete_rows(spark, root, "docs", "doc_id", [1])
    monkeypatch.setattr(lake, "commit_segment_manifest", real_commit)
    # the mid-flight ingest survived; the failed delete is invisible
    assert lake.read_segmented_live(spark, root, "docs", "doc_id").count() == 81
    # retry lands the delete exactly once
    lake.delete_rows(spark, root, "docs", "doc_id", [1])
    assert lake.read_segmented_live(spark, root, "docs", "doc_id").count() == 80
