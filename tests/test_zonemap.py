"""Zonemap (min/max segment statistics) data skipping on the
segmented-commit protocol.

The contract under test: ``append_segments(zone_cols=...)`` commits
per-segment ``[min, max, n_nulls]`` column stats INTO the manifest
blob; ``zone_pruned_pins`` plans a range read entirely from that
driver-side metadata (no Spark job); the pruned scan + row predicate
is value-identical to the full scan + row predicate; and the pruning
is conservative (stat-less segments kept, all-NULL segments dropped,
pre-zonemap manifests keep working).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from ed_housing_data_pipeline_spark.sources import lake
from tests.conftest import rows


def _batch(spark, lo: int, hi: int, ts_day: int | None = None):
    data = [
        Row(
            k=i,
            v=float(i),
            ts=(
                None
                if ts_day is None
                else dt.datetime(2024, 1, ts_day, i % 24, 0, 0)
            ),
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(data, "k bigint, v double, ts timestamp")


def _ingest_three(spark, root: str) -> None:
    """Three disjoint-k batches with disjoint ts days: k∈[0,10) day 1,
    k∈[10,20) day 2, k∈[20,30) day 3."""
    lake.append_segments(
        spark,
        root,
        appends={"data": _batch(spark, 0, 10, ts_day=1).coalesce(1)},
        init=True,
        zone_cols={"data": ["k", "ts"]},
    )
    for lo, day in ((10, 2), (20, 3)):
        lake.append_segments(
            spark,
            root,
            appends={"data": _batch(spark, lo, lo + 10, ts_day=day).coalesce(1)},
            zone_cols={"data": ["k", "ts"]},
        )


def test_zone_stats_recorded_per_segment(spark, tmp_path):
    root = str(tmp_path / "zl")
    _ingest_three(spark, root)
    pins = lake.segment_pins(spark, root)
    zones = lake.segment_zones(spark, root)
    assert set(zones["data"]) == set(pins["data"])
    ordered = [zones["data"][s] for s in pins["data"]]
    assert [st["k"][:2] for st in ordered] == [[0, 9], [10, 19], [20, 29]]
    # timestamps round-trip as lexicographically-ordered strings
    assert ordered[0]["ts"][0].startswith("2024-01-01")
    assert ordered[2]["ts"][1].startswith("2024-01-03")
    assert all(st["k"][2] == 0 for st in ordered)  # n_nulls


def test_pruned_read_equals_full_filtered_read(spark, tmp_path):
    root = str(tmp_path / "zl")
    _ingest_three(spark, root)
    kept, pinned = lake.zone_pruned_pins(spark, root, "data", "k", lo=12, hi=14)
    assert len(pinned) == 3 and len(kept) == 1
    pruned = lake.read_segments_zone_pruned(
        spark, root, "data", "k", lo=12, hi=14
    ).filter(F.col("k").between(12, 14))
    full = (
        lake.read_segmented_components(spark, root, ["data"])["data"]
        .filter(F.col("k").between(12, 14))
    )
    assert rows(pruned) == rows(full)
    assert rows(pruned, "k") == [(12,), (13,), (14,)]


def test_timestamp_range_prunes_chronologically(spark, tmp_path):
    root = str(tmp_path / "zl")
    _ingest_three(spark, root)
    kept, pinned = lake.zone_pruned_pins(
        spark,
        root,
        "data",
        "ts",
        lo=dt.datetime(2024, 1, 2, 0, 0, 0),
        hi=dt.datetime(2024, 1, 2, 23, 59, 59),
    )
    assert len(kept) == 1
    got = lake.read_segments(spark, f"{root}/data", kept)
    assert rows(got.select(F.min("k"), F.max("k"))) == [(10, 19)]
    # string bounds in the normalized form prune identically
    kept2, _ = lake.zone_pruned_pins(
        spark, root, "data", "ts", lo="2024-01-02 00:00:00", hi="2024-01-02 23:59:59"
    )
    assert kept2 == kept


def test_half_open_ranges_and_no_match(spark, tmp_path):
    root = str(tmp_path / "zl")
    _ingest_three(spark, root)
    kept_ge, _ = lake.zone_pruned_pins(spark, root, "data", "k", lo=10)
    assert len(kept_ge) == 2
    kept_le, _ = lake.zone_pruned_pins(spark, root, "data", "k", hi=9)
    assert len(kept_le) == 1
    kept_none, pinned = lake.zone_pruned_pins(spark, root, "data", "k", lo=1000)
    assert kept_none == []
    empty = lake.read_segments_zone_pruned(spark, root, "data", "k", lo=1000)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["k", "v", "ts"]


def test_unzoned_segments_are_conservatively_kept(spark, tmp_path):
    """A manifest mixing pre-zonemap segments (no stats) with zoned
    ones must keep the stat-less segments under every predicate."""
    root = str(tmp_path / "zl")
    lake.append_segments(  # committed WITHOUT zone_cols
        spark, root, appends={"data": _batch(spark, 0, 10).coalesce(1)}, init=True
    )
    lake.append_segments(
        spark,
        root,
        appends={"data": _batch(spark, 10, 20).coalesce(1)},
        zone_cols={"data": ["k"]},
    )
    kept, pinned = lake.zone_pruned_pins(spark, root, "data", "k", lo=50)
    assert len(pinned) == 2 and len(kept) == 1  # stat-less one kept
    zones = lake.segment_zones(spark, root)
    assert len(zones["data"]) == 1


def test_all_null_column_segment_is_skipped(spark, tmp_path):
    root = str(tmp_path / "zl")
    lake.append_segments(
        spark,
        root,
        appends={"data": _batch(spark, 0, 5, ts_day=None).coalesce(1)},
        init=True,
        zone_cols={"data": ["ts"]},
    )
    zones = lake.segment_zones(spark, root)
    (stats,) = zones["data"].values()
    assert stats["ts"] == [None, None, 5]
    kept, _ = lake.zone_pruned_pins(
        spark, root, "data", "ts", lo="2024-01-01 00:00:00"
    )
    assert kept == []


def test_compaction_recomputes_zone_stats(spark, tmp_path):
    root = str(tmp_path / "zl")
    _ingest_three(spark, root)
    lake.compact_segments(spark, root)
    pins = lake.segment_pins(spark, root)
    zones = lake.segment_zones(spark, root)
    assert len(pins["data"]) == 1
    (seg,) = pins["data"]
    assert zones["data"][seg]["k"][:2] == [0, 29]
    assert set(zones["data"]) == {seg}  # folded-away stats dropped
    kept, _ = lake.zone_pruned_pins(spark, root, "data", "k", lo=5, hi=6)
    assert kept == [seg]


def test_plain_manifests_still_parse_and_expire(spark, tmp_path):
    """Back-compat both ways: a zoned manifest parses through every
    pin reader, and expire_segments tolerates the _zones key while
    sweeping unpinned segments."""
    root = str(tmp_path / "zl")
    _ingest_three(spark, root)
    lake.compact_segments(spark, root)
    pins, version = lake.segment_pins_versioned(spark, root)
    assert version == 4 and len(pins["data"]) == 1
    dropped = lake.expire_segments(
        spark, root, keep_manifests=1, orphan_grace_sec=0.0, reader_grace_sec=0.0
    )
    assert len(dropped.get("data", [])) == 3
    got = lake.read_segmented_components(spark, root, ["data"])["data"]
    assert got.count() == 30


def test_underscore_component_name_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="reserved"):
        lake.commit_segment_manifest(
            spark, str(tmp_path / "zl"), {"_zones": [1]}
        )


def test_time_travel_reads_historical_manifest(spark, tmp_path):
    """Each retained manifest version replays the dataset as of its
    commit: version 1 sees only the bootstrap batch, version 3 all
    three, and expiring down to one manifest shrinks the travel
    axis (but never the committed head)."""
    root = str(tmp_path / "zl")
    _ingest_three(spark, root)
    versions = lake.segment_manifest_versions(spark, root)
    assert versions == [1, 2, 3]
    v1 = lake.read_segmented_components_at(spark, root, 1)["data"]
    assert rows(v1.select(F.min("k"), F.max("k"))) == [(0, 9)]
    v3 = lake.read_segmented_components_at(spark, root, 3)["data"]
    assert v3.count() == 30
    lake.expire_segments(
        spark, root, keep_manifests=1, orphan_grace_sec=0.0, reader_grace_sec=0.0
    )
    assert lake.segment_manifest_versions(spark, root) == [3]
    assert (
        lake.read_segmented_components(spark, root, ["data"])["data"].count() == 30
    )
