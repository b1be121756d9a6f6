"""Size-tiered (LSM-shape) compaction: only segments under the byte
threshold fold; graduated segments keep their pins, zonemaps, and
blooms untouched — each maintenance pass rewrites O(small tail), not
O(component), so total rewrite work over a dataset's life is
amortized logarithmic instead of quadratic."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from ed_housing_data_pipeline_spark.operators import text_index
from ed_housing_data_pipeline_spark.sources import lake

from tests.test_text_index import _df


def _seg_rows(spark, n, start=0):
    return spark.createDataFrame(
        [(start + i, f"payload-{start + i}") for i in range(n)],
        "id bigint, payload string",
    )


def test_tiered_compaction_folds_only_small_segments(spark, tmp_path):
    root = str(tmp_path / "ds")
    # one BIG segment (5k rows) + three tiny ones
    lake.append_segments(spark, root, {"t": _seg_rows(spark, 5000)}, init=True)
    for i in range(3):
        lake.append_segments(
            spark, root, {"t": _seg_rows(spark, 5, 10_000 + 10 * i).coalesce(1)}
        )
    pins0 = lake.segment_pins(spark, root)["t"]
    assert len(pins0) == 4
    big = pins0[0]
    big_bytes = lake._segment_bytes(spark, f"{root}/t", big)
    before = sorted(
        tuple(r)
        for r in lake.read_segmented_components(spark, root, ["t"])["t"].collect()
    )
    lake.compact_segments(spark, root, max_segment_bytes=big_bytes)
    pins1 = lake.segment_pins(spark, root)["t"]
    # the big segment's PIN survives untouched; the three tiny ones
    # folded into exactly one fresh segment
    assert big in pins1 and len(pins1) == 2
    after = sorted(
        tuple(r)
        for r in lake.read_segmented_components(spark, root, ["t"])["t"].collect()
    )
    assert after == before
    # idempotent: re-running folds nothing (one big + one tiny-fold,
    # and the fold may itself have graduated)
    lake.compact_segments(spark, root, max_segment_bytes=big_bytes)
    assert big in lake.segment_pins(spark, root)["t"]


def test_tiered_compaction_additive_reducer_subset_sound(spark, tmp_path):
    """Folding a SUBSET of additive count segments through the sum
    reducer preserves the component-wide totals (the subset's sum plus
    the untouched segments' rows equals the full sum)."""
    root = str(tmp_path / "ds")

    def counts(rows):
        return spark.createDataFrame(rows, "k string, _n bigint").coalesce(1)

    lake.append_segments(
        spark,
        root,
        {"c": counts([("a", 5), ("b", 3)] * 400)},  # the big one
        init=True,
    )
    lake.append_segments(spark, root, {"c": counts([("a", 2), ("c", 1)])})
    lake.append_segments(spark, root, {"c": counts([("b", -3), ("c", 4)])})
    pins0 = lake.segment_pins(spark, root)["c"]
    big = pins0[0]
    thresh = lake._segment_bytes(spark, f"{root}/c", big)

    def total(df):
        return sorted(
            tuple(r)
            for r in df.groupBy("k").agg(F.sum("_n").alias("n")).collect()
        )

    before = total(lake.read_segmented_components(spark, root, ["c"])["c"])
    lake.compact_segments(
        spark,
        root,
        reducers={"c": lambda df: df.groupBy("k").agg(F.sum("_n").alias("_n"))},
        max_segment_bytes=thresh,
    )
    pins1 = lake.segment_pins(spark, root)["c"]
    assert big in pins1 and len(pins1) == 2
    assert total(
        lake.read_segmented_components(spark, root, ["c"])["c"]
    ) == before


def test_text_index_tiered_compaction_content_neutral(spark, tmp_path):
    """The text index's plain compaction path under a byte threshold:
    the bootstrap segment graduates, micro-batch segments fold, and
    every search surface is byte-identical."""
    root = str(tmp_path / "idx")
    bulk = [
        Row(doc_id=i, text=f"alpha beta common{i % 7} filler{i}")
        for i in range(400)
    ]
    text_index.bootstrap_text_index(spark, root, _df(spark, bulk))
    for i in range(3):
        text_index.append_text_batch(
            spark,
            root,
            _df(spark, [Row(doc_id=1000 + i, text="alpha gamma tiny")]),
        )
    pins0 = lake.segment_pins(spark, root)[text_index.COMPONENT]
    big = pins0[0]
    thresh = lake._segment_bytes(
        spark, f"{root}/{text_index.COMPONENT}", big
    )

    def state():
        return (
            sorted(
                tuple(r)
                for r in text_index.search_all_terms(
                    spark, root, ["alpha", "gamma"]
                ).collect()
            ),
            sorted(
                tuple(r)
                for r in text_index.term_stats(
                    spark, root, ["alpha", "beta", "gamma"]
                ).collect()
            ),
            text_index.corpus_size(spark, root),
        )

    before = state()
    text_index.compact_text_index(spark, root, max_segment_bytes=thresh)
    pins1 = lake.segment_pins(spark, root)[text_index.COMPONENT]
    assert big in pins1 and len(pins1) < len(pins0)
    assert state() == before


def test_validate_segmented_clean_and_corrupted(spark, tmp_path):
    """fsck: a healthy evolved dataset validates ok (incl. deep footer
    checks); deleting a pinned segment dir and a bloom sidecar turns
    up exactly those errors."""
    import shutil

    root = str(tmp_path / "ds")
    a = spark.createDataFrame([(1, "x")], "id bigint, name string")
    b = spark.createDataFrame([(2, "y", 9.0)], "id bigint, name string, score double")
    lake.append_segments(
        spark, root, {"t": a.coalesce(1)}, init=True, bloom_cols={"t": ["name"]}
    )
    lake.append_segments(spark, root, {"t": b.coalesce(1)}, bloom_cols={"t": ["name"]})
    rep = lake.validate_segmented(spark, root, deep=True)
    assert rep["ok"], rep["errors"]
    assert rep["components"] == {"t": 2}
    pins = lake.segment_pins(spark, root)["t"]
    # corrupt: remove a pinned segment dir and one advertised sidecar
    shutil.rmtree(f"{root}/t/seg={pins[0]}")
    rep2 = lake.validate_segmented(spark, root)
    assert not rep2["ok"]
    assert any("pinned segment dir missing" in e for e in rep2["errors"])


def test_compact_segments_expected_base_pins_the_pass(spark, tmp_path):
    """A caller whose reducer choice was derived from committed state
    pins the pass to that manifest version; a rival commit in between
    raises the typed conflict BEFORE any fold job runs."""
    import pytest

    root = str(tmp_path / "ds")
    lake.append_segments(spark, root, {"t": _seg_rows(spark, 4)}, init=True)
    lake.append_segments(spark, root, {"t": _seg_rows(spark, 4, 100)})
    _pins, version = lake.segment_pins_versioned(spark, root)
    # rival commit lands after the caller read its state
    lake.append_segments(spark, root, {"t": _seg_rows(spark, 4, 200)})
    with pytest.raises(lake.ConcurrentCommitError):
        lake.compact_segments(spark, root, expected_base=version)
    # fresh base goes through
    _pins2, v2 = lake.segment_pins_versioned(spark, root)
    pins = lake.compact_segments(spark, root, expected_base=v2)
    assert len(pins["t"]) == 1


def test_validate_segmented_deep_checks_every_part_file(spark, tmp_path):
    """Deep fsck opens EVERY pinned part file, not just the first: a
    rogue later file with an off-manifest column is reported."""
    root = str(tmp_path / "ds")
    lake.append_segments(
        spark,
        root,
        {"t": spark.createDataFrame([(1, "x")], "id bigint, name string").coalesce(1)},
        init=True,
    )
    seg = lake.segment_pins(spark, root)["t"][0]
    seg_dir = f"{root}/t/seg={seg}"
    # a second, schema-divergent part file sorted AFTER the real one
    spark.createDataFrame([(2, 9.5)], "id bigint, rogue double").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{tmp_path}/rogue")
    import glob
    import shutil

    src = glob.glob(f"{tmp_path}/rogue/part-*.parquet")[0]
    shutil.copy(src, f"{seg_dir}/part-zzzz-rogue.parquet")
    rep = lake.validate_segmented(spark, root, deep=True)
    assert not rep["ok"]
    assert any("rogue" in e and "not in manifest schema" in e for e in rep["errors"])


def _kv(spark, rows_):
    return spark.createDataFrame(rows_, "k int, name string").coalesce(1)


def test_repair_segmented_quarantines_missing_pins(spark, tmp_path):
    """fsck→repair loop: a restored root missing a pinned segment dir
    is repaired by un-pinning it (typed report), after which reads work
    and fsck is clean — no hand-edited manifests."""
    import shutil

    root = str(tmp_path / "ds")
    lake.append_segments(
        spark, root, {"t": _kv(spark, [(1, "a")])}, init=True,
        zone_cols={"t": ["k"]},
    )
    lake.append_segments(
        spark, root, {"t": _kv(spark, [(2, "b")])}, zone_cols={"t": ["k"]}
    )
    pins = lake.segment_pins(spark, root)["t"]
    shutil.rmtree(f"{root}/t/seg={pins[0]}")
    assert not lake.validate_segmented(spark, root)["ok"]
    rep = lake.repair_segmented(spark, root)
    assert rep["committed"] and rep["ok"], rep
    assert rep["actions"]["unpinned"] == {"t": [pins[0]]}
    df = lake.read_segmented_components(spark, root, ["t"])["t"]
    assert [tuple(r) for r in df.collect()] == [(2, "b")]
    # zonemap entry of the quarantined segment dropped with the pin
    _kept, pinned = lake.zone_pruned_pins(spark, root, "t", "k", lo=0, hi=10)
    assert pinned == [pins[1]]


def test_repair_segmented_drops_empty_component_and_rebuilds_sidecars(
    spark, tmp_path
):
    import os
    import shutil

    root = str(tmp_path / "ds")
    lake.append_segments(
        spark,
        root,
        {"t": _kv(spark, [(1, "a")]), "gone": _kv(spark, [(9, "z")])},
        init=True,
        bloom_cols={"t": ["name"]},
    )
    pins0 = lake.segment_pins(spark, root)
    # vaporize the whole 'gone' component and t's advertised sidecar
    shutil.rmtree(f"{root}/gone/seg={pins0['gone'][0]}")
    os.remove(lake._bloom_path(f"{root}/t", pins0["t"][0], "name"))
    assert not lake.validate_segmented(spark, root)["ok"]
    rep = lake.repair_segmented(spark, root)
    assert rep["ok"], rep
    assert rep["actions"]["dropped_components"] == ["gone"]
    assert rep["actions"]["rebuilt_bloom_sidecars"] == {
        "t": [[pins0["t"][0], "name"]]
    }
    assert "gone" not in lake.segment_pins(spark, root)
    # the rebuilt sidecar answers point lookups again
    kept, _ = lake.bloom_pruned_pins(spark, root, "t", "name", ["a"])
    assert kept == pins0["t"]
    kept_none, _ = lake.bloom_pruned_pins(spark, root, "t", "name", ["zzz"])
    assert kept_none == []


def test_repair_segmented_backfills_coverage_and_dry_run(spark, tmp_path):
    """Pinned segments missing the zone stats / bloom ads their
    component carries elsewhere get them recomputed; dry_run reports
    the plan without committing."""
    root = str(tmp_path / "ds")
    lake.append_segments(
        spark, root, {"t": _kv(spark, [(1, "a"), (5, "e")])}, init=True,
        zone_cols={"t": ["k"]}, bloom_cols={"t": ["name"]},
    )
    # a second writer that forgot the sidecar policy
    lake.append_segments(spark, root, {"t": _kv(spark, [(50, "x")])})
    seg2 = lake.segment_pins(spark, root)["t"][1]
    plan = lake.repair_segmented(spark, root, dry_run=True)
    assert not plan["committed"]
    assert plan["actions"]["rebuilt_zone_stats"] == {"t": [seg2]}
    assert plan["actions"]["rebuilt_bloom_ads"] == {"t": [[seg2, "name"]]}
    # nothing landed: pruning still keeps the uncovered segment
    kept, _ = lake.zone_pruned_pins(spark, root, "t", "k", lo=0, hi=10)
    assert seg2 in kept
    rep = lake.repair_segmented(spark, root)
    assert rep["committed"] and rep["ok"], rep
    # coverage is uniform again: the range read now prunes segment 2
    kept, _ = lake.zone_pruned_pins(spark, root, "t", "k", lo=0, hi=10)
    assert seg2 not in kept
    kept_b, _ = lake.bloom_pruned_pins(spark, root, "t", "name", ["x"])
    assert kept_b == [seg2]
    # healthy root: repair is a no-op that commits nothing
    v0 = lake.segment_pins_versioned(spark, root)[1]
    rep2 = lake.repair_segmented(spark, root)
    assert not rep2["committed"] and rep2["ok"]
    assert lake.segment_pins_versioned(spark, root)[1] == v0


def test_repair_backfills_per_column_zone_gaps(spark, tmp_path):
    """A segment with zone stats for only PART of the component's
    column set is a coverage gap too: repair recomputes exactly the
    missing columns and merges them into the existing stats."""
    root = str(tmp_path / "ds")
    lake.append_segments(
        spark,
        root,
        {"t": spark.createDataFrame([(1, 10)], "k int, m int").coalesce(1)},
        init=True,
        zone_cols={"t": ["k", "m"]},
    )
    # a narrower writer: stats for k only
    lake.append_segments(
        spark,
        root,
        {"t": spark.createDataFrame([(500, 99)], "k int, m int").coalesce(1)},
        zone_cols={"t": ["k"]},
    )
    seg2 = lake.segment_pins(spark, root)["t"][1]
    # the m-range read cannot prune the half-covered segment yet
    kept0, _ = lake.zone_pruned_pins(spark, root, "t", "m", lo=0, hi=50)
    assert seg2 in kept0
    rep = lake.repair_segmented(spark, root)
    assert rep["committed"] and rep["ok"], rep
    assert rep["actions"]["rebuilt_zone_stats"] == {"t": [seg2]}
    kept1, _ = lake.zone_pruned_pins(spark, root, "t", "m", lo=0, hi=50)
    assert seg2 not in kept1  # m=99 excluded now
    # and the pre-existing k stats survived the merge
    kept_k, _ = lake.zone_pruned_pins(spark, root, "t", "k", lo=0, hi=100)
    assert kept_k == [lake.segment_pins(spark, root)["t"][0]]
    # idempotent: second repair commits nothing
    v = lake.segment_pins_versioned(spark, root)[1]
    rep2 = lake.repair_segmented(spark, root)
    assert not rep2["committed"]
    assert lake.segment_pins_versioned(spark, root)[1] == v


def test_repair_converges_on_over_budget_bloom_gap(spark, tmp_path):
    """A pinned segment past _BLOOM_MAX_ROWS that lacks a bloom ad the
    component carries elsewhere is reported as skipped — not claimed
    rebuilt, not re-committed forever (the convergence bug the r11
    review caught)."""
    root = str(tmp_path / "ds")
    lake.append_segments(
        spark,
        root,
        {"t": _seg_rows(spark, 10).coalesce(1)},
        init=True,
        bloom_cols={"t": ["id"]},
    )
    # over-budget segment, no bloom requested
    lake.append_segments(
        spark,
        root,
        {"t": _seg_rows(spark, lake._BLOOM_MAX_ROWS + 1, start=100).coalesce(4)},
    )
    seg2 = lake.segment_pins(spark, root)["t"][1]
    v0 = lake.segment_pins_versioned(spark, root)[1]
    rep = lake.repair_segmented(spark, root)
    assert rep["ok"]
    assert not rep["committed"]  # nothing rebuildable: no commit
    assert rep["actions"]["skipped_bloom_over_budget"] == {"t": [[seg2, "id"]]}
    assert rep["actions"]["rebuilt_bloom_ads"] == {}
    assert lake.segment_pins_versioned(spark, root)[1] == v0


def test_repair_coverage_rebuild_is_batched(spark, tmp_path):
    """Coverage backfill issues O(columns) jobs, not O(segments ×
    columns): with 50 induced gap segments the whole repair stays
    under a constant job budget, and the report/commit are exactly
    what the per-segment path produced."""
    import uuid

    root = str(tmp_path / "ds")
    lake.append_segments(
        spark, root, {"t": _kv(spark, [(1, "a")])}, init=True,
        zone_cols={"t": ["k"]}, bloom_cols={"t": ["name"]},
    )
    # 50 writers that forgot the sidecar policy → 50 zone gaps + 50
    # bloom-ad gaps
    for i in range(50):
        lake.append_segments(
            spark, root, {"t": _kv(spark, [(10 + i, f"v{i}")]).coalesce(1)}
        )
    gap_segs = lake.segment_pins(spark, root)["t"][1:]
    sc = spark.sparkContext
    group = f"probe-{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, "repair job-count probe")
    try:
        rep = lake.repair_segmented(spark, root, sweep_orphans=False)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    assert rep["committed"] and rep["ok"], rep
    assert sorted(rep["actions"]["rebuilt_zone_stats"]["t"]) == gap_segs
    assert sorted(t[0] for t in rep["actions"]["rebuilt_bloom_ads"]["t"]) == gap_segs
    # one zone-stats job + one count/collect pair per bloom column,
    # plus constant scan overhead (file-listing/footer jobs for the
    # 51-path scans) — NOT the old path's >= 2 jobs per (segment,
    # column), which at 50 gaps x 2 columns would exceed 100
    assert jobs <= 15, jobs
    assert jobs < len(gap_segs), jobs
    # coverage is uniform: every gap segment prunes again
    kept, _ = lake.zone_pruned_pins(spark, root, "t", "k", lo=0, hi=5)
    assert kept == lake.segment_pins(spark, root)["t"][:1]


def test_repair_dry_run_reports_drop_for_over_budget_sidecar(spark, tmp_path):
    """Plan/apply parity: a vanished advertised sidecar whose segment
    outgrew the bloom budget is planned as a DROP (dry_run probes the
    count), matching what apply then does — not claimed as a rebuild."""
    import os

    root = str(tmp_path / "ds")
    lake.append_segments(
        spark,
        root,
        {"t": _seg_rows(spark, 10).coalesce(1)},
        init=True,
        bloom_cols={"t": ["id"]},
    )
    seg1 = lake.segment_pins(spark, root)["t"][0]
    # grow the advertisement onto an over-budget segment by hand:
    # vaporize the small segment's sidecar AND swap in big data
    os.remove(lake._bloom_path(f"{root}/t", seg1, "id"))
    import shutil

    shutil.rmtree(f"{root}/t/seg={seg1}")
    _seg_rows(spark, lake._BLOOM_MAX_ROWS + 1).coalesce(4).write.parquet(
        f"{root}/t/seg={seg1}"
    )
    plan = lake.repair_segmented(spark, root, dry_run=True)
    assert not plan["committed"]
    assert plan["actions"]["rebuilt_bloom_sidecars"] == {}
    assert plan["actions"]["dropped_bloom_ads"] == {"t": [[seg1, "id"]]}
    rep = lake.repair_segmented(spark, root)
    assert rep["committed"] and rep["ok"], rep
    assert rep["actions"]["dropped_bloom_ads"] == {"t": [[seg1, "id"]]}
    assert lake.segment_blooms(spark, root) == {}
