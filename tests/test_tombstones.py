"""Tombstone deletes on append-only segments: logical delete =
O(delete-set) tombstone append, reads subtract, physical apply
rewrites atomically (data + tombstone reset in one manifest flip),
and the metadata planes (zonemaps, blooms, _meta) survive the apply.
Completes the GDPR shape: bloom point-lookup finds, tombstone delete
removes, apply + retention forget."""

from __future__ import annotations

import pytest
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


# ------------------------------------------------ r13: revision axis


def test_upsert_rows_single_commit_replace_and_merged_read(spark, tmp_path):
    """upsert_rows = tombstone-at-sequence + new revisions in ONE
    manifest flip: the merged view serves exactly the latest revision
    per id, plain appends read as sequence 0, and the whole upsert is
    atomic (one version increment)."""
    root = str(tmp_path / "t")
    _corpus(spark, root)  # doc_id 0..79, v = float(doc_id), two segments
    v0 = lake.segment_pins_versioned(spark, root)[1]
    ups = spark.createDataFrame(
        [Row(doc_id=j, v=1000.0 + j) for j in (3, 5, 70)],
        "doc_id bigint, v double",
    )
    lake.upsert_rows(spark, root, "docs", "doc_id", ups)
    assert lake.segment_pins_versioned(spark, root)[1] == v0 + 1  # atomic
    merged = lake.read_segmented_merged(spark, root, "docs", "doc_id")
    got = {r.doc_id: r.v for r in merged.collect()}
    assert len(got) == 80
    assert got[3] == 1003.0 and got[5] == 1005.0 and got[70] == 1070.0
    assert got[4] == 4.0  # untouched ids serve the plain append


def test_delete_then_upsert_resurrects_under_merged_view(spark, tmp_path):
    """The sequence watermark composes under MAX: a delete kills all
    prior revisions, a LATER upsert of the same id outranks the delete
    and resurrects it — while the legacy bare-id live view keeps hiding
    every tombstoned id (documented divergence)."""
    root = str(tmp_path / "t")
    _corpus(spark, root)
    lake.delete_rows(spark, root, "docs", "doc_id", [7, 8])
    merged = lake.read_segmented_merged(spark, root, "docs", "doc_id")
    assert merged.count() == 78
    lake.upsert_rows(
        spark, root, "docs", "doc_id",
        spark.createDataFrame([Row(doc_id=7, v=-7.0)], "doc_id bigint, v double"),
    )
    merged = lake.read_segmented_merged(spark, root, "docs", "doc_id")
    got = {r.doc_id: r.v for r in merged.collect()}
    assert len(got) == 79 and got[7] == -7.0 and 8 not in got
    # legacy view: id 7 has tombstone rows, so it stays hidden there
    live = lake.read_segmented_live(spark, root, "docs", "doc_id")
    assert live.filter(F.col("doc_id") == 7).count() == 0


def test_upsert_retries_past_a_rival_commit(spark, tmp_path, monkeypatch):
    """A rival ingest landing mid-upsert costs a retry, never a lost
    update: the payload restamps at the fresh sequence and both commits
    survive."""
    root = str(tmp_path / "t")
    _corpus(spark, root)
    real_commit = lake.commit_segment_manifest
    state = {"armed": True}

    def rival_lands_first(*args, **kwargs):
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

    monkeypatch.setattr(lake, "commit_segment_manifest", rival_lands_first)
    lake.upsert_rows(
        spark, root, "docs", "doc_id",
        spark.createDataFrame([Row(doc_id=0, v=100.0)], "doc_id bigint, v double"),
    )
    monkeypatch.setattr(lake, "commit_segment_manifest", real_commit)
    merged = lake.read_segmented_merged(spark, root, "docs", "doc_id")
    got = {r.doc_id: r.v for r in merged.collect()}
    assert len(got) == 81  # rival's row AND the upsert both landed
    assert got[0] == 100.0 and got[900] == 9.0
    # the upsert's stamp equals the sequence that actually committed it
    head = lake.segment_pins_versioned(spark, root)[1]
    data = lake.read_segmented_components(spark, root, ["docs"])["docs"]
    stamped = data.filter(F.col("doc_id") == 0).filter(
        F.col(lake.UPSERT_SEQ_COL).isNotNull()
    )
    assert [r[lake.UPSERT_SEQ_COL] for r in stamped.collect()] == [head]


def test_apply_tombstones_merged_keeps_resurrected_revisions(
    spark, tmp_path
):
    """Physical apply with merged=True preserves the watermark
    semantics: upserted/resurrected revisions survive the rewrite, the
    tombstone component resets, and the merged view is unchanged."""
    from collections import Counter

    root = str(tmp_path / "t")
    _corpus(spark, root)
    lake.delete_rows(spark, root, "docs", "doc_id", [1, 2, 3])
    lake.upsert_rows(
        spark, root, "docs", "doc_id",
        spark.createDataFrame(
            [Row(doc_id=2, v=22.0), Row(doc_id=50, v=55.0)],
            "doc_id bigint, v double",
        ),
    )
    before = Counter(
        (r.doc_id, r.v)
        for r in lake.read_segmented_merged(
            spark, root, "docs", "doc_id"
        ).collect()
    )
    assert (2, 22.0) in before and (1, 1.0) not in before
    lake.apply_tombstones(spark, root, "docs", "doc_id", merged=True)
    pins = lake.segment_pins(spark, root)
    assert len(pins["docs"]) == 1  # folded to one live segment
    tomb = lake.tombstone_component("docs")
    assert lake.read_segments(spark, f"{root}/{tomb}", pins[tomb]).count() == 0
    after = Counter(
        (r.doc_id, r.v)
        for r in lake.read_segmented_merged(
            spark, root, "docs", "doc_id"
        ).collect()
    )
    assert after == before


def test_merged_view_survives_user_dead_column_and_rejects_orphan_version(
    spark, tmp_path
):
    """Edge hardening: a user column named '_dead' must not make the
    merged view unreadable (the internal liveness alias is
    collision-proof), and time travel refuses a manifest version past
    the committed head (a crashed writer's orphan blob is not
    history)."""
    import pytest

    root = str(tmp_path / "t")
    lake.append_segments(
        spark, root,
        {"d": spark.createDataFrame(
            [Row(doc_id=1, _dead="x"), Row(doc_id=2, _dead="y")],
            "doc_id bigint, _dead string",
        )},
        init=True,
    )
    lake.delete_rows(spark, root, "d", "doc_id", [1])
    lake.upsert_rows(
        spark, root, "d", "doc_id",
        spark.createDataFrame([Row(doc_id=1, _dead="z")],
                              "doc_id bigint, _dead string"),
    )
    got = {r.doc_id: r["_dead"] for r in
           lake.read_segmented_merged(spark, root, "d", "doc_id").collect()}
    assert got == {1: "z", 2: "y"}
    head = lake.segment_pins_versioned(spark, root)[1]
    at1 = lake.read_segmented_merged_at(spark, root, 1, "d", "doc_id")
    assert {r.doc_id for r in at1.collect()} == {1, 2}
    with pytest.raises(FileNotFoundError, match="not a committed"):
        lake.read_segmented_merged_at(spark, root, head + 5, "d", "doc_id")


def test_revision_axis_matches_model_under_random_interleaving(
    spark, tmp_path
):
    """Model-based check of the whole revision axis: a seeded random
    interleaving of plain appends, upserts, deletes, compactions, and
    physical applies is replayed against a driver-side model of the
    liveness rule (a row is live iff its useq >= its id's max
    dead_below; plain appends are useq 0 UNTIL the component carries
    the axis — after the first upsert, append_segments stamps appends
    at their commit sequence, so commit order is respected and an
    append after a delete serves; apply drops dead rows and clears
    watermarks). After every commit the merged view must equal the
    model, and at the end time travel must reproduce the model's
    snapshot at every retained version."""
    import random
    from collections import Counter

    from ed_housing_data_pipeline_spark.sources import lake as lk

    rng = random.Random(13)

    def df_of(rows):
        return spark.createDataFrame(
            [Row(k=i, v=v) for i, v in rows], "k bigint, v double"
        ).coalesce(1)

    for trial in range(2):
        root = str(tmp_path / f"m{trial}")
        rows_model: list[tuple[int, float, int]] = []  # (id, value, useq)
        max_dead: dict[int, int] = {}
        axis = False  # schema carries _useq after the first upsert
        init = [(i, float(i)) for i in range(6)]
        lk.append_segments(spark, root, {"t": df_of(init)}, init=True)
        rows_model += [(i, v, 0) for i, v in init]

        def live() -> Counter:
            return Counter(
                (i, v)
                for i, v, useq in rows_model
                if useq >= max_dead.get(i, 0)
            )

        snapshots: dict[int, Counter] = {}
        v = lk.segment_pins_versioned(spark, root)[1]
        snapshots[v] = live()
        for step in range(12):
            op = rng.choice(
                ["append", "upsert", "delete", "upsert", "compact", "apply"]
            )
            ids = rng.sample(range(12), rng.randint(1, 3))
            base_v = lk.segment_pins_versioned(spark, root)[1]
            if op == "append":
                batch = [(i, 1000.0 * (step + 1) + i) for i in ids]
                lk.append_segments(spark, root, {"t": df_of(batch)})
                useq = (base_v + 1) if axis else 0
                rows_model += [(i, val, useq) for i, val in batch]
            elif op == "upsert":
                seq = base_v + 1
                batch = [(i, 2000.0 * (step + 1) + i) for i in ids]
                lk.upsert_rows(spark, root, "t", "k", df_of(batch))
                axis = True
                for i, val in batch:
                    max_dead[i] = max(max_dead.get(i, 0), seq)
                    rows_model.append((i, val, seq))
            elif op == "delete":
                seq = base_v + 1
                lk.delete_rows(spark, root, "t", "k", ids)
                for i in ids:
                    max_dead[i] = max(max_dead.get(i, 0), seq)
            elif op == "compact":
                lk.compact_segments(spark, root)  # content-neutral
            else:  # apply: physicalize, clear watermarks
                lk.apply_tombstones(spark, root, "t", "k", merged=True)
                rows_model = [
                    (i, val, useq)
                    for i, val, useq in rows_model
                    if useq >= max_dead.get(i, 0)
                ]
                max_dead = {}
            got = Counter(
                (r.k, r.v)
                for r in lk.read_segmented_merged(
                    spark, root, "t", "k"
                ).collect()
            )
            assert got == live(), f"trial {trial} step {step} op {op}"
            v = lk.segment_pins_versioned(spark, root)[1]
            snapshots[v] = live()
        for v, want in snapshots.items():
            at = Counter(
                (r.k, r.v)
                for r in lk.read_segmented_merged_at(
                    spark, root, v, "t", "k"
                ).collect()
            )
            assert at == want, f"trial {trial} time travel at v{v}"


def test_upsert_rows_empty_batch_is_harmless(spark, tmp_path):
    """An empty upsert batch (a cadence with nothing to revise) commits
    two empty segments and changes no answer: the merged view is
    unchanged, later upserts behave normally, and compaction folds the
    empties away."""
    root = str(tmp_path / "t")
    _corpus(spark, root)
    before = sorted(
        (r.doc_id, r.v)
        for r in lake.read_segmented_merged(spark, root, "docs", "doc_id").collect()
    )
    empty = spark.createDataFrame([], "doc_id bigint, v double")
    lake.upsert_rows(spark, root, "docs", "doc_id", empty)
    after = sorted(
        (r.doc_id, r.v)
        for r in lake.read_segmented_merged(spark, root, "docs", "doc_id").collect()
    )
    assert after == before
    lake.upsert_rows(
        spark, root, "docs", "doc_id",
        spark.createDataFrame([Row(doc_id=0, v=-1.0)], "doc_id bigint, v double"),
    )
    got = {r.doc_id: r.v for r in
           lake.read_segmented_merged(spark, root, "docs", "doc_id").collect()}
    assert got[0] == -1.0 and len(got) == 80
    lake.compact_segments(spark, root)
    assert got == {
        r.doc_id: r.v
        for r in lake.read_segmented_merged(spark, root, "docs", "doc_id").collect()
    }


# ---------------------------------------------------------------- r14:
# the full MERGE class (merge_rows), composite keys, pressure counter,
# auto-apply, and the legacy kill-all guard


def _dim(spark, root):
    lake.append_segments(
        spark,
        root,
        appends={
            "dim": spark.createDataFrame(
                [Row(k1=i, k2=f"g{i % 3}", v=float(i)) for i in range(12)],
                "k1 bigint, k2 string, v double",
            ).coalesce(1)
        },
        init=True,
    )


def test_merge_rows_conditional_update_skip_and_insert(spark, tmp_path):
    """WHEN MATCHED [AND changed] THEN UPDATE / WHEN NOT MATCHED THEN
    INSERT on a COMPOSITE key, one manifest flip: unchanged keys skip
    (no revision, no tombstone row), changed keys revise with exactly
    one tombstone row each, new keys insert with NO tombstone row."""
    root = str(tmp_path / "t")
    _dim(spark, root)
    batch = spark.createDataFrame(
        [
            Row(k1=0, k2="g0", v=0.0),     # unchanged -> skip
            Row(k1=1, k2="g1", v=100.0),   # changed -> update
            Row(k1=99, k2="gX", v=-1.0),   # new -> insert
        ],
        "k1 bigint, k2 string, v double",
    )
    rep = lake.merge_rows(spark, root, "dim", ["k1", "k2"], batch)
    assert (rep["updated"], rep["inserted"], rep["skipped"]) == (1, 1, 1)
    assert rep["applied"] and rep["version"] == 2
    got = {
        (r.k1, r.k2): r.v
        for r in lake.read_segmented_merged(
            spark, root, "dim", ["k1", "k2"]
        ).collect()
    }
    assert got[(1, "g1")] == 100.0 and got[(99, "gX")] == -1.0
    assert got[(0, "g0")] == 0.0 and len(got) == 13
    # exactly ONE tombstone row (the updated key), counter in sync
    pins = lake.segment_pins(spark, root)
    tomb = lake.read_segments(
        spark, f"{root}/{lake.tombstone_component('dim')}",
        pins[lake.tombstone_component("dim")],
    )
    assert [(r.k1, r.k2) for r in tomb.collect()] == [(1, "g1")]
    assert lake.segment_meta(spark, root)[
        lake.component_tombstone_rows_key("dim")
    ] == 1


def test_merge_rows_noop_batch_commits_nothing(spark, tmp_path):
    """A fully-unchanged batch is a FULL no-op: no manifest flip, no
    tombstone rows, counter untouched (the r13 VERDICT #1 pin — no-op
    cadence revisions must not churn the tombstone component)."""
    root = str(tmp_path / "t")
    _dim(spark, root)
    v0 = lake.segment_pins_versioned(spark, root)[1]
    same = spark.createDataFrame(
        [Row(k1=i, k2=f"g{i % 3}", v=float(i)) for i in range(12)],
        "k1 bigint, k2 string, v double",
    )
    rep = lake.merge_rows(spark, root, "dim", ["k1", "k2"], same)
    assert not rep["applied"] and rep["skipped"] == 12
    assert rep["updated"] == 0 and rep["inserted"] == 0
    assert lake.segment_pins_versioned(spark, root)[1] == v0
    assert lake.tombstone_component("dim") not in lake.segment_pins(spark, root)
    assert lake.segment_meta(spark, root).get(
        lake.component_tombstone_rows_key("dim"), 0
    ) == 0


def test_merge_rows_when_matched_predicate(spark, tmp_path):
    """WHEN MATCHED AND <pred>: only matched keys with a (source,
    target) pair satisfying the predicate update; the rest skip even
    though their content differs."""
    root = str(tmp_path / "t")
    _dim(spark, root)
    batch = spark.createDataFrame(
        [Row(k1=1, k2="g1", v=0.5), Row(k1=2, k2="g2", v=50.0)],
        "k1 bigint, k2 string, v double",
    )
    rep = lake.merge_rows(
        spark, root, "dim", ["k1", "k2"], batch,
        when_matched="source.v > target.v",
    )
    assert rep["updated"] == 1 and rep["skipped"] == 1
    got = {
        (r.k1, r.k2): r.v
        for r in lake.read_segmented_merged(
            spark, root, "dim", ["k1", "k2"]
        ).collect()
    }
    assert got[(2, "g2")] == 50.0 and got[(1, "g1")] == 1.0  # not downgraded


def test_merge_rows_multirow_keys_and_composite_delete(spark, tmp_path):
    """Whole-key replace with MANY rows per key on both sides, and the
    composite-key delete/resurrect lifecycle under the merged view."""
    root = str(tmp_path / "t")
    lake.append_segments(
        spark, root,
        appends={"t": spark.createDataFrame(
            [Row(a=1, b="x", v=1.0), Row(a=1, b="x", v=2.0),
             Row(a=2, b="y", v=3.0)],
            "a bigint, b string, v double",
        )},
        init=True,
    )
    # same multiset for (1,x) -> skip; (2,y) gets TWO rows -> update
    batch = spark.createDataFrame(
        [Row(a=1, b="x", v=2.0), Row(a=1, b="x", v=1.0),
         Row(a=2, b="y", v=30.0), Row(a=2, b="y", v=31.0)],
        "a bigint, b string, v double",
    )
    rep = lake.merge_rows(spark, root, "t", ["a", "b"], batch)
    assert rep["skipped"] == 1 and rep["updated"] == 1
    got = sorted(
        (r.a, r.b, r.v)
        for r in lake.read_segmented_merged(spark, root, "t", ["a", "b"]).collect()
    )
    assert got == [(1, "x", 1.0), (1, "x", 2.0), (2, "y", 30.0), (2, "y", 31.0)]
    lake.delete_rows(spark, root, "t", ["a", "b"], [(1, "x")])
    assert lake.read_segmented_merged(
        spark, root, "t", ["a", "b"]
    ).count() == 2
    lake.upsert_rows(
        spark, root, "t", ["a", "b"],
        spark.createDataFrame([Row(a=1, b="x", v=9.0)],
                              "a bigint, b string, v double"),
    )
    got = sorted(
        (r.a, r.b, r.v)
        for r in lake.read_segmented_merged(spark, root, "t", ["a", "b"]).collect()
    )
    assert got == [(1, "x", 9.0), (2, "y", 30.0), (2, "y", 31.0)]


def test_tombstone_pressure_counter_and_auto_apply(spark, tmp_path):
    """The lake-core pressure trigger (r13 VERDICT #2): every
    delete/upsert/merge commit advances the per-component counter;
    maintain(auto max_rows) does NOT apply below the bound, applies at
    it, and the apply resets the counter (re-arming the trigger)."""
    root = str(tmp_path / "t")
    _corpus(spark, root)
    ckey = lake.component_tombstone_rows_key("docs")
    lake.delete_rows(spark, root, "docs", "doc_id", [1, 2, 3])
    assert lake.segment_meta(spark, root)[ckey] == 3
    lake.upsert_rows(
        spark, root, "docs", "doc_id",
        spark.createDataFrame([Row(doc_id=10, v=-1.0)],
                              "doc_id bigint, v double"),
    )
    assert lake.segment_meta(spark, root)[ckey] == 4
    policy = {"apply_tombstones": {"docs": {
        "id_col": "doc_id", "merged": True, "auto": {"max_rows": 6},
    }}}
    rep = lake.maintain(spark, root, policy)
    assert rep["apply_tombstones"]["docs"] == "below_pressure"
    data_pins = lake.segment_pins(spark, root)["docs"]
    lake.delete_rows(spark, root, "docs", "doc_id", [20, 21])
    assert lake.segment_meta(spark, root)[ckey] == 6
    before = sorted(
        (r.doc_id, r.v)
        for r in lake.read_segmented_merged(spark, root, "docs", "doc_id").collect()
    )
    rep = lake.maintain(spark, root, policy)
    assert rep["apply_tombstones"]["docs"] == "applied"
    assert lake.segment_meta(spark, root)[ckey] == 0
    assert lake.segment_pins(spark, root)["docs"] != data_pins
    after = sorted(
        (r.doc_id, r.v)
        for r in lake.read_segmented_merged(spark, root, "docs", "doc_id").collect()
    )
    assert after == before  # apply is content-neutral
    # re-armed: next cadence is below pressure again
    rep = lake.maintain(spark, root, policy)
    assert rep["apply_tombstones"]["docs"] in ("below_pressure", "no_tombstones")
    # the below-pressure gate is METADATA-PLANE: zero Spark jobs
    from tests.conftest import count_jobs

    lake.delete_rows(spark, root, "docs", "doc_id", [30])
    quiet = {
        "apply_tombstones": {"docs": {
            "id_col": "doc_id", "auto": {"max_rows": 10**9},
        }},
        "repair": False,
        "expire": False,
    }
    rep = {}
    jobs = count_jobs(
        spark, lambda: rep.update(lake.maintain(spark, root, quiet))
    )
    assert rep["apply_tombstones"]["docs"] == "below_pressure"
    assert jobs == 0, f"below-pressure gate scheduled {jobs} jobs"


def test_auto_apply_rows_ratio_policy(spark, tmp_path):
    """max_rows_ratio (r14 VERDICT #2): churned keys / physical rows,
    both from the metadata plane (pressure counter + counts plane) —
    the exact form of the ratio policy (byte ratios lie when tombstone
    rows are narrow). Below the bound: zero Spark jobs."""
    from tests.conftest import count_jobs

    root = str(tmp_path / "t")
    _corpus(spark, root)  # 80 physical rows
    lake.delete_rows(spark, root, "docs", "doc_id", [1, 2, 3])  # 3/80
    policy = {"apply_tombstones": {"docs": {
        "id_col": "doc_id", "merged": True, "auto": {"max_rows_ratio": 0.1},
    }}, "repair": False, "expire": False}
    rep = {}
    jobs = count_jobs(spark, lambda: rep.update(lake.maintain(spark, root, policy)))
    assert rep["apply_tombstones"]["docs"] == "below_pressure"
    assert jobs == 0, f"below-ratio gate scheduled {jobs} jobs"
    lake.delete_rows(spark, root, "docs", "doc_id", [4, 5, 6, 7, 8])  # 8/80
    rep = lake.maintain(spark, root, policy)
    assert rep["apply_tombstones"]["docs"] == "applied"
    assert lake.segment_meta(spark, root).get(
        lake.component_tombstone_rows_key("docs"), 0
    ) == 0
    assert lake.read_segmented_live(spark, root, "docs", "doc_id").count() == 72


def test_auto_apply_bytes_ratio_fallback(spark, tmp_path):
    """max_bytes_ratio fires from segment_sizes listings alone — the
    counter-free path for tombstones that predate the counter."""
    root = str(tmp_path / "t")
    _corpus(spark, root)
    lake.delete_rows(spark, root, "docs", "doc_id", list(range(30)))
    policy_lo = {"apply_tombstones": {"docs": {
        "id_col": "doc_id", "auto": {"max_bytes_ratio": 100.0},
    }}}
    rep = lake.maintain(spark, root, policy_lo)
    assert rep["apply_tombstones"]["docs"] == "below_pressure"
    policy_hi = {"apply_tombstones": {"docs": {
        "id_col": "doc_id", "auto": {"max_bytes_ratio": 0.0001},
    }}}
    rep = lake.maintain(spark, root, policy_hi)
    assert rep["apply_tombstones"]["docs"] == "applied"
    assert lake.read_segmented_live(spark, root, "docs", "doc_id").count() == 50


def test_upsert_segment_partitions_knob(spark, tmp_path):
    """segment_partitions mirrors delete_rows_from: explicit ints are
    a hard cap; ``None`` defers to the write path's SIZE-DERIVED file
    count (r16: lake.sized_for_segment_write — a tiny id batch lands
    as ONE file instead of one per shuffle partition, while the
    multi-million-id shape of r13 VERDICT #5 keeps its parallelism
    because the byte estimate exceeds the file target; pinned directly
    on the sizing helper below)."""
    import glob

    root = str(tmp_path / "t")
    _corpus(spark, root)
    batch = spark.range(0, 24).select(
        F.col("id").alias("doc_id"), F.lit(0.0).alias("v")
    ).repartition(6)
    lake.upsert_rows(spark, root, "docs", "doc_id", batch,
                     segment_partitions=None)
    tname = lake.tombstone_component("docs")
    seg = lake.segment_pins(spark, root)[tname][-1]
    files = glob.glob(f"{root}/{tname}/seg={seg}/part-*.parquet")
    assert len(files) == 1, "tiny batch must land size-coalesced to 1 file"
    assert lake.read_segmented_merged(
        spark, root, "docs", "doc_id"
    ).filter(F.col("v") == 0.0).count() == 24
    # the sizing contract itself: a frame whose (estimated) bytes span
    # N file targets keeps min(N, current) partitions — big deletes
    # keep their write parallelism, small ones stop flooding files
    big = spark.range(0, 24).repartition(6)
    assert lake.sized_for_segment_write(
        big, est_bytes=3 * lake.SEGMENT_FILE_TARGET_BYTES
    ).rdd.getNumPartitions() == 3
    assert lake.sized_for_segment_write(
        big, est_bytes=1
    ).rdd.getNumPartitions() == 1
    # an astronomical estimate (join-product stats) must be a no-op,
    # not an int overflow
    assert lake.sized_for_segment_write(
        big, est_bytes=1 << 62
    ).rdd.getNumPartitions() == 6


def test_legacy_killall_guard_raises_then_apply_unblocks(spark, tmp_path):
    """A stampless kill-all tombstone covering a batch id makes
    upsert/merge raise LOUDLY (the revision would be silently
    invisible); apply_tombstones retires the legacy rows and the same
    batch then lands (ADVICE r13)."""
    import pytest

    root = str(tmp_path / "t")
    _corpus(spark, root)
    # forge a legacy (pre-revision-axis) tombstone: bare id, no stamp
    lake.append_segments(
        spark, root,
        appends={lake.tombstone_component("docs"): spark.createDataFrame(
            [Row(doc_id=7)], "doc_id bigint"
        )},
    )
    batch = spark.createDataFrame(
        [Row(doc_id=7, v=700.0)], "doc_id bigint, v double"
    )
    with pytest.raises(RuntimeError, match="kill-all"):
        lake.upsert_rows(spark, root, "docs", "doc_id", batch)
    with pytest.raises(RuntimeError, match="kill-all"):
        lake.merge_rows(spark, root, "docs", "doc_id", batch)
    # un-covered ids pass the guard untouched
    lake.upsert_rows(
        spark, root, "docs", "doc_id",
        spark.createDataFrame([Row(doc_id=8, v=800.0)],
                              "doc_id bigint, v double"),
    )
    # escape hatch 1: opt out explicitly (documented loss)
    # escape hatch 2 (the supported one): physical apply retires legacy
    lake.apply_tombstones(spark, root, "docs", "doc_id", merged=True)
    lake.upsert_rows(spark, root, "docs", "doc_id", batch)
    got = {
        r.doc_id: r.v
        for r in lake.read_segmented_merged(spark, root, "docs", "doc_id").collect()
    }
    assert got[7] == 700.0 and got[8] == 800.0


def test_append_after_delete_serves_on_axis_component(spark, tmp_path):
    """Once a component carries the revision axis, a PLAIN append
    committed after a delete of the same id is stamped at its commit
    sequence and SERVES under the merged view (pre-r14 it read as
    sequence 0 and silently died under the earlier delete — ADVICE
    r13); mirrors are unaffected because CDF feeds carry the source's
    stamps verbatim."""
    root = str(tmp_path / "t")
    _corpus(spark, root)
    # adopt the axis (schema gains _useq)
    lake.upsert_rows(
        spark, root, "docs", "doc_id",
        spark.createDataFrame([Row(doc_id=0, v=-1.0)],
                              "doc_id bigint, v double"),
    )
    lake.delete_rows(spark, root, "docs", "doc_id", [5])
    lake.append_segments(
        spark, root,
        appends={"docs": spark.createDataFrame(
            [Row(doc_id=5, v=555.0)], "doc_id bigint, v double"
        )},
    )
    got = {
        r.doc_id: r.v
        for r in lake.read_segmented_merged(
            spark, root, "docs", "doc_id"
        ).collect()
    }
    assert got[5] == 555.0, "append after delete must serve (commit order)"
    # the mirror replays the same history through the CDF feed
    dst = str(tmp_path / "dst")
    lake.consume_changes(spark, root, "docs", dst, merge=True)
    mirror = {
        r.doc_id: r.v
        for r in lake.read_segmented_merged(
            spark, dst, "docs", "doc_id"
        ).collect()
    }
    assert mirror == got


def test_merge_rows_update_set_partial_column_patch(spark, tmp_path):
    """UPDATE SET c = expr (partial-column MERGE): a narrow patch frame
    rewrites only the named columns — every other column keeps the
    target's value — expressions see both sides (source./target.), a
    patch writing the value already there skips, a multi-row patch per
    key raises, and key columns are not rewritable."""
    import pytest

    root = str(tmp_path / "t")
    lake.append_segments(
        spark, root,
        appends={"dim": spark.createDataFrame(
            [Row(k=1, g="a", price=10.0, note="n1"),
             Row(k=2, g="b", price=20.0, note="n2"),
             Row(k=3, g="c", price=30.0, note="n3")],
            "k bigint, g string, price double, note string",
        )},
        init=True,
    )
    patch = spark.createDataFrame(
        [Row(k=1, price=11.0), Row(k=2, price=20.0), Row(k=9, price=99.0)],
        "k bigint, price double",
    )
    rep = lake.merge_rows(
        spark, root, "dim", "k", patch, update_set={"price": "source.price"}
    )
    assert (rep["updated"], rep["skipped"], rep["inserted"]) == (1, 1, 1)
    got = {
        r.k: (r.g, r.price, r.note)
        for r in lake.read_segmented_merged(spark, root, "dim", "k").collect()
    }
    assert got[1] == ("a", 11.0, "n1")  # non-patched columns survive
    assert got[2] == ("b", 20.0, "n2")  # value-identical patch skipped
    assert got[9] == (None, 99.0, None)  # narrow insert null-fills
    rep = lake.merge_rows(
        spark, root, "dim", "k",
        spark.createDataFrame([Row(k=3, price=5.0)], "k bigint, price double"),
        update_set={"price": "target.price + source.price"},
    )
    assert rep["updated"] == 1
    got = {
        r.k: r.price
        for r in lake.read_segmented_merged(spark, root, "dim", "k").collect()
    }
    assert got[3] == 35.0
    with pytest.raises(ValueError, match="unique per key"):
        lake.merge_rows(
            spark, root, "dim", "k",
            spark.createDataFrame(
                [Row(k=1, price=1.0), Row(k=1, price=2.0)],
                "k bigint, price double",
            ),
            update_set={"price": "source.price"},
        )
    with pytest.raises(ValueError, match="key column"):
        lake.merge_rows(
            spark, root, "dim", "k", patch, update_set={"k": "source.k"}
        )


def test_merge_rows_narrow_patch_guard_and_insert_values(spark, tmp_path):
    """The r14 VERDICT #1 footgun, closed: update_set with the default
    insert_unmatched=True RAISES when the batch carries scratch columns
    outside the target schema (an unmatched key would null-pad an
    insert AND evolve the schema); insert_values — the explicit WHEN
    NOT MATCHED THEN INSERT (cols) VALUES (...) clause — projects
    inserts onto the target's recorded columns so the schema can never
    evolve from an insert."""
    import pytest

    root = str(tmp_path / "t")
    lake.append_segments(
        spark, root,
        appends={"dim": spark.createDataFrame(
            [Row(k=1, g="a", price=10.0, note="n1"),
             Row(k=2, g="b", price=20.0, note="n2")],
            "k bigint, g string, price double, note string",
        )},
        init=True,
    )
    # keys + scratch 'delta' patch with an unmatched key: the old
    # behavior inserted (k=9, NULLs..., delta=5.0) and evolved 'delta'
    # into the dimension — now it raises before touching anything
    scratch_patch = spark.createDataFrame(
        [Row(k=1, delta=1.5), Row(k=9, delta=5.0)], "k bigint, delta double"
    )
    with pytest.raises(ValueError, match="non-target column"):
        lake.merge_rows(
            spark, root, "dim", "k", scratch_patch,
            update_set={"price": "target.price + source.delta"},
        )
    rec = lake.segment_schemas(spark, root)["dim"]
    assert "delta" not in {f["name"] for f in rec["fields"]}  # no evolution
    # insert_unmatched=False: the documented patch-only path, unchanged
    rep = lake.merge_rows(
        spark, root, "dim", "k", scratch_patch,
        update_set={"price": "target.price + source.delta"},
        insert_unmatched=False,
    )
    assert (rep["updated"], rep["inserted"], rep["skipped"]) == (1, 0, 1)
    # insert_values: explicit projection — keys ride source.<key>,
    # named columns evaluate over source.*, the rest insert NULL
    rep = lake.merge_rows(
        spark, root, "dim", "k", scratch_patch,
        update_set={"price": "target.price + source.delta"},
        insert_values={"price": "source.delta * 10", "g": "'new'"},
    )
    assert (rep["updated"], rep["inserted"]) == (1, 1)
    got = {
        r.k: (r.g, r.price, r.note)
        for r in lake.read_segmented_merged(spark, root, "dim", "k").collect()
    }
    assert got[1] == ("a", 13.0, "n1")  # 10 + 1.5 + 1.5
    assert got[9] == ("new", 50.0, None)  # projected insert, no 'delta'
    rec = lake.segment_schemas(spark, root)["dim"]
    assert "delta" not in {f["name"] for f in rec["fields"]}
    # static validation
    with pytest.raises(ValueError, match="requires insert_unmatched"):
        lake.merge_rows(
            spark, root, "dim", "k", scratch_patch,
            insert_values={"price": "source.delta"}, insert_unmatched=False,
        )
    with pytest.raises(ValueError, match="key column"):
        lake.merge_rows(
            spark, root, "dim", "k", scratch_patch,
            insert_values={"k": "source.k + 100"},
        )
    with pytest.raises(ValueError, match="not in the target"):
        lake.merge_rows(
            spark, root, "dim", "k", scratch_patch,
            insert_values={"delta": "source.delta"},
        )


def test_merge_rows_noop_with_extra_meta_reports_committed_version(
    spark, tmp_path
):
    """A fully-no-op batch with extra_meta performs a meta-only flip at
    base+1 — the report must carry THAT version, not the pre-commit
    base (r14 ADVICE #4: a streaming committer reconciles where its
    batch id actually landed)."""
    root = str(tmp_path / "t")
    _dim(spark, root)
    v0 = lake.segment_pins_versioned(spark, root)[1]
    same = spark.createDataFrame(
        [Row(k1=0, k2="g0", v=0.0)], "k1 bigint, k2 string, v double"
    )
    rep = lake.merge_rows(
        spark, root, "dim", ["k1", "k2"], same, extra_meta={"bid": 7}
    )
    assert not rep["applied"] and rep.get("meta_only")
    assert rep["version"] == v0 + 1
    assert lake.segment_pins_versioned(spark, root)[1] == rep["version"]
    assert lake.segment_meta(spark, root)["bid"] == 7


def test_merge_rows_when_matched_delete_clause(spark, tmp_path):
    """WHEN MATCHED AND <pred> THEN DELETE: matched keys satisfying the
    predicate tombstone at this commit's sequence (no replacement
    rows); the delete clause wins a double match; a delete-only batch
    commits no data segment; a later merge resurrects."""
    root = str(tmp_path / "t")
    _dim(spark, root)  # k1 0..11, k2 g{k1%3}, v float(k1)
    batch = spark.createDataFrame(
        [Row(k1=1, k2="g1", v=-1.0),   # delete marker
         Row(k1=2, k2="g2", v=200.0),  # update
         Row(k1=3, k2="g0", v=3.0),    # unchanged -> skip
         Row(k1=99, k2="gX", v=9.0)],  # insert
        "k1 bigint, k2 string, v double",
    )
    rep = lake.merge_rows(
        spark, root, "dim", ["k1", "k2"], batch,
        when_matched_delete="source.v < 0",
    )
    assert (rep["updated"], rep["inserted"], rep["deleted"], rep["skipped"]) \
        == (1, 1, 1, 1)
    got = {
        (r.k1, r.k2): r.v
        for r in lake.read_segmented_merged(
            spark, root, "dim", ["k1", "k2"]
        ).collect()
    }
    assert (1, "g1") not in got and got[(2, "g2")] == 200.0
    assert got[(99, "gX")] == 9.0 and len(got) == 12  # 12 - 1 del + 1 ins
    # counter: update + delete keys both churn
    assert lake.segment_meta(spark, root)[
        lake.component_tombstone_rows_key("dim")
    ] == 2
    # double match (delete pred AND changed): delete wins
    data_pins = lake.segment_pins(spark, root)["dim"]
    rep = lake.merge_rows(
        spark, root, "dim", ["k1", "k2"],
        spark.createDataFrame([Row(k1=2, k2="g2", v=-5.0)],
                              "k1 bigint, k2 string, v double"),
        when_matched_delete="source.v < 0",
    )
    assert rep["deleted"] == 1 and rep["updated"] == 0
    # delete-only batch: tombstone append only, data pins untouched
    assert lake.segment_pins(spark, root)["dim"] == data_pins
    assert (2, "g2") not in {
        (r.k1, r.k2)
        for r in lake.read_segmented_merged(
            spark, root, "dim", ["k1", "k2"]
        ).collect()
    }
    # resurrect via merge insert
    rep = lake.merge_rows(
        spark, root, "dim", ["k1", "k2"],
        spark.createDataFrame([Row(k1=2, k2="g2", v=2.5)],
                              "k1 bigint, k2 string, v double"),
    )
    assert rep["inserted"] == 1


def test_merge_rows_not_matched_by_source_clauses(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE | UPDATE SET
    (the third Delta clause class): target keys ABSENT from the batch
    retire or staleness-mark; the delete clause wins a double match;
    rows not satisfying the SET condition keep their values (row-wise
    patch); skip_unchanged makes an idempotent SET replay a no-op;
    NULL-keyed target rows are unaddressable and never mis-deleted;
    validation raises on key/unknown SET columns."""
    root = str(tmp_path / "t")
    dim = spark.createDataFrame(
        [Row(k=1, g="a", v=1.0), Row(k=2, g="b", v=2.0),
         Row(k=3, g="c", v=3.0), Row(k=4, g="d", v=4.0),
         Row(k=None, g="nullkey", v=0.0)],
        "k bigint, g string, v double",
    )
    lake.append_segments(spark, root, {"dim": dim}, init=True)
    batch = spark.createDataFrame(
        [Row(k=1, g="a", v=10.0)], "k bigint, g string, v double"
    )
    kw = {
        "when_not_matched_by_source_delete": "target.k = 4",
        "when_not_matched_by_source_set": {"g": "concat(target.g, '!')"},
        "when_not_matched_by_source_condition": "target.k >= 3",
    }
    rep = lake.merge_rows(spark, root, "dim", "k", batch, **kw)
    # k=1 updates; k=4 deletes; k=3 marks (k=4 matched both -> delete
    # wins); k=2 and the NULL-keyed row untouched
    assert (rep["updated"], rep["nmbs_updated"], rep["nmbs_deleted"]) \
        == (1, 1, 1)
    got = {
        r.k: (r.g, r.v)
        for r in lake.read_segmented_merged(spark, root, "dim", "k")
        .collect()
    }
    assert got[1] == ("a", 10.0) and got[2] == ("b", 2.0)
    assert got[3] == ("c!", 3.0) and 4 not in got
    assert got[None] == ("nullkey", 0.0)  # unaddressable, never deleted
    # pressure counter: matched update + nmbs update + nmbs delete
    assert lake.segment_meta(spark, root)[
        lake.component_tombstone_rows_key("dim")
    ] == 3
    # replay with an idempotent SET: complete no-op, version pinned
    v = lake.segment_pins_versioned(spark, root)[1]
    rep2 = lake.merge_rows(
        spark, root, "dim", "k", batch,
        when_not_matched_by_source_delete="target.k = 4",
        when_not_matched_by_source_set={"g": "'c!'"},
        when_not_matched_by_source_condition="target.k = 3",
    )
    assert not rep2["applied"]
    assert rep2["nmbs_updated"] == 0 and rep2["nmbs_deleted"] == 0
    assert lake.segment_pins_versioned(spark, root)[1] == v
    # validation: SET on a key column / unknown column raises
    with pytest.raises(ValueError, match="key column"):
        lake.merge_rows(
            spark, root, "dim", "k", batch,
            when_not_matched_by_source_set={"k": "target.k + 1"},
        )
    with pytest.raises(ValueError, match="recorded schema"):
        lake.merge_rows(
            spark, root, "dim", "k", batch,
            when_not_matched_by_source_set={"nope": "1"},
        )


def test_merge_rows_cdc_apply_shape(spark, tmp_path):
    """The single-commit CDC-apply shape: when_not_matched_insert
    (WHEN NOT MATCHED AND cond THEN INSERT) + source_scratch_cols (the
    feed's op marker — visible to every clause predicate, dropped from
    every written row, excluded from the skip-unchanged fingerprint).
    One merge commit applies a mixed U/D/I feed; markers never evolve
    the schema; a replay of the same feed is a complete no-op; a
    delete marker for an absent key does NOT insert a null row."""
    root = str(tmp_path / "t")
    lake.append_segments(
        spark, root,
        {"t": spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")],
            "k bigint, v string",
        )},
        init=True,
    )
    cdc = spark.createDataFrame(
        [Row(k=1, v="A", _op="U"), Row(k=2, v=None, _op="D"),
         Row(k=9, v="i", _op="I"), Row(k=8, v=None, _op="D")],
        "k bigint, v string, _op string",
    )
    kw = {
        "when_matched_delete": "source._op = 'D'",
        "when_not_matched_insert": "source._op != 'D'",
        "source_scratch_cols": ["_op"],
    }
    rep = lake.merge_rows(spark, root, "t", "k", cdc, **kw)
    assert (rep["updated"], rep["inserted"], rep["deleted"],
            rep["skipped"]) == (1, 1, 1, 1)
    got = sorted(
        (r.k, r.v)
        for r in lake.read_segmented_merged(spark, root, "t", "k")
        .drop("_useq").collect()
    )
    assert got == [(1, "A"), (3, "c"), (9, "i")]
    rec = lake.segment_schemas(spark, root)["t"]
    assert "_op" not in {f["name"] for f in rec["fields"]}
    # replay: update content-equal -> skip; dead keys unmatched with a
    # D marker -> no insert; version pinned
    v = lake.segment_pins_versioned(spark, root)[1]
    rep2 = lake.merge_rows(spark, root, "t", "k", cdc, **kw)
    assert not rep2["applied"] and rep2["skipped"] == 4
    assert lake.segment_pins_versioned(spark, root)[1] == v
    # a marker flip alone must not defeat skip-if-unchanged
    rep3 = lake.merge_rows(
        spark, root, "t", "k",
        spark.createDataFrame(
            [Row(k=1, v="A", _op="UU")], "k bigint, v string, _op string"
        ),
        **kw,
    )
    assert not rep3["applied"] and rep3["skipped"] == 1
    # validation: scratch col must exist and not be a key
    with pytest.raises(ValueError, match="not in the batch"):
        lake.merge_rows(
            spark, root, "t", "k", cdc.drop("_op"),
            source_scratch_cols=["_op"],
        )
    with pytest.raises(ValueError, match="key column"):
        lake.merge_rows(spark, root, "t", "k", cdc,
                        source_scratch_cols=["k"])


def test_stream_merge_sink_is_replay_safe(spark, tmp_path):
    """The foreachBatch merge sink (streaming/lake_merge): the batch id
    rides the merge's own manifest flip — a replayed batch is skipped
    untouched (even a non-idempotent update_set delta patch), a no-op
    batch still records its id (meta-only flip), and the bootstrap
    batch plain-appends."""
    from ed_housing_data_pipeline_spark.streaming import lake_merge

    root = str(tmp_path / "t")
    b0 = spark.createDataFrame(
        [Row(k=i, v=float(i)) for i in range(6)], "k bigint, v double"
    )
    rep = lake_merge.sink_merge_batch(spark, root, "dim", "k", b0, 0)
    assert rep["committed"] and rep.get("bootstrap")
    patch = spark.createDataFrame([Row(k=1, v=100.0)], "k bigint, v double")
    rep = lake_merge.sink_merge_batch(
        spark, root, "dim", "k", patch, 1,
        update_set={"v": "target.v + source.v"},
    )
    assert rep["committed"] and rep["updated"] == 1
    got = {r.k: r.v for r in
           lake.read_segmented_merged(spark, root, "dim", "k").collect()}
    assert got[1] == 101.0
    # REPLAY of the delta patch: must not double-apply
    rep = lake_merge.sink_merge_batch(
        spark, root, "dim", "k", patch, 1,
        update_set={"v": "target.v + source.v"},
    )
    assert not rep["committed"] and rep.get("replay")
    got = {r.k: r.v for r in
           lake.read_segmented_merged(spark, root, "dim", "k").collect()}
    assert got[1] == 101.0
    # a fully-no-op batch still advances the id (meta-only flip)
    noop = spark.createDataFrame([Row(k=2, v=2.0)], "k bigint, v double")
    rep = lake_merge.sink_merge_batch(spark, root, "dim", "k", noop, 2)
    assert rep["committed"] and not rep["applied"]
    assert lake.segment_meta(spark, root)[lake_merge.LAST_BATCH_KEY] == 2
    rep = lake_merge.sink_merge_batch(spark, root, "dim", "k", noop, 2)
    assert not rep["committed"] and rep.get("replay")


def test_merge_rows_prunes_touched_segments_by_zonemap(spark, tmp_path):
    """The Delta/Iceberg MERGE file-skip shape: with zonemap coverage
    on the key, the target read drops every segment whose key range
    cannot intersect the batch's (min, max) — at 100 TB the merge
    scans touched segments, not the table. A batch entirely outside
    every range reads an EMPTY target (pure insert)."""
    root = str(tmp_path / "t")
    _corpus(spark, root)  # two segments: doc_id 0-39 and 40-79, zoned
    seg_lo, seg_hi = lake.segment_pins(spark, root)["docs"]
    reads: list[list[int]] = []
    real = lake.read_segments

    def spy(spark_, comp_root, segments, **kw):
        if comp_root.endswith("/docs"):
            reads.append(sorted(segments))
        return real(spark_, comp_root, segments, **kw)

    import unittest.mock as mock

    with mock.patch.object(lake, "read_segments", side_effect=spy):
        rep = lake.merge_rows(
            spark, root, "docs", "doc_id",
            spark.createDataFrame(
                [Row(doc_id=41, v=-41.0), Row(doc_id=50, v=50.0)],
                "doc_id bigint, v double",
            ),
            zone_cols=["doc_id"],  # the revision segment stays prunable
        )
    assert rep["updated"] == 1 and rep["skipped"] == 1
    assert [seg_lo] not in reads  # never scanned alone…
    assert all(seg_lo not in segs for segs in reads), (
        f"low segment (0-39) must be pruned for a 41-50 batch: {reads}"
    )
    # a fully out-of-range batch inserts against an EMPTY target scan
    reads.clear()
    with mock.patch.object(lake, "read_segments", side_effect=spy):
        rep = lake.merge_rows(
            spark, root, "docs", "doc_id",
            spark.createDataFrame(
                [Row(doc_id=500, v=5.0)], "doc_id bigint, v double"
            ),
        )
    assert rep["inserted"] == 1 and reads == [], reads
    got = {
        r.doc_id: r.v
        for r in lake.read_segmented_merged(spark, root, "docs", "doc_id").collect()
    }
    assert got[41] == -41.0 and got[500] == 5.0 and got[50] == 50.0


def test_merge_rows_bloom_prunes_scattered_point_batch(spark, tmp_path):
    """Bloom-backed probe pruning (r14 VERDICT #4): segments whose key
    RANGES fully overlap (interleaved even/odd ids) defeat zonemap
    pruning, but a bounded point-key batch tests its actual keys
    against each segment's bloom sidecar driver-side — the target read
    drops every bloom-miss segment, and the report says so."""
    import unittest.mock as mock

    root = str(tmp_path / "t")
    even = spark.createDataFrame(
        [Row(doc_id=j, v=float(j)) for j in range(0, 80, 2)],
        "doc_id bigint, v double",
    ).coalesce(1)
    odd = spark.createDataFrame(
        [Row(doc_id=j, v=float(j)) for j in range(1, 80, 2)],
        "doc_id bigint, v double",
    ).coalesce(1)
    lake.append_segments(
        spark, root, {"docs": even}, init=True,
        zone_cols={"docs": ["doc_id"]}, bloom_cols={"docs": ["doc_id"]},
    )
    lake.append_segments(
        spark, root, {"docs": odd},
        zone_cols={"docs": ["doc_id"]}, bloom_cols={"docs": ["doc_id"]},
    )
    seg_even, seg_odd = lake.segment_pins(spark, root)["docs"]
    reads: list[list[int]] = []
    real = lake.read_segments

    def spy(spark_, comp_root, segments, **kw):
        if comp_root.endswith("/docs"):
            reads.append(sorted(segments))
        return real(spark_, comp_root, segments, **kw)

    batch = spark.createDataFrame(
        [Row(doc_id=40, v=-40.0)], "doc_id bigint, v double"
    )
    with mock.patch.object(lake, "read_segments", side_effect=spy):
        rep = lake.merge_rows(
            spark, root, "docs", "doc_id", batch,
            zone_cols=["doc_id"], bloom_cols=["doc_id"],
        )
    assert rep["updated"] == 1
    assert rep["probe"] == {"segments_pinned": 2, "segments_read": 1}
    assert all(seg_odd not in segs for segs in reads), (
        f"odd segment must be bloom-pruned for an even-key batch: {reads}"
    )
    # a batch touching both parities reads both segments (no wrong prune)
    reads.clear()
    both = spark.createDataFrame(
        [Row(doc_id=2, v=-2.0), Row(doc_id=3, v=-3.0)],
        "doc_id bigint, v double",
    )
    with mock.patch.object(lake, "read_segments", side_effect=spy):
        rep = lake.merge_rows(
            spark, root, "docs", "doc_id", both,
            zone_cols=["doc_id"], bloom_cols=["doc_id"],
        )
    assert rep["updated"] == 2
    # even+odd bloom-hit; merge #1's revision segment (doc_id 40 only)
    # bloom-misses keys {2,3} and is pruned too
    assert rep["probe"] == {"segments_pinned": 3, "segments_read": 2}
    # cap 0 disables bloom probing: back to the (useless-here) zonemaps
    rep = lake.merge_rows(
        spark, root, "docs", "doc_id",
        spark.createDataFrame([Row(doc_id=4, v=-4.0)],
                              "doc_id bigint, v double"),
        bloom_probe_cap=0,
    )
    assert rep["updated"] == 1
    # zonemaps prune the tight revision segments ([40,40] and [2,3])
    # but CANNOT prune either overlapping parity segment for key 4 —
    # exactly the gap bloom probing closes
    assert rep["probe"] == {"segments_pinned": 4, "segments_read": 2}
    got = {
        r.doc_id: r.v
        for r in lake.read_segmented_merged(spark, root, "docs", "doc_id").collect()
    }
    assert got[40] == -40.0 and got[2] == -2.0 and got[3] == -3.0
    assert got[4] == -4.0 and got[5] == 5.0


def test_merge_rows_retries_past_a_rival_commit(spark, tmp_path, monkeypatch):
    """A rival ingest landing mid-merge costs a retry, never a lost
    update or a stale decision: the retry recomputes matched/changed
    against the FRESH state (the rival's rows are visible to it) and
    both commits survive."""
    root = str(tmp_path / "t")
    _dim(spark, root)
    real_commit = lake.commit_segment_manifest
    state = {"armed": True}

    def rival_lands_first(*args, **kwargs):
        if state["armed"]:
            state["armed"] = False
            lake.append_segments(
                spark, root,
                appends={"dim": spark.createDataFrame(
                    [Row(k1=900, k2="gZ", v=9.0)],
                    "k1 bigint, k2 string, v double",
                )},
            )
        return real_commit(*args, **kwargs)

    monkeypatch.setattr(lake, "commit_segment_manifest", rival_lands_first)
    rep = lake.merge_rows(
        spark, root, "dim", ["k1", "k2"],
        spark.createDataFrame(
            [Row(k1=900, k2="gZ", v=9.0),   # the rival's row: now a SKIP
             Row(k1=1, k2="g1", v=111.0)],  # update
            "k1 bigint, k2 string, v double",
        ),
    )
    monkeypatch.setattr(lake, "commit_segment_manifest", real_commit)
    assert rep["attempts"] == 2
    # the retry's decision saw the rival's row: skip, not insert
    assert (rep["updated"], rep["inserted"], rep["skipped"]) == (1, 0, 1)
    got = {
        (r.k1, r.k2): r.v
        for r in lake.read_segmented_merged(
            spark, root, "dim", ["k1", "k2"]
        ).collect()
    }
    assert got[(900, "gZ")] == 9.0 and got[(1, "g1")] == 111.0


def test_merge_rows_prunes_on_composite_keys(spark, tmp_path):
    """Composite-key pruning intersects per-column kept sets: a batch
    whose (k1, k2) bounds miss a segment on EITHER covered column
    drops it; an equi-join match needs every column in range, so the
    intersection is exact-conservative."""
    import unittest.mock as mock

    root = str(tmp_path / "t")
    for i, (lo, hi) in enumerate(((0, 40), (40, 80))):
        lake.append_segments(
            spark, root,
            appends={"t": spark.createDataFrame(
                [Row(a=j, b=j % 10, v=float(j)) for j in range(lo, hi)],
                "a bigint, b bigint, v double",
            ).coalesce(1)},
            init=(i == 0),
            zone_cols={"t": ["a", "b"]},
        )
    seg_lo, seg_hi = lake.segment_pins(spark, root)["t"]
    reads: list[list[int]] = []
    real = lake.read_segments

    def spy(spark_, comp_root, segments, **kw):
        if comp_root.endswith("/t"):
            reads.append(sorted(segments))
        return real(spark_, comp_root, segments, **kw)

    with mock.patch.object(lake, "read_segments", side_effect=spy):
        rep = lake.merge_rows(
            spark, root, "t", ["a", "b"],
            spark.createDataFrame(
                [Row(a=45, b=5, v=-1.0)], "a bigint, b bigint, v double"
            ),
        )
    assert rep["updated"] == 1
    assert all(seg_lo not in segs for segs in reads), (
        f"a=45 misses the 0-39 segment on column a: {reads}"
    )
    got = {
        (r.a, r.b): r.v
        for r in lake.read_segmented_merged(spark, root, "t", ["a", "b"]).collect()
    }
    assert got[(45, 5)] == -1.0 and len(got) == 80
