"""lake.maintain — the single cadence verb sequencing size-tiered
compaction → recluster waves → coverage repair → retention. A fleet
scheduler calls ONE verb per root; these tests drive a long ingest
through it exclusively and pin the bounded-growth + correctness
contract, plus dry-run/apply parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.operators import zcluster
from ed_housing_data_pipeline_spark.sources import lake


def _batch(spark, seed: int, n: int = 400):
    import random

    rng = random.Random(seed)
    rows = [
        (seed * 10_000 + i, rng.randrange(1000), rng.randrange(1, 13))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id bigint, k int, m int").coalesce(1)


_POLICY = {
    "recluster": {
        "t": {
            "exprs": ["CAST(floor(k / 4) AS INT)", "m"],
            "zone_cols": ("k", "m"),
            "n_segments": 4,
            "max_waves": 2,
        }
    },
    "expire": {"keep_manifests": 2, "orphan_grace_sec": 0},
}


def test_maintain_long_ingest_bounded_and_correct(spark, tmp_path):
    """12 ingest batches, maintenance ONLY through maintain(): pins
    stay bounded (level-merge fires automatically), every row stays
    served, box pruning stays effective, and each report carries the
    per-step actions."""
    root = str(tmp_path / "ds")
    total = 0
    pin_counts = []
    for rnd in range(4):
        for b in range(3):
            seed = rnd * 3 + b
            lake.append_segments(
                spark, root, {"t": _batch(spark, seed)},
                init=(seed == 0), zone_cols={"t": ["k", "m"]},
            )
            total += 400
        rep = lake.maintain(spark, root, _POLICY)
        assert not rep["dry_run"]
        assert rep["compact"] == {"skipped": True}
        assert rep["repair"]["ok"], rep["repair"]
        assert "swept" in rep["expire"]
        assert rep["recluster"]["t"]["new_segments"], rep["recluster"]
        pin_counts.append(len(lake.segment_pins(spark, root)["t"]))
    # bounded: never beyond max_waves x n_segments
    assert max(pin_counts) <= 2 * 4, pin_counts
    live = lake.read_segmented_components(spark, root, ["t"])["t"]
    assert live.count() == total
    # pruning engaged after maintenance
    box = {"k": (0, 240), "m": (1, 3)}
    kept, pinned = zcluster.box_pruned_pins(spark, root, "t", box)
    assert 0 < len(kept) < len(pinned)
    pred = F.col("k").between(0, 240) & F.col("m").between(1, 3)
    got = zcluster.read_box(spark, root, "t", box).filter(pred).count()
    assert got == live.filter(pred).count()
    # converged: an idle cadence folds nothing and commits nothing
    v0 = lake.segment_pins_versioned(spark, root)[1]
    rep_idle = lake.maintain(spark, root, _POLICY)
    assert rep_idle["recluster"]["t"] == {"folded": [], "new_segments": []}
    assert rep_idle["version"] == v0


def test_maintain_dry_run_matches_apply(spark, tmp_path):
    """Plan/apply parity: the dry-run report names exactly the fold
    sets the apply pass then folds, and commits nothing."""
    root = str(tmp_path / "ds")
    for seed in range(3):
        lake.append_segments(
            spark, root, {"t": _batch(spark, seed)},
            init=(seed == 0), zone_cols={"t": ["k", "m"]},
        )
    v0 = lake.segment_pins_versioned(spark, root)[1]
    plan = lake.maintain(spark, root, _POLICY, dry_run=True)
    assert plan["dry_run"]
    assert lake.segment_pins_versioned(spark, root)[1] == v0  # no commit
    assert plan["expire"] == {"skipped": True, "reason": "dry_run"}
    would = plan["recluster"]["t"]["would_fold"]
    assert sorted(would) == lake.segment_pins(spark, root)["t"]
    rep = lake.maintain(spark, root, _POLICY)
    assert rep["recluster"]["t"]["folded"] == sorted(would)


def test_maintain_compact_step_and_policy_gating(spark, tmp_path):
    """The compact step folds the small tail under the size tier and
    reports exactly what it unpinned; omitted steps report skipped."""
    root = str(tmp_path / "ds")
    big = spark.createDataFrame(
        [(i, i % 100, i % 12 + 1) for i in range(20_000)],
        "id bigint, k int, m int",
    ).coalesce(1)
    lake.append_segments(spark, root, {"t": big}, init=True)
    for seed in (1, 2):
        lake.append_segments(spark, root, {"t": _batch(spark, seed, n=50)})
    pins0 = lake.segment_pins(spark, root)["t"]
    big_seg = pins0[0]
    thresh = lake.segment_sizes(spark, root, "t", [big_seg])[big_seg]
    policy = {
        "compact": {"max_segment_bytes": thresh},
        "repair": False,
        "expire": False,
    }
    plan = lake.maintain(spark, root, policy, dry_run=True)
    assert plan["compact"]["would_fold"] == {"t": pins0[1:]}
    assert plan["recluster"] == {"skipped": True}
    assert plan["repair"] == {"skipped": True}
    rep = lake.maintain(spark, root, policy)
    assert rep["compact"]["folded"] == {"t": pins0[1:]}
    assert rep["repair"] == {"skipped": True}
    assert rep["expire"] == {"skipped": True}
    pins1 = lake.segment_pins(spark, root)["t"]
    assert big_seg in pins1 and len(pins1) == 2  # graduated + folded tail
    assert (
        lake.read_segmented_components(spark, root, ["t"])["t"].count()
        == 20_000 + 100
    )


def test_maintain_applies_tombstones_with_merged_semantics(spark, tmp_path):
    """The cadence verb can make logical deletes physical (bounding the
    read-time watermark fold): upserted/resurrected revisions survive
    the apply, the tombstone component resets, dry-run only reports,
    and a tombstone-free component is a no-op."""
    from pyspark.sql import functions as F

    from ed_housing_data_pipeline_spark.sources import lake

    root = str(tmp_path / "ds")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )

    lake.append_segments(spark, root, {"t": batch(0, 30)}, init=True)
    lake.delete_rows(spark, root, "t", "k", [1, 2])
    lake.upsert_rows(  # resurrect 2
        spark, root, "t", "k",
        spark.range(2, 3).select(F.col("id").alias("k"), F.lit(22.0).alias("v")),
    )
    want = sorted(
        (r.k, r.v)
        for r in lake.read_segmented_merged(spark, root, "t", "k").collect()
    )
    dry = lake.maintain(
        spark, root, {"apply_tombstones": {"t": {"id_col": "k"}}},
        dry_run=True,
    )
    assert dry["apply_tombstones"] == {"t": "would_apply"}
    rep = lake.maintain(
        spark, root, {"apply_tombstones": {"t": {"id_col": "k"}}}
    )
    assert rep["apply_tombstones"] == {"t": "applied"}
    pins = lake.segment_pins(spark, root)
    assert len(pins["t"]) == 1
    tomb = lake.tombstone_component("t")
    assert lake.read_segments(spark, f"{root}/{tomb}", pins[tomb]).count() == 0
    got = sorted(
        (r.k, r.v)
        for r in lake.read_segmented_merged(spark, root, "t", "k").collect()
    )
    assert got == want and (2, 22.0) in got and (1, 1.0) not in got
    # fresh component without tombstones: the step is a no-op
    rep2 = lake.maintain(
        spark, root, {"apply_tombstones": {"t": {"id_col": "k"}}}
    )
    assert rep2["apply_tombstones"] == {"t": "no_tombstones"}
