"""Continuous-rollup (incremental materialized aggregate) contracts.

The load-bearing invariant: merge(partial segments of any batch
partition of the facts) == direct aggregate of all facts — per key,
for every kept statistic, including NULL-measure and empty-batch
edges. Plus the protocol contracts the other segmented artifacts pin:
spec immutability, crash-before-flip invisibility, compaction
content-neutrality with zonemap coverage surviving, and chunk-excluded
range reads matching the full view.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, functions as F

from ed_housing_data_pipeline_spark.operators import rollup
from ed_housing_data_pipeline_spark.sources import lake
from tests.conftest import rows

KEYS = ["grp", "bucket"]
MEASURES = {"v": "val"}


def _r6(ts):
    """Rows with floats rounded to 6 dp: partial-sum association vs
    direct-sum association differ in the last double bits (that's IEEE
    754, not a correctness bug — the registered query rounds its
    exported sums the same way)."""
    return [
        tuple(round(v, 6) if isinstance(v, float) else v for v in t) for t in ts
    ]


def _facts(n: int = 120, seed: int = 7):
    rng = random.Random(seed)
    return [
        Row(
            grp=rng.choice(["a", "b", "c"]),
            bucket=rng.randint(1, 6),
            val=None if rng.random() < 0.15 else round(rng.uniform(-50, 150), 3),
        )
        for _ in range(n)
    ]


def _df(spark, data):
    return spark.createDataFrame(data, "grp string, bucket int, val double")


def _direct(spark, data):
    """The non-incremental truth: one GROUP BY over all facts."""
    return rows(
        _df(spark, data)
        .groupBy(*KEYS)
        .agg(
            F.count(F.lit(1)).alias("_rows"),
            F.sum("val").alias("v_sum"),
            F.count("val").alias("v_cnt"),
            F.min("val").alias("v_min"),
            F.max("val").alias("v_max"),
        )
    )


def _build(spark, root, data, cuts, zone_keys=("bucket",)):
    """Bootstrap on data[:cuts[0]], append the remaining slices."""
    parts = [data[: cuts[0]]] + [
        data[a:b] for a, b in zip(cuts, [*cuts[1:], len(data)])
    ]
    rollup.bootstrap_rollup(
        spark,
        root,
        _df(spark, parts[0]),
        KEYS,
        MEASURES,
        zone_keys=list(zone_keys),
        segment_partitions=1,
    )
    for p in parts[1:]:
        rollup.append_rollup_batch(
            spark, root, _df(spark, p), segment_partitions=1
        )


def test_incremental_equals_direct_over_random_splits(spark, tmp_path):
    data = _facts()
    for i, cuts in enumerate([[40, 80], [1, 2, 3], [119], [60]]):
        root = str(tmp_path / f"r{i}")
        _build(spark, root, data, cuts)
        got = rollup.read_rollup(spark, root, derive_avg=False)
        assert _r6(rows(got)) == _r6(_direct(spark, data))


def test_avg_derivation_and_all_null_group(spark, tmp_path):
    data = [
        Row(grp="a", bucket=1, val=10.0),
        Row(grp="a", bucket=1, val=20.0),
        Row(grp="z", bucket=9, val=None),
        Row(grp="z", bucket=9, val=None),
    ]
    root = str(tmp_path / "r")
    _build(spark, root, data, cuts=[2])
    got = rows(
        rollup.read_rollup(spark, root).select(
            "grp", "_rows", "v_sum", "v_cnt", "v_avg"
        )
    )
    assert got == [("a", 2, 30.0, 2, 15.0), ("z", 2, None, 0, None)]


def test_empty_batch_append_is_a_noop_on_content(spark, tmp_path):
    data = _facts(40)
    root = str(tmp_path / "r")
    _build(spark, root, data, cuts=[40])  # second batch is empty
    assert _r6(rows(rollup.read_rollup(spark, root, derive_avg=False))) == _r6(
        _direct(spark, data)
    )


def test_compaction_is_content_neutral_and_keeps_zonemaps(spark, tmp_path):
    data = _facts()
    root = str(tmp_path / "r")
    _build(spark, root, data, cuts=[40, 80])
    before = rows(rollup.read_rollup(spark, root, derive_avg=False))
    rollup.compact_rollup(spark, root)
    pins = lake.segment_pins(spark, root)
    assert len(pins[rollup.PARTIALS]) == 1
    assert _r6(rows(rollup.read_rollup(spark, root, derive_avg=False))) == _r6(before)
    zones = lake.segment_zones(spark, root)
    (stats,) = zones[rollup.PARTIALS].values()
    assert stats["bucket"][:2] == [1, 6]


def test_range_read_prunes_segments_and_matches_full_view(spark, tmp_path):
    """Time-disjoint ingest batches (the hypertable shape): a bucket
    window must read fewer segments and equal the filtered view."""
    data = sorted(_facts(), key=lambda r: r.bucket)
    third = len(data) // 3
    root = str(tmp_path / "r")
    _build(spark, root, data, cuts=[third, 2 * third])
    kept, pinned = lake.zone_pruned_pins(
        spark, root, rollup.PARTIALS, "bucket", lo=1, hi=1
    )
    assert len(pinned) == 3 and len(kept) < 3
    got = rollup.read_rollup_range(
        spark, root, "bucket", lo=1, hi=1, derive_avg=False
    )
    want = rollup.read_rollup(spark, root, derive_avg=False).filter(
        F.col("bucket") == 1
    )
    assert _r6(rows(got)) == _r6(rows(want))


def test_range_read_requires_a_zone_key(spark, tmp_path):
    root = str(tmp_path / "r")
    _build(spark, root, _facts(30), cuts=[30], zone_keys=())
    with pytest.raises(ValueError, match="not a zone key"):
        rollup.read_rollup_range(spark, root, "bucket", lo=1, hi=2)


def test_second_bootstrap_raises_spec_is_immutable(spark, tmp_path):
    root = str(tmp_path / "r")
    _build(spark, root, _facts(30), cuts=[30])
    with pytest.raises(Exception, match="v=1|version 1|exists"):
        rollup.bootstrap_rollup(
            spark, root, _df(spark, _facts(5)), KEYS, MEASURES
        )


def test_unflipped_segment_stays_invisible(spark, tmp_path):
    """A partial segment written WITHOUT a manifest flip (crash before
    commit) must not leak into the served view."""
    data = _facts(60)
    root = str(tmp_path / "r")
    _build(spark, root, data[:40], cuts=[40])
    before = rows(rollup.read_rollup(spark, root, derive_avg=False))
    lake.write_segment(  # data write only — no commit_segment_manifest
        spark,
        rollup.partial_rollup(_df(spark, data[40:]), KEYS, MEASURES).coalesce(1),
        f"{root}/{rollup.PARTIALS}",
    )
    assert _r6(rows(rollup.read_rollup(spark, root, derive_avg=False))) == _r6(before)
    # the retried append commits and the view converges to all facts
    rollup.append_rollup_batch(spark, root, _df(spark, data[40:]))
    assert _r6(rows(rollup.read_rollup(spark, root, derive_avg=False))) == _r6(
        _direct(spark, data)
    )


def _sum_cnt(frame_rows):
    """(key..., _rows, v_sum(6dp), v_cnt) projection — the statistics
    the retraction contract promises EXACT (min/max are bounds)."""
    out = []
    for r in frame_rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        out.append(
            (
                d["grp"],
                d["bucket"],
                d["_rows"],
                round(d["v_sum"], 6) if d["v_sum"] is not None else None,
                d["v_cnt"],
            )
        )
    return sorted(out, key=lambda t: (t[0], t[1]))


def test_retraction_equals_direct_over_remaining_facts(spark, tmp_path):
    """retract_rollup_batch cancels the retracted facts' contribution
    exactly for _rows/sum/cnt (the contract), and a fully-retracted
    group drops out of the served view like a GROUP BY over corrected
    facts would drop it."""
    data = _facts()
    retract = [r for i, r in enumerate(data) if i % 9 == 0]
    remaining = [r for i, r in enumerate(data) if i % 9 != 0]
    root = str(tmp_path / "view")
    _build(spark, root, data, [40, 80])
    rollup.retract_rollup_batch(
        spark, root, _df(spark, retract), segment_partitions=1
    )
    got = rollup.read_rollup(spark, root, derive_avg=False)
    assert _sum_cnt(got.collect()) == _sum_cnt(
        _df(spark, remaining)
        .groupBy(*KEYS)
        .agg(
            F.count(F.lit(1)).alias("_rows"),
            F.sum("val").alias("v_sum"),
            F.count("val").alias("v_cnt"),
        )
        .collect()
    )


def test_retraction_drops_fully_retracted_group(spark, tmp_path):
    data = [
        Row(grp="only", bucket=1, val=10.0),
        Row(grp="only", bucket=1, val=20.0),
        Row(grp="keep", bucket=2, val=5.0),
    ]
    root = str(tmp_path / "view")
    _build(spark, root, data, [2])
    rollup.retract_rollup_batch(
        spark, root, _df(spark, data[:2]), segment_partitions=1
    )
    got = rows(rollup.read_rollup(spark, root, derive_avg=False))
    assert [(r[0], r[1], r[2]) for r in got] == [("keep", 2, 1)]


def test_retraction_minmax_are_conservative_bounds(spark, tmp_path):
    """After retracting the extreme fact, min/max still COVER the live
    values (they may over-cover — the documented deletable-aggregate
    limitation) while sum/cnt are exact."""
    data = [
        Row(grp="g", bucket=1, val=1.0),
        Row(grp="g", bucket=1, val=100.0),  # the max; gets retracted
        Row(grp="g", bucket=1, val=7.0),
    ]
    root = str(tmp_path / "view")
    _build(spark, root, data, [2])
    rollup.retract_rollup_batch(
        spark, root, _df(spark, [data[1]]), segment_partitions=1
    )
    r = rollup.read_rollup(spark, root, derive_avg=False).collect()[0]
    assert r["_rows"] == 2 and r["v_cnt"] == 2
    assert round(r["v_sum"], 6) == 8.0
    assert r["v_min"] <= 1.0 and r["v_max"] >= 7.0  # valid envelopes


def test_retraction_survives_compaction(spark, tmp_path):
    """Compacting a view with negative partials is content-neutral:
    the merge reducer folds the negatives in, fully-retracted groups
    leave the physical segment, and the served sums/counts are
    unchanged."""
    data = _facts(60)
    retract = data[10:25]
    root = str(tmp_path / "view")
    _build(spark, root, data, [30])
    rollup.retract_rollup_batch(
        spark, root, _df(spark, retract), segment_partitions=1
    )
    before = _sum_cnt(
        rollup.read_rollup(spark, root, derive_avg=False).collect()
    )
    pins = rollup.compact_rollup(spark, root)
    assert len(pins[rollup.PARTIALS]) == 1
    assert (
        _sum_cnt(rollup.read_rollup(spark, root, derive_avg=False).collect())
        == before
    )
    seg = lake.read_segments(
        spark, f"{root}/{rollup.PARTIALS}", pins[rollup.PARTIALS]
    )
    assert seg.filter("_rows <= 0").count() == 0


def test_repairing_retraction_exact_minmax_equals_direct(spark, tmp_path):
    """With remaining_facts supplied, the retraction re-aggregates the
    dirty groups' min/max and the served view equals the direct GROUP
    BY over the corrected facts for EVERY statistic — including the
    extremes a plain negation would have left as stale bounds."""
    data = _facts(150, seed=11)
    retract = [r for i, r in enumerate(data) if i % 7 == 0]
    remaining = [r for i, r in enumerate(data) if i % 7 != 0]
    root = str(tmp_path / "view")
    _build(spark, root, data, [50, 100])
    rollup.retract_rollup_batch(
        spark,
        root,
        _df(spark, retract),
        remaining_facts=_df(spark, remaining),
        segment_partitions=1,
    )
    assert _r6(rows(rollup.read_rollup(spark, root, derive_avg=False))) == _r6(
        _direct(spark, remaining)
    )


def test_repair_retracting_the_unique_extreme(spark, tmp_path):
    """The hardest case: the retracted fact WAS the unique max — the
    override row must land the new exact max (7.0), not the stale
    bound (100.0)."""
    data = [
        Row(grp="g", bucket=1, val=1.0),
        Row(grp="g", bucket=1, val=100.0),
        Row(grp="g", bucket=1, val=7.0),
    ]
    root = str(tmp_path / "view")
    _build(spark, root, data, [2])
    rollup.retract_rollup_batch(
        spark,
        root,
        _df(spark, [data[1]]),
        remaining_facts=_df(spark, [data[0], data[2]]),
        segment_partitions=1,
    )
    r = rollup.read_rollup(spark, root, derive_avg=False).collect()[0]
    assert (r["v_min"], r["v_max"]) == (1.0, 7.0)
    assert r["_rows"] == 2 and round(r["v_sum"], 6) == 8.0


def test_repair_then_append_then_compact_lifecycle(spark, tmp_path):
    """Reset rows compose with later ingests and compaction: a new
    fact beyond the repaired extreme folds in (the reset only
    supersedes OLDER rows), compaction keeps the reset semantics, and
    a post-compaction append still converges to the direct truth."""
    data = _facts(90, seed=23)
    retract = [r for i, r in enumerate(data[:60]) if i % 5 == 0]
    live0 = [r for i, r in enumerate(data[:60]) if i % 5 != 0]
    root = str(tmp_path / "view")
    _build(spark, root, data[:60], [30])
    rollup.retract_rollup_batch(
        spark,
        root,
        _df(spark, retract),
        remaining_facts=_df(spark, live0),
        segment_partitions=1,
    )
    # later ingest can move the extremes past the repaired values
    rollup.append_rollup_batch(
        spark, root, _df(spark, data[60:75]), segment_partitions=1
    )
    live1 = live0 + data[60:75]
    assert _r6(rows(rollup.read_rollup(spark, root, derive_avg=False))) == _r6(
        _direct(spark, live1)
    )
    pins = rollup.compact_rollup(spark, root)
    assert len(pins[rollup.PARTIALS]) == 1
    assert _r6(rows(rollup.read_rollup(spark, root, derive_avg=False))) == _r6(
        _direct(spark, live1)
    )
    rollup.append_rollup_batch(
        spark, root, _df(spark, data[75:]), segment_partitions=1
    )
    assert _r6(rows(rollup.read_rollup(spark, root, derive_avg=False))) == _r6(
        _direct(spark, live1 + data[75:])
    )


def test_second_repair_supersedes_first(spark, tmp_path):
    """Two repairing retractions in sequence: the newer reset outranks
    the older one (max-sequence fold), and the view stays exact."""
    data = [
        Row(grp="g", bucket=1, val=float(v))
        for v in [5, 50, 90, 100]
    ]
    root = str(tmp_path / "view")
    _build(spark, root, data, [4])
    rollup.retract_rollup_batch(
        spark,
        root,
        _df(spark, [data[3]]),  # retract 100 -> max 90
        remaining_facts=_df(spark, data[:3]),
        segment_partitions=1,
    )
    rollup.retract_rollup_batch(
        spark,
        root,
        _df(spark, [data[2]]),  # retract 90 -> max 50
        remaining_facts=_df(spark, data[:2]),
        segment_partitions=1,
    )
    r = rollup.read_rollup(spark, root, derive_avg=False).collect()[0]
    assert (r["v_min"], r["v_max"], r["_rows"]) == (5.0, 50.0, 2)


def test_size_tiered_compaction_subset_sound_with_retraction(spark, tmp_path):
    """The LSM shape the rollup family gained in r11: under a byte
    threshold only small partials fold — and a fold that catches a
    retraction's NEGATIVE partial apart from its graduated positive
    twin must keep the net-negative group (keep_zero) so the serve
    merge still cancels the twin. Served values are byte-identical to
    the uncompacted view; the graduated segment's pin never moves."""
    # bootstrap with MANY groups → a big partial segment; appends and
    # the retraction touch few groups → small segments
    boot = [
        Row(grp=f"g{i % 97}", bucket=i % 211, val=float(i)) for i in range(2000)
    ]
    extra = [Row(grp="g1", bucket=1, val=7.0), Row(grp="zz", bucket=3, val=2.0)]
    retract = boot[:40]  # groups live only in the graduated bootstrap
    root = str(tmp_path / "view")
    rollup.bootstrap_rollup(
        spark, root, _df(spark, boot), KEYS, MEASURES,
        zone_keys=["bucket"], segment_partitions=1,
    )
    rollup.append_rollup_batch(spark, root, _df(spark, extra), segment_partitions=1)
    rollup.retract_rollup_batch(spark, root, _df(spark, retract), segment_partitions=1)
    pins0 = lake.segment_pins(spark, root)[rollup.PARTIALS]
    big = pins0[0]
    thresh = lake._segment_bytes(spark, f"{root}/{rollup.PARTIALS}", big)
    remaining = boot[40:] + extra
    before = _r6(rows(rollup.read_rollup(spark, root, derive_avg=False)))
    pins1 = rollup.compact_rollup(spark, root, max_segment_bytes=thresh)[
        rollup.PARTIALS
    ]
    # bounded rewrite: the graduated bootstrap partial is untouched,
    # the small tail folded to one fresh segment
    assert big in pins1 and len(pins1) == 2
    after = rows(rollup.read_rollup(spark, root, derive_avg=False))
    assert _r6(after) == before
    # exactness vs the direct aggregate for the additive stats
    assert {(r[0], r[1]): (r[2], r[4]) for r in after} == {
        (r[0], r[1]): (r[2], r[4]) for r in _direct(spark, remaining)
    }
    # the subset fold parked net-negative groups instead of dropping
    # them (the graduated twin still has their positive rows)
    folded = [s for s in pins1 if s != big]
    seg = lake.read_segments(spark, f"{root}/{rollup.PARTIALS}", folded)
    assert seg.filter("_rows < 0").count() > 0
    # a later FULL fold sweeps them and serving is still identical
    pins2 = rollup.compact_rollup(spark, root)[rollup.PARTIALS]
    assert len(pins2) == 1
    seg2 = lake.read_segments(spark, f"{root}/{rollup.PARTIALS}", pins2)
    assert seg2.filter("_rows <= 0").count() == 0
    assert _r6(rows(rollup.read_rollup(spark, root, derive_avg=False))) == before


def test_reset_flag_retires_after_full_compaction(spark, tmp_path):
    """A repairing retraction sets the min/max-reset manifest flag; a
    full compaction applies every reset, so the same flip RETIRES the
    flag — the view returns to the map-side-combined serve fold and
    regains size-tiering eligibility — with served values still equal
    to the direct aggregate of the corrected facts."""
    data = _facts(150, seed=23)
    retract = [r for i, r in enumerate(data) if i % 9 == 0]
    remaining = [r for i, r in enumerate(data) if i % 9 != 0]
    root = str(tmp_path / "view")
    _build(spark, root, data, [50, 100])
    rollup.retract_rollup_batch(
        spark, root, _df(spark, retract),
        remaining_facts=_df(spark, remaining), segment_partitions=1,
    )
    assert lake.segment_meta(spark, root).get(rollup.MM_RESETS_KEY) is True
    # with resets pending, a size-tiered request transparently runs
    # the FULL fold (the reset fold is not subset-sound)
    pins = rollup.compact_rollup(spark, root, max_segment_bytes=1)[
        rollup.PARTIALS
    ]
    assert len(pins) == 1
    assert lake.segment_meta(spark, root).get(rollup.MM_RESETS_KEY) is False
    assert _r6(rows(rollup.read_rollup(spark, root, derive_avg=False))) == _r6(
        _direct(spark, remaining)
    )
    # the view keeps working incrementally after the flag retired
    more = [Row(grp="q", bucket=9, val=1.5), Row(grp="a", bucket=1, val=-3.0)]
    rollup.append_rollup_batch(spark, root, _df(spark, more), segment_partitions=1)
    assert _r6(rows(rollup.read_rollup(spark, root, derive_avg=False))) == _r6(
        _direct(spark, remaining + more)
    )


def test_compact_rollup_retries_after_rival_commit(spark, tmp_path, monkeypatch):
    """The TOCTOU fix (r10 ADVICE): compact_rollup pins its reducer
    decision to the manifest version it read the reset flag at; a
    rival commit landing in between makes that pass conflict, and the
    bounded retry re-decides from fresh state. Injected via a
    pass-through wrapper that commits a repairing retraction after the
    flag read of the first attempt — the final state must reflect the
    RESET-AWARE fold (exact extremes), not the stale no-reset one."""
    data = _facts(60, seed=31)
    retract = data[:8]
    remaining = data[8:]
    root = str(tmp_path / "view")
    _build(spark, root, data, [30])

    real = lake.compact_segments
    calls = {"n": 0}

    def racy(spark_, root_, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            # rival repairing retraction lands between the flag read
            # and the fold — the pinned pass must conflict, not fold
            # reset rows with the stale no-reset reducer
            rollup.retract_rollup_batch(
                spark_,
                root_,
                _df(spark_, retract),
                remaining_facts=_df(spark_, remaining),
                segment_partitions=1,
            )
        return real(spark_, root_, **kw)

    monkeypatch.setattr(lake, "compact_segments", racy)
    pins = rollup.compact_rollup(spark, root)[rollup.PARTIALS]
    assert calls["n"] == 2  # attempt 1 conflicted, attempt 2 folded
    assert len(pins) == 1
    # the retry saw the reset state: flag retired by the full fold and
    # served extremes EXACT against the corrected facts
    assert lake.segment_meta(spark, root).get(rollup.MM_RESETS_KEY) is False
    assert _r6(rows(rollup.read_rollup(spark, root, derive_avg=False))) == _r6(
        _direct(spark, remaining)
    )
