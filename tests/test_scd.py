"""SCD Type 2 dimension maintenance (sources/scd): validity-interval
bookkeeping composed on merge_rows' composite-key whole-key replace.
The oracle row lake_scd2_dimension pins the happy path + replay no-op
+ as-of reads at sf scale; this module pins the edges: validation,
partial snapshots, attribute-schema evolution, and multi-version
histories with resurrection-like re-changes."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from ed_housing_data_pipeline_spark.sources import lake, scd


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k bigint, seg string, v double")


def test_scd2_multi_version_history_and_partial_snapshots(spark, tmp_path):
    root = str(tmp_path / "d")
    scd.scd2_init(
        spark, root, "dim", "k",
        _snap(spark, [Row(k=1, seg="a", v=1.0), Row(k=2, seg="b", v=2.0)]),
        ts=10, bloom_cols={"dim": ["k"]},
    )
    # partial snapshot: only k=1 mentioned — k=2 untouched, not closed
    rep = scd.scd2_apply(
        spark, root, "dim", "k",
        _snap(spark, [Row(k=1, seg="a2", v=1.0)]), ts=20,
    )
    assert (rep["closed"], rep["opened"], rep["unchanged_keys"]) == (1, 1, 0)
    # third version of k=1, back to its ORIGINAL attributes — still a
    # real change vs the t=20 row, opens a third interval
    rep = scd.scd2_apply(
        spark, root, "dim", "k",
        _snap(spark, [Row(k=1, seg="a", v=1.0), Row(k=2, seg="b", v=2.0)]),
        ts=30,
    )
    assert (rep["closed"], rep["opened"], rep["unchanged_keys"]) == (1, 1, 1)
    hist = sorted(
        (r.k, r.valid_from, r.valid_to, r.is_current, r.seg)
        for r in lake.read_segmented_merged(
            spark, root, "dim", ["k", scd.VALID_FROM]
        ).collect()
    )
    assert hist == [
        (1, 10, 20, False, "a"),
        (1, 20, 30, False, "a2"),
        (1, 30, None, True, "a"),
        (2, 10, None, True, "b"),
    ]
    # as-of walks the intervals
    for ts, want in ((10, "a"), (25, "a2"), (30, "a"), (99, "a")):
        got = {
            r.k: r.seg
            for r in scd.scd2_asof(spark, root, "dim", "k", ts).collect()
        }
        assert got[1] == want, (ts, got)
    assert {r.k for r in scd.scd2_current(spark, root, "dim", "k").collect()} \
        == {1, 2}


def test_scd2_attribute_schema_evolution(spark, tmp_path):
    """A snapshot adding a NEW attribute column evolves the dimension:
    scd2_apply refuses unknown columns (fail closed), the documented
    path is append_segments add-column evolution — after which old
    intervals serve NULL for the new attribute and new versions carry
    it."""
    root = str(tmp_path / "d")
    scd.scd2_init(
        spark, root, "dim", "k",
        _snap(spark, [Row(k=1, seg="a", v=1.0)]), ts=10,
    )
    wide = spark.createDataFrame(
        [Row(k=1, seg="a", v=1.0, tier="gold")],
        "k bigint, seg string, v double, tier string",
    )
    with pytest.raises(ValueError, match="allow_new_columns"):
        scd.scd2_apply(spark, root, "dim", "k", wide, ts=20)
    rep = scd.scd2_apply(
        spark, root, "dim", "k", wide, ts=20, allow_new_columns=True
    )
    # the tier column changed NULL -> 'gold': a real version
    assert (rep["closed"], rep["opened"]) == (1, 1)
    cur = scd.scd2_current(spark, root, "dim", "k").collect()
    assert len(cur) == 1 and cur[0].tier == "gold"
    old = scd.scd2_asof(spark, root, "dim", "k", 15).collect()
    assert len(old) == 1 and old[0].tier is None


def test_scd2_validation_raises(spark, tmp_path):
    root = str(tmp_path / "d")
    scd.scd2_init(
        spark, root, "dim", "k",
        _snap(spark, [Row(k=1, seg="a", v=1.0)]), ts=10,
    )
    with pytest.raises(ValueError, match="reserved"):
        scd.scd2_apply(
            spark, root, "dim", ["k", "valid_from"],
            _snap(spark, [Row(k=1, seg="a", v=1.0)]), ts=20,
        )
    with pytest.raises(ValueError, match="meta column"):
        scd.scd2_apply(
            spark, root, "dim", "k",
            _snap(spark, [Row(k=1, seg="a", v=1.0)]).withColumn(
                "is_current", F.lit(True)
            ),
            ts=20,
        )
    with pytest.raises(ValueError, match="multiple rows"):
        scd.scd2_apply(
            spark, root, "dim", "k",
            _snap(spark, [Row(k=1, seg="a", v=1.0),
                          Row(k=1, seg="b", v=2.0)]),
            ts=20,
        )
    with pytest.raises(ValueError, match="lacks key"):
        scd.scd2_apply(
            spark, root, "dim", "k",
            spark.createDataFrame([Row(seg="a")], "seg string"), ts=20,
        )
    # unchanged snapshot at an EARLIER ts is fine (nothing affected)
    rep = scd.scd2_apply(
        spark, root, "dim", "k",
        _snap(spark, [Row(k=1, seg="a", v=1.0)]), ts=5,
    )
    assert not rep["applied"]


def test_stream_scd2_sink_exactly_once(spark, tmp_path):
    """The streaming SCD2 sink (streaming/scd): batch 0 bootstraps
    (id atomic with init), later batches apply as cadences, a REPLAY
    of an already-recorded id is skipped untouched, and a
    fully-unchanged snapshot still records its id (meta-only flip) so
    the replay guard holds across no-op batches."""
    from ed_housing_data_pipeline_spark.streaming import scd as sscd

    root = str(tmp_path / "d")
    s1 = _snap(spark, [Row(k=1, seg="a", v=1.0), Row(k=2, seg="b", v=2.0)])
    s2 = _snap(spark, [Row(k=1, seg="a2", v=1.0), Row(k=2, seg="b", v=2.0)])
    rep = sscd.sink_scd2_batch(spark, root, "dim", "k", s1, 0)
    assert rep["bootstrap"] and rep["ts"] == 1
    rep = sscd.sink_scd2_batch(spark, root, "dim", "k", s2, 1)
    assert rep["committed"] and rep["closed"] == 1 and rep["ts"] == 2
    # replay of batch 1: skipped untouched
    v = lake.segment_pins_versioned(spark, root)[1]
    rep = sscd.sink_scd2_batch(spark, root, "dim", "k", s2, 1)
    assert rep["replay"] and lake.segment_pins_versioned(spark, root)[1] == v
    # fully-unchanged batch 2: meta-only flip records the id
    rep = sscd.sink_scd2_batch(spark, root, "dim", "k", s2, 2)
    assert rep["committed"] and rep["meta_only"] and not rep["applied"]
    assert int(lake.segment_meta(spark, root)[sscd.LAST_BATCH_KEY]) == 2
    # ... and ITS replay is recognized too
    rep = sscd.sink_scd2_batch(spark, root, "dim", "k", s2, 2)
    assert rep["replay"]
    hist = sorted(
        (r.k, r.valid_from, r.valid_to, r.is_current)
        for r in lake.read_segmented_merged(
            spark, root, "dim", ["k", scd.VALID_FROM]
        ).collect()
    )
    assert hist == [
        (1, 1, 2, False), (1, 2, None, True), (2, 1, None, True),
    ]


def test_scd2_validate_finds_external_corruption(spark, tmp_path):
    """scd2_validate: a healthy component audits clean; corruption
    injected by EXTERNAL writes (raw upserts around the scd verbs)
    surfaces as typed violations."""
    root = str(tmp_path / "d")
    scd.scd2_init(
        spark, root, "dim", "k",
        _snap(spark, [Row(k=1, seg="a", v=1.0), Row(k=2, seg="b", v=2.0)]),
        ts=10,
    )
    scd.scd2_apply(
        spark, root, "dim", "k",
        _snap(spark, [Row(k=1, seg="a2", v=1.0)]), ts=20,
    )
    assert scd.scd2_validate(spark, root, "dim", "k").count() == 0
    # external writer: a second "current" row for k=2 at an
    # OVERLAPPING interval, and an inverted interval for k=3
    lake.upsert_rows(
        spark, root, "dim", ["k", "valid_from"],
        spark.createDataFrame(
            [Row(k=2, seg="rogue", v=9.0, valid_from=5, valid_to=None,
                 is_current=True),
             Row(k=3, seg="inv", v=3.0, valid_from=50, valid_to=40,
                 is_current=False)],
            "k bigint, seg string, v double, valid_from bigint, "
            "valid_to bigint, is_current boolean",
        ),
    )
    got = {
        (r.k, r.violation)
        for r in scd.scd2_validate(spark, root, "dim", "k").collect()
    }
    assert (2, "multiple_current") in got
    assert (3, "gap_inverted") in got
    # the rogue open k=2 interval at valid_from=5 is followed by the
    # real one at 10 -> overlap is subsumed under multiple_current for
    # that row; the audit reports one violation per row
    assert all(k in (2, 3) for k, _v in got)
