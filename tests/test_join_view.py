"""Incrementally-maintained denormalized join view
(sources/join_view): the oracle row lake_join_view_sync pins the
left-join happy path at sf scale; this module pins the edges — inner
joins deleting dim-orphaned rows, the unbounded-dim-churn fallback
path, the zero-job maintenance-only cycle, and validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.sources import join_view, lake
from tests.conftest import count_jobs


def _fixture(spark, tmp_path, how):
    fr, dr, sr = (str(tmp_path / p) for p in ("f", "d", "s"))
    fact = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(12)],
        "fk bigint, dk bigint, amt double",
    )
    dim = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two")], "dk bigint, label string"
    )
    lake.append_segments(spark, fr, {"fact": fact}, init=True)
    lake.append_segments(spark, dr, {"dim": dim}, init=True)
    args = (spark, fr, "fact", "fk", dr, "dim", "dk", sr)
    rep = join_view.sync_join_view(*args, how=how)
    assert rep.get("bootstrapped")
    return fr, dr, sr, args


def _view(spark, sr):
    return {
        r.fk: (r.dk, r.amt, r.label)
        for r in lake.read_segmented_merged(spark, sr, "fact__joined", "fk")
        .drop("_useq")
        .collect()
    }


def test_inner_join_deletes_dim_orphans(spark, tmp_path):
    """Under how='inner', a dim delete ORPHANS its fact rows: they must
    be DELETED from the view (not served with NULL dim columns), and a
    fact re-insert under a live dim key resurrects."""
    fr, dr, sr, args = _fixture(spark, tmp_path, "inner")
    assert len(_view(spark, sr)) == 12
    lake.delete_rows(spark, dr, "dim", "dk", [1])
    rep = join_view.sync_join_view(*args, how="inner")
    # dk=1 owned fks 1,4,7,10 — all four leave the view
    assert rep["deleted"] == 4 and rep["inserted"] == 0
    v = _view(spark, sr)
    assert len(v) == 8 and not any(dk == 1 for dk, _a, _l in v.values())
    # fact moves fk=1 under a LIVE dim key: it re-enters the view
    lake.upsert_rows(
        spark, fr, "fact", "fk",
        spark.createDataFrame([(1, 0, 99.0)], "fk bigint, dk bigint, amt double"),
    )
    rep = join_view.sync_join_view(*args, how="inner")
    assert rep["inserted"] == 1
    assert _view(spark, sr)[1] == (0, 99.0, "zero")


def test_unbounded_dim_churn_falls_back_to_semi_join(spark, tmp_path):
    """dim_probe_cap=0 disables the pushable IN-filter: the affected-
    by-dim discovery must take the semi-join path and still converge
    to the same view."""
    fr, dr, sr, args = _fixture(spark, tmp_path, "left")
    lake.upsert_rows(
        spark, dr, "dim", "dk",
        spark.createDataFrame(
            [(0, "Z"), (1, "O"), (2, "T")], "dk bigint, label string"
        ),
    )
    rep = join_view.sync_join_view(*args, how="left", dim_probe_cap=0)
    assert rep["updated"] == 12
    assert {lab for _dk, _a, lab in _view(spark, sr).values()} == {
        "Z", "O", "T"
    }
    # idempotent relabel replay: every re-derived row content-equal
    lake.upsert_rows(
        spark, dr, "dim", "dk",
        spark.createDataFrame([(0, "Z")], "dk bigint, label string"),
    )
    rep = join_view.sync_join_view(*args, how="left", dim_probe_cap=0)
    # every re-derived row is content-equal -> the merge detects a
    # fully-no-op batch and the cycle degrades to a meta-only
    # watermark flip (nothing written, watermarks still advance)
    assert not rep["applied"] and rep["meta_only"] and rep["skipped"] == 4


def test_maintenance_only_cycle_is_meta_only_zero_jobs(spark, tmp_path):
    fr, _dr, _sr, args = _fixture(spark, tmp_path, "left")
    # a second fact segment (synced), so compaction has work to do
    lake.append_segments(
        spark, fr,
        {"fact": spark.createDataFrame(
            [(50, 0, 50.0)], "fk bigint, dk bigint, amt double"
        )},
    )
    assert join_view.sync_join_view(*args, how="left")["applied"]
    lake.compact_segments(spark, fr)
    rep = {}
    jobs = count_jobs(
        spark, lambda: rep.update(join_view.sync_join_view(*args, how="left"))
    )
    assert rep["meta_only"] and not rep["applied"]
    assert jobs == 0, f"maintenance-only cycle scheduled {jobs} jobs"
    # and a fully-quiet cycle doesn't even flip
    v = lake.segment_pins_versioned(spark, args[7])[1]
    rep = join_view.sync_join_view(*args, how="left")
    assert not rep["applied"] and "meta_only" not in rep
    assert lake.segment_pins_versioned(spark, args[7])[1] == v


def test_column_collision_and_how_validation(spark, tmp_path):
    fr, dr, sr = (str(tmp_path / p) for p in ("f", "d", "s"))
    fact = spark.createDataFrame(
        [(1, 0, "x")], "fk bigint, dk bigint, label string"
    )
    dim = spark.createDataFrame([(0, "zero")], "dk bigint, label string")
    lake.append_segments(spark, fr, {"fact": fact}, init=True)
    lake.append_segments(spark, dr, {"dim": dim}, init=True)
    with pytest.raises(ValueError, match="exist\n?.*in both|in both sources"):
        join_view.sync_join_view(
            spark, fr, "fact", "fk", dr, "dim", "dk", sr
        )
    with pytest.raises(ValueError, match="left|inner"):
        join_view.sync_join_view(
            spark, fr, "fact", "fk", dr, "dim", "dk", sr, how="outer"
        )


def test_composite_fact_key_view(spark, tmp_path):
    """Composite fact keys ride every path (feeds, affected-key
    derivation falls back to the semi-join, the merge keys on the
    tuple)."""
    fr, dr, sr = (str(tmp_path / p) for p in ("f", "d", "s"))
    fact = spark.createDataFrame(
        [(i, "x" if i % 2 else "y", i % 2, float(i)) for i in range(8)],
        "k1 bigint, k2 string, dk bigint, amt double",
    )
    dim = spark.createDataFrame(
        [(0, "zero"), (1, "one")], "dk bigint, label string"
    )
    lake.append_segments(spark, fr, {"fact": fact}, init=True)
    lake.append_segments(spark, dr, {"dim": dim}, init=True)
    args = (spark, fr, "fact", ["k1", "k2"], dr, "dim", "dk", sr)
    assert join_view.sync_join_view(*args, how="left")["bootstrapped"]
    # fact churn on the composite key + dim relabel, one cycle
    lake.upsert_rows(
        spark, fr, "fact", ["k1", "k2"],
        spark.createDataFrame(
            [(1, "x", 1, 111.0)], "k1 bigint, k2 string, dk bigint, amt double"
        ),
    )
    lake.upsert_rows(
        spark, dr, "dim", "dk",
        spark.createDataFrame([(0, "ZERO")], "dk bigint, label string"),
    )
    rep = join_view.sync_join_view(*args, how="left")
    assert rep["applied"] and rep["updated"] == 5  # (1,x) + the 4 dk=0 rows
    got = {
        (r.k1, r.k2): (r.amt, r.label)
        for r in lake.read_segmented_merged(
            spark, sr, "fact__joined", ["k1", "k2"]
        ).collect()
    }
    assert got[(1, "x")] == (111.0, "one")
    assert all(
        lab == "ZERO" for (k1, _k2), (_a, lab) in got.items() if k1 % 2 == 0
    )


def test_scd2_dim_composition_and_chained_star(spark, tmp_path):
    """The two composition contracts: (1) a view over an SCD TYPE 2
    dimension (dim_merge_key = the SCD revision key, dim_filter
    restricts the join to current rows, dim_drop keeps the SCD meta
    out of the sink) enriches facts against the CURRENT version and
    follows a version flip; (2) STAR schemas chain — the sink is
    itself a CDF source, so a second view joins another dim on top and
    the dim churn propagates through BOTH links."""
    from ed_housing_data_pipeline_spark.sources import scd

    fr, dr, d2, s1, s2 = (
        str(tmp_path / p) for p in ("f", "d", "d2", "s1", "s2")
    )
    fact = spark.createDataFrame(
        [(i, i % 2, i % 3, float(i)) for i in range(6)],
        "fk bigint, dk bigint, ek bigint, amt double",
    )
    lake.append_segments(spark, fr, {"fact": fact}, init=True)
    scd.scd2_init(
        spark, dr, "dim", "dk",
        spark.createDataFrame([(0, "zero"), (1, "one")],
                              "dk bigint, label string"),
        ts=10,
    )
    lake.append_segments(
        spark, d2,
        {"dim2": spark.createDataFrame(
            [(0, "E0"), (1, "E1"), (2, "E2")], "ek bigint, tag string"
        )},
        init=True,
    )
    scd_kw = {
        "dim_merge_key": ["dk", "valid_from"],
        "dim_filter": "is_current",
        "dim_drop": ("valid_from", "valid_to", "is_current"),
    }
    args1 = (spark, fr, "fact", "fk", dr, "dim", "dk", s1)
    assert join_view.sync_join_view(*args1, how="left", **scd_kw)[
        "bootstrapped"
    ]
    # link 2: the first sink is the fact of the second view
    args2 = (spark, s1, "fact__joined", "fk", d2, "dim2", "ek", s2)
    assert join_view.sync_join_view(*args2, how="left")["bootstrapped"]
    star = {
        r.fk: (r.label, r.tag)
        for r in lake.read_segmented_merged(spark, s2,
                                            "fact__joined__joined", "fk")
        .collect()
    }
    assert star[3] == ("one", "E0") and len(star) == 6
    # SCD version flip: dk=1 relabels at ts=20 — current changes, the
    # closed history row must NOT also join (exactly one row per fact)
    scd.scd2_apply(
        spark, dr, "dim", "dk",
        spark.createDataFrame([(1, "ONE")], "dk bigint, label string"),
        ts=20,
    )
    rep = join_view.sync_join_view(*args1, how="left", **scd_kw)
    assert rep["updated"] == 3  # fks 1,3,5
    rep2 = join_view.sync_join_view(*args2, how="left")
    assert rep2["updated"] == 3  # propagated through the chain
    star = {
        r.fk: (r.label, r.tag)
        for r in lake.read_segmented_merged(spark, s2,
                                            "fact__joined__joined", "fk")
        .collect()
    }
    assert star[3] == ("ONE", "E0") and star[0] == ("zero", "E0")
    assert len(star) == 6  # one row per fact — history never joins


def test_bloom_sidecars_on_fact_prune_the_rederive_read(spark, tmp_path):
    """Fact bloom sidecars on both the dim-key and the fact-key column
    route the bounded re-derive reads through the bloom-pruned merged
    view (whole-segment skipping); the view still converges exactly."""
    fr, dr, sr = (str(tmp_path / p) for p in ("f", "d", "s"))
    lake.append_segments(
        spark, fr,
        {"fact": spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(6)],
            "fk bigint, dk bigint, amt double",
        )},
        init=True, bloom_cols={"fact": ["fk", "dk"]},
    )
    lake.append_segments(
        spark, fr,
        {"fact": spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(100, 106)],
            "fk bigint, dk bigint, amt double",
        )},
        bloom_cols={"fact": ["fk", "dk"]},
    )
    lake.append_segments(
        spark, dr,
        {"dim": spark.createDataFrame(
            [(0, "zero"), (1, "one"), (2, "two")],
            "dk bigint, label string",
        )},
        init=True,
    )
    args = (spark, fr, "fact", "fk", dr, "dim", "dk", sr)
    assert join_view.sync_join_view(*args, how="left")["bootstrapped"]
    # fact churn confined to the SECOND segment + a dim relabel: both
    # bounded re-derives take the bloom-pruned path
    lake.upsert_rows(
        spark, fr, "fact", "fk",
        spark.createDataFrame(
            [(101, 1, 999.0)], "fk bigint, dk bigint, amt double"
        ),
        bloom_cols=["fk", "dk"],
    )
    lake.upsert_rows(
        spark, dr, "dim", "dk",
        spark.createDataFrame([(2, "TWO")], "dk bigint, label string"),
    )
    rep = join_view.sync_join_view(*args, how="left")
    # fk=101 re-derived + the three dk=2 rows (2, 5, 104)
    assert rep["applied"] and rep["updated"] == 4
    got = _view(spark, sr)
    assert got[101] == (1, 999.0, "one")
    assert all(
        lab == "TWO" for _fk, (dk, _a, lab) in got.items() if dk == 2
    )
    assert len(got) == 12
