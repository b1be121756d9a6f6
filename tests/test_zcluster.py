"""Z-order clustering (functions/zorder + operators/zcluster):
interleave correctness, multi-column zonemap pruning, and the
it-actually-beats-single-column-sort property the layout exists for."""

from __future__ import annotations

import os

import pytest

import random

from pyspark.sql import Row, functions as F

from ed_housing_data_pipeline_spark.functions import zorder as zo
from ed_housing_data_pipeline_spark.operators import zcluster
from ed_housing_data_pipeline_spark.sources import lake


def test_interleave_bijection_py():
    rng = random.Random(8)
    for _ in range(200):
        x, y = rng.randrange(1 << 10), rng.randrange(1 << 10)
        z = zo.zorder2_py(x, y)
        assert zo.deinterleave2_py(z) == (x, y)
    assert zo.zorder2_py(0, 0) == 0
    assert zo.zorder2_py((1 << 10) - 1, (1 << 10) - 1) == (1 << 20) - 1


def test_spark_expr_matches_python(spark):
    rng = random.Random(9)
    rows = [Row(x=rng.randrange(1 << 10), y=rng.randrange(1 << 10)) for _ in range(64)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = df.select("x", "y", zo.zorder2("x", "y").alias("z")).collect()
    for r in got:
        assert r.z == zo.zorder2_py(r.x, r.y), (r.x, r.y)


def test_out_of_range_and_null_inputs_are_null(spark):
    df = spark.createDataFrame(
        [Row(x=None, y=1), Row(x=1, y=None), Row(x=-1, y=1), Row(x=1 << 10, y=1), Row(x=3, y=5)],
        "x int, y int",
    )
    got = [r.z for r in df.select(zo.zorder2("x", "y").alias("z")).collect()]
    assert got[:4] == [None, None, None, None]
    assert got[4] == zo.zorder2_py(3, 5)


GRID = 64  # the exact 64×64 grid: every (x, y) cell exactly once


def _grid_df(spark):
    rows = [
        Row(k=y * GRID + x, x=x, y=y, v=float(x + y))
        for y in range(GRID)
        for x in range(GRID)
    ]
    return spark.createDataFrame(rows, "k bigint, x int, y int, v double")


# An 8×8 box aligned inside one 16×16 Morton tile: with 16 exact
# z-slices each slice IS one tile, so z-clustering keeps exactly 1
# segment while either single-column sort keeps its 2 matching slices.
BOX = {"x": (8, 15), "y": (40, 47)}


def _row_filter(df):
    return df.filter(F.col("x").between(*BOX["x"]) & F.col("y").between(*BOX["y"]))


def test_box_read_matches_full_scan(spark, tmp_path):
    df = _grid_df(spark)
    root = str(tmp_path / "z")
    zcluster.write_zorder_clustered(
        spark, root, df, "t", "x", "y", zone_cols=("x", "y"), n_segments=8, bits=6
    )
    got = sorted(r.k for r in _row_filter(zcluster.read_box(spark, root, "t", BOX)).collect())
    want = sorted(r.k for r in _row_filter(df).collect())
    assert got == want and len(want) > 0


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="driver row orders_zorder_box value-checks the pruned read; the beats-single-sort sweep is RUN_SLOW=1",
)
def test_zorder_prunes_both_dimensions_beats_single_sort(spark, tmp_path):
    """The reason the layout exists: for a 2-D box, z-clustering must
    prune strictly more segments than sorting on either single column
    (whose zonemaps are tight on one dim and span the other)."""
    df = _grid_df(spark)
    zroot = str(tmp_path / "z")
    zcluster.write_zorder_clustered(
        spark, zroot, df, "t", "x", "y", zone_cols=("x", "y"), n_segments=16, bits=6
    )
    kept_z, pinned_z = zcluster.box_pruned_pins(spark, zroot, "t", BOX)
    assert len(pinned_z) == 16

    def _sorted_layout(col):
        root = str(tmp_path / f"s_{col}")
        cuts = df.stat.approxQuantile(col, [i / 16 for i in range(1, 16)], 0.0)
        cuts = sorted(set(cuts))
        sliced = df.withColumn(
            "_slice",
            sum(
                (F.col(col) > F.lit(c)).cast("int") for c in cuts
            ),
        )
        for i in range(len(cuts) + 1):
            lake.append_segments(
                spark,
                root,
                appends={"t": sliced.filter(F.col("_slice") == i).drop("_slice")},
                init=(i == 0),
                zone_cols={"t": ["x", "y"]},
            )
        kept, pinned = zcluster.box_pruned_pins(spark, root, "t", BOX)
        return len(kept), len(pinned)

    kept_x, pinned_x = _sorted_layout("x")
    kept_y, pinned_y = _sorted_layout("y")
    # single-column sort: zonemaps tight on the sort column (the box
    # keeps its ~2 matching slices), useless on the other column
    assert len(kept_z) < kept_x
    assert len(kept_z) < kept_y
    assert 0 < len(kept_z) < len(pinned_z)


def test_degenerate_constant_z_still_correct(spark, tmp_path):
    """All rows share one z value → quantile cuts collapse → a single
    segment; reads stay correct (pruning is conservative)."""
    df = spark.createDataFrame(
        [Row(k=i, x=5, y=9, v=1.0) for i in range(32)],
        "k bigint, x int, y int, v double",
    )
    root = str(tmp_path / "zc")
    zcluster.write_zorder_clustered(
        spark, root, df, "t", "x", "y", zone_cols=("x", "y"), n_segments=4, bits=6
    )
    pins = lake.segment_pins(spark, root)["t"]
    assert len(pins) == 1
    assert zcluster.read_box(spark, root, "t", {"x": (0, 63), "y": (0, 63)}).count() == 32
    kept, _ = zcluster.box_pruned_pins(spark, root, "t", {"x": (6, 7), "y": (9, 9)})
    assert kept == []  # zonemap excludes the whole (only) segment


def test_null_z_rows_survive_in_last_slice(spark, tmp_path):
    """Out-of-range inputs (NULL z) must not be dropped by the writer."""
    rows = [Row(k=i, x=i % 16, y=i % 16, v=1.0) for i in range(64)]
    rows.append(Row(k=999, x=-3, y=2, v=1.0))  # negative → NULL z
    df = spark.createDataFrame(rows, "k bigint, x int, y int, v double")
    root = str(tmp_path / "zn")
    zcluster.write_zorder_clustered(
        spark, root, df, "t", "x", "y", zone_cols=("x", "y"), n_segments=4, bits=4
    )
    comp = f"{root}/t"
    pins = lake.segment_pins(spark, root)["t"]
    all_rows = lake.read_segments(spark, comp, pins)
    assert all_rows.count() == 65
    assert all_rows.filter(F.col("k") == 999).count() == 1


def test_interleaveN_bijection_py():
    import itertools
    import random

    rng = random.Random(5)
    for n in (3, 4):
        for _ in range(200):
            vals = tuple(rng.randrange(1 << 10) for _ in range(n))
            assert zo.deinterleaveN_py(zo.zorderN_py(vals), n) == vals
    # corner coverage
    for vals in itertools.product((0, (1 << 10) - 1), repeat=3):
        assert zo.deinterleaveN_py(zo.zorderN_py(vals), 3) == vals
    # 2-D wrappers are the N=2 case bit-for-bit
    assert zo.zorder2_py(37, 91) == zo.zorderN_py([37, 91])


def test_zorderN_spark_expr_matches_python(spark):
    import random

    rng = random.Random(6)
    rows_ = [
        (rng.randrange(1 << 8), rng.randrange(1 << 8), rng.randrange(1 << 8))
        for _ in range(64)
    ]
    df = spark.createDataFrame(rows_, "x int, y int, w int")
    got = df.select(
        "x", "y", "w", zo.zorderN(["x", "y", "w"], bits=8).alias("z")
    ).collect()
    for r in got:
        assert r.z == zo.zorderN_py([r.x, r.y, r.w], bits=8), (r.x, r.y, r.w)


def test_zorderN_guards_bit_budget():
    import pytest

    with pytest.raises(ValueError):
        zo.zorderN_sql(["a"], bits=10)  # 1 dim is a plain sort
    with pytest.raises(ValueError):
        zo.zorderN_sql(["a", "b", "c"], bits=22)  # 66 > 63 bits
    zo.zorderN_sql(["a", "b", "c"], bits=21)  # 63: exactly legal


def test_3d_box_read_matches_full_scan(spark, tmp_path):
    import random

    rng = random.Random(9)
    rows_ = [
        (
            i,
            rng.randrange(1000),
            rng.randrange(1, 13),
            float(rng.randrange(500)),
        )
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows_, "id bigint, k int, m int, p double")
    root = str(tmp_path / "z3")
    zcluster.write_zorder_clustered_n(
        spark,
        root,
        df,
        component="t",
        exprs=["CAST(floor(k / 4) AS INT)", "m", "CAST(p AS INT)"],
        zone_cols=("k", "m", "p"),
        n_segments=8,
    )
    box = {"k": (100, 400), "m": (3, 6), "p": (50.0, 300.0)}
    kept, pinned = zcluster.box_pruned_pins(spark, root, "t", box)
    assert 0 < len(kept) < len(pinned)  # all three dimensions cut
    pred = (
        F.col("k").between(100, 400)
        & F.col("m").between(3, 6)
        & F.col("p").between(50.0, 300.0)
    )
    got = sorted(
        r.id for r in zcluster.read_box(spark, root, "t", box).filter(pred).collect()
    )
    want = sorted(r.id for r in df.filter(pred).collect())
    assert got == want


def _append_messy(spark, root, n_batches=6, rows_per=500, seed=3):
    """Arrival-ordered appends: each batch spans the FULL key space, so
    every segment's zonemap covers everything and box pruning is
    useless until a recluster pass."""
    import random

    rng = random.Random(seed)
    for b in range(n_batches):
        rows_ = [
            (
                b * rows_per + i,
                rng.randrange(1000),
                rng.randrange(1, 13),
            )
            for i in range(rows_per)
        ]
        df = spark.createDataFrame(rows_, "id bigint, k int, m int").coalesce(1)
        lake.append_segments(
            spark, root, {"t": df}, init=(b == 0), zone_cols={"t": ["k", "m"]}
        )


def test_recluster_zorder_makes_pruning_effective(spark, tmp_path):
    """OPTIMIZE-ZORDER maintenance: arrival-ordered appends prune
    nothing (every zonemap spans the key space); one recluster pass
    re-slices them z-contiguously under one manifest flip — same rows,
    box pruning now cuts segments on BOTH dimensions."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "ds")
    _append_messy(spark, root)
    box = {"k": (0, 240), "m": (1, 3)}
    kept0, pinned0 = zcluster.box_pruned_pins(spark, root, "t", box)
    assert kept0 == pinned0  # arrival order: nothing prunable
    before = sorted(
        tuple(r)
        for r in lake.read_segmented_components(spark, root, ["t"])["t"].collect()
    )
    pins = zcluster.recluster_zorder(
        spark,
        root,
        "t",
        exprs=["CAST(floor(k / 4) AS INT)", "m"],
        zone_cols=("k", "m"),
        n_segments=8,
    )
    kept1, pinned1 = zcluster.box_pruned_pins(spark, root, "t", box)
    assert pinned1 == pins["t"]
    assert 0 < len(kept1) < len(pinned1)  # pruning engaged
    after = sorted(
        tuple(r)
        for r in lake.read_segmented_components(spark, root, ["t"])["t"].collect()
    )
    assert after == before  # content-neutral
    # the pruned read is still row-complete for the box
    pred = F.col("k").between(0, 240) & F.col("m").between(1, 3)
    got = sorted(
        r.id for r in zcluster.read_box(spark, root, "t", box).filter(pred).collect()
    )
    want = sorted(
        r.id
        for r in lake.read_segmented_components(spark, root, ["t"])["t"]
        .filter(pred)
        .collect()
    )
    assert got == want


def test_recluster_zorder_size_tiered_and_rival_commit(spark, tmp_path):
    """Size-tiered recluster leaves graduated segments pinned; a rival
    commit between the state read and the flip conflicts loudly."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    root = str(tmp_path / "ds")
    # one BIG arrival segment + messy small tail
    big = spark.createDataFrame(
        [(10_000 + i, i % 1000, i % 12 + 1) for i in range(20_000)],
        "id bigint, k int, m int",
    ).coalesce(1)
    lake.append_segments(spark, root, {"t": big}, init=True, zone_cols={"t": ["k", "m"]})
    _append_messy_tail = [
        spark.createDataFrame(
            [(b * 100 + i, (i * 37) % 1000, i % 12 + 1) for i in range(100)],
            "id bigint, k int, m int",
        ).coalesce(1)
        for b in range(3)
    ]
    for df in _append_messy_tail:
        lake.append_segments(spark, root, {"t": df}, zone_cols={"t": ["k", "m"]})
    pins0 = lake.segment_pins(spark, root)["t"]
    big_seg = pins0[0]
    thresh = lake.segment_sizes(spark, root, "t", [big_seg])[big_seg]
    before = sorted(
        tuple(r)
        for r in lake.read_segmented_components(spark, root, ["t"])["t"].collect()
    )
    pins = zcluster.recluster_zorder(
        spark,
        root,
        "t",
        exprs=["CAST(floor(k / 4) AS INT)", "m"],
        zone_cols=("k", "m"),
        n_segments=4,
        max_segment_bytes=thresh,
    )
    assert big_seg in pins["t"]  # graduated: pin untouched
    after = sorted(
        tuple(r)
        for r in lake.read_segmented_components(spark, root, ["t"])["t"].collect()
    )
    assert after == before
    # rival commit between read and flip: a ONE-SHOT rival is absorbed
    # by the replan-from-fresh-pins retry (the rival's row survives the
    # re-laid-out component); a PERSISTENT rival exhausts the bounded
    # attempts and the typed conflict propagates. The rival append
    # itself commits through this same seam, so it fires re-entrantly.
    real = lake.commit_segment_manifest
    state = {"fired": False, "always": False, "depth": 0}
    def racy(spark_, root_, pins_, **kw):
        if state["depth"] == 0 and (state["always"] or not state["fired"]):
            state["fired"] = True
            state["depth"] += 1
            try:
                lake.append_segments(
                    spark_,
                    root_,
                    {"t": spark_.createDataFrame(
                        [(77_777, 2, 3)], "id bigint, k int, m int"
                    )},
                )
            finally:
                state["depth"] -= 1
        return real(spark_, root_, pins_, **kw)
    lake.commit_segment_manifest = racy
    try:
        # force: the convergence marker would otherwise make this
        # pass a fold-nothing no-op that never reaches the commit
        pins_retry = zcluster.recluster_zorder(
            spark, root, "t",
            exprs=["CAST(floor(k / 4) AS INT)", "m"],
            zone_cols=("k", "m"), n_segments=2, force=True,
        )
        assert lake.segment_pins(spark, root)["t"] == pins_retry["t"]
        live = lake.read_segmented_components(spark, root, ["t"])["t"]
        assert live.filter("id = 77777").count() == 1  # rival survived
        state["always"] = True
        with pytest.raises(lake.ConcurrentCommitError):
            zcluster.recluster_zorder(
                spark, root, "t",
                exprs=["CAST(floor(k / 4) AS INT)", "m"],
                zone_cols=("k", "m"), n_segments=2, force=True,
            )
    finally:
        lake.commit_segment_manifest = real


def test_recluster_zorder_rebuilds_bloom_coverage(spark, tmp_path):
    """Bloom advertisements follow the data through a recluster pass:
    columns the component covered before are re-bloomed on the fresh
    z-slices, so point-lookup skipping stays tight after maintenance."""
    root = str(tmp_path / "ds")
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 100 + i, (i * 7) % 50, i % 12 + 1) for i in range(100)],
            "id bigint, k int, m int",
        ).coalesce(1)
        lake.append_segments(
            spark, root, {"t": df}, init=(b == 0),
            zone_cols={"t": ["k", "m"]}, bloom_cols={"t": ["id"]},
        )
    pins = zcluster.recluster_zorder(
        spark, root, "t",
        exprs=["k", "m"], zone_cols=("k", "m"), n_segments=4,
    )
    kept, pinned = lake.bloom_pruned_pins(spark, root, "t", "id", [105])
    assert pinned == pins["t"]
    assert len(kept) == 1  # exactly the slice holding id=105
    got = (
        lake.read_segments_bloom_pruned(spark, root, "t", "id", [105])
        .filter("id = 105")
        .collect()
    )
    assert [r.id for r in got] == [105]


def test_zorderN_positions_past_31_bits_match_reference(spark):
    """Regression: shiftleft on an INT operand masks the shift count
    & 31, so Morton positions >= 31 silently wrapped before the
    CAST-to-BIGINT fix — 4x10 and 3x21 shapes must match the Python
    reference bit-for-bit and stay non-negative."""
    import random

    rng = random.Random(14)
    for n, bits in ((4, 10), (3, 21)):
        cols = [f"c{i}" for i in range(n)]
        rows_ = [
            tuple(rng.randrange(1 << min(bits, 16)) for _ in range(n))
            for _ in range(40)
        ]
        df = spark.createDataFrame(rows_, ", ".join(f"{c} int" for c in cols))
        got = df.select(*cols, zo.zorderN(cols, bits=bits).alias("z")).collect()
        for r in got:
            want = zo.zorderN_py([r[c] for c in cols], bits=bits)
            assert r.z == want and r.z >= 0, (n, bits, tuple(r))


def test_recluster_zorder_converges_and_force_relayouts(spark, tmp_path):
    """A cadence recluster with no new ingests is a no-op (the layout
    marker records this pass's own slices); a new ingest gets its own
    wave; force=True re-lays everything out as one clean wave."""
    root = str(tmp_path / "ds")
    _append_messy(spark, root, n_batches=4)
    exprs = ["CAST(floor(k / 4) AS INT)", "m"]
    pins1 = zcluster.recluster_zorder(
        spark, root, "t", exprs=exprs, zone_cols=("k", "m"), n_segments=4
    )
    v1 = lake.segment_pins_versioned(spark, root)[1]
    # converged: same call again folds nothing, commits nothing
    pins2 = zcluster.recluster_zorder(
        spark, root, "t", exprs=exprs, zone_cols=("k", "m"), n_segments=4
    )
    assert pins2 == pins1
    assert lake.segment_pins_versioned(spark, root)[1] == v1
    # a new ingest gets its own wave; prior slices keep their pins
    df = spark.createDataFrame(
        [(9_000 + i, i % 1000, i % 12 + 1) for i in range(200)],
        "id bigint, k int, m int",
    ).coalesce(1)
    lake.append_segments(spark, root, {"t": df}, zone_cols={"t": ["k", "m"]})
    pins3 = zcluster.recluster_zorder(
        spark, root, "t", exprs=exprs, zone_cols=("k", "m"), n_segments=4
    )
    assert set(pins1["t"]) <= set(pins3["t"])
    # force: one clean wave replaces every pin
    pins4 = zcluster.recluster_zorder(
        spark, root, "t", exprs=exprs, zone_cols=("k", "m"), n_segments=4,
        force=True,
    )
    assert not set(pins3["t"]) & set(pins4["t"])
    n = lake.read_segmented_components(spark, root, ["t"])["t"].count()
    assert n == 4 * 500 + 200


def _count_jobs(spark, fn):
    """Shared job-group probe (one implementation: session.count_spark_jobs)."""
    from ed_housing_data_pipeline_spark.session import count_spark_jobs

    return count_spark_jobs(spark, fn)


def test_recluster_wave_job_count_independent_of_slices(spark, tmp_path):
    """The staged wave writes ALL slices in ONE Spark write job
    (repartitionByRange → partitionBy → rename): total jobs per wave
    must not grow with n_segments. The old shape — one filter-pass
    write per slice — would differ by ~n_segments between these runs."""
    counts = {}
    for n_seg in (4, 8):
        root = str(tmp_path / f"ds{n_seg}")
        _append_messy(spark, root, n_batches=4)
        counts[n_seg] = _count_jobs(
            spark,
            lambda: zcluster.recluster_zorder(
                spark, root, "t",
                exprs=["CAST(floor(k / 4) AS INT)", "m"],
                zone_cols=("k", "m"), n_segments=n_seg,
            ),
        )
        assert len(lake.segment_pins(spark, root)["t"]) > 1
    assert counts[4] == counts[8], counts
    # absolute ceiling: persist+agg (cuts+max), range-sampling, the
    # ONE staged write, batched zone stats, footer probes — but NOT
    # anything that scales with slice count
    assert counts[8] <= 12, counts


def test_bootstrap_writer_is_single_pass_and_one_commit(spark, tmp_path):
    """The bootstrap writer stages every slice from one write job and
    pins them in ONE manifest commit (manifest version 1)."""
    df = _grid_df(spark)
    root = str(tmp_path / "z1")
    jobs = _count_jobs(
        spark,
        lambda: zcluster.write_zorder_clustered(
            spark, root, df, "t", "x", "y",
            zone_cols=("x", "y"), n_segments=8, bits=6,
        ),
    )
    assert jobs <= 12, jobs
    pins, version = lake.segment_pins_versioned(spark, root)
    assert len(pins["t"]) > 1
    assert version == 1  # one commit pinned every slice


def test_recluster_auto_level_merge_bounds_wave_count(spark, tmp_path):
    """Bounded read fan-in without operator-scheduled force passes:
    once a pass would start wave max_waves+1, the graduated waves fold
    back in as one clean level-merge and the wave counter resets."""
    root = str(tmp_path / "ds")
    exprs = ["CAST(floor(k / 4) AS INT)", "m"]
    _append_messy(spark, root, n_batches=2, seed=11)
    def _ingest(seed):
        import random as _r
        rng = _r.Random(seed)
        for _ in range(2):
            rows_ = [(rng.randrange(10_000), rng.randrange(1000), rng.randrange(1, 13)) for _ in range(500)]
            lake.append_segments(
                spark, root,
                {"t": spark.createDataFrame(rows_, "id bigint, k int, m int").coalesce(1)},
                zone_cols={"t": ["k", "m"]},
            )

    kw = dict(exprs=exprs, zone_cols=("k", "m"), n_segments=4, max_waves=2)
    zcluster.recluster_zorder(spark, root, "t", **kw)  # wave 1
    marker = lake.segment_meta(spark, root)["zcluster_t"]
    assert marker["waves"] == 1
    wave1 = set(marker["segs"])
    _ingest(12)
    zcluster.recluster_zorder(spark, root, "t", **kw)  # wave 2
    marker = lake.segment_meta(spark, root)["zcluster_t"]
    assert marker["waves"] == 2
    assert wave1 <= set(marker["segs"])  # wave-1 slices still graduated
    _ingest(13)
    zcluster.recluster_zorder(spark, root, "t", **kw)  # would be wave 3
    marker = lake.segment_meta(spark, root)["zcluster_t"]
    assert marker["waves"] == 1  # level-merged, counter reset
    pins = lake.segment_pins(spark, root)["t"]
    assert not wave1 & set(pins)  # the old waves' slices were folded in
    assert set(pins) == set(marker["segs"])
    n = lake.read_segmented_components(spark, root, ["t"])["t"].count()
    assert n == 6 * 500  # content-neutral throughout


def test_z_slice_cuts_are_exact_past_float53(spark):
    """Above 2^53 the percentile sketch's internal doubles can no
    longer place cuts at unit granularity, so _z_slices recomputes
    them on the shifted key and maps back with EXACT integer
    boundaries: values 2^shift apart still split into n slices,
    assignment is monotone in z, and no row is lost."""
    base = 1 << 60
    step = 1 << 16  # > the 2^(61-53)=2^8 placement granularity
    zs = [base + i * step for i in range(8)]
    df = spark.createDataFrame([(z,) for z in zs], "_z bigint")
    sliced, n = zcluster._z_slices(df, 4)
    got = {r["_z"]: r["_slice"] for r in sliced.collect()}
    assert len(got) == 8  # lossless
    assert n == 4
    slices = [got[z] for z in zs]
    assert slices == sorted(slices)  # monotone in z
    assert len(set(slices)) == 4, slices
    # adjacent z values (inside one granularity cell) collapse into
    # the same slice rather than smearing across a float-rounded cut
    tight = spark.createDataFrame(
        [(base + i,) for i in range(8)], "_z bigint"
    )
    sliced_t, n_t = zcluster._z_slices(tight, 4)
    rows = sliced_t.collect()
    assert len(rows) == 8
    vals = sorted(r["_slice"] for r in rows)
    assert vals == [v for v in vals if v is not None]  # all assigned


def test_empty_input_still_pins_valid_manifest(spark, tmp_path):
    """An all-empty clustered write (or an all-empty recluster fold)
    stages zero slice dirs; the commit must still pin one empty
    current-schema segment instead of rejecting an empty pin list."""
    empty = spark.createDataFrame([], "k bigint, x int, y int")
    root = str(tmp_path / "ze")
    pins = zcluster.write_zorder_clustered(
        spark, root, empty, "t", "x", "y", zone_cols=("x", "y"), n_segments=4
    )
    assert len(pins["t"]) == 1
    out = lake.read_segmented_components(spark, root, ["t"])["t"]
    assert out.count() == 0
    assert out.columns == ["k", "x", "y"]
    # recluster over two empty segments folds to one empty segment
    lake.append_segments(spark, root, {"t": empty})
    pins2 = zcluster.recluster_zorder(
        spark, root, "t", exprs=["x", "y"], zone_cols=("x", "y"), n_segments=4
    )
    assert len(pins2["t"]) == 1
    assert lake.read_segmented_components(spark, root, ["t"])["t"].count() == 0


def test_recluster_sorted_single_column_layout(spark, tmp_path):
    """The 1-D ORDER BY sibling: arrival-ordered appends prune nothing
    on k; recluster_sorted makes k-range pruning tight, stays
    content-neutral, converges via the marker, and switching the
    layout to z-order afterwards invalidates the marker cleanly."""
    root = str(tmp_path / "ds")
    _append_messy(spark, root, n_batches=4, seed=21)
    kept0, pinned0 = lake.zone_pruned_pins(spark, root, "t", "k", lo=0, hi=120)
    assert kept0 == pinned0  # arrival order: nothing prunable
    before = sorted(
        tuple(r)
        for r in lake.read_segmented_components(spark, root, ["t"])["t"].collect()
    )
    pins = zcluster.recluster_sorted(
        spark, root, "t", order_expr="k", zone_cols=("k", "m"), n_segments=8
    )
    kept1, pinned1 = lake.zone_pruned_pins(spark, root, "t", "k", lo=0, hi=120)
    assert pinned1 == pins["t"]
    assert 0 < len(kept1) < len(pinned1)  # k-pruning engaged
    after = sorted(
        tuple(r)
        for r in lake.read_segmented_components(spark, root, ["t"])["t"].collect()
    )
    assert after == before  # content-neutral
    marker = lake.segment_meta(spark, root)["zcluster_t"]
    assert marker["bits"] == "sort" and marker["exprs"] == ["k"]
    # converged: idle pass commits nothing
    v = lake.segment_pins_versioned(spark, root)[1]
    assert zcluster.recluster_sorted(
        spark, root, "t", order_expr="k", zone_cols=("k", "m"), n_segments=8
    ) == pins
    assert lake.segment_pins_versioned(spark, root)[1] == v
    # layout switch: the z-order verb sees a foreign marker and re-lays
    pins_z = zcluster.recluster_zorder(
        spark, root, "t",
        exprs=["CAST(floor(k / 4) AS INT)", "m"], zone_cols=("k", "m"),
        n_segments=4,
    )
    assert not set(pins["t"]) & set(pins_z["t"])


def test_maintain_runs_sorted_recluster_kind(spark, tmp_path):
    root = str(tmp_path / "ds")
    _append_messy(spark, root, n_batches=3, seed=23)
    policy = {
        "recluster": {
            "t": {
                "kind": "sorted",
                "order_expr": "k",
                "zone_cols": ("k", "m"),
                "n_segments": 4,
            }
        },
        "repair": False,
        "expire": False,
    }
    plan = lake.maintain(spark, root, policy, dry_run=True)
    assert sorted(plan["recluster"]["t"]["would_fold"]) == lake.segment_pins(
        spark, root
    )["t"]
    rep = lake.maintain(spark, root, policy)
    assert rep["recluster"]["t"]["new_segments"]
    kept, pinned = lake.zone_pruned_pins(spark, root, "t", "k", lo=0, hi=120)
    assert 0 < len(kept) < len(pinned)
