"""Schema evolution on the segmented lake (sources/lake).

Pinned contract:
- add-column: appending a frame with NEW columns evolves the
  component's manifest-carried schema; segments written before the
  column existed read back NULL-filled in the canonical column order.
- old-writer: appending a frame MISSING evolved columns is legal; its
  segment reads back null-filled.
- type change on a common column raises the typed
  SchemaEvolutionError BEFORE any segment lands (no debris pinned).
- compaction normalizes: a mixed-schema component folds to one
  segment carrying the current schema, results identical.
- time travel reads the schema AS OF the historical manifest — a
  later column does not leak into an older read.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.sources import lake


def _v1(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    )


def _v2(spark):
    return spark.createDataFrame(
        [(3, "c", 30.0), (4, "d", 40.0)],
        "id bigint, name string, score double",
    )


def _read(spark, root):
    return lake.read_segmented_components(spark, root, ["t"])["t"]


def test_add_column_null_backfills_old_segments(spark, tmp_path):
    root = str(tmp_path / "ds")
    lake.append_segments(spark, root, {"t": _v1(spark)}, init=True)
    lake.append_segments(spark, root, {"t": _v2(spark)})
    got = _read(spark, root)
    assert got.columns == ["id", "name", "score"]
    rows = {r.id: (r.name, r.score) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_old_writer_missing_column_is_null_filled(spark, tmp_path):
    root = str(tmp_path / "ds")
    lake.append_segments(spark, root, {"t": _v2(spark)}, init=True)
    # a stale writer still emitting the pre-evolution column set
    lake.append_segments(spark, root, {"t": _v1(spark)})
    got = _read(spark, root)
    assert got.columns == ["id", "name", "score"]
    assert got.filter(F.col("score").isNull()).count() == 2
    assert got.count() == 4


def test_type_change_raises_typed_before_any_write(spark, tmp_path):
    root = str(tmp_path / "ds")
    lake.append_segments(spark, root, {"t": _v1(spark)}, init=True)
    pins_before = lake.segment_pins(spark, root)
    bad = spark.createDataFrame([(9, 9)], "id bigint, name bigint")
    with pytest.raises(lake.SchemaEvolutionError, match="name"):
        lake.append_segments(spark, root, {"t": bad})
    # nothing landed, nothing pinned
    assert lake.segment_pins(spark, root) == pins_before


def test_compaction_normalizes_to_current_schema(spark, tmp_path):
    root = str(tmp_path / "ds")
    lake.append_segments(spark, root, {"t": _v1(spark)}, init=True)
    lake.append_segments(spark, root, {"t": _v2(spark)})
    before = sorted(tuple(r) for r in _read(spark, root).collect())
    lake.compact_segments(spark, root)
    pins = lake.segment_pins(spark, root)
    assert len(pins["t"]) == 1
    after_df = _read(spark, root)
    assert sorted(tuple(r) for r in after_df.collect()) == before
    # the compacted segment physically carries the evolved schema: a
    # raw footer read (no manifest schema) shows all three columns
    raw = lake.read_segments(spark, f"{root}/t", pins["t"])
    assert set(raw.columns) == {"id", "name", "score"}


def test_time_travel_reads_schema_as_of_version(spark, tmp_path):
    root = str(tmp_path / "ds")
    lake.append_segments(spark, root, {"t": _v1(spark)}, init=True)
    lake.append_segments(spark, root, {"t": _v2(spark)})
    v1 = lake.read_segmented_components_at(spark, root, 1, ["t"])["t"]
    assert v1.columns == ["id", "name"]
    assert v1.count() == 2
    v2 = lake.read_segmented_components_at(spark, root, 2, ["t"])["t"]
    assert v2.columns == ["id", "name", "score"]


def test_nested_types_evolve_and_nullability_is_not_a_conflict(spark, tmp_path):
    root = str(tmp_path / "ds")
    a = spark.createDataFrame(
        [(1, [1, 2])], "id bigint, xs array<bigint>"
    )
    lake.append_segments(spark, root, {"t": a}, init=True)
    # same element type, different containsNull flag: NOT a conflict
    b = spark.createDataFrame(
        [(2, [3], "x")], "id bigint, xs array<bigint>, tag string"
    )
    lake.append_segments(spark, root, {"t": b})
    got = _read(spark, root)
    assert got.columns == ["id", "xs", "tag"]
    # element type change IS a conflict
    c = spark.createDataFrame([(3, ["s"])], "id bigint, xs array<string>")
    with pytest.raises(lake.SchemaEvolutionError, match="xs"):
        lake.append_segments(spark, root, {"t": c})


def test_tombstone_apply_preserves_evolved_schema(spark, tmp_path):
    """The per-component tombstone protocol (delete_rows /
    read_segmented_live / apply_tombstones) serves and rewrites the
    evolved schema."""
    root = str(tmp_path / "ds")
    lake.append_segments(spark, root, {"t": _v1(spark)}, init=True)
    lake.append_segments(spark, root, {"t": _v2(spark)})
    lake.delete_rows(spark, root, "t", "id", [2, 3])
    live = lake.read_segmented_live(spark, root, "t", "id")
    assert live.columns == ["id", "name", "score"]
    assert {r.id for r in live.collect()} == {1, 4}
    lake.apply_tombstones(spark, root, "t", "id")
    live2 = lake.read_segmented_live(spark, root, "t", "id")
    assert sorted(tuple(r) for r in live2.collect()) == sorted(
        tuple(r) for r in live.collect()
    )


def test_delete_rows_from_dataframe_delete_set(spark, tmp_path):
    """The generic per-component tombstone surface accepts a DataFrame
    delete set (never driver-materialized) and matches the list path."""
    root = str(tmp_path / "ds")
    lake.append_segments(spark, root, {"t": _v2(spark)}, init=True)
    lake.delete_rows_from(
        spark, root, "t", "id", _v2(spark).filter(F.col("id") == 3).select("id")
    )
    live = lake.read_segmented_live(spark, root, "t", "id")
    assert {r.id for r in live.collect()} == {4}


def test_zone_pruned_read_serves_evolved_schema(spark, tmp_path):
    """A zone-pruned range read over mixed segment vintages serves the
    manifest schema (old segments null-backfilled), never whichever
    file footer Spark samples first."""
    root = str(tmp_path / "ds")
    old = spark.createDataFrame([(1, 10)], "id bigint, bucket bigint")
    new = spark.createDataFrame(
        [(2, 20, "x")], "id bigint, bucket bigint, tag string"
    )
    lake.append_segments(
        spark, root, {"t": old}, init=True, zone_cols={"t": ["bucket"]}
    )
    lake.append_segments(spark, root, {"t": new}, zone_cols={"t": ["bucket"]})
    got = lake.read_segments_zone_pruned(spark, root, "t", "bucket", 0, 30)
    assert got.columns == ["id", "bucket", "tag"]
    assert {(r.id, r.tag) for r in got.collect()} == {(1, None), (2, "x")}
    # pruned-to-one-old-segment read still carries the evolved schema
    got_old = lake.read_segments_zone_pruned(spark, root, "t", "bucket", 0, 15)
    assert got_old.columns == ["id", "bucket", "tag"]


def test_replace_resets_component_schema(spark, tmp_path):
    """A replace IS the explicit rewrite the evolution errors point
    to: the same commit unpins every prior segment of the component,
    so the recorded schema resets to the replacing frame's — a retype
    becomes legal, and columns the rewrite dropped stop being served
    as phantom NULLs."""
    root = str(tmp_path / "ds")
    lake.append_segments(
        spark,
        root,
        {"t": spark.createDataFrame([(1, "x", 5)], "id bigint, name string, flag int").coalesce(1)},
        init=True,
    )
    # retype flag int→string and drop name via a replacing rewrite
    lake.append_segments(
        spark,
        root,
        appends={},
        replaces={
            "t": spark.createDataFrame(
                [(1, "on"), (2, "off")], "id bigint, flag string"
            ).coalesce(1)
        },
    )
    df = lake.read_segmented_components(spark, root, ["t"])["t"]
    assert df.schema["flag"].dataType.simpleString() == "string"
    assert "name" not in df.columns
    assert sorted(tuple(r) for r in df.collect()) == [(1, "on"), (2, "off")]
    # appends against the reset schema enforce the NEW types
    with pytest.raises(lake.SchemaEvolutionError):
        lake.append_segments(
            spark,
            root,
            {"t": spark.createDataFrame([(3, 1)], "id bigint, flag int")},
        )


def test_type_widening_int_to_bigint_across_segments(spark, tmp_path):
    """Lossless widenings evolve in place: an int column widened to
    bigint by a later writer serves BOTH vintages under the wide read
    schema (Spark's parquet readers reconcile narrow files natively);
    a lagging narrow writer keeps committing; compaction normalizes
    the physical tail; deep fsck accepts the legal vintages."""
    root = str(tmp_path / "ds")
    lake.append_segments(
        spark,
        root,
        {"t": spark.createDataFrame([(1, 10)], "id bigint, n int").coalesce(1)},
        init=True,
    )
    lake.append_segments(
        spark,
        root,
        {"t": spark.createDataFrame(
            [(2, 4_000_000_000)], "id bigint, n bigint"
        ).coalesce(1)},
    )
    # lagging writer still emitting int: legal, manifest stays bigint
    lake.append_segments(
        spark,
        root,
        {"t": spark.createDataFrame([(3, 7)], "id bigint, n int").coalesce(1)},
    )
    df = lake.read_segmented_components(spark, root, ["t"])["t"]
    assert df.schema["n"].dataType.simpleString() == "bigint"
    assert sorted(tuple(r) for r in df.collect()) == [
        (1, 10), (2, 4_000_000_000), (3, 7),
    ]
    rep = lake.validate_segmented(spark, root, deep=True)
    assert rep["ok"], rep["errors"]
    # compaction rewrites the mixed-vintage tail AT the wide type
    lake.compact_segments(spark, root)
    seg = lake.segment_pins(spark, root)["t"]
    assert len(seg) == 1
    raw = spark.read.parquet(f"{root}/t/seg={seg[0]}")
    assert raw.schema["n"].dataType.simpleString() == "bigint"


def test_type_widening_float_double_and_decimal_scale_up(spark, tmp_path):
    from decimal import Decimal

    root = str(tmp_path / "ds")
    lake.append_segments(
        spark,
        root,
        {"t": spark.createDataFrame(
            [(1.5, Decimal("1.25"))], "x float, d decimal(5,2)"
        ).coalesce(1)},
        init=True,
    )
    lake.append_segments(
        spark,
        root,
        {"t": spark.createDataFrame(
            [(2.25, Decimal("123456.7890"))], "x double, d decimal(12,4)"
        ).coalesce(1)},
    )
    df = lake.read_segmented_components(spark, root, ["t"])["t"]
    assert df.schema["x"].dataType.simpleString() == "double"
    assert df.schema["d"].dataType.simpleString() == "decimal(12,4)"
    got = sorted(tuple(r) for r in df.collect())
    assert got == [
        (1.5, Decimal("1.2500")),
        (2.25, Decimal("123456.7890")),
    ]
    assert lake.validate_segmented(spark, root, deep=True)["ok"]


def test_lossy_type_changes_stay_typed_rejects(spark, tmp_path):
    root = str(tmp_path / "ds")
    lake.append_segments(
        spark,
        root,
        {"t": spark.createDataFrame(
            [(10**18, "a")], "big bigint, s string"
        ).coalesce(1)},
        init=True,
    )
    # long→double loses precision past 2^53: rejected
    with pytest.raises(lake.SchemaEvolutionError):
        lake.append_segments(
            spark, root,
            {"t": spark.createDataFrame([(1.0, "b")], "big double, s string")},
        )
    # string↔numeric: rejected
    with pytest.raises(lake.SchemaEvolutionError):
        lake.append_segments(
            spark, root,
            {"t": spark.createDataFrame([(5, 6)], "big bigint, s int")},
        )
    # decimal that would DROP fractional digits: rejected
    root2 = str(tmp_path / "ds2")
    from decimal import Decimal
    lake.append_segments(
        spark, root2,
        {"t": spark.createDataFrame([(Decimal("1.23"),)], "d decimal(5,2)").coalesce(1)},
        init=True,
    )
    with pytest.raises(lake.SchemaEvolutionError):
        lake.append_segments(
            spark, root2,
            {"t": spark.createDataFrame([(Decimal("12345678"),)], "d decimal(8,0)")},
        )


# ---------------------------------------------------------------- renames
def _rename_root(spark, tmp_path):
    root = str(tmp_path / "ds")
    lake.append_segments(
        spark, root,
        {"t": spark.createDataFrame(
            [(1, 10, "x"), (2, 20, "y")], "id int, amount int, tag string"
        )},
        init=True, zone_cols={"t": ["amount"]}, bloom_cols={"t": ["id"]},
    )
    return root


def test_rename_column_is_metadata_only_and_reads_reconcile(spark, tmp_path):
    root = _rename_root(spark, tmp_path)
    seg0 = lake.segment_pins(spark, root)["t"][0]
    lake.rename_columns(spark, root, "t", {"amount": "total"})
    # no rewrite: the same segment is still pinned, physical name old
    assert lake.segment_pins(spark, root)["t"] == [seg0]
    raw = spark.read.parquet(f"{root}/t/seg={seg0}")
    assert "amount" in raw.columns
    out = _read(spark, root)
    assert out.columns == ["id", "total", "tag"]
    assert sorted(map(tuple, out.collect())) == [(1, 10, "x"), (2, 20, "y")]


def test_rename_mixed_vintages_one_scan_and_pruning(spark, tmp_path):
    root = _rename_root(spark, tmp_path)
    lake.rename_columns(spark, root, "t", {"amount": "total"})
    # post-rename writer (new name) and LAGGING writer (old name)
    lake.append_segments(
        spark, root,
        {"t": spark.createDataFrame([(3, 30, "z")], "id int, total int, tag string")},
        zone_cols={"t": ["total"]}, bloom_cols={"t": ["id"]},
    )
    lake.append_segments(
        spark, root,
        {"t": spark.createDataFrame([(4, 40, "w")], "id int, amount int, tag string")},
        bloom_cols={"t": ["id"]},
    )
    out = _read(spark, root)
    assert sorted(map(tuple, out.collect())) == [
        (1, 10, "x"), (2, 20, "y"), (3, 30, "z"), (4, 40, "w")
    ]
    # zonemap keys followed the rename: the [10,20] vintage prunes for
    # a total-range predicate even though its stats were written pre-rename
    kept, pinned = lake.zone_pruned_pins(spark, root, "t", "total", lo=35, hi=50)
    assert len(pinned) == 3
    assert len(kept) == 1  # only the un-zoned lagging segment survives
    got = (
        lake.read_segments_zone_pruned(spark, root, "t", "total", lo=35, hi=50)
        .filter(F.col("total").between(35, 50))
        .collect()
    )
    assert [(r.id, r.total) for r in got] == [(4, 40)]
    # bloom sidecars survived the rename (copied, not orphaned)
    kept_b, _ = lake.bloom_pruned_pins(spark, root, "t", "id", [1])
    assert len(kept_b) == 1


def test_rename_rejects_reserved_names_and_requires_live_column(spark, tmp_path):
    root = _rename_root(spark, tmp_path)
    lake.rename_columns(spark, root, "t", {"amount": "total"})
    with pytest.raises(lake.SchemaEvolutionError):
        lake.rename_columns(spark, root, "t", {"tag": "amount"})  # retired
    with pytest.raises(lake.SchemaEvolutionError):
        lake.rename_columns(spark, root, "t", {"tag": "total"})  # live
    with pytest.raises(lake.SchemaEvolutionError):
        lake.rename_columns(spark, root, "t", {"nope": "other"})  # not live
    # a frame carrying BOTH names of one field is ambiguous
    with pytest.raises(lake.SchemaEvolutionError):
        lake.append_segments(
            spark, root,
            {"t": spark.createDataFrame(
                [(9, 1, 2, "q")], "id int, amount int, total int, tag string"
            )},
        )


def test_rename_then_compaction_normalizes_physical_names(spark, tmp_path):
    root = _rename_root(spark, tmp_path)
    lake.rename_columns(spark, root, "t", {"amount": "total"})
    lake.append_segments(
        spark, root,
        {"t": spark.createDataFrame([(3, 30, "z")], "id int, total int, tag string")},
    )
    before = sorted(map(tuple, _read(spark, root).collect()))
    lake.compact_segments(spark, root)
    pins = lake.segment_pins(spark, root)["t"]
    assert len(pins) == 1
    raw = spark.read.parquet(f"{root}/t/seg={pins[0]}")
    assert raw.columns == ["id", "total", "tag"]  # old name aged out
    assert sorted(map(tuple, _read(spark, root).collect())) == before


def test_drop_column_is_metadata_only_and_name_stays_reserved(spark, tmp_path):
    root = _rename_root(spark, tmp_path)
    seg0 = lake.segment_pins(spark, root)["t"][0]
    lake.drop_columns(spark, root, "t", ["tag"])
    assert lake.segment_pins(spark, root)["t"] == [seg0]  # no rewrite
    out = _read(spark, root)
    assert out.columns == ["id", "amount"]
    # re-introducing the dropped name would resurrect old physical data
    with pytest.raises(lake.SchemaEvolutionError):
        lake.append_segments(
            spark, root,
            {"t": spark.createDataFrame([(9, 5, "q")], "id int, amount int, tag string")},
        )
    # dropping everything is a typed reject
    with pytest.raises(lake.SchemaEvolutionError):
        lake.drop_columns(spark, root, "t", ["id", "amount"])
    # compaction writes the dropped column out of the physical files
    lake.append_segments(
        spark, root,
        {"t": spark.createDataFrame([(3, 30)], "id int, amount int")},
    )
    lake.compact_segments(spark, root)
    pins = lake.segment_pins(spark, root)["t"]
    raw = spark.read.parquet(f"{root}/t/seg={pins[0]}")
    assert raw.columns == ["id", "amount"]


def test_repair_zone_backfill_respects_renames(spark, tmp_path):
    """Coverage backfill on a pre-rename segment must find the values
    under their prior physical name — [None, None, n] stats would make
    a real-data segment silently prunable (wrong results)."""
    root = str(tmp_path / "ds")
    lake.append_segments(
        spark, root,
        {"t": spark.createDataFrame([(1, 10), (2, 20)], "id int, amount int")},
        init=True,  # NO zone stats: this segment is the coverage gap
    )
    lake.append_segments(
        spark, root,
        {"t": spark.createDataFrame([(3, 500)], "id int, amount int")},
        zone_cols={"t": ["amount"]},
    )
    lake.rename_columns(spark, root, "t", {"amount": "total"})
    rep = lake.repair_segmented(spark, root, sweep_orphans=False)
    assert rep["committed"] and rep["ok"], rep
    seg_gap = lake.segment_pins(spark, root)["t"][0]
    stats = lake.segment_zones(spark, root)["t"][seg_gap]["total"]
    assert stats[:2] == [10, 20]  # real values, via the prior name
    kept, _ = lake.zone_pruned_pins(spark, root, "t", "total", lo=15, hi=18)
    assert kept == [seg_gap]


def test_lagging_writer_coverage_under_current_names(spark, tmp_path):
    """A lagging writer appends the OLD physical name while naming the
    CURRENT column in zone_cols/bloom_cols (what any config-driven
    ingest does post-rename): coverage must be computed through the
    rename plan — real stats under the current name, a resolving bloom
    — not crash on an unresolved column."""
    root = _rename_root(spark, tmp_path)
    lake.rename_columns(spark, root, "t", {"amount": "total"})
    lake.append_segments(
        spark, root,
        {"t": spark.createDataFrame(
            [(7, 700, "q"), (8, 800, "r")], "id int, amount int, tag string"
        )},
        zone_cols={"t": ["total"]}, bloom_cols={"t": ["id"]},
    )
    seg = lake.segment_pins(spark, root)["t"][-1]
    stats = lake.segment_zones(spark, root)["t"][seg]["total"]
    assert stats[:2] == [700, 800]  # values found via the prior name
    kept, _ = lake.zone_pruned_pins(spark, root, "t", "total", lo=0, hi=100)
    assert seg not in kept  # and they prune
    kept_b, _ = lake.bloom_pruned_pins(spark, root, "t", "id", [7])
    assert kept_b == [seg]
    got = sorted(
        map(tuple, lake.read_segments_bloom_pruned(
            spark, root, "t", "id", [7]
        ).filter(F.col("id") == 7).collect())
    )
    assert got == [(7, 700, "q")]


def test_rewrite_segments_folds_schema_over_every_output_frame(spark, tmp_path):
    """The fold-to-N list path must evolve the recorded schema from
    EVERY output frame — a column only the second frame carries has to
    survive pinned reads (losing it would physically drop the data at
    the next normalization), and a type conflict between output frames
    is a typed reject with zero segment debris."""
    import pytest

    root = str(tmp_path / "ds")
    lake.append_segments(
        spark, root,
        {"t": spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")},
        init=True,
    )
    lake.append_segments(
        spark, root,
        {"t": spark.createDataFrame([(3, "c")], "id int, name string")},
    )

    def split_and_annotate(df):
        return [
            df.filter(F.col("id") % 2 == 0),
            df.filter(F.col("id") % 2 == 1).withColumn("extra", F.lit(9)),
        ]

    lake.rewrite_segments(spark, root, "t", rewrite=split_and_annotate)
    out = lake.read_segmented_components(spark, root, ["t"])["t"]
    assert out.columns == ["id", "name", "extra"]
    assert sorted(map(tuple, out.collect())) == [
        (1, "a", 9), (2, "b", None), (3, "c", 9)
    ]

    def conflicting(df):
        return [
            df.select("id", "name"),
            df.select("id", F.col("id").alias("name")),  # name as INT
        ]

    segs_before = lake.segment_numbers(spark, f"{root}/t")
    with pytest.raises(lake.SchemaEvolutionError):
        lake.rewrite_segments(spark, root, "t", rewrite=conflicting)
    # typed reject BEFORE any segment landed: no debris
    assert lake.segment_numbers(spark, f"{root}/t") == segs_before


def test_recluster_sorted_rejects_non_numeric_key(spark, tmp_path):
    import pytest
    from ed_housing_data_pipeline_spark.operators import zcluster

    root = str(tmp_path / "ds")
    for i in range(2):
        lake.append_segments(
            spark, root,
            {"t": spark.createDataFrame([(i, "x")], "k int, name string")},
            init=(i == 0),
        )
    with pytest.raises(ValueError, match="numeric"):
        zcluster.recluster_sorted(
            spark, root, "t", order_expr="name", zone_cols=("k",)
        )


def test_time_travel_reads_pre_rename_names(spark, tmp_path):
    """A historical read serves the schema AS OF that manifest: before
    the rename the column is its old name; the head read serves the
    new name — same values either way."""
    root = _rename_root(spark, tmp_path)
    v1 = lake.segment_pins_versioned(spark, root)[1]
    lake.rename_columns(spark, root, "t", {"amount": "total"})
    old = lake.read_segmented_components_at(spark, root, v1)["t"]
    assert old.columns == ["id", "amount", "tag"]
    new = _read(spark, root)
    assert new.columns == ["id", "total", "tag"]
    assert sorted(r[1] for r in old.collect()) == sorted(
        r[1] for r in new.collect()
    )


def test_maintain_normalize_renames_closes_pushdown_gap(spark, tmp_path):
    """The renamed-column pushdown gap ages out on cadence: before
    normalization a predicate on the renamed column filters post-scan
    (the coalesce shim is not pushable into parquet row-group stats);
    maintain(normalize_renames=True) full-folds the component under the
    current physical names and retires the shim, after which the SAME
    predicate reaches the scan as a PushedFilter and values are
    unchanged."""
    root = _rename_root(spark, tmp_path)
    lake.rename_columns(spark, root, "t", {"amount": "total"})
    lake.append_segments(
        spark, root,
        {"t": spark.createDataFrame(
            [(3, 30, "z")], "id int, total int, tag string"
        )},
    )

    def plan_of():
        df = _read(spark, root).filter(F.col("total") > 15)
        return df, df._jdf.queryExecution().executedPlan().toString()

    before_rows = sorted(map(tuple, plan_of()[0].collect()))
    assert "PushedFilters: [IsNotNull(total), GreaterThan(total,15)" not in (
        plan_of()[1]
    )  # the honest pre-normalization cost
    # dry run names the target without rewriting
    dry = lake.maintain(
        spark, root, {"normalize_renames": True}, dry_run=True
    )
    assert dry["normalize_renames"] == {"would_normalize": ["t"]}
    assert len(lake.segment_pins(spark, root)["t"]) == 2  # untouched
    rep = lake.maintain(spark, root, {"normalize_renames": True})
    assert rep["normalize_renames"] == {"normalized": ["t"]}
    sj = lake.segment_schemas(spark, root)["t"]
    assert not any(
        (f.get("metadata") or {}).get("prior_names") for f in sj["fields"]
    )
    df, plan = plan_of()
    assert "PushedFilters: [IsNotNull(total), GreaterThan(total,15)" in plan
    assert sorted(map(tuple, df.collect())) == before_rows
    # a second cadence is a no-op (nothing renamed anymore)
    rep2 = lake.maintain(spark, root, {"normalize_renames": True})
    assert rep2["normalize_renames"] == {"normalized": []}


def test_vintage_predicate_pushes_on_pre_rename_segments(spark, tmp_path):
    """r13 VERDICT #9 (grace AND pushdown): with rename normalization
    OFF, read_segmented_where's per-vintage disjunction lands in the
    parquet scan's PushedFilters under BOTH the old and new physical
    names — exact because each segment serves one vintage and NULL
    predicates are falsy — and the values equal the post-read filter
    on the coalesced frame."""
    root = _rename_root(spark, tmp_path)
    lake.rename_columns(spark, root, "t", {"amount": "total"})
    lake.append_segments(
        spark, root,
        {"t": spark.createDataFrame(
            [(3, 30, "z"), (4, 8, "w")], "id int, total int, tag string"
        )},
    )
    df = lake.read_segmented_where(
        spark, root, "t", "total", lambda c: c > 15
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(total,15)" in plan, plan
    assert "GreaterThan(amount,15)" in plan, plan  # pre-rename vintage
    got = sorted(map(tuple, df.collect()))
    want = sorted(
        map(tuple, _read(spark, root).filter(F.col("total") > 15).collect())
    )
    assert got == want == [(2, 20, "y"), (3, 30, "z")]
    # never-renamed component: plain pushed filter, same verb
    df2 = lake.read_segmented_where(
        spark, root, "t", "id", lambda c: c == 4
    )
    assert [r.id for r in df2.collect()] == [4]
