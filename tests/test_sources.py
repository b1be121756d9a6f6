"""Unit tests for sources/{readers,lake}.py — the custom scan helpers
(skip-rows CSV, Excel fallback) and the partitioned lake sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.sources import lake, readers
from tests.conftest import rows


def test_read_csv_all_strings(spark, tmp_path):
    p = tmp_path / "plain.csv"
    p.write_text("id,name\n1,alice\n2,bob\n")
    df = readers.read_csv(spark, str(p))
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    assert rows(df) == [("1", "alice"), ("2", "bob")]


def test_read_csv_skip_rows_preamble_and_spaced_headers(spark, tmp_path):
    p = tmp_path / "preamble.csv"
    p.write_text(
        "Some report title\n"
        "generated 2023, do not edit\n"
        '"note, with a comma"\n'
        "fourth preamble line\n"
        'State LEA ID,LEA Name,"School Age, Total"\n'
        "601,Fulton,100\n"
        "602,DeKalb,200\n"
    )
    df = readers.read_csv_skip_rows(spark, str(p), skip_rows=4)
    assert df.columns == ["State LEA ID", "LEA Name", "School Age, Total"]
    assert rows(df) == [("601", "Fulton", "100"), ("602", "DeKalb", "200")]


def test_read_csv_skip_rows_past_eof_raises(spark, tmp_path):
    p = tmp_path / "short.csv"
    p.write_text("only line\n")
    with pytest.raises(ValueError, match="no header line"):
        readers.read_csv_skip_rows(spark, str(p), skip_rows=5)


def test_read_excel_vendored(spark, tmp_path):
    """S3 executes in this container via the vendored stdlib parser
    (openpyxl absent): strings via sharedStrings, numbers as raw text,
    sparse cells as NULL, all-string schema."""
    from tests.conftest import write_xlsx

    xp = tmp_path / "t.xlsx"
    write_xlsx(
        xp,
        [
            ["name", "score", "note"],
            ["alpha", 90.5, "ok"],
            ["beta", 601, None],
        ],
    )
    df = readers.read_excel(spark, str(xp))
    assert df.columns == ["name", "score", "note"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 3
    assert rows(df) == [("alpha", "90.5", "ok"), ("beta", "601", None)]


def test_read_xlsx_table_edge_cells(tmp_path):
    """Hand-built sheet exercising inlineStr, rich-text shared strings,
    booleans, missing header cells, and sparse rows."""
    import zipfile

    from ed_housing_data_pipeline_spark.sources.xlsx import read_xlsx_table

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pkgrel = "http://schemas.openxmlformats.org/package/2006/relationships"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="inlineStr">'
        "<is><t>c_col</t></is></c></row>"
        '<row r="2"><c r="A2" t="b"><v>1</v></c><c r="B2"><v>3.25</v></c>'
        '<c r="C2" t="s"><v>1</v></c></row>'
        "</sheetData></worksheet>"
    )
    # si[1] is a rich-text run pair -> concatenated "richtext"
    sst = (
        f'<sst xmlns="{ns}"><si><t>a col</t></si>'
        "<si><r><t>rich</t></r><r><t>text</t></r></si></sst>"
    )
    xp = tmp_path / "edge.xlsx"
    with zipfile.ZipFile(xp, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{ns}" xmlns:r="{rel}"><sheets>'
            '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<Relationships xmlns="{pkgrel}"><Relationship Id="rId1" '
            f'Type="{rel}/worksheet" Target="worksheets/sheet1.xml"/></Relationships>',
        )
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    header, data = read_xlsx_table(str(xp))
    assert header == ["a col", "Unnamed: 1", "c_col"]
    assert data == [["True", "3.25", "richtext"]]


def test_read_xlsx_sheet_selection_errors(tmp_path):
    from tests.conftest import write_xlsx

    from ed_housing_data_pipeline_spark.sources.xlsx import read_xlsx_table

    xp = tmp_path / "s.xlsx"
    write_xlsx(xp, [["h"], ["v"]], sheet_name="Data")
    assert read_xlsx_table(str(xp), "Data")[1] == [["v"]]
    with pytest.raises(ValueError, match="out of range"):
        read_xlsx_table(str(xp), 3)
    with pytest.raises(ValueError, match="not found"):
        read_xlsx_table(str(xp), "Nope")


def test_read_json_lines(spark, tmp_path):
    p = tmp_path / "e.jsonl"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    df = readers.read_json_lines(spark, str(p), schema="a long")
    assert rows(df) == [(1,), (2,)]


# ------------------------------------------------------------------ lake
def test_catalog_paths():
    cat = lake.LakeCatalog(base="file:///tmp/lake/")
    assert cat.dataset_root("silver", "housing") == "file:///tmp/lake/silver/housing"
    assert (
        cat.partition("gold", "lea", "2024-01-01")
        == "file:///tmp/lake/gold/lea/ingest_date=2024-01-01"
    )


def test_compact_partition(spark, tmp_path):
    """20 tiny files -> 1 compacted file, same rows; sorted variant
    leaves the data range-clustered for min/max pruning."""
    root = str(tmp_path / "many")
    df = spark.range(0, 2000).selectExpr("id", "id % 7 AS k")
    df.repartition(20).write.parquet(root)
    import glob

    assert len(glob.glob(f"{root}/part-*")) == 20
    n = lake.compact_partition(spark, root, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{root}/part-*")) == 1
    assert spark.read.parquet(root).count() == 2000

    sroot = str(tmp_path / "sorted")
    df.repartition(8).write.parquet(sroot)
    lake.compact_partition(spark, sroot, target_file_bytes=1 << 30, sort_by=["id"])
    back = spark.read.parquet(sroot)
    assert back.count() == 2000
    ids = [r["id"] for r in back.toLocalIterator()]
    assert ids == sorted(ids)  # single sorted file: fully clustered
    # the swap leaves no intermediate dirs behind
    assert not glob.glob(f"{sroot}.compact-*")


def test_upsert_partitions(spark, tmp_path):
    """Keyed merge touching one partition: updated key takes the new
    value, new key appears, untouched keys and partitions survive."""
    root = str(tmp_path / "ds")
    base = spark.createDataFrame(
        [(1, "a", 10, "2024-01-01"), (2, "b", 20, "2024-01-01"),
         (3, "c", 30, "2024-01-02")],
        "id int, name string, v int, ingest_date string",
    )
    lake.write_parquet(base, root, partition_by=["ingest_date"])
    updates = spark.createDataFrame(
        [(1, "a2", 11, "2024-01-01"), (9, "z", 99, "2024-01-01")],
        "id int, name string, v int, ingest_date string",
    )
    touched = lake.upsert_partitions(spark, root, updates, key_cols=["id"])
    assert touched == ["2024-01-01"]
    got = {
        (r["id"], r["ingest_date"]): (r["name"], r["v"])
        for r in spark.read.parquet(root)
        .withColumn("ingest_date", F.col("ingest_date").cast("string"))
        .collect()
    }
    assert got == {
        (1, "2024-01-01"): ("a2", 11),   # updated in place
        (2, "2024-01-01"): ("b", 20),    # untouched key survives
        (9, "2024-01-01"): ("z", 99),    # new key inserted
        (3, "2024-01-02"): ("c", 30),    # untouched partition survives
    }


def test_upsert_partitions_order_col_and_bootstrap(spark, tmp_path):
    root = str(tmp_path / "fresh")
    u1 = spark.createDataFrame(
        [(1, 5, "2024-01-01")], "id int, ver int, ingest_date string"
    )
    # dataset does not exist yet -> plain write
    assert lake.upsert_partitions(spark, root, u1, ["id"]) == ["2024-01-01"]
    # stale update (lower ver) must NOT clobber when order_col given
    u2 = spark.createDataFrame(
        [(1, 3, "2024-01-01")], "id int, ver int, ingest_date string"
    )
    lake.upsert_partitions(spark, root, u2, ["id"], order_col="ver")
    row = spark.read.parquet(root).first()
    assert row["ver"] == 5


def test_compact_partition_refuses_stale_old_dir(spark, tmp_path):
    """A leftover .compact-old dir means a previous swap crashed with
    the original moved aside — compacting again must refuse loudly
    instead of deleting the only surviving copy."""
    import pytest

    root = str(tmp_path / "ds")
    spark.range(0, 100).write.parquet(root)
    (tmp_path / "ds.compact-old").mkdir()
    with pytest.raises(RuntimeError, match="compact-old"):
        lake.compact_partition(spark, root)
    # original untouched by the refused run
    assert spark.read.parquet(root).count() == 100


def test_abfss_conf_and_base():
    assert (
        lake.abfss_base("lake", "acct", "bronze/housing")
        == "abfss://lake@acct.dfs.core.windows.net/bronze/housing"
    )
    assert lake.abfss_base("lake", "acct") == "abfss://lake@acct.dfs.core.windows.net"
    conf = lake.abfss_conf("acct")
    host = "acct.dfs.core.windows.net"
    assert conf == {
        f"fs.azure.account.auth.type.{host}": "OAuth",
        f"fs.azure.account.oauth.provider.type.{host}": (
            "org.apache.hadoop.fs.azurebfs.oauth2.MsiTokenProvider"
        ),
    }
    full = lake.abfss_conf("acct", tenant_id="tid", client_id="cid")
    assert full[f"fs.azure.account.oauth2.msi.tenant.{host}"] == "tid"
    assert full[f"fs.azure.account.oauth2.client.id.{host}"] == "cid"
    assert len(full) == 4


def test_write_parquet_dynamic_partition_overwrite(spark, tmp_path):
    root = str(tmp_path / "ds")
    d1 = spark.createDataFrame([(1, "2024-01-01"), (2, "2024-01-02")], "x int, d string")
    lake.write_parquet(d1, root, partition_by=["d"])
    # re-write ONLY date 1; date 2 must survive (idempotent re-runs)
    d2 = spark.createDataFrame([(99, "2024-01-01")], "x int, d string")
    lake.write_parquet(d2, root, partition_by=["d"])
    got = rows(spark.read.parquet(root).withColumn("d", F.col("d").cast("string")), "x", "d")
    assert got == [(2, "2024-01-02"), (99, "2024-01-01")]


def test_summarize(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "x int, y string")
    s = lake.summarize(df, "out/path")
    assert s == {"rows": 2, "columns": 2, "output_path": "out/path"}


def test_default_ingest_date_env(monkeypatch):
    monkeypatch.setenv("INGEST_DATE", " 2024-02-03 ")
    assert lake.default_ingest_date() == "2024-02-03"


def test_bucketed_tables_join_without_exchange(spark):
    orders = spark.createDataFrame(
        [(i, i % 10, float(i)) for i in range(200)], "o_id int, cust int, total double"
    )
    cust = spark.createDataFrame(
        [(i % 10, f"c{i % 10}") for i in range(10)], "cust int, name string"
    )
    lake.write_bucketed_table(orders, "t_orders_b", ["cust"], 4)
    lake.write_bucketed_table(cust, "t_cust_b", ["cust"], 4)
    try:
        a, b = spark.table("t_orders_b"), spark.table("t_cust_b")
        # force a non-broadcast join so the bucketing is what saves the shuffle
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = a.join(b, "cust")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan  # co-located: shuffle paid at write
            assert j.count() == 200
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_partition_pruned_read(spark, tmp_path):
    """Reads filtered on the partition column must prune at plan time
    (PartitionFilters in the scan), not post-filter all files."""
    root = str(tmp_path / "pruned")
    df = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 3:02d}") for i in range(30)], "x int, d string"
    )
    lake.write_parquet(df, root, partition_by=["d"])
    rd = spark.read.parquet(root).filter(F.col("d") == "2024-01-02")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-01-02" in plan
    assert rd.count() == 10


def test_expire_partitions(spark, tmp_path):
    root = str(tmp_path / "ds")
    for d in ("2024-01-01", "2024-01-02", "2024-01-03"):
        spark.createDataFrame([(1, d)], "x int, ingest_date string").write.mode(
            "append"
        ).partitionBy("ingest_date").parquet(root)
    import pytest

    # keep_latest < 1 would wipe the dataset — must refuse, not obey
    with pytest.raises(ValueError, match="keep_latest"):
        lake.expire_partitions(spark, root, keep_latest=0)
    with pytest.raises(ValueError, match="keep_latest"):
        lake.expire_partitions(spark, root, keep_latest=-3)
    dropped = lake.expire_partitions(spark, root, keep_latest=1)
    assert dropped == ["2024-01-01", "2024-01-02"]
    # partition-value inference types the dir name as a DATE — cast back
    left = {
        r["ingest_date"]
        for r in spark.read.parquet(root)
        .withColumn("ingest_date", F.col("ingest_date").cast("string"))
        .collect()
    }
    assert left == {"2024-01-03"}
    assert lake.expire_partitions(spark, str(tmp_path / "nope"), 1) == []


def test_read_parquet_schema_evolution(spark, tmp_path):
    """mergeSchema unions per-file schemas — the additive-column
    evolution a long-lived lake accumulates; missing columns read as
    NULL from older files."""
    root = tmp_path / "evo"
    spark.createDataFrame([(1,)], "a int").write.parquet(str(root / "p=1"))
    spark.createDataFrame([(2, "x")], "a int, b string").write.parquet(str(root / "p=2"))
    df = spark.read.option("mergeSchema", True).parquet(str(root / "p=*"))
    assert set(df.columns) == {"a", "b"}
    got = {r["a"]: r["b"] for r in df.collect()}
    assert got == {1: None, 2: "x"}


def test_snapshot_versioning_roundtrip(spark, tmp_path):
    """Write → pointer flip → read-latest; historical versions stay
    readable (time travel); expiry keeps the newest N and honors the
    wipe guard."""
    import pytest

    root = str(tmp_path / "snap")
    d1 = spark.createDataFrame([(1, "a")], "id int, v string")
    d2 = spark.createDataFrame([(1, "b"), (2, "c")], "id int, v string")
    assert lake.write_snapshot(spark, d1, root) == 1
    assert lake.write_snapshot(spark, d2, root) == 2
    assert lake.snapshot_versions(spark, root) == [1, 2]
    assert lake.read_snapshot(spark, root).count() == 2          # latest = v2
    assert lake.read_snapshot(spark, root, version=1).count() == 1  # time travel
    d3 = spark.createDataFrame([(9, "z")], "id int, v string")
    assert lake.write_snapshot(spark, d3, root) == 3
    with pytest.raises(ValueError, match="keep_latest"):
        lake.expire_snapshots(spark, root, keep_latest=0)
    assert lake.expire_snapshots(spark, root, keep_latest=2) == [1]
    assert lake.snapshot_versions(spark, root) == [2, 3]
    assert {r["v"] for r in lake.read_snapshot(spark, root).collect()} == {"z"}


def test_read_snapshot_missing_pointer(spark, tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError, match="snapshot"):
        lake.read_snapshot(spark, str(tmp_path / "nope"))


def test_snapshot_crash_before_commit_is_invisible_and_swept(spark, tmp_path):
    """A writer crash after the data dir but before the pointer rename:
    readers keep resolving the previous committed version; expiry
    sweeps the orphan and NEVER the committed version, even with
    keep_latest=1."""
    root = str(tmp_path / "snap")
    d1 = spark.createDataFrame([(1, "a")], "id int, v string")
    assert lake.write_snapshot(spark, d1, root) == 1
    # simulate the crash: v=2 data lands, no pointer
    spark.createDataFrame([(2, "b")], "id int, v string").write.parquet(
        f"{root}/v=2"
    )
    assert lake.snapshot_versions(spark, root) == [1, 2]
    assert {r["v"] for r in lake.read_snapshot(spark, root).collect()} == {"a"}
    # next write claims v=3 (above the orphan), commits, and is read
    d3 = spark.createDataFrame([(3, "c")], "id int, v string")
    assert lake.write_snapshot(spark, d3, root) == 3
    assert {r["v"] for r in lake.read_snapshot(spark, root).collect()} == {"c"}
    # v=2 sits BELOW the committed pointer (v=3): provably dead — any
    # live single writer claims a version ABOVE max(data, committed),
    # so below-pointer debris needs no grace gating (the grace gate
    # protects only versions above the pointer; see
    # test_expire_snapshots_spares_inflight_writer)
    assert lake.expire_snapshots(spark, root, keep_latest=1) == [1, 2]
    assert lake.snapshot_versions(spark, root) == [3]
    assert {r["v"] for r in lake.read_snapshot(spark, root).collect()} == {"c"}


def _backdate(path, days):
    """Rewind mtime (recursively for dirs — the staleness probe takes
    the newest mtime anywhere under a version dir, so a dead writer's
    files must all look old) so the orphan-grace gate sees the path as
    stale."""
    import os
    import time

    old = time.time() - days * 86400
    os.utime(path, (old, old))
    if os.path.isdir(path):
        for dirpath, dirnames, filenames in os.walk(path):
            for name in dirnames + filenames:
                os.utime(os.path.join(dirpath, name), (old, old))


def test_expire_snapshots_spares_inflight_writer(spark, tmp_path):
    """The ADVICE race: a second process is mid-write_snapshot (data
    landed or landing, pointer not yet flipped) while a retention cron
    fires. The young version — signalled by the _INTENT marker and the
    dir mtime — must survive; once stale (writer truly dead) it goes."""
    root = str(tmp_path / "snap")
    d1 = spark.createDataFrame([(1, "a")], "id int, v string")
    assert lake.write_snapshot(spark, d1, root) == 1
    # freeze a write_snapshot at the point where intent + data exist
    # but the pointer rename has not happened yet
    with open(f"{root}/_INTENT.v2", "w") as f:
        f.write("2")
    spark.createDataFrame([(2, "b")], "id int, v string").write.parquet(
        f"{root}/v=2"
    )
    assert lake.expire_snapshots(spark, root, keep_latest=1) == []
    assert lake.snapshot_versions(spark, root) == [1, 2]  # v2 intact
    # a fresh intent alone keeps the version alive even if the data
    # dir is old (writer still mid-flight on a slow job)
    _backdate(f"{root}/v=2", days=2)
    assert lake.expire_snapshots(spark, root, keep_latest=1) == []
    # writer is truly dead: both signals stale -> swept, marker too
    _backdate(f"{root}/_INTENT.v2", days=2)
    assert lake.expire_snapshots(spark, root, keep_latest=1) == [2]
    assert lake.snapshot_versions(spark, root) == [1]
    import os

    assert not os.path.exists(f"{root}/_INTENT.v2")
    # and the committed version still reads
    assert {r["v"] for r in lake.read_snapshot(spark, root).collect()} == {"a"}
    # a marker at-or-below the committed pointer (writer committed but
    # died before its own cleanup) is swept unconditionally
    with open(f"{root}/_INTENT.v1", "w") as f:
        f.write("1")
    lake.expire_snapshots(spark, root, keep_latest=1)
    assert not os.path.exists(f"{root}/_INTENT.v1")
    assert lake.snapshot_versions(spark, root) == [1]


def test_expire_snapshots_spares_partitioned_inflight_write(spark, tmp_path):
    """A long PARTITIONED write lands files in partition subdirs
    without refreshing the version dir's own mtime; the staleness
    probe must see the young leaf files and spare the version even
    when the root dir and the intent marker both look stale."""
    import os
    import time

    root = str(tmp_path / "snap")
    d1 = spark.createDataFrame([(1, "a")], "id int, p string")
    assert lake.write_snapshot(spark, d1, root) == 1
    with open(f"{root}/_INTENT.v2", "w") as f:
        f.write("2")
    spark.createDataFrame([(2, "b")], "id int, p string").write.partitionBy(
        "p"
    ).parquet(f"{root}/v=2")
    _backdate(f"{root}/_INTENT.v2", days=2)
    old = time.time() - 2 * 86400
    os.utime(f"{root}/v=2", (old, old))  # root dir only — leaves stay young
    assert lake.expire_snapshots(spark, root, keep_latest=1) == []
    assert lake.snapshot_versions(spark, root) == [1, 2]


def test_upsert_partitions_rejects_null_partition_and_lost_columns(spark, tmp_path):
    root = str(tmp_path / "ds")
    base = spark.createDataFrame(
        [(1, "a", 7, "2024-01-01")], "id int, name string, extra int, ingest_date string"
    )
    lake.write_parquet(base, root, partition_by=["ingest_date"])
    # NULL partition value: refused before any write happens
    null_part = spark.createDataFrame(
        [(2, "b", 1, None)], "id int, name string, extra int, ingest_date string"
    )
    with pytest.raises(ValueError, match="NULL"):
        lake.upsert_partitions(spark, root, null_part, key_cols=["id"])
    # updates lacking a stored column would erase it partition-wide
    narrow = spark.createDataFrame(
        [(1, "a2", "2024-01-01")], "id int, name string, ingest_date string"
    )
    with pytest.raises(ValueError, match="extra"):
        lake.upsert_partitions(spark, root, narrow, key_cols=["id"])
    # dataset untouched by both refusals
    assert spark.read.parquet(root).count() == 1


# ------------------------------------------------ JSONL / shard export
def _docs_df(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text with\nnewline and \"quotes\" #"), F.col("id")).alias(
            "text"
        ),
        (F.col("id") % 3).cast("string").alias("source"),
    )


def test_write_json_lines_roundtrip_escapes(spark, tmp_path):
    from ed_housing_data_pipeline_spark.sources import export

    df = _docs_df(spark, 5)
    out = str(tmp_path / "plain")
    export.write_json_lines(df, out)
    back = spark.read.schema("doc_id BIGINT, text STRING, source STRING").json(out)
    assert rows(back.select("doc_id", "text", "source")) == rows(df)


def test_export_jsonl_shards_membership_and_layout(spark, tmp_path):
    import glob

    from ed_housing_data_pipeline_spark.functions.text import hash60
    from ed_housing_data_pipeline_spark.sources import export

    df = _docs_df(spark)
    out = str(tmp_path / "sharded")
    export.export_jsonl_shards(
        df, out, key=F.col("doc_id").cast("string"), n_shards=4
    )
    # one gzip file per shard directory (repartition-by-shard co-locates)
    for d in glob.glob(f"{out}/shard=*"):
        assert len(glob.glob(f"{d}/part-*.json.gz")) == 1
    back = export.read_jsonl_shards(
        spark, out, "doc_id BIGINT, text STRING, source STRING"
    )
    # membership matches the portable hash exactly, content survives
    expected = df.withColumn(
        "shard", (hash60(F.col("doc_id").cast("string")) % 4).cast("int")
    )
    assert rows(back.select(*expected.columns)) == rows(expected)


def test_export_jsonl_shards_deterministic_across_runs(spark, tmp_path):
    from ed_housing_data_pipeline_spark.sources import export

    df = _docs_df(spark)
    outs = [str(tmp_path / f"run{i}") for i in (1, 2)]
    got = []
    for out in outs:
        export.export_jsonl_shards(
            df.repartition(7), out, key=F.col("doc_id").cast("string"), n_shards=4
        )
        back = export.read_jsonl_shards(
            spark, out, "doc_id BIGINT, text STRING, source STRING"
        )
        got.append(rows(back.select("shard", "doc_id")))
    assert got[0] == got[1]


def test_export_jsonl_shards_rejects_null_key(spark, tmp_path):
    # the guard is raise_error INSIDE the write pass (no separate
    # precheck job), so it surfaces as a Spark execution error
    from ed_housing_data_pipeline_spark.sources import export

    df = _docs_df(spark, 3).withColumn(
        "doc_id", F.when(F.col("doc_id") == 1, None).otherwise(F.col("doc_id"))
    )
    with pytest.raises(Exception, match="NULL shard key"):
        export.export_jsonl_shards(
            df, str(tmp_path / "nulls"), key=F.col("doc_id").cast("string"), n_shards=2
        )


def test_export_jsonl_shards_rejects_shard_collision(spark, tmp_path):
    from ed_housing_data_pipeline_spark.sources import export

    df = _docs_df(spark, 3).withColumn("shard", F.lit(1))
    with pytest.raises(ValueError, match="already exists"):
        export.export_jsonl_shards(
            df, str(tmp_path / "coll"), key=F.col("doc_id").cast("string"), n_shards=2
        )


# ------------------------- multi-component manifest commit protocol
def test_commit_components_roundtrip_and_torn_commit_invisible(spark, tmp_path):
    """commit_components → read_components pins every component to the
    manifest's version tuple; component snapshots written WITHOUT a
    manifest commit (a torn multi-component write) stay invisible."""
    root = str(tmp_path / "ds")
    a1 = spark.createDataFrame([(1,)], "x long")
    b1 = spark.createDataFrame([(10,)], "y long")
    versions = lake.commit_components(spark, root, {"a": a1, "b": b1})
    assert versions == {"a": 1, "b": 1}
    got = lake.read_components(spark, root)
    assert rows(got["a"]) == [(1,)] and rows(got["b"]) == [(10,)]

    # torn commit: component 'a' advances to v2, manifest does not
    lake.write_snapshot(spark, spark.createDataFrame([(2,)], "x long"), f"{root}/a")
    got = lake.read_components(spark, root, ["a", "b"])
    assert rows(got["a"]) == [(1,)]  # still the manifest-pinned v1

    # next full commit claims v3 for 'a' (v2 is orphan debris), v2 for 'b'
    versions = lake.commit_components(
        spark,
        root,
        {"a": spark.createDataFrame([(3,)], "x long"), "b": b1},
    )
    assert versions["a"] == 3 and versions["b"] == 2
    got = lake.read_components(spark, root)
    assert rows(got["a"]) == [(3,)]
    assert lake.manifest_versions(spark, root) == {"a": 3, "b": 2}


def test_manifest_versions_missing_manifest_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        lake.manifest_versions(spark, str(tmp_path / "nothing"))


def test_pinned_commit_claim_gate(spark, tmp_path):
    """The _CLAIM.v<N> marker is the put-if-absent gate for pinned-mode
    commits: a standing claim (another writer mid-commit) rejects a
    same-version commit BEFORE any data lands; a stale claim (writer
    dead for > claim_stale_sec) is broken and taken over, along with
    any data debris the crasher left in the version dir."""
    import os

    root = str(tmp_path / "snap")
    d1 = spark.createDataFrame([(1, "a")], "id int, v string")
    assert lake.write_snapshot(spark, d1, root, version=1) == 1
    # a live writer holds the claim for v2
    with open(f"{root}/_CLAIM.v2", "w") as f:
        f.write("2")
    d2 = spark.createDataFrame([(2, "b")], "id int, v string")
    with pytest.raises(lake.ConcurrentCommitError, match="claimed"):
        lake.write_snapshot(spark, d2, root, version=2)
    # no data landed for the rejected commit — the claim fired first
    assert lake.snapshot_versions(spark, root) == [1]
    # the claimer crashed: claim is stale, and it left data debris
    spark.createDataFrame([(9, "junk")], "id int, v string").write.parquet(
        f"{root}/v=2"
    )
    _backdate(f"{root}/_CLAIM.v2", days=2)
    _backdate(f"{root}/v=2", days=2)
    assert lake.write_snapshot(spark, d2, root, version=2) == 2
    rows = {r["v"] for r in lake.read_snapshot(spark, root).collect()}
    assert rows == {"b"}  # the crasher's debris was replaced, not merged
    # a completed commit releases its claim
    assert not os.path.exists(f"{root}/_CLAIM.v2")
    # and a failed commit releases its claim too (stale-pin reject
    # happens before the claim, so force the data-dir conflict path)
    with pytest.raises(lake.ConcurrentCommitError):
        lake.write_snapshot(spark, d2, root, version=2)
    assert not os.path.exists(f"{root}/_CLAIM.v2")
    # the break left no tombstone or debris-rename leftovers behind
    assert not [
        n for n in os.listdir(root)
        if n.startswith("_CLAIMTOMB") or ".debris." in n
    ]


def test_stale_claim_break_loser_stands_down(spark, tmp_path, monkeypatch):
    """The r7-ADVICE cross-process hazard: two writers that both
    observed the same stale claim must not BOTH break it — the naive
    delete-then-create break lets the slow breaker delete the fast
    breaker's freshly re-created claim and both write into v=N. The
    break is now an atomic rename to a unique tombstone with the
    staleness verdict re-checked ON the tombstone (rename preserves
    mtime). Simulated interleaving: a rival completes a full break and
    re-claim in the window between our staleness read and our rename —
    our writer must restore the rival's live claim untouched and raise
    the typed conflict, landing no data."""
    import os

    root = str(tmp_path / "snap")
    d1 = spark.createDataFrame([(1, "a")], "id int, v string")
    assert lake.write_snapshot(spark, d1, root, version=1) == 1
    claim_path = f"{root}/_CLAIM.v2"
    with open(claim_path, "w") as f:
        f.write("2:crashed-writer")
    _backdate(claim_path, days=2)

    real_break = lake._break_stale_claim

    def rival_wins_first(jvm, fs, r, version, claim, stale_sec):
        # the rival's full break + fresh re-claim, atomically "before"
        # our rename: old claim renamed away, fresh claim created NOW
        os.rename(claim_path, f"{root}/_CLAIMTOMB.v2.rival")
        os.remove(f"{root}/_CLAIMTOMB.v2.rival")
        with open(claim_path, "w") as f:
            f.write("2:rival")
        return real_break(jvm, fs, r, version, claim, stale_sec)

    monkeypatch.setattr(lake, "_break_stale_claim", rival_wins_first)
    d2 = spark.createDataFrame([(2, "b")], "id int, v string")
    with pytest.raises(lake.ConcurrentCommitError, match="re-claim"):
        lake.write_snapshot(spark, d2, root, version=2)
    # the rival's live claim was restored, not deleted or replaced
    with open(claim_path) as f:
        assert f.read() == "2:rival"
    # and the losing breaker landed no data
    assert lake.snapshot_versions(spark, root) == [1]


def test_stale_claim_break_stands_down_if_version_committed(spark, tmp_path):
    """A claim can look stale while its holder merely stalled; if the
    holder resumed and COMMITTED the version, breaking the claim and
    touching the data dir would orphan live committed data. The breaker
    must re-check the pointer and stand down, leaving claim and data
    untouched (the unfenced-lease hazard from the r7 ADVICE)."""
    import os

    root = str(tmp_path / "snap")
    d1 = spark.createDataFrame([(1, "a")], "id int, v string")
    assert lake.write_snapshot(spark, d1, root, version=1) == 1
    d2 = spark.createDataFrame([(2, "b")], "id int, v string")
    assert lake.write_snapshot(spark, d2, root, version=2) == 2
    # reconstruct the stalled-holder-resumed state: v2 committed but its
    # stale claim still standing (holder died between flip and cleanup)
    claim_path = f"{root}/_CLAIM.v2"
    with open(claim_path, "w") as f:
        f.write("2:stalled-holder")
    _backdate(claim_path, days=2)
    jvm, fs = lake._fs(spark, root)
    claim = jvm.org.apache.hadoop.fs.Path(claim_path)
    with pytest.raises(lake.ConcurrentCommitError, match="committed"):
        lake._break_stale_claim(jvm, fs, root, 2, claim, 3600.0)
    # nothing was touched: claim intact, committed data intact
    assert os.path.exists(claim_path)
    assert {r["v"] for r in lake.read_snapshot(spark, root).collect()} == {"b"}


def test_expire_snapshots_reader_grace(spark, tmp_path):
    """min_age_sec retains committed-but-superseded versions a live
    reader may still be scanning; once older than the grace they fall
    to the normal keep_latest count."""
    root = str(tmp_path / "snap")
    for i in (1, 2, 3):
        lake.write_snapshot(
            spark, spark.createDataFrame([(i,)], "x long"), root
        )
    # young superseded versions survive beyond keep_latest
    assert (
        lake.expire_snapshots(spark, root, keep_latest=1, min_age_sec=3600)
        == []
    )
    assert lake.snapshot_versions(spark, root) == [1, 2, 3]
    # aged out -> count-based retention applies
    _backdate(f"{root}/v=1", days=2)
    _backdate(f"{root}/v=2", days=2)
    assert lake.expire_snapshots(
        spark, root, keep_latest=1, min_age_sec=3600
    ) == [1, 2]
    assert lake.snapshot_versions(spark, root) == [3]


def test_snapshot_blob_roundtrip_and_time_travel(spark, tmp_path):
    """Blob snapshots (the metadata plane: manifests as JSON files,
    no Spark jobs) follow the exact snapshot protocol: versioning,
    newest-committed reads, time travel, pinned-mode conflicts."""
    root = str(tmp_path / "meta")
    assert lake.write_snapshot_blob(spark, '{"a": 1}', root) == 1
    assert lake.write_snapshot_blob(spark, '{"a": 2}', root) == 2
    assert lake.read_snapshot_blob(spark, root) == '{"a": 2}'
    assert lake.read_snapshot_blob(spark, root, version=1) == '{"a": 1}'
    with pytest.raises(lake.ConcurrentCommitError):
        lake.write_snapshot_blob(spark, '{"a": 9}', root, version=2)
    with pytest.raises(FileNotFoundError):
        lake.read_snapshot_blob(spark, str(tmp_path / "nothing"))


# ------------------------------------------------ change-data-feed
def test_read_segment_changes_excludes_rewrites(spark, tmp_path):
    """Incremental read between two manifest versions: genuine appends
    flow, a compaction INSIDE the window does not re-emit old rows,
    and a segment appended-then-compacted within the window is still
    picked up from the intermediate manifest that pinned it."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "ds")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("v")
        )

    lake.append_segments(spark, root, {"t": batch(0, 100)}, init=True)
    v1 = lake.segment_pins_versioned(spark, root)[1]
    lake.append_segments(spark, root, {"t": batch(100, 150)})
    lake.compact_segments(spark, root)  # rewrite: no new rows
    lake.append_segments(spark, root, {"t": batch(150, 180)})
    feed = lake.read_segment_changes(spark, root, "t", v1)
    got = sorted(r.k for r in feed.collect())
    # exactly the two appended batches — the appended-then-compacted
    # batch (100..150) comes from the intermediate manifest, the
    # compacted fold (0..180's rewrite outputs) is excluded
    assert got == list(range(100, 150)) + list(range(150, 180))
    # idle window → typed empty frame with the component's schema
    head = lake.segment_pins_versioned(spark, root)[1]
    empty = lake.read_segment_changes(spark, root, "t", head)
    assert empty.count() == 0 and empty.columns == ["k", "v"]


def test_read_segment_changes_skips_recluster_and_bounds(spark, tmp_path):
    from pyspark.sql import functions as F

    from ed_housing_data_pipeline_spark.operators import zcluster

    root = str(tmp_path / "ds")
    for i in range(3):
        df = spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").alias("k"),
            (F.col("id") % 13).cast("int").alias("m"),
        )
        lake.append_segments(
            spark, root, {"t": df}, init=(i == 0), zone_cols={"t": ["k", "m"]}
        )
    v1 = lake.segment_pins_versioned(spark, root)[1]
    # a maintenance wave between the versions: content-neutral
    zcluster.recluster_zorder(
        spark, root, "t",
        exprs=["CAST(floor(k / 8) AS INT)", "m"], zone_cols=("k", "m"),
        n_segments=4, bits=6,
    )
    lake.append_segments(
        spark, root,
        {"t": spark.range(300, 320).select(
            F.col("id").alias("k"),
            (F.col("id") % 13).cast("int").alias("m"),
        )},
        zone_cols={"t": ["k", "m"]},
    )
    feed = lake.read_segment_changes(spark, root, "t", v1)
    assert sorted(r.k for r in feed.collect()) == list(range(300, 320))
    # delete feed: the tombstone component is its own change stream
    lake.delete_rows(spark, root, "t", "k", [301, 302])
    v2 = lake.segment_pins_versioned(spark, root)[1]
    dead = lake.read_segment_changes(
        spark, root, lake.tombstone_component("t"), v1
    )
    assert sorted(r.k for r in dead.collect()) == [301, 302]
    assert v2 > v1


def test_read_segment_changes_bootstrap_and_delete_apply(spark, tmp_path):
    """from_version=0 bootstraps the feed (everything since the
    beginning); a PHYSICAL delete apply inside a window is a marked
    rewrite — the surviving rows are not re-emitted as appends."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "ds")
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    lake.append_segments(spark, root, {"t": df}, init=True)
    boot = lake.read_segment_changes(spark, root, "t", 0)
    assert sorted(r.k for r in boot.collect()) == list(range(50))
    v1 = lake.segment_pins_versioned(spark, root)[1]
    lake.delete_rows(spark, root, "t", "k", [3, 4])
    lake.apply_tombstones(spark, root, "t", "k")
    feed = lake.read_segment_changes(spark, root, "t", v1)
    # the 48 surviving rows were rewritten, not appended: empty feed
    assert feed.count() == 0
    # while the delete feed (consumed from v1) carries the two ids
    dead = lake.read_segment_changes(
        spark, root, lake.tombstone_component("t"), v1
    )
    assert sorted(r.k for r in dead.collect()) == [3, 4]


def test_cdc_markers_survive_caller_meta_replace(spark, tmp_path):
    """The meta REPLACE contract covers application state only: a sink
    committing its own meta after a compaction must not wipe the
    rewrite markers the change feed depends on."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "ds")

    def batch(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    lake.append_segments(spark, root, {"t": batch(0, 30)}, init=True)
    v1 = lake.segment_pins_versioned(spark, root)[1]
    lake.append_segments(spark, root, {"t": batch(30, 40)})
    lake.compact_segments(spark, root)
    # a streaming-sink-style commit REPLACING meta wholesale
    lake.append_segments(
        spark, root, {"t": batch(40, 45)}, meta={"batch": 7}
    )
    m = lake.segment_meta(spark, root)
    assert m["batch"] == 7 and m["_cdc_rewrites"]["t"]
    feed = lake.read_segment_changes(spark, root, "t", v1)
    assert sorted(r.k for r in feed.collect()) == list(range(30, 45))


def test_consume_changes_exactly_once_mirror(spark, tmp_path):
    """The checkpointed consumer: bootstraps a mirror from the feed,
    applies only new windows on later calls (replays are no-ops), a
    maintenance-only window advances the watermark without accreting
    segments, a crashed commit re-reads the same window, and a rival
    consumer loses the pinned race instead of double-applying."""
    import pytest
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")

    def batch(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    lake.append_segments(spark, src, {"t": batch(0, 100)}, init=True)
    rep = lake.consume_changes(spark, src, "t", dst)
    assert rep["applied"] and rep["from"] == 0
    assert lake.read_segmented_components(spark, dst, ["t"])["t"].count() == 100
    # replay with no new source commits: no-op, nothing committed
    v_dst = lake.segment_pins_versioned(spark, dst)[1]
    rep2 = lake.consume_changes(spark, src, "t", dst)
    assert not rep2["applied"] and rep2["from"] == rep2["to"]
    assert lake.segment_pins_versioned(spark, dst)[1] == v_dst
    # maintenance-only window: watermark advances, zero new segments
    lake.append_segments(spark, src, {"t": batch(100, 120)})
    lake.compact_segments(spark, src)
    rep3 = lake.consume_changes(spark, src, "t", dst)
    assert rep3["applied"]  # the appended batch flows
    mirror = lake.read_segmented_components(spark, dst, ["t"])["t"]
    assert sorted(r.k for r in mirror.collect()) == list(range(120))
    lake.compact_segments(spark, dst)  # keep the mirror tidy too
    pins_before = lake.segment_pins(spark, dst)["t"]
    # a maintenance-only window on src: logical delete + physical
    # apply (both rewrite/mark; no appends to 't' itself)
    lake.delete_rows(spark, src, "t", "k", [0])
    lake.apply_tombstones(spark, src, "t", "k")
    rep4 = lake.consume_changes(spark, src, "t", dst)
    assert not rep4["applied"] and rep4["to"] > rep4["from"]
    assert lake.segment_pins(spark, dst)["t"] == pins_before  # no accretion
    # crash between read and commit: watermark not advanced, window re-read
    lake.append_segments(spark, src, {"t": batch(120, 130)})
    real = lake.commit_segment_manifest
    calls = {"n": 0}
    def crash_once(*a, **kw):
        if calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("simulated crash before the flip")
        return real(*a, **kw)
    lake.commit_segment_manifest = crash_once
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            lake.consume_changes(spark, src, "t", dst)
    finally:
        lake.commit_segment_manifest = real
    rep5 = lake.consume_changes(spark, src, "t", dst)  # retry: same window
    assert rep5["applied"]
    mirror = lake.read_segmented_components(spark, dst, ["t"])["t"]
    assert mirror.count() == 130
    assert mirror.filter(F.col("k") >= 120).count() == 10  # exactly once


# --------------------------------------------------------- r13 fixes


def test_batched_coverage_anchored_past_seg_element_in_root(spark, tmp_path):
    """A dataset ROOT containing a 'seg=<digits>' path element must not
    mis-key the batched zone/bloom builders (the segment id is the
    file's IMMEDIATE parent, never an ancestor): unanchored parsing
    would leave every real segment on empty-segment default stats,
    which pruning then treats as prunable — silent data drop."""
    root = str(tmp_path / "seg=3" / "ds")

    def batch(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    lake.append_segments(
        spark, root, {"t": batch(0, 10)}, init=True,
        zone_cols={"t": ["k"]}, bloom_cols={"t": ["k"]},
    )
    lake.append_segments(
        spark, root, {"t": batch(100, 110)},
        zone_cols={"t": ["k"]}, bloom_cols={"t": ["k"]},
    )
    pins = lake.segment_pins(spark, root)["t"]
    zones = lake.segment_zones(spark, root)["t"]
    assert {tuple(zones[s]["k"][:2]) for s in pins} == {(0, 9), (100, 109)}
    kept, pinned = lake.zone_pruned_pins(spark, root, "t", "k", 100, 109)
    assert len(pinned) == 2 and len(kept) == 1
    assert rows(lake.read_segments(spark, f"{root}/t", kept)) == [
        (v,) for v in range(100, 110)
    ]
    kept_b, _ = lake.bloom_pruned_pins(spark, root, "t", "k", [105])
    assert len(kept_b) == 1
    sizes = lake.segment_sizes(spark, root, "t", pins)
    assert set(sizes) == set(pins) and all(v > 0 for v in sizes.values())


def test_consume_changes_watermarks_key_on_source_and_sink_component(
    spark, tmp_path
):
    """Watermarks are per (source root, source component, sink
    component): two sources sharing a component name feeding one sink,
    and one source consumed into two sink components, must each advance
    their OWN mark — a shared key would make the second consumer see an
    already-advanced watermark and silently skip its window."""

    def batch(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    src1 = str(tmp_path / "src1")
    src2 = str(tmp_path / "src2")
    dst = str(tmp_path / "dst")
    lake.append_segments(spark, src1, {"t": batch(0, 10)}, init=True)
    lake.append_segments(spark, src2, {"t": batch(50, 60)}, init=True)
    rep1 = lake.consume_changes(spark, src1, "t", dst, sink_component="m1")
    assert rep1["applied"]
    # same component name, different source, same sink
    rep2 = lake.consume_changes(spark, src2, "t", dst, sink_component="m2")
    assert rep2["applied"], "src2's watermark collided with src1's"
    # same source into a SECOND sink component
    rep3 = lake.consume_changes(spark, src1, "t", dst, sink_component="m3")
    assert rep3["applied"], "the second sink component saw m1's watermark"
    got = lake.read_segmented_components(spark, dst, ["m1", "m2", "m3"])
    assert sorted(r.k for r in got["m1"].collect()) == list(range(10))
    assert sorted(r.k for r in got["m2"].collect()) == list(range(50, 60))
    assert sorted(r.k for r in got["m3"].collect()) == list(range(10))


def test_consume_changes_legacy_watermark_adoption_is_restricted_and_retired(
    spark, tmp_path
):
    """Pre-r13 sinks stored a bare ``cdf_watermark:<component>`` mark.
    Migration contract (r13 VERDICT #8 + ADVICE medium): the SAME-named
    sink component adopts it (no re-bootstrap duplication), surfaces
    ``adopted_legacy_key`` in its report, and RETIRES the legacy key in
    the same commit — so a later consumer with a different sink
    component can never silently inherit the advanced mark: it
    bootstraps its own full window instead."""

    def batch(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    lake.append_segments(spark, src, {"t": batch(0, 10)}, init=True)
    lake.consume_changes(spark, src, "t", dst)
    # forge the pre-r13 sink shape: qualified key -> bare legacy key
    state = lake._manifest_state(spark, dst)
    pins, meta, base = state[0], dict(state[3]), state[5]
    (qual_key,) = [k for k in meta if k.startswith("cdf_watermark:")]
    meta["cdf_watermark:t"] = meta.pop(qual_key)
    lake.commit_segment_manifest(
        spark, dst, pins, expected_base=base, meta=meta,
        schemas=state[4] or None,
    )
    lake.append_segments(spark, src, {"t": batch(10, 15)})
    rep = lake.consume_changes(spark, src, "t", dst)
    assert rep["adopted_legacy_key"] is True and rep["applied"]
    got = lake.read_segmented_components(spark, dst, ["t"])["t"]
    assert sorted(r.k for r in got.collect()) == list(range(15))  # no dups
    meta_after = lake.segment_meta(spark, dst)
    assert "cdf_watermark:t" not in meta_after, "legacy key must retire"
    assert qual_key in meta_after
    rep2 = lake.consume_changes(spark, src, "t", dst)
    assert "adopted_legacy_key" not in rep2  # one-shot migration flag
    # a DIFFERENT sink component must NOT inherit: full bootstrap
    rep3 = lake.consume_changes(spark, src, "t", dst, sink_component="m2")
    assert rep3["applied"] and "adopted_legacy_key" not in rep3
    m2 = lake.read_segmented_components(spark, dst, ["m2"])["m2"]
    assert sorted(r.k for r in m2.collect()) == list(range(15))


def test_maintain_retires_inert_legacy_watermark_keys(spark, tmp_path):
    """maintain's retire_legacy_watermarks sweep (r14 VERDICT #7 +
    ADVICE #5): bare pre-r13 ``cdf_watermark:<component>`` keys are
    deleted on cadence (meta-only flip, default ON) so a future
    consumer from a DIFFERENT source can never adopt a mark written
    for another source; qualified keys and the rest of the meta
    survive, and a post-sweep same-named consumer bootstraps its own
    full window instead of adopting."""

    def batch(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    lake.append_segments(spark, src, {"t": batch(0, 10)}, init=True)
    lake.consume_changes(spark, src, "t", dst)
    # forge a pre-r13 sink: a bare legacy key NEXT TO the qualified one
    state = lake._manifest_state(spark, dst)
    pins, meta, base = state[0], dict(state[3]), state[5]
    (qual_key,) = [k for k in meta if k.startswith("cdf_watermark:")]
    meta["cdf_watermark:t"] = 99
    meta["other_app_state"] = "keep-me"
    lake.commit_segment_manifest(
        spark, dst, pins, expected_base=base, meta=meta,
        schemas=state[4] or None,
    )
    rep = lake.maintain(spark, dst, {"repair": False, "expire": False},
                        dry_run=True)
    assert rep["retire_legacy_watermarks"] == {
        "would_retire": ["cdf_watermark:t"]
    }
    assert lake.segment_meta(spark, dst)["cdf_watermark:t"] == 99  # dry
    rep = lake.maintain(spark, dst, {"repair": False, "expire": False})
    assert rep["retire_legacy_watermarks"] == {
        "retired": ["cdf_watermark:t"]
    }
    meta_after = lake.segment_meta(spark, dst)
    assert "cdf_watermark:t" not in meta_after
    assert meta_after[qual_key] == state[3][qual_key]  # qualified survives
    assert meta_after["other_app_state"] == "keep-me"
    # adoption semantics unchanged: the swept key can't be inherited —
    # a new same-named consumer from ANOTHER source bootstraps cleanly
    src2 = str(tmp_path / "src2")
    lake.append_segments(spark, src2, {"t": batch(100, 103)}, init=True)
    rep = lake.consume_changes(spark, src2, "t", dst, sink_component="t2")
    assert rep["applied"] and "adopted_legacy_key" not in rep
    got = lake.read_segmented_components(spark, dst, ["t2"])["t2"]
    assert sorted(r.k for r in got.collect()) == [100, 101, 102]
    # opt-out honored, idempotent when nothing is left to retire
    rep = lake.maintain(
        spark, dst,
        {"repair": False, "expire": False, "retire_legacy_watermarks": False},
    )
    assert rep["retire_legacy_watermarks"] == {"skipped": True}
    rep = lake.maintain(spark, dst, {"repair": False, "expire": False})
    assert rep["retire_legacy_watermarks"] == {"retired": []}


def test_typed_feed_rejects_reserved_column_collision(spark, tmp_path):
    """A component with a data column named like one of the three
    reserved change-feed columns raises a CLEAR error from
    include_changes=True instead of emitting an ambiguous frame
    (ADVICE r13); the plain feeds stay readable."""
    import pytest

    root = str(tmp_path / "src")
    df = spark.range(5).select(
        F.col("id").alias("k"), F.lit("x").alias("_change_type")
    )
    lake.append_segments(spark, root, {"t": df}, init=True)
    with pytest.raises(ValueError, match="_change_type"):
        lake.read_segment_changes(spark, root, "t", 0, include_changes=True)
    assert lake.read_segment_changes(spark, root, "t", 0).count() == 5


def test_typed_feed_plan_is_one_scan_per_feed(spark, tmp_path):
    """The retraction-aware feed's PLAN stays two parquet scans (data +
    tombstones) however many manifest versions the window spans — the
    seg= hive-dir tag + seg->version map replaces the per-version
    union (r13 VERDICT #4). At 100 TB an interactive multi-hundred-
    version window must not pay plan size linear in versions."""
    import re

    root = str(tmp_path / "src")

    def batch(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    lake.append_segments(spark, root, {"t": batch(0, 10)}, init=True)
    for i in range(4):  # 4 more data versions
        lake.append_segments(
            spark, root, {"t": batch(10 + i * 5, 15 + i * 5)}
        )
    lake.delete_rows(spark, root, "t", "k", [1, 2])
    lake.delete_rows(spark, root, "t", "k", [11])
    feed = lake.read_segment_changes(spark, root, "t", 0, include_changes=True)
    plan = feed._jdf.queryExecution().executedPlan().toString()
    n_scans = len(re.findall(r"Scan parquet", plan))
    assert n_scans == 2, f"expected 2 scans (7-version window), got {n_scans}"
    # and the flattened feed is value-identical to the manifest walk
    rows_ = feed.collect()
    assert sum(r._change_type == "insert" for r in rows_) == 30
    assert sum(r._change_type == "delete" for r in rows_) == 3
    versions = {r._commit_version for r in rows_}
    assert versions == set(range(1, 8))


def test_rename_and_drop_leave_bloom_sidecars_for_reader_grace(
    spark, tmp_path
):
    """rename/drop keep the superseded sidecar files on disk (a reader
    that snapshotted the pre-rename manifest still probes the OLD
    advertisement mid-read); expire_segments age-gates sidecars no
    retained manifest advertises, so they sweep on the normal cadence
    instead of breaking a concurrent probe."""
    import os

    root = str(tmp_path / "ds")
    df = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    lake.append_segments(
        spark, root, {"t": df}, init=True, bloom_cols={"t": ["k", "v"]}
    )
    seg = lake.segment_pins(spark, root)["t"][0]
    tdir = str(tmp_path / "ds" / "t")
    old_k = os.path.join(tdir, f"_BLOOM.s{seg}.k.json")
    assert os.path.exists(old_k)
    lake.rename_columns(spark, root, "t", {"k": "key"})
    new_k = os.path.join(tdir, f"_BLOOM.s{seg}.key.json")
    assert os.path.exists(new_k) and os.path.exists(old_k)
    lake.drop_columns(spark, root, "t", ["v"])
    old_v = os.path.join(tdir, f"_BLOOM.s{seg}.v.json")
    assert os.path.exists(old_v)
    # the sweep drops exactly the unadvertised files once aged…
    lake.expire_segments(
        spark, root, keep_manifests=1, orphan_grace_sec=0.0,
        reader_grace_sec=0.0,
    )
    assert not os.path.exists(old_k) and not os.path.exists(old_v)
    assert os.path.exists(new_k)
    # …and the advertised one still serves lookups
    kept, pinned = lake.bloom_pruned_pins(spark, root, "t", "key", [7])
    assert kept == [seg]


def test_cdf_bootstrap_exact_after_history_expired(spark, tmp_path):
    """from_version=0 once retention expired the pre-compaction
    manifests: the earliest RETAINED version's full pin set (fold
    outputs included — they are the only remaining copy of the old
    rows) seeds the bootstrap, so a fresh mirror is complete; a window
    that expired entirely raises instead of under-reporting."""

    def batch(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    root = str(tmp_path / "ds")
    lake.append_segments(spark, root, {"t": batch(0, 30)}, init=True)  # v1
    lake.append_segments(spark, root, {"t": batch(30, 60)})  # v2
    lake.compact_segments(spark, root)  # v3: fold marked _cdc_rewrites
    lake.append_segments(spark, root, {"t": batch(60, 70)})  # v4
    lake.expire_segments(
        spark, root, keep_manifests=2, orphan_grace_sec=0.0,
        reader_grace_sec=0.0,
    )
    assert lake.segment_manifest_versions(spark, root) == [3, 4]
    boot = lake.read_segment_changes(spark, root, "t", 0)
    assert sorted(r.k for r in boot.collect()) == list(range(70))
    # incremental reads from a retained version are unchanged
    inc = lake.read_segment_changes(spark, root, "t", 3)
    assert sorted(r.k for r in inc.collect()) == list(range(60, 70))
    # a fully-expired explicit window fails loud
    with pytest.raises(FileNotFoundError, match="expired"):
        lake.read_segment_changes(spark, root, "t", 0, to_version=2)
    # and so does an expired non-zero from_version (existing contract)
    with pytest.raises(FileNotFoundError):
        lake.read_segment_changes(spark, root, "t", 1)


def test_read_segment_changes_typed_feed(spark, tmp_path):
    """include_changes=True — the retraction-aware Delta-CDF shape:
    inserts from the data feed, deletes from the paired tombstone feed
    (id populated, other columns NULL), each stamped with the manifest
    version that committed it; an upsert emits its tombstone AND its
    new revision at the SAME version (kill-strictly-below: the new
    rows survive their own tombstone)."""
    root = str(tmp_path / "ds")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )

    lake.append_segments(spark, root, {"t": batch(0, 10)}, init=True)  # v1
    lake.append_segments(spark, root, {"t": batch(10, 20)})  # v2
    lake.delete_rows(spark, root, "t", "k", [1, 12])  # v3
    lake.upsert_rows(  # v4: delete@4 + insert@4 for k=2
        spark, root, "t", "k",
        spark.range(2, 3).select(F.col("id").alias("k"), F.lit(222.0).alias("v")),
    )
    feed = lake.read_segment_changes(spark, root, "t", 1, include_changes=True)
    rows_ = feed.collect()
    got = {
        (r["_change_type"], r["k"], r["_commit_version"]): r["v"]
        for r in rows_
    }
    assert {k for k in got if k[0] == "insert"} == (
        {("insert", j, 2) for j in range(10, 20)} | {("insert", 2, 4)}
    )
    assert {k for k in got if k[0] == "delete"} == {
        ("delete", 1, 3), ("delete", 12, 3), ("delete", 2, 4),
    }
    assert got[("insert", 2, 4)] == 222.0
    assert got[("delete", 1, 3)] is None  # non-id columns are NULL
    # _change_seq is the liveness watermark: plain appends carry 0, an
    # upsert's rows carry their revision sequence, a delete carries its
    # dead_below — so the kill-strictly-below rule reconstructs the
    # source's merged view EXACTLY from the feed alone
    seqs = {
        (r["_change_type"], r["k"], r["_commit_version"]): r["_change_seq"]
        for r in rows_
    }
    assert seqs[("insert", 10, 2)] == 0 and seqs[("insert", 2, 4)] == 4
    assert seqs[("delete", 1, 3)] == 3 and seqs[("delete", 2, 4)] == 4
    kill = {}
    for r in rows_:
        if r["_change_type"] == "delete":
            kill[r["k"]] = max(kill.get(r["k"], 0), r["_change_seq"])
    replayed = {
        r["k"]: r["v"]
        for r in rows_
        if r["_change_type"] == "insert"
        and r["_change_seq"] >= kill.get(r["k"], 0)
    }
    merged = lake.read_segmented_merged(spark, root, "t", "k")
    live = {r.k: r.v for r in merged.collect()}
    assert 1 not in live and 12 not in live and live[2] == 222.0
    window_keys = {r["k"] for r in rows_ if r["_change_type"] == "insert"}
    assert replayed == {k: v for k, v in live.items() if k in window_keys}


def test_typed_feed_serves_key_column_named_seg(spark, tmp_path):
    """A component whose KEY column is literally named ``seg`` shadows
    the feed scan's hive tag dir, so both feeds take the per-version
    union fallback — and the delete feed must still SERVE that key
    column (r14 ADVICE #1: excluding the literal name 'seg' nulled the
    key, making deletes unmatchable downstream)."""
    root = str(tmp_path / "ds")
    batch = spark.range(0, 6).select(
        F.col("id").alias("seg"), (F.col("id") * 2.0).alias("v")
    )
    lake.append_segments(spark, root, {"t": batch}, init=True)  # v1
    lake.delete_rows(spark, root, "t", "seg", [2, 4])  # v2
    feed = lake.read_segment_changes(spark, root, "t", 0, include_changes=True)
    dels = {
        r["seg"]: r["_commit_version"]
        for r in feed.filter(F.col("_change_type") == "delete").collect()
    }
    assert dels == {2: 2, 4: 2}  # key values populated, not NULL
    ins = {r["seg"] for r in feed.filter(F.col("_change_type") == "insert").collect()}
    assert ins == set(range(6))


def test_consume_changes_merge_mirrors_upsert_delete_resurrect(
    spark, tmp_path
):
    """merge=True: the mirror consumes data AND tombstone feeds in one
    commit per window, carrying the source's revision axis verbatim —
    its merged view equals the source's through upserts, deletes, a
    mid-window compaction, and a resurrection; replay stays a no-op."""
    from collections import Counter

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )

    lake.append_segments(spark, src, {"t": batch(0, 40)}, init=True)
    rep = lake.consume_changes(spark, src, "t", dst, merge=True)
    assert rep["applied"] and rep["raced"] == 0 and rep["attempts"] == 1
    lake.upsert_rows(
        spark, src, "t", "k",
        spark.range(1, 3).select(F.col("id").alias("k"), F.lit(-1.0).alias("v")),
    )
    lake.compact_segments(spark, src)  # maintenance inside the window
    lake.delete_rows(spark, src, "t", "k", [3, 4])
    assert lake.consume_changes(spark, src, "t", dst, merge=True)["applied"]
    lake.upsert_rows(  # resurrect a deleted id
        spark, src, "t", "k",
        spark.range(3, 4).select(F.col("id").alias("k"), F.lit(33.0).alias("v")),
    )
    assert lake.consume_changes(spark, src, "t", dst, merge=True)["applied"]
    replay = lake.consume_changes(spark, src, "t", dst, merge=True)
    assert not replay["applied"]
    want = Counter(
        (r.k, r.v)
        for r in lake.read_segmented_merged(spark, src, "t", "k").collect()
    )
    got = Counter(
        (r.k, r.v)
        for r in lake.read_segmented_merged(spark, dst, "t", "k").collect()
    )
    assert got == want
    assert got[(3, 33.0)] == 1 and (4, 4.0) not in got and got[(1, -1.0)] == 1


def test_consume_changes_two_consumer_race_surfaces_raced(
    spark, tmp_path, monkeypatch
):
    """Two consumers racing one sink: the loser's commit conflicts, its
    retry sees the advanced watermark and no-ops — exactly-once — and
    the return dict reports the churn (raced/attempts) so a scheduler
    can log rival-consumer pressure without parsing exceptions."""

    def batch(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    lake.append_segments(spark, src, {"t": batch(0, 10)}, init=True)
    lake.consume_changes(spark, src, "t", dst)  # bootstrap the sink
    lake.append_segments(spark, src, {"t": batch(10, 20)})
    real_commit = lake.commit_segment_manifest
    state = {"armed": True}

    def rival_consumes_first(*args, **kwargs):
        if state["armed"] and args[1] == dst:
            state["armed"] = False
            lake.consume_changes(spark, src, "t", dst)  # the rival wins
        return real_commit(*args, **kwargs)

    monkeypatch.setattr(lake, "commit_segment_manifest", rival_consumes_first)
    rep = lake.consume_changes(spark, src, "t", dst)
    monkeypatch.setattr(lake, "commit_segment_manifest", real_commit)
    assert rep["raced"] == 1 and rep["attempts"] == 2
    assert not rep["applied"]  # the rival consumed the window
    mirror = lake.read_segmented_components(spark, dst, ["t"])["t"]
    assert sorted(r.k for r in mirror.collect()) == list(range(20))


def test_metadata_plane_verbs_schedule_zero_spark_jobs(spark, tmp_path):
    """Mechanical pin on the metadata plane (r12 VERDICT #5): the
    change-feed version walk, the empty-window consumer cadence
    (meta-only watermark advance), and rename/drop evolution are
    driver-side filesystem work — ZERO Spark jobs. At 100 TB the
    metadata plane must never queue behind the data plane."""
    from tests.conftest import count_jobs

    def batch(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    lake.append_segments(spark, src, {"t": batch(0, 20)}, init=True)
    lake.append_segments(spark, src, {"t": batch(20, 40)})
    lake.consume_changes(spark, src, "t", dst)  # mirror in sync
    # the version walk (window planning) is driver-side only
    assert count_jobs(
        spark,
        lambda: lake.plan_segment_changes(spark, src, "t", 1),
    ) == 0
    # maintenance-only window: compaction rewrites, no appends — the
    # cadence advances the watermark with a meta-only commit, NO job
    lake.compact_segments(spark, src)
    rep = {}
    jobs = count_jobs(
        spark,
        lambda: rep.update(lake.consume_changes(spark, src, "t", dst)),
    )
    assert rep["to"] > rep["from"] and not rep["applied"]
    assert jobs == 0, f"meta-only cadence scheduled {jobs} Spark jobs"
    # an already-caught-up cadence is also job-free
    assert count_jobs(
        spark, lambda: lake.consume_changes(spark, src, "t", dst)
    ) == 0
    # rename/drop evolution is metadata-only
    assert count_jobs(
        spark, lambda: lake.rename_columns(spark, src, "t", {"k": "key"})
    ) == 0
    lake.append_segments(
        spark, src,
        {"t": spark.range(3).select(
            F.col("id").alias("key"), F.lit("x").alias("tag")
        )},
    )
    assert count_jobs(
        spark, lambda: lake.drop_columns(spark, src, "t", ["tag"])
    ) == 0


def test_counts_plane_lifecycle_and_zero_job_describe(spark, tmp_path):
    """Per-segment row counts in the manifest (r14 VERDICT #2):
    collected driver-side from parquet footers at commit time,
    carried through every rewrite, backfilled on the first commit
    after a pre-counts manifest — and the whole DESCRIBE/COUNT(*)
    surface schedules ZERO Spark jobs."""
    from tests.conftest import count_jobs

    root = str(tmp_path / "ds")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )

    lake.append_segments(spark, root, {"t": batch(0, 100)}, init=True)
    lake.append_segments(spark, root, {"t": batch(100, 150)})
    counts = lake.segment_counts(spark, root)
    pins = lake.segment_pins(spark, root)
    assert sorted(counts["t"].values()) == [50, 100]
    assert set(counts["t"]) == set(pins["t"])
    # manifest-served COUNT(*) == the physical pinned read, ZERO jobs
    n = {}
    jobs = count_jobs(
        spark, lambda: n.update(t=lake.count_segmented(spark, root, "t"))
    )
    assert n["t"] == 150 and jobs == 0
    d = {}
    jobs = count_jobs(
        spark, lambda: d.update(lake.describe_segmented(spark, root))
    )
    assert jobs == 0
    assert d["components"]["t"]["rows"] == 150
    assert d["components"]["t"]["segments"] == 2
    assert d["components"]["t"]["columns"] == ["k", "v"]
    # counts survive a rewrite (compaction) and stay footer-exact
    lake.compact_segments(spark, root, components=["t"], min_segments=2)
    assert lake.count_segmented(spark, root, "t") == 150
    assert lake.validate_segmented(spark, root, deep=True)["ok"]
    # pre-counts manifest (a bare pin-map commit drops the plane):
    # count_segmented still answers from footers, and the NEXT commit
    # backfills the plane for every pinned segment — self-healing
    pins, v = lake.segment_pins_versioned(spark, root)
    lake.commit_segment_manifest(spark, root, pins, expected_base=v)
    assert lake.segment_counts(spark, root) == {}
    jobs = count_jobs(
        spark, lambda: n.update(t=lake.count_segmented(spark, root, "t"))
    )
    assert n["t"] == 150 and jobs == 0  # footer fallback, still no jobs
    lake.append_segments(spark, root, {"t": batch(150, 160)})
    counts = lake.segment_counts(spark, root)
    assert sum(counts["t"].values()) == 160
    assert set(counts["t"]) == set(lake.segment_pins(spark, root)["t"])
    # fsck: a tampered count is caught by deep mode
    pins, v = lake.segment_pins_versioned(spark, root)
    bad = {c: dict(m) for c, m in counts.items()}
    seg0 = next(iter(bad["t"]))
    bad["t"][seg0] += 7
    lake.commit_segment_manifest(
        spark, root, pins, expected_base=v, counts=bad
    )
    rep = lake.validate_segmented(spark, root, deep=True)
    assert not rep["ok"] and any("footer count" in e for e in rep["errors"])
    # repair(verify_counts=True) footer-corrects the tampered entry
    rep = lake.repair_segmented(spark, root, verify_counts=True)
    assert rep["actions"]["fixed_counts"] == {"t": [seg0]}
    assert lake.validate_segmented(spark, root, deep=True)["ok"]


def test_changes_feed_survives_rename_normalization_in_window(
    spark, tmp_path
):
    """A rename AND its normalizing full fold can both land inside one
    consumer window: the head schema no longer carries prior_names, but
    the feed still scans pre-rename segments from intermediate
    manifests — the walk must re-attach every name each field carried
    across the window (union by field_id), or those reads would
    silently null-backfill the renamed column into the mirror."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    lake.append_segments(
        spark, src,
        {"t": spark.createDataFrame([(1, 10)], "id int, amount int")},
        init=True,
    )
    lake.consume_changes(spark, src, "t", dst)  # watermark = v1
    lake.append_segments(  # v2: pre-rename vintage inside the window
        spark, src,
        {"t": spark.createDataFrame([(2, 20), (3, 30)], "id int, amount int")},
    )
    lake.rename_columns(spark, src, "t", {"amount": "total"})  # v3
    rep = lake.maintain(spark, src, {"normalize_renames": True})  # v4: strip
    assert rep["normalize_renames"] == {"normalized": ["t"]}
    # the direct typed feed serves the vintage's values under the
    # current name…
    feed = lake.read_segment_changes(spark, src, "t", 1, include_changes=True)
    ins = {r["id"]: r["total"] for r in feed.collect() if r["_change_type"] == "insert"}
    assert ins == {2: 20, 3: 30}
    # …and so does the consumer's window
    assert lake.consume_changes(spark, src, "t", dst)["applied"]
    mirror = lake.read_segmented_components(spark, dst, ["t"])["t"]
    got = {r.id: r.total for r in mirror.collect()}
    assert got[2] == 20 and got[3] == 30, f"null-backfilled mirror: {got}"


def test_upsert_and_mirror_collect_pruning_coverage(spark, tmp_path):
    """zone_cols/bloom_cols ride the upsert commit and the consumer's
    sink commits: a dimension served by point lookups gets its id
    bloomed per revision, and a mirror builds its OWN zonemaps —
    pruning works downstream without a repair pass."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )

    lake.append_segments(
        spark, src, {"t": batch(0, 50)}, init=True,
        zone_cols={"t": ["k"]}, bloom_cols={"t": ["k"]},
    )
    lake.upsert_rows(
        spark, src, "t", "k", batch(900, 905),
        zone_cols=["k"], bloom_cols=["k"],
    )
    zones = lake.segment_zones(spark, src)["t"]
    pins = lake.segment_pins(spark, src)["t"]
    assert all(s in zones and "k" in zones[s] for s in pins)
    kept, pinned = lake.bloom_pruned_pins(spark, src, "t", "k", [902])
    assert len(kept) == 1 and len(pinned) == 2
    # mirror coverage: each consumed window's sink segment gets stats
    lake.consume_changes(
        spark, src, "t", dst, merge=True,
        sink_zone_cols=["k"], sink_bloom_cols=["k"],
    )
    lake.append_segments(spark, src, {"t": batch(50, 60)})
    lake.consume_changes(
        spark, src, "t", dst, merge=True,
        sink_zone_cols=["k"], sink_bloom_cols=["k"],
    )
    dzones = lake.segment_zones(spark, dst)["t"]
    dpins = lake.segment_pins(spark, dst)["t"]
    assert all(s in dzones and "k" in dzones[s] for s in dpins)
    # window 1's segment spans [0, 904] (bootstrap + upserted ids);
    # window 2's spans [50, 59] — a probe at 900 keeps only window 1
    dkept, dpinned = lake.zone_pruned_pins(spark, dst, "t", "k", 900, 904)
    assert len(dkept) == 1 and len(dpinned) == 2


def test_restore_segmented_rolls_back_head_keeping_history_linear(
    spark, tmp_path
):
    """Delta-style RESTORE: a retained historical version re-commits
    as the NEW head (one more manifest flip — the bad commits stay
    time-travelable), the data plane (pins, zones, counts, pressure
    counters, schemas) rolls back verbatim, the application plane
    (consumer watermarks) carries forward, components born after the
    restored version drop, and the whole verb schedules ZERO Spark
    jobs. A version expired past restorability fails CLOSED before
    the flip."""
    import shutil

    from tests.conftest import count_jobs

    root = str(tmp_path / "ds")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )

    lake.append_segments(
        spark, root, {"t": batch(0, 10)}, init=True,
        zone_cols={"t": ["k"]},
    )
    v1 = lake.segment_pins_versioned(spark, root)[1]
    good = {(r.k, r.v) for r in lake.read_segmented_merged(
        spark, root, "t", "k").drop("_useq").collect()}
    # the "bad" tail: a delete, an upsert, and a new component
    lake.delete_rows(spark, root, "t", "k", [1, 2, 3])
    lake.upsert_rows(spark, root, "t", "k", batch(5, 7))
    lake.append_segments(spark, root, {"born_later": batch(0, 3)})
    assert lake.segment_meta(spark, root)[
        lake.component_tombstone_rows_key("t")
    ] == 5
    head = lake.segment_pins_versioned(spark, root)[1]
    # dry run: plans, validates, commits nothing
    plan = lake.restore_segmented(spark, root, v1, dry_run=True)
    assert not plan["applied"] and plan["components_dropped"] == [
        "born_later", lake.tombstone_component("t")
    ]
    assert lake.segment_pins_versioned(spark, root)[1] == head
    # the restore: zero jobs, head+1, data plane back to v1
    rep = {}
    jobs = count_jobs(
        spark, lambda: rep.update(lake.restore_segmented(spark, root, v1))
    )
    assert jobs == 0, f"restore scheduled {jobs} Spark jobs"
    assert rep["version"] == head + 1 and rep["restored_from"] == v1
    assert {(r.k, r.v) for r in lake.read_segmented_merged(
        spark, root, "t", "k").drop("_useq").collect()} == good
    assert lake.segment_pins(spark, root) == lake.segment_pins_at(
        spark, root, v1
    )
    # pressure counter rolled back with the data plane
    assert lake.segment_meta(spark, root).get(
        lake.component_tombstone_rows_key("t"), 0
    ) == 0
    # zone plane restored (pruning still works)
    kept, pinned = lake.zone_pruned_pins(spark, root, "t", "k", 100, 200)
    assert kept == [] and len(pinned) == 1
    # counts plane restored: zero-job COUNT(*) still serves
    assert lake.count_segmented(spark, root, "t") == 10
    # history stays linear: the bad head remains time-travelable
    assert set(lake.segment_pins_at(spark, root, head)) == {
        "t", lake.tombstone_component("t"), "born_later"
    }
    # ahead-of-head raises
    with pytest.raises(ValueError, match="ahead of the committed head"):
        lake.restore_segmented(spark, root, head + 50)
    # application plane carries forward: an app meta key written AFTER
    # v1 (a streaming committer's batch id rides this way) survives a
    # second restore, while the data-plane pressure counter rolls back
    lake.merge_rows(
        spark, root, "t", "k",
        spark.range(5, 8).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        ),
        extra_meta={"app_mark": "keepme"},
    )
    assert lake.segment_meta(spark, root)[
        lake.component_tombstone_rows_key("t")
    ] == 3
    lake.restore_segmented(spark, root, v1)
    after = lake.segment_meta(spark, root)
    assert after.get("app_mark") == "keepme"
    assert after.get(lake.component_tombstone_rows_key("t"), 0) == 0
    # expired past restorability: fail closed, nothing committed
    seg = lake.segment_pins_at(spark, root, head)["born_later"][0]
    shutil.rmtree(f"{root}/born_later/seg={seg}")
    vb = lake.segment_pins_versioned(spark, root)[1]
    with pytest.raises(FileNotFoundError, match="expired past"):
        lake.restore_segmented(spark, root, head)
    assert lake.segment_pins_versioned(spark, root)[1] == vb
