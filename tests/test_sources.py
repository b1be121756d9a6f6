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


def test_read_excel_gated(spark, tmp_path):
    try:
        import openpyxl  # noqa: F401

        have_openpyxl = True
    except ImportError:
        have_openpyxl = False
    if not have_openpyxl:
        with pytest.raises(NotImplementedError, match="openpyxl"):
            readers.read_excel(spark, str(tmp_path / "missing.xlsx"))
    else:  # pragma: no cover - exercised only where openpyxl exists
        import pandas as pd

        xp = tmp_path / "t.xlsx"
        pd.DataFrame({"a": [1], "b": ["x"]}).to_excel(xp, index=False)
        df = readers.read_excel(spark, str(xp))
        assert rows(df) == [("1", "x")]


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
