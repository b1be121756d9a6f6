"""Typed file readers.

Covers the reference's ingest surface (SURVEY.md §2.1):

- S1  plain CSV with header            (reference bronze_to_silver.py:50)
- S2  CSV with N metadata preamble rows (reference bronze_to_silver.py:58,
      ``pd.read_csv(header=4)``) — OSS Spark has no skip-N-rows option,
      so this is a small custom scan helper.
- S3  Excel (xlsx)                      (reference bronze_to_silver.py:52-55)
      — no built-in Spark reader; openpyxl-pandas when available, else
      the vendored stdlib zip+XML parser (sources/xlsx.py).
- S4  Parquet                           (reference silver_to_gold.py:101-103)
- JSON-lines reader for completeness (events-style feeds).

Design stance: every reader returns **all-string columns unless a
schema is given** — the reference reads CSVs with pandas inference that
collapses to object/string because of embedded label rows, and then
repair-casts explicitly (SURVEY.md §1.2). We make that contract
explicit: read strings, cast deliberately in the clean operators.
"""

from __future__ import annotations

import csv as _csv
import io

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    sep: str = ",",
) -> DataFrame:
    """CSV scan, header row 0, all columns string unless ``schema`` given.

    Deliberately no ``inferSchema`` — inference at scale costs an extra
    full pass over 100 TB and can silently produce types that differ
    run-to-run; explicit casts in the clean layer instead.
    """
    reader = spark.read.option("header", True).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_csv_skip_rows(
    spark: SparkSession,
    path: str,
    skip_rows: int,
    sep: str = ",",
) -> DataFrame:
    """CSV whose real header sits below ``skip_rows`` free-text preamble
    lines (reference: ``pd.read_csv(header=4)`` at bronze_to_silver.py:58).

    Implementation: read as text, assign stable line numbers, drop the
    preamble, take the first remaining line as the header, parse the
    rest with ``from_csv`` (JVM-side, codegen'd — no Python per row).

    Scale note: files with human-written preambles are configuration-
    sized inputs, not the 100 TB fact stream; we coalesce to one
    partition so line numbers are contiguous file order. Large
    machine-written feeds should use :func:`read_csv` (splittable).
    """
    lines = (
        spark.read.text(path)
        .coalesce(1)
        .withColumn("_line", F.monotonically_increasing_id())
        .filter(F.col("_line") >= skip_rows)
    )
    header_row = lines.orderBy("_line").select("value").first()
    if header_row is None:
        raise ValueError(
            f"read_csv_skip_rows: {path!r} has no header line after "
            f"skipping {skip_rows} rows"
        )
    columns = next(_csv.reader(io.StringIO(header_row[0]), delimiter=sep))
    # Backtick-quote: human-written preamble CSVs routinely carry
    # spaces/commas in headers, which an unquoted DDL string can't parse.
    ddl = ", ".join(f"`{c.replace('`', '')}` STRING" for c in columns)
    body = lines.filter(F.col("_line") > skip_rows)
    parsed = body.select(F.from_csv(F.col("value"), ddl, {"sep": sep}).alias("r"))
    return parsed.select([F.col(f"r.`{c}`").alias(c) for c in columns])


def read_excel(spark: SparkSession, path: str, sheet: int | str = 0) -> DataFrame:
    """Excel ingestion (reference bronze_to_silver.py:52-55 uses
    ``pd.read_excel(engine="openpyxl")``).

    Spark has no built-in xlsx source; xlsx inputs are small,
    hand-maintained workbooks (the 100 TB path is parquet/CSV), so
    this is a driver-side read: openpyxl-backed pandas when the
    library exists, else the vendored stdlib parser
    (:mod:`..sources.xlsx` — zip + XML; strings/numbers/bools, dates
    stay raw serial text). Either way the result is all-string
    columns, cast deliberately downstream.
    """
    try:
        import pandas as pd  # noqa: PLC0415

        pdf = pd.read_excel(path, sheet_name=sheet, engine="openpyxl", dtype=str)
        pdf = pdf.where(pdf.notna(), None)
        header = [str(c) for c in pdf.columns]
        data = [list(r) for r in pdf.itertuples(index=False, name=None)]
    except ImportError:
        from ed_housing_data_pipeline_spark.sources.xlsx import (  # noqa: PLC0415
            read_xlsx_table,
        )

        header, data = read_xlsx_table(path, sheet)
    schema = T.StructType([T.StructField(c, T.StringType()) for c in header])
    return spark.createDataFrame(data, schema=schema)


def read_json_lines(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
