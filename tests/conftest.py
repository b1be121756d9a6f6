"""Shared fixtures.

The session is deliberately VANILLA (like the driver harness's) — no
engine confs — so tests prove every operator works without relying on
``session.get_spark()`` defaults. ANSI mode therefore stays at the
Spark 4 default (on), which is exactly the trap the try_cast-based
operators must survive.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        # local[8]: the suite's wall clock is dominated by a handful of
        # sf0.01-sized loops whose stages parallelize; 8 threads on the
        # 32-CPU CI host cuts them without changing any test's
        # partition-count assumptions (shuffle.partitions stays 4)
        SparkSession.builder.master("local[8]")
        .appName("engine-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _sort_key_elem(v):
    """NULLs first, then values grouped by type (columns are homogeneous,
    so cross-type comparison never actually happens)."""
    import datetime
    import decimal

    if v is None:
        return (0, "", 0.0)
    if isinstance(v, bool):
        return (1, "bool", float(v))
    if isinstance(v, (int, float, decimal.Decimal)):
        return (1, "num", float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return (1, "ts", v.isoformat())
    return (1, "str", str(v))


def rows(df, *cols):
    """Collected rows as sorted tuples for order-insensitive asserts."""
    if cols:
        df = df.select(*cols)
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple(_sort_key_elem(v) for v in t),
    )


def write_xlsx(path, data_rows, sheet_name="Sheet1"):
    """Fixture writer: a minimal real .xlsx (zip of XML parts) without
    openpyxl. Strings go through sharedStrings (exercising the reader's
    shared-string path), ints/floats as plain numeric cells, None as a
    sparse gap."""
    import zipfile
    from xml.sax.saxutils import escape

    shared: dict[str, int] = {}

    def cell_xml(r, c, v):
        ref = f"{chr(ord('A') + c)}{r + 1}"  # fixtures stay < 26 cols
        if v is None:
            return ""
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            num = repr(int(v)) if isinstance(v, int) else repr(v)
            return f'<c r="{ref}"><v>{num}</v></c>'
        s = str(v)
        idx = shared.setdefault(s, len(shared))
        return f'<c r="{ref}" t="s"><v>{idx}</v></c>'

    body = "".join(
        f'<row r="{r + 1}">{"".join(cell_xml(r, c, v) for c, v in enumerate(row))}</row>'
        for r, row in enumerate(data_rows)
    )
    sst = "".join(
        f"<si><t>{escape(s)}</t></si>"
        for s, _ in sorted(shared.items(), key=lambda kv: kv[1])
    )
    ns_main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    ns_rel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    ns_pkgrel = "http://schemas.openxmlformats.org/package/2006/relationships"
    parts = {
        "[Content_Types].xml": (
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
            'package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
            'package.relationships+xml"/><Default Extension="xml" ContentType='
            '"application/xml"/></Types>'
        ),
        "_rels/.rels": (
            f'<Relationships xmlns="{ns_pkgrel}"><Relationship Id="rId1" Type='
            f'"{ns_rel}/officeDocument" Target="xl/workbook.xml"/></Relationships>'
        ),
        "xl/workbook.xml": (
            f'<workbook xmlns="{ns_main}" xmlns:r="{ns_rel}"><sheets>'
            f'<sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/>'
            "</sheets></workbook>"
        ),
        "xl/_rels/workbook.xml.rels": (
            f'<Relationships xmlns="{ns_pkgrel}">'
            f'<Relationship Id="rId1" Type="{ns_rel}/worksheet" '
            'Target="worksheets/sheet1.xml"/>'
            f'<Relationship Id="rId2" Type="{ns_rel}/sharedStrings" '
            'Target="sharedStrings.xml"/></Relationships>'
        ),
        "xl/sharedStrings.xml": f'<sst xmlns="{ns_main}">{sst}</sst>',
        "xl/worksheets/sheet1.xml": (
            f'<worksheet xmlns="{ns_main}"><sheetData>{body}</sheetData></worksheet>'
        ),
    }
    with zipfile.ZipFile(path, "w") as z:
        for name, content in parts.items():
            z.writestr(name, content)


def count_jobs(spark, fn):
    """Shared job-group probe (one implementation: session.count_spark_jobs)."""
    from ed_housing_data_pipeline_spark.session import count_spark_jobs

    return count_spark_jobs(spark, fn)
