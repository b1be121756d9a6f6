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
        SparkSession.builder.master("local[4]")
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
