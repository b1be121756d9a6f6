"""Registered-query-level contracts of the continuous-aggregate
family: the month-window query really chunk-excludes segments (the
claim its docstring makes), and the window result is consistent with
the full view (the oracle pins both against DuckDB separately)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.plans import queries_rollup as qr
from ed_housing_data_pipeline_spark.sources import lake
from tests.conftest import rows

SF = "/root/testdata/sf0.001"


def test_range_query_chunk_excludes_segments(spark):
    out = qr.q_orders_rollup_month_range(spark, SF)
    months = rows(out.select(F.min("month"), F.max("month")))
    assert months[0][0] >= qr.RANGE_LO and months[0][1] <= qr.RANGE_HI
    # the built view's manifest must prune the bootstrap (≤1996)
    # segment for the 1998 window — driver-side, from zonemap stats
    tmp = qr._ROLLUP_DIR[(SF,)]
    kept, pinned = lake.zone_pruned_pins(
        spark, tmp.name, "partials", "month", lo=qr.RANGE_LO, hi=qr.RANGE_HI
    )
    assert len(pinned) == 3
    assert len(kept) < len(pinned)


def test_window_is_a_restriction_of_the_full_view(spark):
    full = qr.q_orders_incremental_rollup(spark, SF).filter(
        F.col("month").between(qr.RANGE_LO, qr.RANGE_HI)
    )
    window = qr.q_orders_rollup_month_range(spark, SF)
    assert rows(window) == rows(full)
