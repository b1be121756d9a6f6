#!/usr/bin/env python
"""Measure parquet file counts of the session-built index artifacts.

The r16 size-derived segment sizing claim (lake.sized_for_segment_write)
is about FILE granularity, which `.explain("formatted")` does not print
(InMemoryFileIndex lists segment dirs, not files) — this script makes the
before/after evidence reproducible: it builds the incremental LSH index,
the incremental ANN index, the orders rollup, and the text index at
$SPARK_GRAFT_SF_DIR (default sf0.1) and prints one JSON line of total
parquet-file counts per artifact. Run with --unsized to reproduce the
pre-r16 write behavior (sizing disabled) for the "before" column.

Usage: python scripts/measure_segment_files.py [--unsized]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def count_files(root: str) -> int:
    return sum(
        1
        for p in glob.glob(root + "/**", recursive=True)
        if os.path.isfile(p) and p.endswith(".parquet")
    )


def main() -> int:
    from ed_housing_data_pipeline_spark.session import get_spark
    from ed_housing_data_pipeline_spark.sources import lake

    unsized = "--unsized" in sys.argv
    if unsized:
        lake.sized_for_segment_write = lambda df, est_bytes=None: df

    spark = get_spark("segment-file-counts")
    spark.sparkContext.setLogLevel("ERROR")

    from ed_housing_data_pipeline_spark.plans import _caches
    from ed_housing_data_pipeline_spark.plans import queries_ann as qa
    from ed_housing_data_pipeline_spark.plans import queries_llm as qll
    from ed_housing_data_pipeline_spark.plans import queries_rollup as qr
    from ed_housing_data_pipeline_spark.plans import queries_search as qs

    out: dict[str, int] = {}
    qll.ensure_incr_index_built(spark, SF_DIR)
    out["incr_lsh_index"] = count_files(
        _caches._INCR_INDEX[(SF_DIR, qll.SHINGLE_K, qll.N_HASHES)].name
    )
    qa.ensure_ann_index_built(spark, SF_DIR)
    out["ann_index"] = count_files(_caches._ANN_INDEX[(SF_DIR,)].name)
    qr._ensure_rollup(spark, SF_DIR)
    out["orders_rollup"] = count_files(qr._ROLLUP_DIR[(SF_DIR,)].name)
    out["text_index"] = count_files(qs._ensure_text_index(spark, SF_DIR))
    qll.release_shared_caches()
    print(json.dumps({"sf_dir": SF_DIR, "sized": not unsized, "files": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
