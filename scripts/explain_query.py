#!/usr/bin/env python
"""Dump the formatted physical plan of registered queries.

Usage: python scripts/explain_query.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    from ed_housing_data_pipeline_spark.plans.registry import query_map
    from ed_housing_data_pipeline_spark.session import get_spark

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = query_map()
    names = sys.argv[1:] or sorted(qmap)
    unknown = [n for n in names if n not in qmap]
    if unknown:
        print(f"unknown queries: {unknown}\navailable: {sorted(qmap)}")
        return 1
    for name in names:
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        qmap[name](spark, SF_DIR).explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
