#!/usr/bin/env python
"""Dump the formatted physical plan of registered queries.

Usage: python scripts/explain_query.py [query ...]   (default: all)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    from ed_housing_data_pipeline_spark.plans.registry import query_map
    from ed_housing_data_pipeline_spark.session import get_spark

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = query_map()
    names = sys.argv[1:] or sorted(qmap)
    for name in names:
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        qmap[name](spark, SF_DIR).explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
