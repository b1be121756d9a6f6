#!/usr/bin/env python
"""Local emulation of the driver's DuckDB-oracle differential check.

Runs every registered query at sf0.01 in BOTH engines and compares
row count, column names, and an order-insensitive value comparison
(exact for ints/strings, exact-after-round for floats — the queries
themselves round, so any residual mismatch is a real bug).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        else:
            out[c] = s.astype("string")
    res = pd.DataFrame(out)
    return res.sort_values(by=list(res.columns), na_position="last").reset_index(
        drop=True
    )


def main() -> int:
    from ed_housing_data_pipeline_spark.session import get_spark
    from ed_housing_data_pipeline_spark.plans.registry import (
        oracle_sql_map,
        query_map,
    )

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qmap = query_map()
    omap = oracle_sql_map()
    n_pass = n_fail = 0
    for name, fn in sorted(qmap.items()):
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if name not in omap:
            print(f"SKIP {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            odf = con.execute(omap[name]).df()
        except Exception:
            print(f"FAIL {name}: ORACLE ERROR")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        dt = time.time() - t0
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(
                f"FAIL {name}: columns spark={sorted(sdf.columns)} "
                f"oracle={sorted(odf.columns)}"
            )
            n_fail += 1
            continue
        cs, co = canon(sdf), canon(odf)
        if not cs.equals(co):
            diff_cols = [
                c
                for c in cs.columns
                if not cs[c].equals(co[c])
            ]
            print(f"FAIL {name}: values differ in {diff_cols}")
            for c in diff_cols[:2]:
                neq = cs[c] != co[c]
                neq = neq & ~(cs[c].isna() & co[c].isna())
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"    row {i}: spark={cs[c][i]!r} oracle={co[c][i]!r}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sdf)} rows, {dt:.1f}s)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
