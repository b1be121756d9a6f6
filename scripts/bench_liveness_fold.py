"""One-off A/B of the tombstone-liveness fold's SHUFFLE fallback on a
corpus with a real >2M-row tombstone set (r10 VERDICT #2: the
`_LIVE_BROADCAST_MAX_ROWS = 2M` bound added in r10 had only ever run
under a monkeypatched threshold — `tests/test_bulk_delete.py` — so the
SortMergeJoin plan the fallback degrades to had never executed on
real data).

Builds the same deterministic Zipf corpus as bench_rarest_first
(default 3M docs), bootstraps the persisted inverted index, commits a
DataFrame-scale `delete_from` of 2.2M ids (one tombstone segment, one
manifest flip — the pressure counter crosses the bound), then times a
conjunctive search A/B:

- fallback  — as shipped: counter > bound, `_live` drops the
  broadcast hint, the watermark fold runs as a shuffle join;
- forced    — `_LIVE_BROADCAST_MAX_ROWS` monkeypatched to infinity:
  the same 2.2M-row watermark table is broadcast.

and prints each executed plan's join/exchange lines so the
SortMergeJoin-vs-BroadcastHashJoin shapes are on record.

Run:  python scripts/bench_liveness_fold.py [n_docs] [n_deleted]
Appends nothing; results are copied into PLANS.md by hand.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_rarest_first import corpus  # noqa: E402


def main() -> None:
    from ed_housing_data_pipeline_spark.operators import text_index
    from ed_housing_data_pipeline_spark.sources import lake

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    n_del = int(sys.argv[2]) if len(sys.argv) > 2 else 2_200_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="livefold_ab_") as tmp:
        root = f"{tmp}/idx"
        t0 = time.time()
        text_index.bootstrap_text_index(
            spark, root, corpus(spark, n_docs, 12)
        )
        print(f"build: {time.time() - t0:.1f}s n_docs={n_docs}")
        t0 = time.time()
        # DataFrame-scale take-down: every doc_id ≡ 0/1/2 (mod 4) under
        # n_del*4/3 — a 2.2M-row delete set, never on the driver
        ids = (
            spark.range(n_docs)
            .withColumnRenamed("id", "doc_id")
            .filter(F.col("doc_id") % 4 < 3)
            .filter(F.col("doc_id") < (n_del * 4) // 3)
        )
        text_index.delete_from(spark, root, ids, segment_partitions=None)
        meta = lake.segment_meta(spark, root)
        print(
            f"delete_from: {time.time() - t0:.1f}s "
            f"tombstone_rows={meta.get(lake.TOMBSTONE_ROWS_KEY)} "
            f"(bound={text_index._LIVE_BROADCAST_MAX_ROWS})"
        )
        probe = ["w1", "w300"]

        def run(label: str) -> None:
            for attempt in range(3):
                t = time.time()
                out = text_index.search_all_terms(spark, root, probe)
                n = out.count()
                print(f"{label} run{attempt}: {time.time() - t:.2f}s rows={n}")
                if attempt == 0:
                    plan = out._jdf.queryExecution().executedPlan().toString()
                    keep = [
                        ln
                        for ln in plan.splitlines()
                        if "Join" in ln or "Exchange" in ln
                    ]
                    print(f"{label}-plan joins/exchanges:")
                    for ln in keep:
                        print("   ", ln.strip()[:130])

        run("fallback")  # counter > bound: shuffle-join fold, as shipped
        orig = text_index._LIVE_BROADCAST_MAX_ROWS
        text_index._LIVE_BROADCAST_MAX_ROWS = 10**18
        try:
            run("forced-broadcast")
        finally:
            text_index._LIVE_BROADCAST_MAX_ROWS = orig


if __name__ == "__main__":
    main()
