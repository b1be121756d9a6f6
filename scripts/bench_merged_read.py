#!/usr/bin/env python
"""Measure the merged-read (sequence-watermark liveness) overhead
under delete/upsert churn — the lake-core sibling of
scripts/bench_liveness_fold.py.

Scenario: a component ingests N rows in B batches, then takes U upsert
commits (revising a slice each) and D delete commits; the tombstone
component accumulates ~(U*slice + D*slice) watermark rows. Timed:

- plain pinned read (no liveness rule) — the floor;
- read_segmented_live (bare-id anti-join) — the legacy rule;
- read_segmented_merged (per-id MAX watermark fold + kill-below
  filter) — the revision axis;
- read_segmented_merged after apply_tombstones(merged=True) — the
  post-maintenance floor (fold over one EMPTY tombstone segment).

Job shape notes (why this scales): the watermark fold is one groupBy
over the tombstone component only — O(churned ids), never O(table);
the join side is the pinned multi-dir scan; no explicit broadcast hint
(AQE broadcasts small folds, degrades to shuffle past the threshold
instead of an unbounded broadcast).

Usage: python scripts/bench_merged_read.py [n_rows] [n_churn_commits]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
N_CHURN = int(sys.argv[2]) if len(sys.argv) > 2 else 40


def timed(label, fn, best_of=3):
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:58s} {best:7.3f}s")
    return best


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from ed_housing_data_pipeline_spark.sources import lake

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench-merged-read")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory(prefix="bench_merged_") as tmp:
        root = f"{tmp}/ds"
        batch = N_ROWS // 4
        for i in range(4):
            df = spark.range(i * batch, (i + 1) * batch).select(
                F.col("id").alias("k"),
                (F.col("id") % 997).alias("bucket"),
                (F.col("id") * 1.0).alias("v"),
            )
            lake.append_segments(spark, root, {"t": df}, init=(i == 0))
        slice_rows = max(N_ROWS // 100, 1)
        for j in range(N_CHURN):
            lo = (j * slice_rows) % N_ROWS
            ids = spark.range(lo, min(lo + slice_rows, N_ROWS)).select(
                F.col("id").alias("k")
            )
            if j % 2 == 0:
                lake.upsert_rows(
                    spark, root, "t", "k",
                    ids.select(
                        "k",
                        (F.col("k") % 997).alias("bucket"),
                        F.lit(-1.0).alias("v"),
                    ),
                )
            else:
                lake.delete_rows_from(spark, root, "t", "k", ids)
        pins = lake.segment_pins(spark, root)
        tomb = lake.tombstone_component("t")
        n_tomb = lake.read_segments(spark, f"{root}/{tomb}", pins[tomb]).count()
        print(
            f"rows={N_ROWS:,} churn_commits={N_CHURN} "
            f"tombstone_rows={n_tomb:,} data_segments={len(pins['t'])}"
        )

        def agg(df):
            df.groupBy("bucket").agg(F.sum("v")).write.format("noop").mode(
                "overwrite"
            ).save()

        plain = timed("plain pinned read + agg (floor)", lambda: agg(
            lake.read_segmented_components(spark, root, ["t"])["t"]
        ))
        live = timed("read_segmented_live (bare-id anti-join)", lambda: agg(
            lake.read_segmented_live(spark, root, "t", "k")
        ))
        merged = timed("read_segmented_merged (watermark fold)", lambda: agg(
            lake.read_segmented_merged(spark, root, "t", "k")
        ))
        lake.apply_tombstones(spark, root, "t", "k", merged=True)
        applied = timed("merged read after physical apply", lambda: agg(
            lake.read_segmented_merged(spark, root, "t", "k")
        ))
        print(
            f"overhead vs floor: live {live / plain:.2f}x, "
            f"merged {merged / plain:.2f}x, post-apply {applied / plain:.2f}x"
        )

        # ---- phase 2: the SAME churn under maintain's AUTO cadence
        # (r13 VERDICT #2): every 5 commits the cadence runs with
        # auto max_rows = 10% of the table; the physical apply fires
        # only at pressure, and the merged-read overhead sampled at
        # each cadence point must stay bounded (~1.5x floor) instead
        # of drifting to the unbounded-churn 2.5x ceiling above.
        root2 = f"{tmp}/ds_auto"
        for i in range(4):
            df = spark.range(i * batch, (i + 1) * batch).select(
                F.col("id").alias("k"),
                (F.col("id") % 997).alias("bucket"),
                (F.col("id") * 1.0).alias("v"),
            )
            lake.append_segments(spark, root2, {"t": df}, init=(i == 0))
        policy = {
            "apply_tombstones": {
                "t": {
                    "id_col": "k",
                    "merged": True,
                    "auto": {"max_rows": int(N_ROWS * 0.10)},
                }
            }
        }
        worst = 0.0
        applies = 0
        for j in range(N_CHURN):
            lo = (j * slice_rows) % N_ROWS
            ids = spark.range(lo, min(lo + slice_rows, N_ROWS)).select(
                F.col("id").alias("k")
            )
            if j % 2 == 0:
                lake.upsert_rows(
                    spark, root2, "t", "k",
                    ids.select(
                        "k",
                        (F.col("k") % 997).alias("bucket"),
                        F.lit(-1.0).alias("v"),
                    ),
                )
            else:
                lake.delete_rows_from(spark, root2, "t", "k", ids)
            if j % 5 == 4:
                t_merged = t_plain = float("inf")
                for _ in range(2):  # best-of-2: shared-box noise guard
                    t0 = time.perf_counter()
                    agg(lake.read_segmented_merged(spark, root2, "t", "k"))
                    t_merged = min(t_merged, time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    agg(
                        lake.read_segmented_components(spark, root2, ["t"])["t"]
                    )
                    t_plain = min(t_plain, time.perf_counter() - t0)
                ratio = t_merged / t_plain
                worst = max(worst, ratio)
                rep = lake.maintain(spark, root2, policy)
                verdict = rep["apply_tombstones"]["t"]
                applies += verdict == "applied"
                n = lake.segment_meta(spark, root2).get(
                    lake.component_tombstone_rows_key("t"), 0
                )
                print(
                    f"cadence @commit {j + 1:3d}: merged/plain "
                    f"{ratio:4.2f}x, counter={n:,}, apply={verdict}"
                )
        print(
            f"auto cadence: worst sampled overhead {worst:.2f}x floor, "
            f"{applies} pressure-fired applies over {N_CHURN} commits "
            f"(threshold {int(N_ROWS * 0.10):,} churned rows)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
