#!/usr/bin/env python
"""Per-query profiling for the optimization rounds (guide §1: measure
first). For each headline query: amortized wall seconds (min of N),
Spark job count, stage count, and task count for ONE steady-state run
(status-tracker job-group probe), written as JSON to
scripts/.bench_profile.json and printed as a table.

Usage: python scripts/bench_profile.py [query ...]   (default: bench.HEADLINE)
  env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
       PROFILE_RUNS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("PROFILE_RUNS", "3"))


def main() -> int:
    from pyspark.sql import SparkSession

    import bench
    from ed_housing_data_pipeline_spark.plans.registry import query_map
    from ed_housing_data_pipeline_spark.session import ensure_runtime_confs

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_runtime_confs(spark)
    sc = spark.sparkContext
    qmap = query_map()
    names = sys.argv[1:] or [n for n in bench.HEADLINE if n in qmap]

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        if name not in qmap:
            print(f"!! unknown query {name}")
            continue
        # cold run (warms family caches; NOT measured here)
        t0 = time.perf_counter()
        noop(qmap[name](spark, SF_DIR))
        cold = time.perf_counter() - t0
        # amortized wall: min of RUNS; plan construction timed separately
        best = float("inf")
        build_best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = qmap[name](spark, SF_DIR)
            t1 = time.perf_counter()
            noop(df)
            build_best = min(build_best, t1 - t0)
            best = min(best, time.perf_counter() - t0)
        # instrumented run: job/stage/task counts via job group
        group = f"prof-{uuid.uuid4().hex[:8]}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        noop(qmap[name](spark, SF_DIR))
        instr = time.perf_counter() - t0
        sc.setLocalProperty("spark.jobGroup.id", None)
        st = sc.statusTracker()
        job_ids = st.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None and si.numTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {
            "cold_s": round(cold, 3),
            "amortized_s": round(best, 3),
            "build_s": round(build_best, 3),
            "instr_s": round(instr, 3),
            "jobs": len(job_ids),
            "stages": n_stages,
            "tasks": n_tasks,
        }
        print(
            f"{name:38s} amort={best:7.3f}s build={build_best:6.3f}s "
            f"cold={cold:7.3f}s jobs={len(job_ids):3d} "
            f"stages={n_stages:3d} tasks={n_tasks:5d}"
        )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_profile.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    total = sum(v["amortized_s"] for v in out.values())
    print(f"\ntotal amortized: {total:.3f}s over {len(out)} queries -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
