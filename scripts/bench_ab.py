#!/usr/bin/env python
"""Variance-proof A/B bench: HEAD vs a reference commit, interleaved.

One-shot whole-suite runs on this shared host swing 1.3-2x between
sessions (r11's 14.63s-vs-21.38s same-tree spread), so round-over-round
perf claims need per-query INTERLEAVED medians, not two sequential
totals. This harness:

- checks the ref commit out into a temp git worktree;
- starts TWO long-lived worker processes (one per tree, each its own
  SparkSession on local[$SPARK_GRAFT_CPUS]), so both sides live in the
  SAME host session and page-cache regime;
- per round, runs each query once in each worker, ALTERNATING which
  side goes first (odd rounds B-first), timing one end-to-end noop-sink
  execution; the first two runs per side are unrecorded warm-ups
  (plan build + family caches, matching bench.py's amortized model);
- POWER (r14 VERDICT #5): sub-second queries are batched — each
  measurement runs the query ``reps`` times back-to-back so the timed
  block sits near --target-sec (default 2s, reps capped at 20) and the
  relative noise band shrinks below the moves worth flagging; reps are
  sized from the warm-up runs and recorded per query;
- PAIRED statistic: host-wide contention spikes hit BOTH sides in the
  same interleaved round (r15 observation: every >1.5x outlier run
  appeared on head AND ref in the same round), so per-side min-max
  bands conflate host noise with tree differences. The headline
  per-query statistic is the MEDIAN OF PER-ROUND RATIOS head_i/ref_i
  (each pair runs back-to-back, so shared noise cancels), and the band
  is the spread of the TRIMMED paired ratios (drop the single highest
  and lowest when rounds >= 5) around their median;
- reports per-query medians, the paired ratio, the trimmed paired band
  (a ratio inside the band is noise), the per-query minimum detectable
  ratio (1 + band), and the median band across queries (the suite's
  overall power).

Usage:
    python scripts/bench_ab.py --ref <commit> [--rounds 5]
        [--queries q1,q2,...] [--sf-dir /root/testdata/sf0.1]
        [--out BENCH_AB.json]

Writes the full report to --out (default BENCH_AB.json at the repo
root) and prints a compact summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER_CODE = r"""
import json, os, sys, time

sys.path.insert(0, os.getcwd())
from pyspark.sql import SparkSession

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("bench-ab-" + os.environ.get("AB_LABEL", "?"))
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
try:
    from ed_housing_data_pipeline_spark.session import ensure_runtime_confs
    ensure_runtime_confs(spark)
except Exception:
    pass
from ed_housing_data_pipeline_spark.plans.registry import query_map

qmap = query_map()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
print("READY", flush=True)
for line in sys.stdin:
    parts = line.strip().split(None, 1)
    if not parts:
        continue
    if parts[0] == "EXIT":
        break
    if parts[0] == "LIST":
        print("QUERIES " + json.dumps(sorted(qmap)), flush=True)
        continue
    if parts[0] == "RUN":
        rest = parts[1].split()
        name, reps = rest[0], (int(rest[1]) if len(rest) > 1 else 1)
        try:
            t0 = time.perf_counter()
            for _ in range(reps):
                qmap[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            dt = (time.perf_counter() - t0) / reps
            print(f"OK {name} {dt:.6f}", flush=True)
        except Exception as e:  # noqa: BLE001 - report, keep serving
            print(f"ERR {name} {type(e).__name__}", flush=True)
spark.stop()
"""


class Worker:
    def __init__(self, label: str, tree: str, sf_dir: str):
        env = dict(os.environ, AB_LABEL=label, SPARK_GRAFT_SF_DIR=sf_dir)
        env["PYTHONPATH"] = tree
        self.label = label
        self.proc = subprocess.Popen(
            [sys.executable, "-c", WORKER_CODE],
            cwd=tree,
            env=env,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        self._await("READY")

    def _await(self, prefix: str) -> str:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"worker {self.label} died")
            if line.startswith(prefix):
                return line.strip()

    def send(self, cmd: str) -> None:
        self.proc.stdin.write(cmd + "\n")
        self.proc.stdin.flush()

    def list_queries(self) -> set[str]:
        self.send("LIST")
        return set(json.loads(self._await("QUERIES")[len("QUERIES ") :]))

    def run_checked(self, name: str, reps: int = 1) -> float | None:
        self.send(f"RUN {name} {reps}")
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"worker {self.label} died on {name}")
            line = line.strip()
            if line.startswith(("OK ", "ERR ")):
                if line.startswith("OK "):
                    return float(line.split()[2])
                return None

    def close(self) -> None:
        try:
            self.send("EXIT")
            self.proc.wait(timeout=60)
        except Exception:  # noqa: BLE001
            self.proc.kill()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True, help="commit to compare against")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_AB.json"))
    ap.add_argument(
        "--target-sec", type=float, default=2.0,
        help="batch sub-second queries until one measurement spans this",
    )
    ap.add_argument("--max-reps", type=int, default=20)
    ap.add_argument(
        "--band-floor", type=float, default=0.15,
        help="minimum effective band: absorbs worker-level systematics "
        "(JVM/heap asymmetry between the two long-lived workers) that "
        "paired ratios cannot cancel; calibrated by an r15 A/A run "
        "(--ref HEAD, 41 queries x 5 rounds): identical trees showed "
        "|ratio-1| up to 0.135 on sub-second queries, so 0.15 covers "
        "every A/A false positive while still detecting sub-1.2x moves "
        "the old per-side bands (median 0.85) never could",
    )
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import bench  # HEAD's headline list is the default query set

    ref_sha = subprocess.check_output(
        ["git", "rev-parse", "--short", args.ref], cwd=REPO, text=True
    ).strip()
    wt = tempfile.mkdtemp(prefix=f"ab_{ref_sha}_")
    subprocess.check_call(
        ["git", "worktree", "add", "--detach", wt, args.ref],
        cwd=REPO,
        stdout=subprocess.DEVNULL,
    )
    workers = {}
    try:
        workers["ref"] = Worker(f"ref-{ref_sha}", wt, args.sf_dir)
        workers["head"] = Worker("head", REPO, args.sf_dir)
        common = workers["ref"].list_queries() & workers["head"].list_queries()
        if args.queries:
            names = [q for q in args.queries.split(",") if q]
        else:
            names = [q for q in bench.HEADLINE if q in common]
        missing = [q for q in names if q not in common]
        if missing:
            print(f"skipping (absent in one tree): {missing}", file=sys.stderr)
            names = [q for q in names if q in common]

        # unrecorded warm-ups: cold + one warm run per side; the warm
        # time sizes the reps batch that lifts each measurement to
        # ~target-sec (sub-second queries' raw runs swing 2x on this
        # host, drowning <2x moves — r14 VERDICT #5)
        reps_for: dict[str, int] = {}
        for name in names:
            warm = []
            for w in workers.values():
                w.run_checked(name)
                t = w.run_checked(name)
                if t is not None:
                    warm.append(t)
            base = max(min(warm), 0.02) if warm else args.target_sec
            reps_for[name] = max(
                1, min(args.max_reps, round(args.target_sec / base))
            )

        runs: dict[str, dict[str, list[float]]] = {
            n: {"ref": [], "head": []} for n in names
        }
        t_start = time.time()
        for rnd in range(args.rounds):
            order = ["ref", "head"] if rnd % 2 == 0 else ["head", "ref"]
            for name in names:
                for side in order:
                    sec = workers[side].run_checked(name, reps_for[name])
                    if sec is not None:
                        runs[name][side].append(sec)

        report: dict = {
            "ref": ref_sha,
            "sf_dir": args.sf_dir,
            "rounds": args.rounds,
            "wall_sec": round(time.time() - t_start, 1),
            "queries": {},
        }
        tot = {"ref": 0.0, "head": 0.0}
        flagged = []
        for name in names:
            r, h = runs[name]["ref"], runs[name]["head"]
            if not r or not h:
                report["queries"][name] = {"error": "missing runs"}
                continue
            mr, mh = statistics.median(r), statistics.median(h)
            # paired per-round ratios: shared host noise cancels because
            # each pair ran back-to-back in the same interleaved round
            paired = [
                hi / ri for hi, ri in zip(h, r) if ri
            ]
            if paired:
                ratio = statistics.median(paired)
                trimmed = (
                    sorted(paired)[1:-1] if len(paired) >= 5 else paired
                )
                mid = statistics.median(trimmed)
                band = (max(trimmed) - min(trimmed)) / mid if mid else 0.0
            else:
                ratio = mh / mr if mr else float("inf")
                band = 0.0
            entry = {
                "ref_median": round(mr, 4),
                "head_median": round(mh, 4),
                "ratio": round(ratio, 3),
                "paired_ratios": [round(x, 3) for x in paired],
                "noise_band": round(band, 3),
                "reps": reps_for[name],
                "min_detectable_ratio": round(1.0 + band, 3),
                "ref_runs": [round(x, 4) for x in r],
                "head_runs": [round(x, 4) for x in h],
            }
            # outside the effective band → a real move, not noise (the
            # floor absorbs per-worker systematics the pairing can't)
            if abs(ratio - 1.0) > max(band, args.band_floor):
                entry["significant"] = True
                flagged.append((name, ratio))
            report["queries"][name] = entry
            tot["ref"] += mr
            tot["head"] += mh
        report["total_ref_median"] = round(tot["ref"], 3)
        report["total_head_median"] = round(tot["head"], 3)
        report["total_ratio"] = round(
            tot["head"] / tot["ref"], 3
        ) if tot["ref"] else None
        bands = [
            q["noise_band"]
            for q in report["queries"].values()
            if "noise_band" in q
        ]
        report["median_noise_band"] = (
            round(statistics.median(bands), 3) if bands else None
        )
        report["band_floor"] = args.band_floor
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(
            f"A/B vs {ref_sha}: head {tot['head']:.2f}s vs ref "
            f"{tot['ref']:.2f}s (ratio {report['total_ratio']}) over "
            f"{len(names)} queries x {args.rounds} interleaved rounds; "
            f"median noise band {report['median_noise_band']}"
        )
        for name, ratio in sorted(flagged, key=lambda t: t[1], reverse=True):
            q = report["queries"][name]
            print(
                f"  significant: {name} ratio {ratio:.2f} "
                f"(band {q['noise_band']:.2f}) head {q['head_median']}s "
                f"ref {q['ref_median']}s"
            )
        if not flagged:
            print("  no per-query move exceeds its own noise band")
        print(f"full report: {args.out}")
        return 0
    finally:
        for w in workers.values():
            w.close()
        subprocess.call(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO,
            stdout=subprocess.DEVNULL,
        )


if __name__ == "__main__":
    sys.exit(main())
