"""Process-level test sharding (r10 VERDICT #5): pytest-xdist is not
installable in this container, so the suite's wall clock is cut by
partitioning test MODULES across N concurrent pytest subprocesses —
sound because every fixture in the suite is module- or
function-scoped (each subprocess builds its own SparkSession, and
4 shards x the conftest's local[8] matches the 32-CPU host).

Balancing is longest-processing-time greedy over per-module durations:
measured ones from the cache this script refreshes on every run
(scripts/.suite_timings.json — junit per-testcase times aggregated per
module), seeded with a hand-measured table for modules the cache has
not seen. Results merge from the shards' junit XML; the exit code is
non-zero if ANY shard failed, and the per-shard tails are printed on
failure so nothing hides.

Run:  python scripts/run_suite_sharded.py [n_shards]   (default 4)
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMINGS = os.path.join(REPO, "scripts", ".suite_timings.json")

# measured single-process durations (seconds) as the cold-start seed;
# the cache overwrites these with fresh junit numbers every run
SEED_WEIGHTS = {
    "tests/test_bulk_delete.py": 200,
    "tests/test_text_index.py": 150,
    "tests/test_streaming.py": 140,
    "tests/test_schema_evolution.py": 60,
    "tests/test_tiered_compaction.py": 90,
    "tests/test_tombstones.py": 60,
    "tests/test_rollup.py": 120,
    "tests/test_streaming_rollups.py": 60,
    "tests/test_incr_index.py": 90,
    "tests/test_ann_index.py": 90,
    "tests/test_queries_rollup.py": 60,
    "tests/test_operators_similarity.py": 80,
    "tests/test_zonemap.py": 40,
    "tests/test_bloom.py": 30,
    "tests/test_zcluster.py": 40,
    "tests/test_patho_smoke.py": 40,
    "tests/test_patho_text.py": 40,
    "tests/test_property_based.py": 40,
    "tests/test_pipeline_golden.py": 40,
}
DEFAULT_WEIGHT = 25.0


def _weights() -> dict[str, float]:
    w = {k: float(v) for k, v in SEED_WEIGHTS.items()}
    try:
        with open(TIMINGS, encoding="utf-8") as f:
            w.update({k: float(v) for k, v in json.load(f).items()})
    except (OSError, ValueError):
        pass
    return w


def _assign(files: list[str], n: int, w: dict[str, float]) -> list[list[str]]:
    shards: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n)]
    for f in sorted(files, key=lambda f: -w.get(f, DEFAULT_WEIGHT)):
        load, members = min(shards, key=lambda s: s[0])
        i = shards.index((load, members))
        shards[i] = (load + w.get(f, DEFAULT_WEIGHT), members + [f])
    return [m for _load, m in shards]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    os.chdir(REPO)
    files = sorted(glob.glob("tests/test_*.py"))
    shards = _assign(files, n, _weights())
    t0 = time.time()
    procs = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        xml = f"/tmp/suite_shard_{i}.xml"
        log = f"/tmp/suite_shard_{i}.log"
        cmd = [
            sys.executable, "-m", "pytest", *shard, "-q",
            "-p", "no:cacheprovider", f"--junitxml={xml}",
        ]
        out = open(log, "w", encoding="utf-8")  # noqa: SIM115
        procs.append(
            (i, xml, log, subprocess.Popen(cmd, stdout=out, stderr=out), out)
        )
        print(f"shard {i}: {len(shard)} modules -> {log}")
    totals = {"tests": 0, "failures": 0, "errors": 0, "skipped": 0}
    durations: dict[str, float] = {}
    failed_shards = []
    for i, xml, log, p, out in procs:
        rc = p.wait()
        out.close()
        try:
            root = ET.parse(xml).getroot()
            suites = root.iter("testsuite")
            for s in suites:
                for k in totals:
                    totals[k] += int(s.get(k, 0))
            for case in ET.parse(xml).getroot().iter("testcase"):
                # junit classnames are dotted module paths
                # ("tests.test_rollup" or "tests.test_x.TestClass"):
                # the MODULE is the segment starting with test_
                cls = case.get("classname", "")
                mod = next(
                    (p for p in cls.split(".") if p.startswith("test_")), ""
                )
                if mod:
                    durations[f"tests/{mod}.py"] = durations.get(
                        f"tests/{mod}.py", 0.0
                    ) + float(case.get("time", 0))
        except (OSError, ET.ParseError) as e:
            print(f"shard {i}: junit unreadable ({e}); rc={rc}")
            failed_shards.append(i)
            continue
        status = "ok" if rc == 0 else f"FAILED rc={rc}"
        print(f"shard {i}: {status}")
        if rc != 0:
            failed_shards.append(i)
    wall = time.time() - t0
    if durations:
        merged = _weights()
        merged.update({k: round(v, 1) for k, v in durations.items()})
        with open(TIMINGS, "w", encoding="utf-8") as f:
            json.dump(
                {
                    k: v
                    for k, v in sorted(merged.items())
                    if k.startswith("tests/test_")
                },
                f,
                indent=0,
                sort_keys=True,
            )
    # PASSED is the certification number (collected = passed + failed +
    # errors + skipped; quoting collected as "passed" overstated the
    # suite by the skip count — r13 VERDICT #7)
    passed = (
        totals["tests"] - totals["failures"] - totals["errors"]
        - totals["skipped"]
    )
    print(
        f"\n=== sharded suite: {passed} passed, "
        f"{totals['failures']} failed, {totals['errors']} errors, "
        f"{totals['skipped']} skipped ({totals['tests']} collected) "
        f"in {wall:.0f}s wall ({len(procs)} shards) ==="
    )
    if failed_shards or totals["failures"] or totals["errors"]:
        for i in failed_shards:
            print(f"\n--- tail of shard {i} log ---")
            with open(f"/tmp/suite_shard_{i}.log", encoding="utf-8") as f:
                print("".join(f.readlines()[-30:]))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
