#!/usr/bin/env python
"""Headline benchmark for the spark-graft driver.

Runs a representative slice of the registered queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE COMPACT JSON
line (the driver captures only the tail of stdout, so the line must
stay small — r8's full per-query dump outgrew the capture window and
the round lost its parsed headline):

    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "sf": 0.1, "n_queries": N, "queries": {<top-5 slowest>},
     "cold_total": <sec>, "detail": "BENCH_detail.json"}

The FULL per-query amortized/cold timings (and --sweep results) land
in ``BENCH_detail.json`` next to this script.

Each query is forced end-to-end with the no-op sink (full plan executes
on the executors; nothing is collected to the driver), which is the
honest proxy for cluster throughput — a ``collect()`` would bench the
driver's Python deserialization instead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# --sweep also runs these (skipping SF_DIR itself) for scaling trends.
SWEEP_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# ----------------------------------------------------------------- r16
# Scale probe (r15 VERDICT #3): at sf0.1 every headline query sits on
# the ~0.1-0.15s/job AQE dispatch floor — the r15 driver's 8-core run
# BEAT 32 cores on 4 of 5 top queries, i.e. the headline had stopped
# measuring executor work. This block times the compute-heaviest
# queries at SPARK_GRAFT_SCALE_PROBE× the input (default 4×, 0
# disables): the inputs are regenerated DETERMINISTICALLY from the
# sf_dir parquet inside every invocation (row replication; doc/vec ids
# shifted to stay unique; each document replica's text is
# letter-translated so replicas do not share 5-gram spans — a 4×
# corpus, not 4 copies of one corpus) into a tempdir that dies with
# the run, so nothing is precomputed or cached across runs. Results
# land as separate `scale_probe*` fields — the headline `value` /
# `queries` keep their exact r1-r15 meaning.
# factor 32 (measured upward from 4 and 8, which were still
# dispatch-bound — 8c/32c ratios 0.6-1.1): at 32× the narrow
# compute stages dominate for the token/ADC family (dup_span 8c/32c
# 1.53, ivfpq 1.27, cms 1.21). Queries whose cost is ONE shuffle
# (unigram's tf exchange) stay core-count-flat even here: their
# shuffle bytes at 32×sf0.1 still fit a single AQE-coalesced
# partition, which is the CORRECT at-scale behavior (partition count
# follows bytes, not cores) — the probe reports the honest ratio
# rather than forcing partitions
SCALE_PROBE_FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_PROBE", "32"))
SCALE_PROBE_QUERIES = [
    "doc_dup_span_coverage",     # gram dup + interval-union fold
    "doc_unigram_surprisal",     # tokenize + tf/vocab/total chain
    "doc_word_cms_topk",         # CMS counters + exact top-k
    "doc_quality_score",         # text stats battery
    "doc_minhash_signature",     # shingles + 8 minhashes
    "embedding_knn_blocked",     # label-blocked cosine top-k
    "embedding_knn_srp",         # SRP-LSH bucketed ANN
    "embedding_knn_ivfpq_fixed", # ADC math, the 100 TB ANN path
    "events_hll_daily_users",    # distinct pairs + HLL registers
    "rank_dense_global",         # sharded global window
    "lineitem_group_histogram_quantiles",  # grouped rank sketch
]
# tables the probe queries read; everything else is symlinked as-is
SCALE_PROBE_TABLES = {
    "documents": "doc",
    "embeddings": "vec",
    "orders": "plain",
    "lineitem": "plain",
    "events": "plain",
}


def _materialize_scaled_inputs(spark, sf_dir: str, out_dir: str, k: int) -> None:
    """Write k× replicas of the probe tables under ``out_dir`` and
    symlink the rest. Deterministic: replica i of a document shifts
    doc_id to doc_id*k+i and letter-translates the text (replicas
    share no tokens, so gram/vocab structures grow with the corpus
    instead of degenerating into k-way duplicates); embeddings shift
    vec_id the same way; fact tables replicate rows as-is (the group/
    window/distinct keys keep their cardinality — the many-rows-per-
    key shape of a bigger corpus)."""
    import glob as _glob

    from pyspark.sql import functions as F

    rot = "bcdfghjklmnpqrstvwxyz"  # consonant rotation per replica
    for name, mode in SCALE_PROBE_TABLES.items():
        src = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        reps = []
        for i in range(k):
            r = src
            if mode == "doc":
                r = r.withColumn(
                    "doc_id", F.col("doc_id") * k + F.lit(i)
                )
                if i:
                    r = r.withColumn(
                        "text",
                        F.translate(
                            F.col("text"), rot, rot[i:] + rot[:i]
                        ),
                    )
            elif mode == "vec":
                r = r.withColumn(
                    "vec_id", F.col("vec_id") * k + F.lit(i)
                )
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    for p in _glob.glob(f"{sf_dir}/*.parquet"):
        base = os.path.basename(p)
        if base.replace(".parquet", "") not in SCALE_PROBE_TABLES:
            os.symlink(p, f"{out_dir}/{base}")


def run_scale_probe(spark, sf_dir: str, k: int) -> dict:
    """Time SCALE_PROBE_QUERIES at k× inputs (min of 2 end-to-end
    noop-sink runs each — at this size executor work dominates
    dispatch, so two runs bound the noise the amortized model's five
    exist for). Returns {factor, gen_sec, total, queries}."""
    import tempfile
    import time as _time

    from ed_housing_data_pipeline_spark.plans.registry import query_map

    qmap = query_map()
    with tempfile.TemporaryDirectory(prefix="scale_probe_") as tmp:
        t0 = _time.perf_counter()
        _materialize_scaled_inputs(spark, sf_dir, tmp, k)
        gen_sec = round(_time.perf_counter() - t0, 3)
        timings: dict[str, float] = {}
        for name in SCALE_PROBE_QUERIES:
            if name not in qmap:
                continue
            spark.sparkContext.setJobDescription(f"scale_probe {k}x {name}")
            best = float("inf")
            for _ in range(2):
                t0 = _time.perf_counter()
                qmap[name](spark, tmp).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, _time.perf_counter() - t0)
            timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    return {
        "factor": k,
        "gen_sec": gen_sec,
        "total": round(sum(timings.values()), 3),
        "queries": timings,
    }

# One per operator family; heavy hitters (joins, windows, dedup, events,
# minhash, ANN) all represented so a regression anywhere shows up here.
HEADLINE = [
    "grouped_agg",          # TPC-H Q1 shape: scan + partial/final agg
    "safe_division",        # full-table projection arithmetic
    "left_join",            # broadcast left join, fact side unshuffled
    "inner_join_agg",       # two-hop broadcast join + agg
    "dedup_keep_first",     # shuffle + partition-local window
    "rank_sum_top1",        # flagship: joins + agg + 3 ranks + top-1
    "topk_orders",          # TakeOrderedAndProject
    "topk_per_group",       # partitioned window top-k
    "events_hourly_by_type",    # ns-ts conversion + time bucket agg
    "events_sessionize_stats",  # lag + cumsum sessionization
    "doc_exact_dedup",      # normalize + hash-groupBy dedup
    "doc_minhash_signature",    # shingles + 8 universal-hash minhashes
    "doc_neardup_pairs",    # LSH banding join
    "doc_quality_score",    # text stats battery
    "embedding_knn_blocked",    # label-blocked cosine top-k
    "embedding_knn_srp",    # SRP-LSH bucketed ANN
    "embedding_knn_ivfpq_fixed",  # IVF-PQ/ADC search, the 100 TB ANN path
    "embedding_incremental_ann",  # probe of the persisted segmented ANN index
    "events_asof_last_view",    # as-of join (union + window)
    # heavy dedup/cluster family + sharded global rank (r5 VERDICT #3:
    # driver-track their perf, not just correctness)
    "doc_dedup_clusters",   # LSH pairs -> pointer-jumping components
    "embedding_dedup_clusters",  # cosine pairs -> components
    "doc_incremental_neardup",   # batch probe vs persisted snapshot index
    "rank_dense_global",    # quantile-sharded dense_rank over orders
    # r6 token-explode battery (compute-heavy curation audits)
    "doc_unigram_surprisal",    # per-(doc,word) counts + vocab join
    "doc_dup_span_coverage",    # gram table + repeated-gram semi-join
    # r8 continuous-aggregate family: serving cost of the persisted
    # view (merge of partial segments; build memoized per session)
    "orders_incremental_rollup",   # merge-on-read of the full view
    "orders_rollup_month_range",   # zonemap chunk-excluded window read
    # r8 sketch / multi-dim / point-lookup rows
    "events_hll_daily_users",      # HLL registers + exact distinct side-by-side
    "events_hll_rollup",           # sketch served from incremental max-state
    "orders_status_priority_cube",  # Expand + single-pass grouping sets
    "doc_point_lookup",            # bloom-sidecar pruned segment fetch
    "doc_word_cms_topk",           # count-min counters + probe join
    # r8 fourth wave: search / rank sketch / SFC layout
    "doc_inverted_search_and",     # posting-list AND through the index
    "doc_inverted_phrase",         # positional phrase search
    "doc_inverted_tfidf_topk",     # ranked retrieval off additive stats
    "doc_inverted_bm25_topk",      # BM25 with dl/avgdl index state
    "doc_inverted_prefix",         # StartsWith-pushed wildcard search
    "orders_histogram_quantiles",  # quantiles off the bin-table CDF
    "lineitem_group_histogram_quantiles",  # grouped rank sketch
    "orders_zorder_box",           # 2-D zonemap box pruning
    "orders_zorder_box3",          # r11: N-dim Morton, 3-D box pruning
]

# Cold-only rows (r6 VERDICT #5): these two run REAL side-effecting
# loops — the full streaming ingest-with-dedup sink (index bootstrap +
# foreachBatch commits in a fresh tempdir every call) and the sharded
# JSONL export (write → readback → manifest) — so "min of 5 with warm
# caches" is not a meaningful model for them; each run pays the whole
# pipeline. They are timed ONCE per suite and reported in cold_queries
# only (cold_total includes them; the amortized headline stays
# apples-to-apples with prior rounds).
COLD_ONLY = [
    "doc_export_shards",            # sharded corpus export e2e
    "doc_stream_incremental_dedup",  # streaming ingest + incremental dedup
    "orders_stream_rollup",         # streamed view maintenance e2e
    "doc_stream_search_ingest",     # streamed text-index maintenance e2e
    "doc_search_after_delete",      # GDPR take-down + BM25 over remaining
    "doc_search_after_update",      # revision upsert + BM25 over revised
    "lake_type_widening",           # r11: widening evolution e2e (tempdir build per run)
    "lake_rename_evolution",        # r12: rename evolution e2e (tempdir build per run)
    "embedding_knn_ivfpq_recall_clustered",  # r12: trains coarse+PQ per run
    "lake_maintain_cycle",          # r12: full maintenance cadence e2e
    "lake_changes_feed",            # r12: CDF read across a rewrite e2e
    "lake_mirror_consume",          # r12: exactly-once CDF consumer e2e
    "lake_upsert_roundtrip",        # r13: row-level upsert/merge lifecycle e2e
    "lake_cdf_merged_mirror",       # r13: retraction-aware consumer loop e2e
    "lake_changes_typed_feed",      # r13: _change_type feed across a delete
    "lake_stream_mirror_consume",   # r13: continuous mirror (stream-driven)
    "lake_upsert_time_travel",      # r13: merged-view time travel e2e
    "lake_merge_conditional",       # r14: conditional MERGE, composite keys
    "lake_merge_patch",             # r14: partial-column UPDATE SET
    "lake_stream_merge_dim",        # r14: exactly-once streaming merge sink
]


# Reference canary: the START-side run_canary() measured on the quiet
# r12 host whose 16.41s headline is the round-over-round anchor.
# canary_normalized = value * (REF_CANARY / canary_start) rescales the
# headline to that host, so a reader comparing BENCH_r{N}.json rounds
# sees repo drift, not shared-box contention (r13 VERDICT #6: the raw
# 22.05s read as a 34% regression until the canary attribution showed
# the host was ~1.8x slower; normalized: 22.05 * 0.210/0.387 ≈ 12s).
# START-side only: the end-side canary runs JIT-warm after the suite
# (r12: start 0.210 vs end 0.124) and would over-correct.
REF_CANARY = 0.210


def run_canary(spark) -> float:
    """A FIXED synthetic job (no repo code, no input data): hash-mix +
    aggregate over a generated range. Identical work every round, so
    its round-over-round drift measures THE HOST, not this repo —
    the denominator that separates real regressions from shared-box
    contention (r11 VERDICT #4). Min of 3 like the headline's
    amortized model."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(20_000_000).selectExpr(
            "sum(CAST((id * 2654435761) % 1000003 AS BIGINT)) AS s"
        ).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def run_suite(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, float]]:
    """(amortized, cold) per-query seconds.

    ``cold`` is the FIRST end-to-end run: it pays plan build, JIT
    warm-up, and any session-shared cache/index the query family
    builds on first use (signature table, incremental LSH index), so
    it is an upper bound and inter-query order matters. ``amortized``
    is the min of 5 subsequent runs — steady-state cost with family
    caches warm, the headline number (and the noise-robust one: host
    CPU contention showed uniform 1.3-2× swings on single timed runs
    in rounds 4-5). Reporting both keeps round-over-round trends
    honest about the caching model (r5 ADVICE)."""
    from ed_housing_data_pipeline_spark.plans.registry import query_map

    qmap = query_map()
    amortized: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qmap:
            continue
        t0 = time.perf_counter()
        df = qmap[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        amortized[name] = round(best, 3)
    for name in COLD_ONLY:
        if name not in qmap:
            continue
        t0 = time.perf_counter()
        df = qmap[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
    return amortized, cold


def _sf_of(sf_dir: str) -> float | None:
    sf_token = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        return float(sf_token)
    except ValueError:
        return None


def main() -> int:
    from pyspark.sql import SparkSession

    from ed_housing_data_pipeline_spark.session import ensure_runtime_confs

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("spark-graft-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "8g")
        # progress bars spam the driver's stdout tail capture and can
        # push the final JSON line out of the window (r8 VERDICT nit)
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_runtime_confs(spark)

    canary_start = run_canary(spark)
    timings, cold = run_suite(spark, SF_DIR)
    canary_end = run_canary(spark)
    # r16: the scale probe runs AFTER the end canary so the headline's
    # thermal/JIT context stays identical to r1-r15; see the block
    # comment at SCALE_PROBE_FACTOR
    scale_probe = (
        run_scale_probe(spark, SF_DIR, SCALE_PROBE_FACTOR)
        if SCALE_PROBE_FACTOR > 0
        else None
    )
    detail = {
        # host-drift denominator: the same synthetic job before and
        # after the suite; compare across rounds' BENCH_r{N}.json to
        # separate host slowdown from repo regressions
        "canary": {"start": canary_start, "end": canary_end},
        "sf": _sf_of(SF_DIR),
        "cpus": int(CPUS),
        # caching model disclosure: "queries" are steady-state (family
        # caches warm, min of 5); "cold_queries" are each query's first
        # run including shared cache/index builds and JIT warm-up
        "caching_model": "queries=min-of-5 amortized; cold_queries=first run",
        "queries": timings,
        "cold_queries": cold,
        "scale_probe": scale_probe,
    }
    if "--sweep" in sys.argv:
        # Scaling check: same frozen query list at each SF so a
        # regression in the *slope* (not just the total) is visible
        # round-over-round. Keyed by SF token, e.g. {"0.01": {...}}.
        sweep: dict[str, dict] = {}
        for d in SWEEP_DIRS:
            if d == SF_DIR or not os.path.isdir(d):
                continue
            t, c = run_suite(spark, d)
            sweep[str(_sf_of(d))] = {
                "total": round(sum(t.values()), 3),
                "queries": t,
                "cold_total": round(sum(c.values()), 3),
            }
        detail["sweep"] = sweep
    here = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(here, "BENCH_detail.json")
    with open(detail_path, "w", encoding="utf-8") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    # r15 VERDICT #8: a 32-core and an 8-core run silently overwrote
    # each other's BENCH_detail.json; keep the canonical name (the JSON
    # line references it) AND a per-core-count copy
    with open(
        os.path.join(here, f"BENCH_detail_c{CPUS}.json"), "w", encoding="utf-8"
    ) as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    top5 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    value = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_total",
        "value": value,
        "unit": "sec",
        "sf": _sf_of(SF_DIR),
        "n_queries": len(timings),
        "queries": top5,
        "cold_total": round(sum(cold.values()), 3),
        "canary": {"start": canary_start, "end": canary_end},
        # self-attributing headline: value rescaled to the r12
        # reference host (see REF_CANARY) — compare THIS field
        # round-over-round, the raw value only within one host session
        "canary_normalized": round(value * REF_CANARY / canary_start, 3)
        if canary_start > 0
        else None,
        "detail": "BENCH_detail.json",
    }
    if scale_probe is not None:
        # executor-work signal (r15 VERDICT #3): the same queries at
        # SCALE_PROBE_FACTOR× inputs, where compute dominates the
        # per-job dispatch floor — per-query detail in BENCH_detail
        result["scale_probe_total"] = scale_probe["total"]
        result["scale_probe_factor"] = scale_probe["factor"]
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
