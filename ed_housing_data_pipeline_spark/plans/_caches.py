"""Session-shared cache machinery for the dedup/similarity family.

Every query in the minhash → neardup → clusters → incremental family
starts from the same (doc_id, source, _sh, mh_*) projection, so within
one driver/bench/correctness session it is computed and persisted ONCE
and reused (the r4 VERDICT perf task: each query used to rebuild its
own). Same story for the verified near-dup PAIR tables (three verbatim
consumers each) and the measured band-bucket width. Bounded by
construction: at most one sf_dir's entries are ever live,
:func:`release_shared_caches` frees everything, and under the audit
flag (``queries_llm.AUDIT_LAZY_PLANS`` — its authoritative home, since
test/audit entry points rebind it there) the caches are bypassed so
plan audits see the real compute graph.

Concurrency model: ONE live session at a time (the harness/driver/
bench shape). The caches are correct under interleaved sessions —
a mismatched session triggers a rebuild, never a wrong result — but
two sessions ALTERNATING family queries would evict each other's
persisted tables every call and repay the full rebuild each time
(amortization gone, not correctness). Serving N concurrent sessions
would need per-session keyed caches with an LRU bound; not built
because no supported entry point runs the family from two live
sessions at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from ed_housing_data_pipeline_spark.functions.text import word_shingles
from ed_housing_data_pipeline_spark.operators import similarity as sim
from ed_housing_data_pipeline_spark.operators import windows as windows_ops
from ed_housing_data_pipeline_spark.plans._base import t

N_HASHES = 8
BANDS = 4
SHINGLE_K = 3
LSH_MAX_BUCKET = 4096

_SHARED_SIG: dict[tuple[str, int, int], DataFrame] = {}
# incremental-index tempdir / manifest-pinned segment map / analyzed
# component relations per index — memoized at build/ingest so probe
# plan construction runs no job (owned here so eviction is one-stop)
_INCR_INDEX: dict[tuple[str, int, int], object] = {}
_INCR_PIN: dict[tuple[str, int, int], dict[str, list[int]]] = {}
_INCR_FRAMES: dict[tuple[str, int, int], tuple] = {}
# incremental ANN (IVF-PQ) index artifact — same memoization contract
# as the LSH index trio above (tempdir / committed pin map / analyzed
# pinned relation), keyed by sf_dir
_ANN_INDEX: dict[tuple[str], object] = {}
_ANN_PIN: dict[tuple[str], dict[str, list[int]]] = {}
_ANN_FRAMES: dict[tuple[str], tuple] = {}
_SHARED_BANDW: dict[tuple[str, str, int, int], int] = {}
# Session-shared verified near-dup PAIR tables (word-shingle / cosine
# families). The pair set is each family's expensive artifact (band
# self-join + Jaccard/cosine verify) and has three verbatim consumers
# (the pairs report, cluster assignment, survivor pick) — in production
# it is exactly the intermediate you would persist between the
# candidate stage and the dedup-drop stage. Persisted once per sf_dir
# (MEMORY_AND_DISK, orders of magnitude smaller than the corpus),
# evicted with the rest of the family caches, and bypassed under the
# audit flag so plan audits see the full candidate-generation graph,
# not an InMemoryRelation scan.
_SHARED_PAIRS: dict[tuple[str, str], DataFrame] = {}


def _audit() -> bool:
    """The plan-audit escape hatch, read at call time from its
    authoritative home — tests and scripts/plan_audit.py rebind
    ``queries_llm.AUDIT_LAZY_PLANS``, so a copy here would go stale."""
    from ed_housing_data_pipeline_spark.plans import queries_llm  # noqa: PLC0415

    return queries_llm.AUDIT_LAZY_PLANS


def _build_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = sim.scale_out(t(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id",
        "source",
        F.array_distinct(word_shingles("text", k=SHINGLE_K)).alias("_sh"),
    )
    return sim.with_minhash_signature(
        sh, "text", n_hashes=N_HASHES, shingles_col="_sh"
    )


def shared_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The family's shared ``(doc_id, source, _sh, mh_0..)`` frame,
    persisted on first use per sf_dir (MEMORY_AND_DISK). A cached frame
    is served only to the SESSION that built it — a DataFrame executes
    with its creating session's state, so a different caller session
    triggers a full family-cache rebuild instead of silently running
    under foreign confs (:func:`_session_mismatch`)."""
    if _audit():
        return _build_signatures(spark, sf_dir)
    key = (sf_dir, SHINGLE_K, N_HASHES)
    hit = _SHARED_SIG.get(key)
    if hit is not None and not _session_mismatch(hit, spark):
        return hit
    if hit is not None:
        # stale session: rebuild the SESSION-BOUND caches only. The
        # incremental index tempdir/pin are session-independent parquet
        # paths + segment lists — and a caller (the incremental probe,
        # an in-flight ingest) may already hold plans reading them, so
        # deleting the tempdir here would break those plans mid-query.
        _evict_session_bound()
    else:
        # evict OTHER keys only: evicting the current key would delete
        # an incremental-index tempdir another branch of this very
        # query may already hold paths into (e.g. index memoized under
        # a plan audit, signature cache still cold)
        _evict_shared(except_sf=sf_dir)
    sig = _build_signatures(spark, sf_dir)
    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    _SHARED_SIG[key] = sig
    return sig


def _session_mismatch(df: DataFrame, spark: SparkSession) -> bool:
    """True when a memoized DataFrame belongs to a different live
    session than the caller's (the memoized frame keeps its session
    object alive, so identity comparison is sound)."""
    return df.sparkSession is not spark


def _safe_unpersist(df: DataFrame) -> None:
    """Unpersist, tolerating a stopped SparkContext: after
    ``spark.stop()`` + a fresh ``getOrCreate()`` the stale DataFrame's
    context is dead and ``unpersist`` raises from the JVM — the block
    manager is gone with the context, so there is nothing left to free
    and the eviction must still complete."""
    try:
        df.unpersist()
    except Exception:  # noqa: BLE001 - dead context; nothing to free
        pass


# Session-memoized committed BASE artifacts for the streaming fixtures
# (r16, VERDICT #5 — the r15 _clone_base_index pattern shared): each
# cold-only streaming query used to rebuild an identical bootstrap
# index/view per run before draining its stream. The base is built
# ONCE per (sf_dir, tag) via the full production commit path; each run
# diverges from a filesystem copy of the committed artifacts
# (immutable segments + manifest pointers), and the streamed commits
# under test — fresh checkpoint, foreachBatch sink, manifest flips —
# still run the full production path on the copy. Content is
# deterministic, so final state and every result are identical to a
# fresh build.
_STREAM_BASE: dict[tuple[str, str], object] = {}


def clone_stream_base(sf_dir: str, tag: str, build, into: str) -> None:
    """Copy the (sf_dir, tag) base artifact into ``into``, building it
    first via ``build(base_root)`` if this session hasn't yet."""
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    key = (sf_dir, tag)
    base = _STREAM_BASE.get(key)
    if base is None:
        base = tempfile.TemporaryDirectory(prefix=f"stream_base_{tag}_")
        build(base.name)
        # memoize only after the build's last commit returned: a failed
        # build must not leave a half-written base served to every
        # later run (the tempdir finalizer sweeps the debris)
        _STREAM_BASE[key] = base
    shutil.copytree(base.name, into, dirs_exist_ok=True)


# Plan-memo dicts owned by OTHER modules (queries_search's
# _SEARCH_PLAN_MEMO) register here at import so every eviction path
# clears them too (r15 ADVICE #3: un-evicted entries keyed by dead
# tempdir roots accumulated across session restarts, each keeping its
# defunct SparkSession object alive). Registration avoids the circular
# import (those modules import _caches).
_EXTERNAL_PLAN_MEMOS: list[dict] = []


def register_plan_memo(memo: dict) -> None:
    _EXTERNAL_PLAN_MEMOS.append(memo)


def _evict_session_bound() -> None:
    """Drop only the caches holding session-bound DataFrames (shared
    signatures, shared pair tables, pinned index relations) — the
    stale-session path. Session-independent state (index tempdir,
    manifest pin, measured bucket widths) survives and is reusable by
    any session."""
    for k in list(_SHARED_SIG):
        _safe_unpersist(_SHARED_SIG.pop(k))
    for k in list(_SHARED_PAIRS):
        _safe_unpersist(_SHARED_PAIRS.pop(k))
    _INCR_FRAMES.clear()
    _ANN_FRAMES.clear()
    _PLAN_MEMO.clear()
    for memo in _EXTERNAL_PLAN_MEMOS:
        memo.clear()


def _evict_shared(except_sf: str | None = None) -> None:
    # every shared-cache key leads with sf_dir; eviction spares the
    # current sf_dir's entries across ALL the family caches
    for k in list(_SHARED_SIG):
        if except_sf is None or k[0] != except_sf:
            _safe_unpersist(_SHARED_SIG.pop(k))
    for k in list(_SHARED_BANDW):
        if except_sf is None or k[0] != except_sf:
            _SHARED_BANDW.pop(k)
    for k in list(_SHARED_PAIRS):
        if except_sf is None or k[0] != except_sf:
            _safe_unpersist(_SHARED_PAIRS.pop(k))
    for k in list(_INCR_INDEX):
        if except_sf is None or k[0] != except_sf:
            tmp = _INCR_INDEX.pop(k)
            # pin/frames FIRST: if cleanup() raises mid-rmtree, a stale
            # pin surviving here would alias a rebuilt index's identical
            # segment map and serve memoized plans over deleted paths
            _INCR_PIN.pop(k, None)
            _INCR_FRAMES.pop(k, None)
            tmp.cleanup()
    for k in list(_ANN_INDEX):
        if except_sf is None or k[0] != except_sf:
            tmp = _ANN_INDEX.pop(k)
            _ANN_PIN.pop(k, None)
            _ANN_FRAMES.pop(k, None)
            tmp.cleanup()
    for k in list(_STREAM_BASE):
        if except_sf is None or k[0] != except_sf:
            _STREAM_BASE.pop(k).cleanup()
    for k in list(_PLAN_MEMO):
        if except_sf is None or k[0] != except_sf:
            _PLAN_MEMO.pop(k)
    # external memos are keyed by index ROOT, not sf_dir, so a scoped
    # except_sf eviction cannot tell which entries to spare — clear
    # them all (they are pure plan caches; the next probe rebuilds)
    for memo in _EXTERNAL_PLAN_MEMOS:
        memo.clear()


def release_shared_caches() -> None:
    """Unpersist the shared signature and near-dup pair tables and drop
    the memoized incremental band index, quantile cut points, and
    bucket-width stat. Safe to call any time — including after a
    context restart (dead-context unpersists are tolerated); the next
    family query rebuilds."""
    _evict_shared(except_sf=None)
    windows_ops.clear_quantile_cache()


# Constructed-plan memo for deterministic probe queries over immutable
# session fixtures (r15 opt; generalizes queries_ann._FIXED_PLAN_MEMO):
# several probe queries spend 0.2-0.35s/call of pure DRIVER work —
# py4j expression building (large literal trees), plan analysis, and
# for the cluster family a gate-bounded edge collect — rebuilding a
# DataFrame that is a deterministic function of (sf_dir) plus a
# session fixture that never mutates after build. The memoized object
# is an ANALYZED PLAN: every run still executes it from parquet /
# the persisted family tables, so no results are ever cached. Bypassed
# under the audit flag and on session change; evicted with the family
# caches it may reference. Entries store (token, df): ``token`` is the
# caller-supplied fixture-version stamp (e.g. the incremental index's
# manifest pin) and a changed token rebuilds the plan — a probe over a
# MUTABLE fixture must pass one (r15 ADVICE #1: probe → ingest → probe
# in one session served the stale pre-ingest plan).
_PLAN_MEMO: dict[tuple[str, str], tuple[object, DataFrame]] = {}


def memo_plan(
    name: str, spark: SparkSession, sf_dir: str, build, token: object = None
) -> DataFrame:
    if _audit():
        return build()
    key = (sf_dir, name)
    hit = _PLAN_MEMO.get(key)
    if (
        hit is not None
        and hit[0] == token
        and not _session_mismatch(hit[1], spark)
    ):
        return hit[1]
    df = build()
    _PLAN_MEMO[key] = (token, df)
    return df


def _shared_pair_table(
    spark: SparkSession, sf_dir: str, family: str, build
) -> DataFrame:
    """Memoize+persist ``build()``'s pair DataFrame per (sf_dir,
    family), served only to the session that built it (see
    :func:`_session_mismatch`); see ``_SHARED_PAIRS``."""
    if _audit():
        return build()
    key = (sf_dir, family)
    hit = _SHARED_PAIRS.get(key)
    if hit is not None and not _session_mismatch(hit, spark):
        return hit
    if hit is not None:
        _evict_session_bound()  # see shared_signatures
    else:
        _evict_shared(except_sf=sf_dir)
    pairs = build().persist(StorageLevel.MEMORY_AND_DISK)
    _SHARED_PAIRS[key] = pairs
    return pairs


def _measured_bucket_guard(sf_dir: str, family: str, bands_builder) -> int | None:
    """``max_bucket_width`` for an LSH self-join family: the
    oversized-bucket salt-shard guard costs an extra aggregation+join
    per run, so the max band-bucket width is measured ONCE per session
    (one map-side-combined agg over the band table, amortized across
    the family like the signature table itself) and the guard is
    enabled only if any bucket actually exceeds the cap. Result-
    identical either way — salting only splits buckets wider than the
    cap, and when none exist the guard was a per-run no-op; this
    measure-first gate is also what keeps the engine aligned with the
    cap-free oracle SQL at tested scales. Plan audits skip the
    measurement (an action) and keep the guarded shape: that IS the
    unknown-corpus 100 TB plan.

    Known first-run cost: for families WITHOUT a persisted signature
    table (chargram), the measurement executes the builder's full
    shingle→minhash→band pipeline once and the returned query plan
    recomputes it — an extra narrow pass on the first call per session
    only. Accepted over persisting the chargram signatures: that
    projection is corpus-sized and single-consumer, so an unconditional
    persist would be the cache-accumulation anti-pattern (ADVICE r03)
    for a one-off saving."""
    if _audit():
        return LSH_MAX_BUCKET
    key = (sf_dir, family, SHINGLE_K, N_HASHES)
    w = _SHARED_BANDW.get(key)
    if w is None:
        w = (
            bands_builder()
            .groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("_bw"))
            .agg(F.max("_bw"))
            .collect()[0][0]
            or 0
        )
        _SHARED_BANDW[key] = w
    return None if w <= LSH_MAX_BUCKET else LSH_MAX_BUCKET


def _own_caches(build) -> DataFrame:
    """Run ``build(scope)`` under a :class:`sim.CacheScope`, eagerly
    materialize the (small) result via ``localCheckpoint``, and release
    every cache the scope collected before returning.

    The registered pair/dedup queries persist their shingle/fingerprint
    projections internally; without an owner those caches would outlive
    the query for the whole session (every harness/bench sweep
    accumulating them, leaning on LRU eviction — ADVICE r03). The
    checkpoint pins the result (pairs — orders of magnitude smaller
    than the projections) so the caches are releasable immediately."""
    with sim.CacheScope() as scope:
        out = build(scope)
        if _audit():
            # lazy: persists are marked but never materialized, so the
            # scope's release on exit is a no-op and the plan is real
            return out
        return out.localCheckpoint(eager=True)
