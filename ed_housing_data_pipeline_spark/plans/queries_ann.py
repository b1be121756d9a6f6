"""ANN query family: IVF-Flat and IVF-PQ (IVFADC) over the embeddings
table — moved out of plans/queries_llm.py (r7 VERDICT task #6: module
split; registration names and window membership unchanged).

Each trained query (k-means coarse quantizer, PQ codebook training) is
non-SQL-expressible and carries a rows-only driver check; its FIXED
twin replays the entire search half with seeded-literal constants on
both engines so cell assignment, multi-probe expansion, code
assignment, ADC summation, and top-k tie-breaks are all hash-checked
against DuckDB. Value-level pinning of the trained paths lives in
tests/test_operators_similarity.py (recall vs brute force, structural
invariants, quantization-noise-free exactness)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ed_housing_data_pipeline_spark.operators import similarity as sim
from ed_housing_data_pipeline_spark.plans._caches import (
    _ANN_FRAMES,
    _ANN_INDEX,
    _ANN_PIN,
    _audit,
    _session_mismatch,
)
from ed_housing_data_pipeline_spark.plans.queries_llm import EMB_DIM, emb_t
from ed_housing_data_pipeline_spark.plans.registry import register
from ed_housing_data_pipeline_spark.sources import lake

# Constructed-plan memo for the PURE fixed-model probe queries: their
# expression trees embed k·dim (+ m·k·sub) literals, so BUILDING the
# plan costs ~0.3s of giant-SQL-string parsing per call even after the
# single-parse rewrite. The queries are deterministic functions of
# (sf_dir) with no side effects, so steady-state serving reuses the
# analyzed DataFrame (the same plan-cache model a SQL service runs;
# bench documents amortized = family caches warm). Bypassed under the
# audit flag and on session change.
_FIXED_PLAN_MEMO: dict[tuple[str, str], DataFrame] = {}


def _memo_fixed_plan(
    name: str, spark: SparkSession, sf_dir: str, build
) -> DataFrame:
    if _audit():
        return build()
    key = (name, sf_dir)
    hit = _FIXED_PLAN_MEMO.get(key)
    if hit is not None and not _session_mismatch(hit, spark):
        return hit
    df = build()
    _FIXED_PLAN_MEMO[key] = df
    return df

KNN_ORACLE = """
SELECT q.vec_id AS q_id, e.vec_id AS nn_id,
       ROUND((list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) / NULLIF(sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))), 0)), 4) AS sim,
       CAST(row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY (list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) / NULLIF(sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))), 0)) DESC NULLS LAST,
                    e.vec_id ASC) AS BIGINT) AS rn
FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64) q
JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64) e ON e.vec_id <> q.vec_id
WHERE q.vec_id < 10
QUALIFY rn <= 3
"""


@register("embedding_knn_bruteforce", oracle=KNN_ORACLE)
def q_embedding_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 for 10 query vectors — broadcast queries, one
    corpus pass, no corpus shuffle. The ANN correctness baseline."""
    def _build() -> DataFrame:
        emb = emb_t(spark, sf_dir)
        out = sim.knn_bruteforce(
            queries=emb.filter(F.col("vec_id") < 10),
            corpus=emb,
            vec_col="embedding",
            id_col="vec_id",
            k=3,
        )
        return out.select(
            "q_id", "nn_id", F.round(F.col("sim"), 4).alias("sim"), "rn"
        )

    return _memo_fixed_plan("knn_bruteforce", spark, sf_dir, _build)


KNN_BLOCKED_ORACLE = """
SELECT q.vec_id AS q_id, e.vec_id AS nn_id,
       ROUND((list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) / NULLIF(sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))), 0)), 4) AS sim,
       CAST(row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY (list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) / NULLIF(sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))), 0)) DESC NULLS LAST,
                    e.vec_id ASC) AS BIGINT) AS rn
FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64) q
JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64) e ON e.label = q.label AND e.vec_id <> q.vec_id
WHERE q.vec_id < 20
QUALIFY rn <= 1
"""


@register("embedding_knn_blocked", oracle=KNN_BLOCKED_ORACLE)
def q_embedding_knn_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-blocked (IVF-style) nearest neighbor — equi-join on the
    block id, exact cosine within block. The 100 TB scale path: never
    a cartesian plan."""
    def _build() -> DataFrame:
        emb = emb_t(spark, sf_dir)
        out = sim.knn_within_block(
            emb,
            vec_col="embedding",
            id_col="vec_id",
            block_col="label",
            k=1,
            query_filter=F.col("q_id") < 20,
        )
        return out.select(
            "q_id", "nn_id", F.round(F.col("sim"), 4).alias("sim"), "rn"
        )

    return _memo_fixed_plan("knn_blocked", spark, sf_dir, _build)




# ------------------------------------------------- SRP-LSH bucketed ANN
# embeddings.parquet schema contract: fixed-width 64-float vectors —
# lets every cosine/dot unroll into codegen arithmetic (vectors.py)
SRP_PLANES = sim.srp_params(n_planes=4, dim=EMB_DIM, seed=42)


def _srp_bucket_sql() -> str:
    terms = []
    for i, plane in enumerate(SRP_PLANES):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"CASE WHEN list_dot_product(v, {lit}) > 0 THEN {2**i} ELSE 0 END"
        )
    return " + ".join(terms)


KNN_SRP_ORACLE = f"""
WITH b AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           CAST({_srp_bucket_sql()} AS BIGINT) AS bucket
    FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64) embeddings
)
SELECT q.vec_id AS q_id, e.vec_id AS nn_id,
       ROUND((list_dot_product(q.v, e.v) / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v)), 0)), 4) AS sim,
       CAST(row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY (list_dot_product(q.v, e.v) / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v)), 0)) DESC NULLS LAST, e.vec_id ASC)
         AS BIGINT) AS rn
FROM b q
JOIN b e ON e.bucket = q.bucket AND e.vec_id <> q.vec_id
WHERE q.vec_id < 20
QUALIFY rn <= 1
"""


@register("embedding_knn_srp", oracle=KNN_SRP_ORACLE)
def q_embedding_knn_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection LSH ANN: bucket by the sign pattern of
    4 seeded hyperplane projections, exact cosine within bucket — the
    data-independent LSH counterpart of the label-blocked (IVF-style)
    path. Equi-join on bucket id; never a cartesian plan."""
    def _build() -> DataFrame:
        emb = emb_t(spark, sf_dir)
        bucketed = emb.withColumn(
            "srp", sim.srp_bucket("embedding", SRP_PLANES)
        )
        out = sim.knn_within_block(
            bucketed,
            vec_col="embedding",
            id_col="vec_id",
            block_col="srp",
            k=1,
            query_filter=F.col("q_id") < 20,
        )
        return out.select(
            "q_id", "nn_id", F.round(F.col("sim"), 4).alias("sim"), "rn"
        )

    return _memo_fixed_plan("knn_srp", spark, sf_dir, _build)


# ------------------------------------------------- IVF-Flat ANN (e2e)
IVF_K = 8
IVF_NPROBE = 4


@register("embedding_knn_ivf", oracle=None)  # iterative k-means: no SQL twin
def q_embedding_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multi-probe IVF-Flat: train the coarse quantizer
    (k-means++ init, 2 Lloyd iterations, k=8) on the embedding column,
    invert the corpus on its nearest cell, then each query (vec_id <
    20, bounded → broadcast) probes its 4 nearest cells and takes
    exact cosine top-3 from those inverted lists. The iterative
    training loop is genuinely non-SQL-expressible, so this query
    carries no DuckDB twin and the driver records the weaker rows-only
    check — value-level correctness is pinned instead by two pytest
    harnesses (tests/test_operators_similarity.py):
    ``test_knn_ivf_recall_vs_bruteforce`` (recall@3 ≥ 0.7 vs the exact
    `embedding_knn_bruteforce` ground truth at sf0.01) and
    ``test_knn_ivf_cell_membership_invariant`` (every returned
    neighbor's cell is among the query's nprobe probed cells). Plan
    shape: small-k native argmin/probe expressions (stay in codegen),
    equi-join on the cell id, partitioned top-k window — never a
    cartesian."""
    emb = emb_t(spark, sf_dir)
    _blocked, cents = sim.kmeans_blocks(
        emb, vec_col="embedding", id_col="vec_id", k=IVF_K, iters=2
    )
    out = sim.knn_ivf(
        emb,
        vec_col="embedding",
        id_col="vec_id",
        cents=cents,
        k=3,
        nprobe=IVF_NPROBE,
        query_filter=F.col("vec_id") < 20,
    )
    return out.select(
        "q_id", "nn_id", F.round(F.col("sim"), 4).alias("sim"), F.col("rn").cast("bigint").alias("rn")
    )


# Fixed coarse quantizer for the oracle-checkable IVF twin: seeded
# gaussian centroids generated from the SAME constants on both sides
# (Spark literals and DuckDB SQL), so cell assignment + multi-probe +
# within-cell top-k are exactly replicable in ANSI SQL. 4×64 = 256
# literals — comfortably inside the native-expression budget.
IVF_FIXED_CENTS = sim.srp_params(n_planes=4, dim=64, seed=123)
IVF_FIXED_NPROBE = 2


def _ivf_fixed_oracle() -> str:
    structs = []
    for i, c in enumerate(IVF_FIXED_CENTS):
        lit = "[" + ", ".join(repr(x) for x in c) + "]"
        structs.append(f"struct_pack(d := list_distance(v, {lit}), i := {i})")
    sd = "list_sort([" + ", ".join(structs) + "])"
    return f"""
WITH b AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64) embeddings
),
a AS (
    SELECT vec_id, v, {sd} AS sd FROM b
),
cells AS (
    SELECT vec_id, v, sd[1].i AS cell,
           list_transform(sd[1:{IVF_FIXED_NPROBE}], s -> s.i) AS probes
    FROM a
)
SELECT q.vec_id AS q_id, e.vec_id AS nn_id,
       ROUND((list_dot_product(q.v, e.v) / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v)), 0)), 4) AS sim,
       CAST(row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY (list_dot_product(q.v, e.v) / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v)), 0)) DESC NULLS LAST, e.vec_id ASC)
         AS BIGINT) AS rn
FROM cells q
JOIN cells e ON list_contains(q.probes, e.cell) AND e.vec_id <> q.vec_id
WHERE q.vec_id < 20
QUALIFY rn <= 3
"""


@register("embedding_knn_ivf_fixed", oracle=_ivf_fixed_oracle())
def q_embedding_knn_ivf_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF-Flat search with a FIXED (seeded-literal) coarse
    quantizer — the oracle-checkable twin of ``embedding_knn_ivf``.
    The trained path's k-means loop is non-SQL-expressible, so its
    driver row is rows-only; this query pins the entire SEARCH half
    (cell assignment argmin, nprobe nearest-cell expansion, inverted-
    list equi-join, exact-cosine top-k with deterministic tie-breaks)
    against a DuckDB twin built from the same centroid constants.
    Ties in cell distance resolve to the lower cell index on both
    sides (strict-less argmin chain in Spark, struct sort (d, i) in
    DuckDB). Plan shape identical to the trained path: native fold
    expressions in codegen, equi-join on the cell id, partitioned
    top-k — never a cartesian."""
    def _build() -> DataFrame:
        emb = emb_t(spark, sf_dir)
        out = sim.knn_ivf(
            emb,
            vec_col="embedding",
            id_col="vec_id",
            cents=IVF_FIXED_CENTS,
            k=3,
            nprobe=IVF_FIXED_NPROBE,
            query_filter=F.col("vec_id") < 20,
        )
        return out.select(
            "q_id",
            "nn_id",
            F.round(F.col("sim"), 4).alias("sim"),
            F.col("rn").cast("bigint").alias("rn"),
        )

    return _memo_fixed_plan("knn_ivf_fixed", spark, sf_dir, _build)


# ------------------------------------------------- IVF-PQ ANN (IVFADC)
# Fixed PQ codebooks for the oracle-checkable twin: m=4 subspaces of 16
# dims, k=8 entries each, seeded gaussians scaled to the embedding
# column's magnitude (~N(0, 0.125²) — srp_params emits unit normals).
# 4·8·16 = 512 literals per expression, inside the single-F.expr parse
# budget; the SAME constants generate the DuckDB SQL.
PQ_M = 4
PQ_SUB = 16
PQ_K = 8
PQ_FIXED_CODEBOOKS = [
    [[0.125 * x for x in row] for row in sim.srp_params(PQ_K, PQ_SUB, seed=500 + m)]
    for m in range(PQ_M)
]
PQ_NPROBE = 2


def _ivfpq_fixed_oracle(
    cents: list[list[float]] = IVF_FIXED_CENTS,
    corpus_exclude_mod: int | None = None,
    vec_sql: str = "CAST(embedding AS DOUBLE[])",
    corpus_exclude_cell: int | None = None,
) -> str:
    # corpus_exclude_mod drops vec_id ≡ 0 (mod m) from the CORPUS side
    # of the self-join only — deleted vectors can still be queries
    # (queries are caller-side), they just never come back as
    # neighbors (the ANN delete contract); corpus_exclude_cell drops a
    # whole inverted list the same way (the delete_where-by-cell twin)
    corpus_cond = (
        f"AND e.vec_id % {corpus_exclude_mod} <> 0"
        if corpus_exclude_mod
        else ""
    )
    if corpus_exclude_cell is not None:
        corpus_cond += f" AND e.cell <> {corpus_exclude_cell}"
    def arr(vals: list[float]) -> str:
        return "CAST([" + ", ".join(repr(x) for x in vals) + "] AS DOUBLE[])"

    def ssq(vexpr: str, vals: list[float]) -> str:
        # term order and the (a-b)*(a-b) form mirror similarity._sql_ssq
        # exactly, so both engines run the same IEEE summation
        return (
            f"list_sum(list_transform(list_zip({vexpr}, {arr(vals)}), "
            "t -> (t[1] - t[2]) * (t[1] - t[2])))"
        )

    coarse = ", ".join(
        f"struct_pack(d := {ssq('v', c)}, i := {i})"
        for i, c in enumerate(cents)
    )
    code_cols = []
    lut_rows = []
    for mi, cb in enumerate(PQ_FIXED_CODEBOOKS):
        sv = f"v[{mi * PQ_SUB + 1}:{(mi + 1) * PQ_SUB}]"
        structs = ", ".join(
            f"struct_pack(d := {ssq(sv, entry)}, i := {j})"
            for j, entry in enumerate(cb)
        )
        code_cols.append(f"list_sort([{structs}])[1].i")
        lut_rows.append("[" + ", ".join(ssq(sv, entry) for entry in cb) + "]")
    adc = " + ".join(
        f"q.lut[{mi + 1}][e.codes[{mi + 1}] + 1]" for mi in range(PQ_M)
    )
    return f"""
WITH b AS (
    SELECT vec_id, {vec_sql} AS v
    FROM (SELECT * FROM embeddings
          WHERE embedding IS NOT NULL AND len(embedding) = 64) embeddings
),
a AS (
    SELECT vec_id, v, list_sort([{coarse}]) AS sd FROM b
),
enc AS (
    SELECT vec_id, sd[1].i AS cell,
           list_transform(sd[1:{PQ_NPROBE}], s -> s.i) AS probes,
           [{", ".join(code_cols)}] AS codes,
           [{", ".join(lut_rows)}] AS lut
    FROM a
)
SELECT q.vec_id AS q_id, e.vec_id AS nn_id,
       ROUND({adc}, 4) AS adc,
       CAST(row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY ({adc}) ASC NULLS LAST, e.vec_id ASC) AS BIGINT) AS rn
FROM enc q
JOIN enc e ON list_contains(q.probes, e.cell) AND e.vec_id <> q.vec_id
           {corpus_cond}
WHERE q.vec_id < 20
QUALIFY rn <= 3
"""


@register("embedding_knn_ivfpq_fixed", oracle=_ivfpq_fixed_oracle())
def q_embedding_knn_ivfpq_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF-PQ (IVFADC) search with FIXED coarse centroids
    and FIXED per-subspace codebooks — the oracle-checkable twin of
    ``embedding_knn_ivfpq``, pinning the entire search half against a
    DuckDB twin built from the same constants: coarse cell argmin,
    nprobe expansion, per-subspace code assignment (ties to the lower
    index on both engines), the per-query ADC lookup table, the m-term
    asymmetric-distance sum in subspace order, and the ascending-ADC
    top-k with deterministic tie-breaks. The corpus side of the join
    carries only (cell, 4 codes) — the compressed representation that
    makes PQ the 100 TB ANN path."""
    def _build() -> DataFrame:
        emb = emb_t(spark, sf_dir)
        out = sim.knn_ivf_pq(
            emb,
            vec_col="embedding",
            id_col="vec_id",
            cents=IVF_FIXED_CENTS,
            codebooks=PQ_FIXED_CODEBOOKS,
            k=3,
            nprobe=PQ_NPROBE,
            query_filter=F.col("vec_id") < 20,
        )
        return out.select(
            "q_id",
            "nn_id",
            F.round(F.col("adc"), 4).alias("adc"),
            F.col("rn").cast("bigint").alias("rn"),
        )

    return _memo_fixed_plan("knn_ivfpq_fixed", spark, sf_dir, _build)


# ------------------------------------------- incremental ANN index
# The persisted-index counterpart of the one-shot IVF-PQ searches: the
# corpus is NOT re-encoded per query wave. A bootstrap half commits the
# model + first segments, two ingest batches append O(batch) segments,
# and probes run against the manifest-pinned (id, cell, codes) scan —
# operators/ann_index over the same segmented-commit protocol as the
# LSH dedup index. Fixed (seeded-literal) model so the DuckDB twin can
# replay the entire search half; training composes by passing
# cents=None to bootstrap_ann_index (pinned by tests instead).
ANN_BATCH_MODULI = (1, 3)  # bootstrap = vec_id % 2 == 0; appends = % 4 ∈ {1, 3}
# The index's coarse quantizer: the seeded centroids scaled to the
# unit-norm embedding column (raw srp_params centroids have norm ~8 —
# one nearest-by-norm cell would swallow the whole corpus and the
# inverted lists / cell stats would be degenerate; at 0.05 the four
# cells split the sf0.01 corpus roughly 12%/15%/42%/30%).
ANN_CENTS = [[0.05 * x for x in c] for c in IVF_FIXED_CENTS]


def _build_base_ann_index(spark: SparkSession, root: str, emb: DataFrame):
    """The shared bootstrap + two-O(batch)-appends recipe of every
    incremental-ANN fixture (base, deleted, cell-purged, updated) —
    ONE copy of the corpus split, so all four fixtures provably index
    the same corpus. Returns the last committed pin map."""
    from ed_housing_data_pipeline_spark.operators import ann_index  # noqa: PLC0415

    ann_index.bootstrap_ann_index(
        spark,
        root,
        emb.filter(F.col("vec_id") % 2 == 0),
        vec_col="embedding",
        id_col="vec_id",
        cents=ANN_CENTS,
        codebooks=PQ_FIXED_CODEBOOKS,
    )
    pins = None
    for r in ANN_BATCH_MODULI:
        pins = ann_index.append_ann_batch(
            spark,
            root,
            emb.filter(F.col("vec_id") % 4 == r),
            vec_col="embedding",
            id_col="vec_id",
        )
    return pins


def _ensure_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The committed encoded corpus (id, cell, codes) of the
    incremental IVF-PQ index — built once per sf_dir per session:
    bootstrap on the even half (model pinned at blob version 1), then
    two O(batch) ingest appends folding in the odd half, so the pinned
    index holds every valid embedding exactly once. Probes read only
    through the last committed manifest. Under ``AUDIT_LAZY_PLANS``
    with no pre-built index (``ensure_ann_index_built``), the lazy
    encode expression stands in so plan construction runs no job."""
    from ed_housing_data_pipeline_spark.operators import (  # noqa: PLC0415
        ann_index,
    )

    key = (sf_dir,)
    tmp = _ANN_INDEX.get(key)
    if tmp is None:
        if _audit():
            return ann_index.encoded_frame(
                emb_t(spark, sf_dir),
                "embedding",
                "vec_id",
                ANN_CENTS,
                PQ_FIXED_CODEBOOKS,
            ).withColumnRenamed("id", "vec_id")
        import tempfile  # noqa: PLC0415

        tmp = tempfile.TemporaryDirectory(prefix="ann_ivfpq_index_")
        emb = emb_t(spark, sf_dir)
        pins = _build_base_ann_index(spark, tmp.name, emb)
        _ANN_PIN[key] = pins
        # memoize only after the last manifest commit (a failed build
        # must not leave a tempdir memo with no readable manifest)
        _ANN_INDEX[key] = tmp
    pins = _ANN_PIN.get(key)
    if pins is None:
        pins = lake.segment_pins(spark, tmp.name)
        _ANN_PIN[key] = pins
    token = tuple(sorted((c, tuple(s)) for c, s in pins.items()))
    frames = _ANN_FRAMES.get(key)
    if frames is None or frames[0] != token or _session_mismatch(frames[1][0], spark):
        frames = (
            token,
            tuple(
                lake.read_segments(spark, f"{tmp.name}/{comp}", pins[comp])
                for comp in (ann_index.VECTORS, ann_index.CELLCOUNTS)
            ),
        )
        _ANN_FRAMES[key] = frames
    return frames[1][0].withColumnRenamed("id", "vec_id")


def _ensure_ann_cellcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index's additive (cell, _n) count segments — the same
    build/memoize path as :func:`_ensure_ann_index`; lazy counts over
    the encode expression under the audit flag."""
    from ed_housing_data_pipeline_spark.operators import (  # noqa: PLC0415
        ann_index,
    )

    key = (sf_dir,)
    if _audit() and _ANN_INDEX.get(key) is None:
        enc = ann_index.encoded_frame(
            emb_t(spark, sf_dir),
            "embedding",
            "vec_id",
            ANN_CENTS,
            PQ_FIXED_CODEBOOKS,
        )
        return ann_index.cell_counts(enc)
    _ensure_ann_index(spark, sf_dir)
    return _ANN_FRAMES[key][1][1]


def _clone_base_ann_index(spark: SparkSession, sf_dir: str, prefix: str):
    """Tempdir preloaded with a byte-copy of the session's base
    incremental ANN index (r15 opt — same rationale as the text
    index's _clone_base_index): the three mutation fixtures (vector
    take-down, cell purge, revision upsert) each diverge from the SAME
    committed base by one commit but were rebuilding an identical
    bootstrap + 2 appends apiece. The base still builds ONCE via the
    production incremental path; the clone is a filesystem copy of
    immutable committed artifacts (model blob, segments, manifest),
    and the mutation commit under test runs the full production path
    on the copy. Final state — and every probe result — is identical
    to a fresh build."""
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    _ensure_ann_index(spark, sf_dir)
    base = _ANN_INDEX[(sf_dir,)].name
    tmp = tempfile.TemporaryDirectory(prefix=prefix)
    shutil.copytree(base, tmp.name, dirs_exist_ok=True)
    return tmp


def ensure_ann_index_built(spark: SparkSession, sf_dir: str) -> None:
    """Eagerly build the index snapshot — audit entry points call this
    BEFORE flipping AUDIT_LAZY_PLANS so audited probe plans show the
    production shape (manifest-pinned parquet scans) while the plan
    build itself stays job-free."""
    _ensure_ann_index(spark, sf_dir)


@register("embedding_incremental_ann", oracle=_ivfpq_fixed_oracle(ANN_CENTS))
def q_embedding_incremental_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC search against the PERSISTED incremental ANN index:
    bootstrap committed the model (coarse centroids + PQ codebooks,
    blob-pinned, immutable) and the even half of the corpus as
    (id, cell, codes) segments; two later ingests appended the odd
    half in O(batch) commits; probes equi-join the manifest-pinned
    compressed scan on the cell id and rank by asymmetric distance —
    raw corpus vectors are never touched at query time. Because the
    committed index holds exactly the valid corpus and the model is
    seeded-literal constants (``ANN_CENTS`` + the fixed codebooks),
    the DuckDB twin replays the whole search half, so the incremental
    path (bootstrap → append → append → probe) is fully hash-checked,
    not rows-only. Commit protocol + crash/race contracts are pinned
    by tests/test_ann_index.py."""
    def _build() -> DataFrame:
        corpus = _ensure_ann_index(spark, sf_dir)
        out = sim.knn_ivf_pq_encoded(
            corpus,
            emb_t(spark, sf_dir),
            vec_col="embedding",
            id_col="vec_id",
            cents=ANN_CENTS,
            codebooks=PQ_FIXED_CODEBOOKS,
            k=3,
            nprobe=PQ_NPROBE,
            cell_col="cell",
            codes_col="codes",
            query_filter=F.col("vec_id") < 20,
        )
        return out.select(
            "q_id",
            "nn_id",
            F.round(F.col("adc"), 4).alias("adc"),
            F.col("rn").cast("bigint").alias("rn"),
        )

    # the base index is immutable once built (mutating fixtures use
    # separate roots), so the probe plan memoizes like the fixed-model
    # searches — through _caches.memo_plan, which is EVICTED with the
    # family caches, so a released/cleaned index tempdir can never be
    # served through a stale memoized plan
    from ed_housing_data_pipeline_spark.plans import _caches  # noqa: PLC0415

    return _caches.memo_plan("embedding_incremental_ann", spark, sf_dir, _build)


ANN_DELETE_MOD = 41  # vec_id % 41 == 0 gets GDPR-deleted (~2.4%)

_ANN_DEL_INDEX: dict[tuple[str], object] = {}


def _ensure_deleted_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A second session index exercising the vector take-down: the
    same bootstrap + two appends, then ONE delete_ann_vectors commit
    tombstoning vec_id ≡ 0 (mod ANN_DELETE_MOD). Returns the LIVE
    corpus frame (read_ann_vectors anti-joins the tombstones). Audit
    mode serves the lazy encode expression over the live subset."""
    from ed_housing_data_pipeline_spark.operators import (  # noqa: PLC0415
        ann_index,
    )

    key = (sf_dir,)
    tmp = _ANN_DEL_INDEX.get(key)
    if tmp is None:
        if _audit():
            return ann_index.encoded_frame(
                emb_t(spark, sf_dir).filter(
                    F.col("vec_id") % ANN_DELETE_MOD != 0
                ),
                "embedding",
                "vec_id",
                ANN_CENTS,
                PQ_FIXED_CODEBOOKS,
            ).withColumnRenamed("id", "vec_id")
        tmp = _clone_base_ann_index(spark, sf_dir, "ann_ivfpq_del_")
        emb = emb_t(spark, sf_dir)
        # DataFrame-scale take-down: the delete set is a FILTER over
        # the embeddings table, never collected to the driver — the
        # tombstone segment and negative cellcounts are built by joins
        # (ann_index.delete_from; r9 VERDICT #1)
        dead = emb.filter(F.col("vec_id") % ANN_DELETE_MOD == 0).select(
            "vec_id"
        )
        ann_index.delete_from(spark, tmp.name, dead, id_col="vec_id")
        _ANN_DEL_INDEX[key] = tmp
    tmp = _ANN_DEL_INDEX[key]
    from ed_housing_data_pipeline_spark.operators import (  # noqa: PLC0415
        ann_index,
    )

    return ann_index.read_ann_vectors(spark, tmp.name).select(
        F.col("id").alias("vec_id"), "cell", "codes"
    )


@register(
    "embedding_ann_after_delete",
    oracle=_ivfpq_fixed_oracle(ANN_CENTS, corpus_exclude_mod=ANN_DELETE_MOD),
)
def q_embedding_ann_after_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC search AFTER a vector take-down (ann_index.
    delete_ann_vectors): ~2.4% of the corpus is logically deleted in
    one O(delete-set) commit — a tombstone segment the pinned scan
    anti-joins (broadcast) plus NEGATIVE additive cellcounts — and the
    probe must return exactly the DuckDB twin's search over the
    remaining corpus (deleted ids may still be QUERIES; they can never
    come back as neighbors). Physical removal rides the next
    compaction (pinned in tests/test_ann_index.py). The right-to-be-
    forgotten completion for a 100 TB embedding store, at ingest cost
    instead of an index rebuild."""
    corpus = _ensure_deleted_ann_index(spark, sf_dir)
    out = sim.knn_ivf_pq_encoded(
        corpus,
        emb_t(spark, sf_dir),
        vec_col="embedding",
        id_col="vec_id",
        cents=ANN_CENTS,
        codebooks=PQ_FIXED_CODEBOOKS,
        k=3,
        nprobe=PQ_NPROBE,
        cell_col="cell",
        codes_col="codes",
        query_filter=F.col("vec_id") < 20,
    )
    return out.select(
        "q_id",
        "nn_id",
        F.round(F.col("adc"), 4).alias("adc"),
        F.col("rn").cast("bigint").alias("rn"),
    )


ANN_PURGE_CELL = 1  # delete_where retires this whole inverted list (~15%)

_ANN_PURGE_INDEX: dict[tuple[str], object] = {}


def _ensure_cell_purged_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A session index exercising the PREDICATE take-down over the
    index's own rows: the same bootstrap + two appends, then ONE
    ann_index.delete_where commit tombstoning every live vector whose
    ``cell == ANN_PURGE_CELL`` — retiring a whole inverted list. The
    delete set derives from the pinned vectors per attempt (filter +
    distinct, persisted for the commit's duration, never collected).
    Returns the LIVE corpus frame."""
    from ed_housing_data_pipeline_spark.operators import (  # noqa: PLC0415
        ann_index,
    )

    key = (sf_dir,)
    tmp = _ANN_PURGE_INDEX.get(key)
    if tmp is None:
        if _audit():
            enc = ann_index.encoded_frame(
                emb_t(spark, sf_dir),
                "embedding",
                "vec_id",
                ANN_CENTS,
                PQ_FIXED_CODEBOOKS,
            )
            return enc.filter(F.col("cell") != ANN_PURGE_CELL).withColumnRenamed(
                "id", "vec_id"
            )
        tmp = _clone_base_ann_index(spark, sf_dir, "ann_ivfpq_purge_")
        ann_index.delete_where(
            spark, tmp.name, F.col("cell") == ANN_PURGE_CELL
        )
        _ANN_PURGE_INDEX[key] = tmp
    tmp = _ANN_PURGE_INDEX[key]
    from ed_housing_data_pipeline_spark.operators import (  # noqa: PLC0415
        ann_index,
    )

    return ann_index.read_ann_vectors(spark, tmp.name).select(
        F.col("id").alias("vec_id"), "cell", "codes"
    )


@register(
    "embedding_ann_after_cell_purge",
    oracle=_ivfpq_fixed_oracle(ANN_CENTS, corpus_exclude_cell=ANN_PURGE_CELL),
)
def q_embedding_ann_after_cell_purge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVFADC search AFTER a predicate take-down over the index's own
    rows (ann_index.delete_where): every vector in one coarse cell
    (~15% of the corpus — a poisoned/retired inverted list) is
    logically deleted in ONE commit whose delete set derives from the
    pinned (id, cell, codes) scan — filter + distinct, persisted for
    the commit's duration, liveness-folded under the attempt's
    manifest meta, never collected. The probe must return exactly the
    DuckDB twin's search over the corpus minus that cell (queries
    still PROBE the retired cell; nothing comes back from it). With
    doc_search_after_term_purge this gives delete_where an oracle row
    in both families that expose it."""
    corpus = _ensure_cell_purged_ann_index(spark, sf_dir)
    out = sim.knn_ivf_pq_encoded(
        corpus,
        emb_t(spark, sf_dir),
        vec_col="embedding",
        id_col="vec_id",
        cents=ANN_CENTS,
        codebooks=PQ_FIXED_CODEBOOKS,
        k=3,
        nprobe=PQ_NPROBE,
        cell_col="cell",
        codes_col="codes",
        query_filter=F.col("vec_id") < 20,
    )
    return out.select(
        "q_id",
        "nn_id",
        F.round(F.col("adc"), 4).alias("adc"),
        F.col("rn").cast("bigint").alias("rn"),
    )


ANN_UPDATE_MOD = 37  # vec_id % 37 == 0 gets re-embedded (~2.7%)
_ANN_UPDATE_VEC_SQL = (
    f"CASE WHEN vec_id % {ANN_UPDATE_MOD} = 0 "
    "THEN list_transform(CAST(embedding AS DOUBLE[]), x -> 0.5 - x) "
    "ELSE CAST(embedding AS DOUBLE[]) END"
)

_ANN_UPD_INDEX: dict[tuple[str], object] = {}


def _updated_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus with the revision wave applied: revised ids carry
    the deterministically transformed embedding (0.5 − x per element —
    exact IEEE on both engines since float→double widening is exact)."""
    return emb_t(spark, sf_dir).select(
        "vec_id",
        F.when(
            F.col("vec_id") % ANN_UPDATE_MOD == 0,
            F.transform("embedding", lambda x: F.lit(0.5) - x),
        )
        .otherwise(F.col("embedding").cast("array<double>"))
        .alias("embedding"),
    )


def _ensure_updated_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same build as _ensure_ann_index, then ONE upsert_ann_vectors
    commit re-embedding vec_id ≡ 0 (mod ANN_UPDATE_MOD) — watermark
    tombstones kill the prior vectors while the same-sequence fresh
    encodings serve, and cellcounts migrate by negative+positive rows.
    Returns the LIVE corpus frame."""
    from ed_housing_data_pipeline_spark.operators import (  # noqa: PLC0415
        ann_index,
    )

    key = (sf_dir,)
    tmp = _ANN_UPD_INDEX.get(key)
    if tmp is None:
        if _audit():
            return ann_index.encoded_frame(
                _updated_vectors(spark, sf_dir),
                "embedding",
                "vec_id",
                ANN_CENTS,
                PQ_FIXED_CODEBOOKS,
            ).withColumnRenamed("id", "vec_id")
        tmp = _clone_base_ann_index(spark, sf_dir, "ann_ivfpq_upd_")
        ann_index.upsert_ann_vectors(
            spark,
            tmp.name,
            _updated_vectors(spark, sf_dir).filter(
                F.col("vec_id") % ANN_UPDATE_MOD == 0
            ),
            vec_col="embedding",
            id_col="vec_id",
        )
        _ANN_UPD_INDEX[key] = tmp
    tmp = _ANN_UPD_INDEX[key]
    from ed_housing_data_pipeline_spark.operators import (  # noqa: PLC0415
        ann_index,
    )

    return ann_index.read_ann_vectors(spark, tmp.name).select(
        F.col("id").alias("vec_id"), "cell", "codes"
    )


@register(
    "embedding_ann_after_update",
    oracle=_ivfpq_fixed_oracle(ANN_CENTS, vec_sql=_ANN_UPDATE_VEC_SQL),
)
def q_embedding_ann_after_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC search AFTER a re-embedding wave (ann_index.
    upsert_ann_vectors — content changed, so ~2.7% of vectors get
    revised embeddings): one atomic commit writes the fresh
    (cell, codes) rows, a sequence watermark killing each id's prior
    vector, and migrated cellcounts; the probe must return exactly the
    DuckDB twin's IVFADC replay over the REVISED corpus — a stale
    vector still probe-able, a double-served id, or a count that
    failed to migrate between cells all hash-mismatch. Queries run
    from the revised vectors too (the re-crawled content is what gets
    searched). The model stays pinned; only the batch re-encoded."""
    corpus = _ensure_updated_ann_index(spark, sf_dir)
    out = sim.knn_ivf_pq_encoded(
        corpus,
        _updated_vectors(spark, sf_dir),
        vec_col="embedding",
        id_col="vec_id",
        cents=ANN_CENTS,
        codebooks=PQ_FIXED_CODEBOOKS,
        k=3,
        nprobe=PQ_NPROBE,
        cell_col="cell",
        codes_col="codes",
        query_filter=F.col("vec_id") < 20,
    )
    return out.select(
        "q_id",
        "nn_id",
        F.round(F.col("adc"), 4).alias("adc"),
        F.col("rn").cast("bigint").alias("rn"),
    )


def _ann_cellcounts_oracle() -> str:
    def arr(vals: list[float]) -> str:
        return "CAST([" + ", ".join(repr(x) for x in vals) + "] AS DOUBLE[])"

    def ssq(vexpr: str, vals: list[float]) -> str:
        return (
            f"list_sum(list_transform(list_zip({vexpr}, {arr(vals)}), "
            "t -> (t[1] - t[2]) * (t[1] - t[2])))"
        )

    coarse = ", ".join(
        f"struct_pack(d := {ssq('v', c)}, i := {i})"
        for i, c in enumerate(ANN_CENTS)
    )
    return f"""
WITH b AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
    FROM (SELECT * FROM embeddings
          WHERE embedding IS NOT NULL AND len(embedding) = 64) embeddings
),
a AS (
    SELECT list_sort([{coarse}])[1].i AS cell FROM b
)
SELECT CAST(cell AS INTEGER) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM a GROUP BY cell
"""


@register("embedding_ann_cellcounts", oracle=_ann_cellcounts_oracle())
def q_embedding_ann_cellcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-list widths of the incremental ANN index from its
    ADDITIVE count segments: each ingest appended its batch's O(batch)
    per-cell counts; the monitor sums count segments — never scanning
    ``vectors`` — and the result must equal a direct count over the
    corpus's cell assignment (what the DuckDB twin computes). This is
    the probe-planning/imbalance signal: a cell holding most of the
    corpus means probes degrade toward brute force (the re-train /
    cell-split trigger at scale)."""
    counts = _ensure_ann_cellcounts(spark, sf_dir)
    return counts.groupBy("cell").agg(
        F.sum("_n").cast("bigint").alias("n_vectors")
    ).select(F.col("cell").cast("int").alias("cell"), "n_vectors")


@register("embedding_knn_ivfpq", oracle=None)  # k-means training: no SQL twin
def q_embedding_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end trained IVF-PQ: k-means coarse quantizer (k=8, 2
    Lloyd iterations) plus per-subspace PQ codebooks (m=4, k=8, one
    independent k-means per 16-dim subspace — the classical PQ
    training decomposition), then IVFADC search. The training loops
    are non-SQL-expressible, so the driver records the weaker
    rows-only check; value-level behavior is pinned by the fixed twin
    above plus four pytest harnesses (tests/
    test_operators_similarity.py "IVF-PQ value-level pinning" block):
    the code-assignment invariant (argmin per subspace, ties to lower
    index, vs numpy), an exactness pin of the full IVFADC path with
    quantization noise removed (codebook-concat corpus → adc == exact
    squared-L2 and full-probe top-k == brute force), trained-path
    recall@3-in-top-10 vs brute force, and the cell-membership
    invariant (every neighbor's cell is among the query's probed
    cells); training contracts (empty-corpus raise, dim % m, shape)
    in test_pq_train_codebooks_contracts."""
    emb = emb_t(spark, sf_dir)
    _blocked, cents = sim.kmeans_blocks(
        emb, vec_col="embedding", id_col="vec_id", k=IVF_K, iters=2
    )
    books = sim.pq_train_codebooks(
        emb, vec_col="embedding", id_col="vec_id", m=PQ_M, k=PQ_K, iters=2
    )
    out = sim.knn_ivf_pq(
        emb,
        vec_col="embedding",
        id_col="vec_id",
        cents=cents,
        codebooks=books,
        k=3,
        nprobe=IVF_NPROBE,
        query_filter=F.col("vec_id") < 20,
    )
    return out.select(
        "q_id",
        "nn_id",
        F.round(F.col("adc"), 4).alias("adc"),
        F.col("rn").cast("bigint").alias("rn"),
    )


# --------------------------------------- trained-path recall gates
# The two trained queries above are rows-only at the driver (their
# k-means loops have no SQL twin). These companions close that gap
# with an ORACLE-CHECKABLE row (r10 VERDICT #7): run the trained
# search, compare its neighbor pairs against the exact brute-force
# ground truth computed in the same query, and return ONE row
# ``ok = CAST(recall >= bound AS BIGINT)`` whose oracle is the
# constant ``SELECT CAST(1 AS BIGINT) AS ok`` — a training or search
# regression flips the row to 0 and the driver records a hard value
# mismatch instead of a permanent ``no_oracle`` entry. Bounds match
# the pytest harnesses (tests/test_operators_similarity.py): IVF ≥0.7
# recall@3 (measured 0.9 at sf0.01; training is seed-deterministic),
# IVF-PQ ≥0.10 @3-in-top-10 (~5× chance on these clusterless uniform
# random vectors — m=4 codes over 64 dims retain little by design;
# the bound pins plumbing, not PQ's information limit on noise).
RECALL_OK_ORACLE = "SELECT CAST(1 AS BIGINT) AS ok"


def _recall_ok(pairs: DataFrame, truth: DataFrame, bound: float) -> DataFrame:
    """One row ``ok``: |pairs ∩ truth| / |pairs| >= bound. ONE pass
    over the trained pairs — a broadcast left join flags the hits
    (truth is k·|queries| rows, bounded by construction) and a single
    aggregate derives the ratio; no driver-side collect, no
    recomputation of the trained search."""
    flagged = pairs.join(
        F.broadcast(
            truth.select("q_id", "nn_id").withColumn("_hit", F.lit(1))
        ),
        ["q_id", "nn_id"],
        "left",
    )
    return flagged.agg(
        (F.count("_hit") / F.count(F.lit(1)) >= F.lit(bound))
        .cast("bigint")
        .alias("ok")
    )


@register("embedding_knn_ivf_recall", oracle=RECALL_OK_ORACLE)
def q_embedding_knn_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained IVF-Flat recall gate: the multi-probe trained search's
    top-3 (20 queries) against exact brute-force top-3, as one
    oracle-checkable boolean row (see RECALL_OK_ORACLE block)."""
    emb = emb_t(spark, sf_dir)
    trained = q_embedding_knn_ivf(spark, sf_dir).select("q_id", "nn_id")
    truth = sim.knn_bruteforce(
        queries=emb.filter(F.col("vec_id") < 20),
        corpus=emb,
        vec_col="embedding",
        id_col="vec_id",
        k=3,
    ).select("q_id", "nn_id")
    return _recall_ok(trained, truth, 0.7)


@register("embedding_knn_ivfpq_recall", oracle=RECALL_OK_ORACLE)
def q_embedding_knn_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained IVF-PQ recall gate: the IVFADC trained search's top-3
    (20 queries) against exact brute-force top-10, as one
    oracle-checkable boolean row (see RECALL_OK_ORACLE block)."""
    emb = emb_t(spark, sf_dir)
    trained = q_embedding_knn_ivfpq(spark, sf_dir).select("q_id", "nn_id")
    truth = sim.knn_bruteforce(
        queries=emb.filter(F.col("vec_id") < 20),
        corpus=emb,
        vec_col="embedding",
        id_col="vec_id",
        k=10,
    ).select("q_id", "nn_id")
    return _recall_ok(trained, truth, 0.10)


# ------------------------- clustered fixture: a gate that can FAIL on
# quality. The uniform-random embeddings table is PQ's information-
# theoretic worst case (the 0.10 bound above pins plumbing, not
# encoder quality — r11 VERDICT #5), so this fixture derives a
# DETERMINISTIC micro-clustered vector set from the SAME table with
# native exprs only: every run of 8 consecutive vec_ids shares a
# pseudo-random group center (3·sin(g·37 + d·61) per dimension) and
# the raw embedding value, scaled to ±0.05, perturbs it. Group sizes
# (≤8) fit inside true top-10, and inter-center distance² (~E 64·9)
# dwarfs both the noise and PQ's quantization error, so a HEALTHY
# pipeline's trained top-3 lands inside the true top-10 almost surely
# (recall pinned ≥ 0.8 — groups are WHY: with a few huge clusters the
# codes tie within the cluster and top-3 becomes an arbitrary draw
# from hundreds, which is chance, not quality), while a codebook
# assignment / ADC bug collapses the row to 0
# (tests/test_operators_similarity.py pins the flip with a
# deliberately-broken codebook).
CLUSTERED_GROUP = 8  # members per planted micro-group
CLUSTERED_NOISE = 0.05
CLUSTERED_CENTER = 3.0


def clustered_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding) with planted micro-group structure — one
    native-expr transform over the embeddings table, no new data."""
    emb = emb_t(spark, sf_dir)
    g = F.floor(F.col("vec_id") / CLUSTERED_GROUP).cast("double")
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: F.sin(g * F.lit(37.0) + i.cast("double") * F.lit(61.0))
            * F.lit(float(CLUSTERED_CENTER))
            + x * F.lit(float(CLUSTERED_NOISE)),
        ).alias("embedding"),
    )


def ivfpq_clustered_recall(
    spark: SparkSession,
    sf_dir: str,
    codebooks: list | None = None,
    bound: float = 0.8,
) -> DataFrame:
    """The clustered-fixture recall gate, with the codebooks injectable
    so the broken-codebook test proves the gate can fail (a gate no
    regression can flip is not a gate)."""
    vecs = clustered_emb(spark, sf_dir)
    _blocked, cents = sim.kmeans_blocks(
        vecs, vec_col="embedding", id_col="vec_id", k=IVF_K, iters=2
    )
    books = (
        codebooks
        if codebooks is not None
        else sim.pq_train_codebooks(
            vecs, vec_col="embedding", id_col="vec_id", m=PQ_M, k=PQ_K, iters=2
        )
    )
    trained = sim.knn_ivf_pq(
        vecs,
        vec_col="embedding",
        id_col="vec_id",
        cents=cents,
        codebooks=books,
        k=3,
        nprobe=IVF_NPROBE,
        query_filter=F.col("vec_id") < 20,
    ).select("q_id", "nn_id")
    truth = sim.knn_bruteforce(
        queries=vecs.filter(F.col("vec_id") < 20),
        corpus=vecs,
        vec_col="embedding",
        id_col="vec_id",
        k=10,
    ).select("q_id", "nn_id")
    return _recall_ok(trained, truth, bound)


@register("embedding_knn_ivfpq_recall_clustered", oracle=RECALL_OK_ORACLE)
def q_embedding_knn_ivfpq_recall_clustered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trained IVF-PQ QUALITY gate on the planted-cluster fixture:
    recall@3-in-top-10 >= 0.8 as one oracle-checkable boolean row (see
    the CLUSTERED_K block). Unlike embedding_knn_ivfpq_recall (whose
    0.10 bound on uniform noise pins plumbing only), a PQ encoder
    quality regression — bad codebook assignment, a residual/ADC bug —
    fails THIS row."""
    return ivfpq_clustered_recall(spark, sf_dir)
