"""Inverted-index text search over the documents corpus.

The index is a persisted segmented-lake artifact (operators/text_index
over sources/lake.append_segments): built once per (sf_dir) session in
three ingest commits — a bootstrap plus two O(batch) appends — and then
probed by every search. The oracle twins run the logically equivalent
token-list predicates directly on the raw documents table, so the whole
ingest → bloom-advertise → probe → intersect lifecycle is value-checked
end-to-end.

The reference has no search surface; this family is part of the
beyond-reference text battery (build brief: text analysis / retrieval
ops a 100 TB training-data pipeline needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ed_housing_data_pipeline_spark.operators import text_index
from ed_housing_data_pipeline_spark.plans._base import t, tokens_sql
from ed_housing_data_pipeline_spark.plans import _caches
from ed_housing_data_pipeline_spark.plans._caches import _session_mismatch
from ed_housing_data_pipeline_spark.plans.registry import register
from ed_housing_data_pipeline_spark.sources import lake

# Terms chosen to hit a few hundred docs at sf0.01 (non-degenerate
# conjunction) and a ~dozen docs for the phrase (adjacency is rare).
SEARCH_TERMS = ("vector", "stream")
PHRASE = ("table", "window")
RANK_TERMS = ("vector", "window", "spark")
RANK_K = 15

_TEXT_IDX_DIR: dict[tuple[str], object] = {}


def _audit() -> bool:
    from ed_housing_data_pipeline_spark.plans import queries_llm  # noqa: PLC0415

    return bool(queries_llm.AUDIT_LAZY_PLANS)


# Version-keyed probe-plan memo (r15 opt, guide §1/§7.3: the measured
# cost was ~0.5-0.8s of per-call DRIVER work — py4j round-trips for
# manifest parse + bloom sidecar loads + three spark.read.parquet
# calls — dwarfing the actual probe execution). The searches are
# deterministic functions of (sf_dir, manifest version): memoize the
# ANALYZED DataFrame and revalidate with ONE pointer-listing read
# (lake.committed_manifest_version) per call, so ANY index commit
# rebuilds the plan. Every probe still executes fully from parquet on
# every run — this caches a PLAN, never results, the same serving
# model as _FIXED_PLAN_MEMO (plans/queries_ann.py) and what a search
# service does between index commits. Bypassed under the audit flag
# and on session change.
_SEARCH_PLAN_MEMO: dict[tuple[str, str], tuple[int | None, DataFrame]] = {}
# evicted with the family caches (r15 ADVICE #3: stale-session entries
# keyed by dead tempdir roots accumulated unboundedly, each keeping its
# defunct SparkSession alive)
_caches.register_plan_memo(_SEARCH_PLAN_MEMO)


def _memo_search_plan(
    name: str, spark: SparkSession, root: str, build
) -> DataFrame:
    if _audit():
        return build()
    version = lake.committed_manifest_version(spark, root)
    key = (name, root)
    hit = _SEARCH_PLAN_MEMO.get(key)
    if (
        hit is not None
        and hit[0] == version
        and not _session_mismatch(hit[1], spark)
    ):
        return hit[1]
    # miss path: prune every entry bound to a dead/foreign session —
    # a restart creates NEW tempdir roots, so stale keys would never
    # be looked up (and so never individually invalidated) again
    for k in [
        k for k, v in _SEARCH_PLAN_MEMO.items()
        if _session_mismatch(v[1], spark)
    ]:
        _SEARCH_PLAN_MEMO.pop(k)
    df = build()
    _SEARCH_PLAN_MEMO[key] = (version, df)
    return df


def _build_3batch_index(spark: SparkSession, root: str, docs: DataFrame) -> None:
    """The shared incremental-build recipe of every search fixture:
    bootstrap on the first doc_id third, then two appended ingest
    batches — the production path, not a one-shot write. ONE copy of
    the range math (five fixtures build on it; a batching change must
    not be mirrored by hand)."""
    n = docs.agg(F.max("doc_id")).collect()[0][0] or 0
    third = max(1, (int(n) + 1) // 3)
    for i in range(3):
        lo, hi = i * third, ((i + 1) * third if i < 2 else int(n) + 1)
        part = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        if i == 0:
            text_index.bootstrap_text_index(spark, root, part)
        else:
            text_index.append_text_batch(spark, root, part)


def _ensure_text_index(spark: SparkSession, sf_dir: str) -> str:
    """The session's persisted inverted index of the documents corpus:
    bootstrap on the first doc_id third, two appended ingest batches
    for the rest — the production incremental-build path, not a
    one-shot write. Memoized only after the final manifest commit."""
    key = (sf_dir,)
    tmp = _TEXT_IDX_DIR.get(key)
    if tmp is None:
        import tempfile  # noqa: PLC0415

        tmp = tempfile.TemporaryDirectory(prefix="text_index_")
        docs = t(spark, sf_dir, "documents").select("doc_id", "text")
        _build_3batch_index(spark, tmp.name, docs)
        _TEXT_IDX_DIR[key] = tmp
    return _TEXT_IDX_DIR[key].name


def _clone_base_index(spark: SparkSession, sf_dir: str, prefix: str):
    """A tempdir preloaded with a byte-copy of the session's base
    3-batch index (r15 opt): the four mutation fixtures (point delete,
    bulk delete, predicate purge, revision upsert) all diverge from
    the SAME committed base by exactly one commit, yet each rebuilt an
    identical base — 3 ingest commits apiece, ~2/3 of every fixture's
    cold cost. The base is still built ONCE per session via the real
    incremental path (_build_3batch_index); the clone copies immutable
    committed segments + manifest pointers on the filesystem, and the
    mutation commit under test still runs the full production path on
    the copy. Final index state (and so every result) is identical to
    a fresh build — segment content is deterministic and nothing reads
    segment ids."""
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    base = _ensure_text_index(spark, sf_dir)
    tmp = tempfile.TemporaryDirectory(prefix=prefix)
    shutil.copytree(base, tmp.name, dirs_exist_ok=True)
    return tmp


def _audit_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job-free logical twin for the plan-shape audit: the posting
    expression over the raw corpus (what the persisted segments hold)."""
    return text_index.posting_table(t(spark, sf_dir, "documents"))


@register(
    "doc_inverted_search_and",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {tokens_sql("lower(text)")} AS ts FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(ts, x -> x = '{SEARCH_TERMS[0]}'))
              + len(list_filter(ts, x -> x = '{SEARCH_TERMS[1]}')) AS BIGINT)
             AS total_tf
    FROM tok
    WHERE list_contains(ts, '{SEARCH_TERMS[0]}')
      AND list_contains(ts, '{SEARCH_TERMS[1]}')
    """,
)
def q_doc_inverted_search_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND-of-terms) search through the persisted inverted
    index: bloom sidecars drop segments driver-side, ``term IN``
    reaches the pinned parquet scan, one groupBy(doc_id) intersects the
    posting lists (HAVING n_distinct_terms = k). total_tf — the summed
    term frequency — is the retrieval pre-rank score. The oracle runs
    the same conjunction as token-list predicates on the raw corpus, so
    a wrong posting row, a lost segment, or a false-negative bloom all
    hash-mismatch. At 100 TB the probe cost is O(matching postings),
    never a corpus scan."""
    if _audit() and _TEXT_IDX_DIR.get((sf_dir,)) is None:
        p = _audit_postings(spark, sf_dir).filter(
            F.col("term").isin(list(SEARCH_TERMS))
        )
        return (
            p.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("_k"),  # (term, doc) rows unique
                F.sum("tf").cast("bigint").alias("total_tf"),
            )
            .filter(F.col("_k") == len(set(SEARCH_TERMS)))
            .drop("_k")
        )
    root = _ensure_text_index(spark, sf_dir)
    return _memo_search_plan(
        "search_and", spark, root,
        lambda: text_index.search_all_terms(spark, root, SEARCH_TERMS),
    )


@register(
    "doc_inverted_phrase",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {tokens_sql("lower(text)")} AS ts FROM documents
    ), occ AS (
      SELECT doc_id,
             CAST(CASE WHEN len(ts) >= 2 THEN
               len(list_filter(generate_series(1, len(ts) - 1),
                               i -> ts[i] = '{PHRASE[0]}' AND ts[i+1] = '{PHRASE[1]}'))
             ELSE 0 END AS BIGINT) AS n_occ
      FROM tok
    )
    SELECT doc_id, n_occ FROM occ WHERE n_occ > 0
    """,
)
def q_doc_inverted_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search ("{PHRASE[0]} {PHRASE[1]}", adjacent
    tokens) through the persisted index: doc_id equi-join of the two
    terms' posting lists, occurrence count = |shift(positions_1) ∩
    positions_2| via array_intersect — no explode, no text re-scan.
    The oracle counts the same adjacencies positionally on the raw
    token lists. This is the classic positional-inverted-index plan:
    at scale both join sides are the filtered posting lists (tiny
    relative to the corpus), and position arrays stay packed."""
    if _audit() and _TEXT_IDX_DIR.get((sf_dir,)) is None:
        p = _audit_postings(spark, sf_dir)
        p1 = p.filter(F.col("term") == PHRASE[0]).select(
            "doc_id", F.col("positions").alias("_p1")
        )
        p2 = p.filter(F.col("term") == PHRASE[1]).select(
            "doc_id", F.col("positions").alias("_p2")
        )
        n_occ = F.size(
            F.array_intersect(
                F.transform("_p1", lambda x: x + F.lit(1)), "_p2"
            )
        ).cast("bigint")
        return (
            p1.join(p2, "doc_id")
            .select("doc_id", n_occ.alias("n_occ"))
            .filter(F.col("n_occ") > 0)
        )
    root = _ensure_text_index(spark, sf_dir)
    return _memo_search_plan(
        "phrase", spark, root,
        lambda: text_index.search_phrase(spark, root, *PHRASE),
    )


@register(
    "doc_inverted_tfidf_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {tokens_sql("lower(text)")} AS ts FROM documents
    ), n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
    ), tf AS (
      SELECT doc_id, term, len(list_filter(ts, x -> x = term)) AS tf
      FROM tok CROSS JOIN
        (VALUES {", ".join(f"('{w}')" for w in RANK_TERMS)}) AS q(term)
    ), df AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
      FROM tf WHERE tf > 0 GROUP BY term
    )
    SELECT doc_id,
           ROUND(SUM(tf.tf * ln((SELECT n_docs FROM n) / df.df)), 4) AS score
    FROM tf JOIN df USING (term)
    WHERE tf.tf > 0
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT {RANK_K}
    """,
)
def q_doc_inverted_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-ranked retrieval through the persisted index
    (operators/text_index.search_ranked): disjunctive match, score =
    sum(tf × ln(N/df)). The inputs the ranker needs beyond postings
    are maintained INCREMENTALLY by the index commits — per-term df as
    additive termstats segments (sum over segments = corpus df because
    each doc lives in one batch), corpus size N in the manifest meta
    (flipped atomically with the data, read back with no job) — so
    serving cost is O(matched postings + probe-term stats), never a
    corpus or index pass. The oracle recomputes tf/df/N relationally
    on the raw table; top-k is cut on the deterministic (score DESC,
    doc_id ASC) total order on both engines."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from ed_housing_data_pipeline_spark.operators import text_index  # noqa: PLC0415

    if _audit() and _TEXT_IDX_DIR.get((sf_dir,)) is None:
        docs = t(spark, sf_dir, "documents")
        p = _audit_postings(spark, sf_dir).filter(
            F.col("term").isin(list(RANK_TERMS))
        )
        n = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
        stats = (
            p.groupBy("term")
            .agg(F.count(F.lit(1)).cast("double").alias("_df"))
            .crossJoin(F.broadcast(n))
            .withColumn("_idf", F.log(F.col("_n") / F.col("_df")))
        )
        return (
            p.join(F.broadcast(stats.select("term", "_idf")), "term")
            .groupBy("doc_id")
            .agg(F.round(F.sum(F.col("tf") * F.col("_idf")), 4).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(RANK_K)
        )
    root = _ensure_text_index(spark, sf_dir)
    return _memo_search_plan(
        "tfidf", spark, root,
        lambda: text_index.search_ranked(spark, root, RANK_TERMS, k=RANK_K),
    )


def _bm25_oracle(where: str = "", docs_sql: str = "documents") -> str:
    from ed_housing_data_pipeline_spark.operators.text_index import (  # noqa: PLC0415
        BM25_B,
        BM25_K1,
    )

    k1, b = BM25_K1, BM25_B
    return f"""
    WITH tok AS (
      SELECT doc_id, {tokens_sql("lower(text)")} AS ts FROM {docs_sql} {where}
    ), n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(len(ts)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM tok
    ), tf AS (
      SELECT doc_id, term,
             len(list_filter(ts, x -> x = term)) AS tf,
             CAST(len(ts) AS DOUBLE) AS dl
      FROM tok CROSS JOIN
        (VALUES {", ".join(f"('{w}')" for w in RANK_TERMS)}) AS q(term)
    ), df AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
      FROM tf WHERE tf > 0 GROUP BY term
    )
    SELECT doc_id,
           ROUND(SUM(
             ln(1.0 + ((SELECT n_docs FROM n) - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * {k1 + 1.0!r}
             / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * tf.dl
                                  / (SELECT avgdl FROM n)))
           ), 4) AS score
    FROM tf JOIN df USING (term)
    WHERE tf.tf > 0
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT {RANK_K}
    """


@register("doc_inverted_bm25_topk", oracle=_bm25_oracle())
def q_doc_inverted_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked retrieval through the persisted index
    (operators/text_index.search_bm25) — the production ranking
    function, with EVERY corpus-level input served from incrementally
    maintained index state: df from additive termstats segments, dl
    from the per-batch doclens segments, N and avgdl from the manifest
    meta (total token count accumulates per commit). The oracle
    recomputes the Robertson-Sparck-Jones idf and the length
    normalization relationally; constants are repr-formatted into both
    engines so the doubles are bit-identical. Same deterministic
    (score DESC, doc_id ASC) top-k cut as the tf-idf twin."""
    from ed_housing_data_pipeline_spark.operators import text_index  # noqa: PLC0415
    from ed_housing_data_pipeline_spark.operators.text_index import (  # noqa: PLC0415
        BM25_B,
        BM25_K1,
    )

    if _audit() and _TEXT_IDX_DIR.get((sf_dir,)) is None:
        from ed_housing_data_pipeline_spark.functions.text import (  # noqa: PLC0415
            token_count,
        )

        docs = t(spark, sf_dir, "documents")
        p = _audit_postings(spark, sf_dir).filter(
            F.col("term").isin(list(RANK_TERMS))
        )
        n = docs.agg(
            F.count(F.lit(1)).cast("double").alias("_n"),
            F.coalesce(F.sum(token_count(F.col("text"))), F.lit(0))
            .cast("double")
            .alias("_tot"),
        )
        stats = (
            p.groupBy("term")
            .agg(F.count(F.lit(1)).cast("double").alias("_df"))
            .crossJoin(F.broadcast(n))
            .withColumn(
                "_idf",
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("_df") + F.lit(0.5))
                    / (F.col("_df") + F.lit(0.5))
                ),
            )
            .withColumn("_avgdl", F.col("_tot") / F.col("_n"))
        )
        lens = _audit_postings(spark, sf_dir).groupBy("doc_id").agg(
            F.sum("tf").cast("bigint").alias("dl")
        )
        norm = F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("_avgdl")
        )
        contrib = F.col("_idf") * (
            F.col("tf") * F.lit(BM25_K1 + 1.0) / (F.col("tf") + norm)
        )
        return (
            p.join(F.broadcast(stats.select("term", "_idf", "_avgdl")), "term")
            .join(lens, "doc_id")
            .groupBy("doc_id")
            .agg(F.round(F.sum(contrib), 4).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(RANK_K)
        )
    root = _ensure_text_index(spark, sf_dir)
    return _memo_search_plan(
        "bm25", spark, root,
        lambda: text_index.search_bm25(spark, root, RANK_TERMS, k=RANK_K),
    )


DELETE_MOD = 97  # docs with doc_id % 97 == 0 are GDPR-deleted (~1%)

_TEXT_IDX_DEL_DIR: dict[tuple[str], object] = {}


def _ensure_deleted_text_index(spark: SparkSession, sf_dir: str) -> str:
    """A second session index exercising the take-down lifecycle: the
    same 3-batch incremental build, then ONE delete_docs commit
    tombstoning every doc_id ≡ 0 (mod DELETE_MOD) — tombstone segment,
    negative termstats, adjusted n_docs/avgdl meta, one manifest flip.
    Kept separate from _ensure_text_index so the no-delete queries'
    results stay byte-stable."""
    key = (sf_dir,)
    tmp = _TEXT_IDX_DEL_DIR.get(key)
    if tmp is None:
        tmp = _clone_base_index(spark, sf_dir, "text_index_del_")
        docs = t(spark, sf_dir, "documents").select("doc_id", "text")
        dead = [
            r.doc_id
            for r in docs.filter(F.col("doc_id") % DELETE_MOD == 0)
            .select("doc_id")
            .collect()
        ]
        text_index.delete_docs(spark, tmp.name, dead)
        _TEXT_IDX_DEL_DIR[key] = tmp
    return _TEXT_IDX_DEL_DIR[key].name


@register(
    "doc_search_after_delete",
    oracle=_bm25_oracle(where=f"WHERE doc_id % {DELETE_MOD} <> 0"),
)
def q_doc_search_after_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval AFTER a GDPR take-down (text_index.delete_docs):
    ~1% of the corpus (doc_id ≡ 0 mod 97) is logically deleted in one
    O(delete-set) commit — a tombstone segment the postings scan
    anti-joins (broadcast), NEGATIVE additive termstats rows (corpus
    df stays exact without rewriting stats segments), and adjusted
    N/avgdl meta counters. The oracle recomputes BM25 over the corpus
    minus the deleted ids, so a stale df, an unadjusted N, or a
    tombstone miss on any of the k posting lists all hash-mismatch.
    Physical removal rides the next compaction (pinned invariant in
    tests/test_text_index.py); at 100 TB the take-down itself stays
    O(delete-set + one pruned postings pass), never a corpus rebuild."""
    from ed_housing_data_pipeline_spark.operators import text_index  # noqa: PLC0415

    if _audit() and _TEXT_IDX_DEL_DIR.get((sf_dir,)) is None:
        from ed_housing_data_pipeline_spark.operators.text_index import (  # noqa: PLC0415
            BM25_B,
            BM25_K1,
        )
        from ed_housing_data_pipeline_spark.functions.text import (  # noqa: PLC0415
            token_count,
        )

        docs = t(spark, sf_dir, "documents").filter(
            F.col("doc_id") % DELETE_MOD != 0
        )
        p = text_index.posting_table(docs).filter(
            F.col("term").isin(list(RANK_TERMS))
        )
        n = docs.agg(
            F.count(F.lit(1)).cast("double").alias("_n"),
            F.coalesce(F.sum(token_count(F.col("text"))), F.lit(0))
            .cast("double")
            .alias("_tot"),
        )
        stats = (
            p.groupBy("term")
            .agg(F.count(F.lit(1)).cast("double").alias("_df"))
            .crossJoin(F.broadcast(n))
            .withColumn(
                "_idf",
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("_df") + F.lit(0.5))
                    / (F.col("_df") + F.lit(0.5))
                ),
            )
            .withColumn("_avgdl", F.col("_tot") / F.col("_n"))
        )
        lens = text_index.posting_table(docs).groupBy("doc_id").agg(
            F.sum("tf").cast("bigint").alias("dl")
        )
        norm = F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("_avgdl")
        )
        contrib = F.col("_idf") * (
            F.col("tf") * F.lit(BM25_K1 + 1.0) / (F.col("tf") + norm)
        )
        return (
            p.join(F.broadcast(stats.select("term", "_idf", "_avgdl")), "term")
            .join(lens, "doc_id")
            .groupBy("doc_id")
            .agg(F.round(F.sum(contrib), 4).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(RANK_K)
        )
    root = _ensure_deleted_text_index(spark, sf_dir)
    return text_index.search_bm25(spark, root, RANK_TERMS, k=RANK_K)


@register(
    "doc_index_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {tokens_sql("lower(text)")} AS ts FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(len(ts)), 0) AS BIGINT) AS total_tokens
    FROM tok
    """,
)
def q_doc_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index's manifest-meta corpus counters as a queryable 1-row
    frame — N and total token count are the BM25/tf-idf idf/avgdl
    inputs, maintained ADDITIVELY across every ingest commit (and
    adjusted by deletes), never recomputed from the corpus. The oracle
    recomputes both from the raw documents table, so any drift in the
    read-modify-write meta protocol (a lost update under concurrent
    commits, a missed zero-token doc, a double-counted replay) is a
    value mismatch, not an invisible bias in every ranked search.
    Driver-side in production (a filesystem read); expressed as a tiny
    Spark frame here so the driver can hash it."""
    from ed_housing_data_pipeline_spark.functions.text import (  # noqa: PLC0415
        token_count,
    )
    from ed_housing_data_pipeline_spark.sources import lake  # noqa: PLC0415

    if _audit() and _TEXT_IDX_DIR.get((sf_dir,)) is None:
        docs = t(spark, sf_dir, "documents")
        return docs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum(token_count(F.lower(F.col("text")))), F.lit(0))
            .cast("bigint")
            .alias("total_tokens"),
        )
    root = _ensure_text_index(spark, sf_dir)
    meta = lake.segment_meta(spark, root)
    return spark.createDataFrame(
        [(int(meta.get("n_docs", 0)), int(meta.get("total_tokens", 0)))],
        "n_docs bigint, total_tokens bigint",
    )


def _audit_bm25_over(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Job-free logical BM25 twin over an arbitrary docs frame — the
    plan-shape audit path shared by the mutation-lifecycle queries."""
    from ed_housing_data_pipeline_spark.operators.text_index import (  # noqa: PLC0415
        BM25_B,
        BM25_K1,
    )
    from ed_housing_data_pipeline_spark.functions.text import (  # noqa: PLC0415
        token_count,
    )

    p = text_index.posting_table(docs).filter(
        F.col("term").isin(list(RANK_TERMS))
    )
    n = docs.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.coalesce(F.sum(token_count(F.col("text"))), F.lit(0))
        .cast("double")
        .alias("_tot"),
    )
    stats = (
        p.groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("_df"))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
            ),
        )
        .withColumn("_avgdl", F.col("_tot") / F.col("_n"))
    )
    lens = text_index.posting_table(docs).groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("dl")
    )
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("_avgdl")
    )
    contrib = F.col("_idf") * (
        F.col("tf") * F.lit(BM25_K1 + 1.0) / (F.col("tf") + norm)
    )
    return (
        p.join(F.broadcast(stats.select("term", "_idf", "_avgdl")), "term")
        .join(lens, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(RANK_K)
    )


# "delete every document from these sources" — the bulk-take-down
# shape whose delete set is a FILTER over the corpus, not an id list
BULK_DELETE_SOURCES = ("src3", "src7")

_TEXT_IDX_BULKDEL_DIR: dict[tuple[str], object] = {}


def _ensure_bulk_deleted_text_index(spark: SparkSession, sf_dir: str) -> str:
    """A session index exercising the DATAFRAME-scale take-down: the
    3-batch incremental build, then ONE text_index.delete_from commit
    whose delete set is ``documents WHERE source IN BULK_DELETE_
    SOURCES`` — a DataFrame filter end to end. No ``.collect()`` of
    ids anywhere: the tombstone segment is written FROM the frame and
    the negative termstats come from semi-joining the pinned postings
    against it (the 100 TB shape, where "delete source X" is millions
    of ids)."""
    key = (sf_dir,)
    tmp = _TEXT_IDX_BULKDEL_DIR.get(key)
    if tmp is None:
        tmp = _clone_base_index(spark, sf_dir, "text_index_bulkdel_")
        dead = (
            t(spark, sf_dir, "documents")
            .filter(F.col("source").isin(*BULK_DELETE_SOURCES))
            .select("doc_id")
        )
        text_index.delete_from(spark, tmp.name, dead)
        _TEXT_IDX_BULKDEL_DIR[key] = tmp
    return _TEXT_IDX_BULKDEL_DIR[key].name


@register(
    "doc_search_after_bulk_delete",
    oracle=_bm25_oracle(
        where="WHERE source NOT IN ("
        + ", ".join(f"'{s}'" for s in BULK_DELETE_SOURCES)
        + ")"
    ),
)
def q_doc_search_after_bulk_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval AFTER a DataFrame-scale take-down
    (text_index.delete_from): every document from two crawl sources
    (~10% of the corpus) is logically deleted in ONE commit whose
    delete set is a FILTER over the documents table — the ids never
    materialize on the driver. The tombstone segment is a select over
    the filter frame, the negative termstats/doclens deltas come from
    joins against it, and n_docs/avgdl/n_tombstones meta adjust under
    the same expected_base flip. The oracle recomputes BM25 over the
    corpus minus those sources, so a missed tombstone, a stale df, or
    an unadjusted N all hash-mismatch. At 100 TB this is the "delete
    source X" shape: O(delete-set + one pruned postings pass) as a
    distributed plan, never a driver id list (r9 VERDICT #1)."""
    from ed_housing_data_pipeline_spark.operators import text_index  # noqa: PLC0415

    if _audit() and _TEXT_IDX_BULKDEL_DIR.get((sf_dir,)) is None:
        docs = t(spark, sf_dir, "documents").filter(
            ~F.col("source").isin(*BULK_DELETE_SOURCES)
        )
        return _audit_bm25_over(spark, docs.select("doc_id", "text"))
    root = _ensure_bulk_deleted_text_index(spark, sf_dir)
    return text_index.search_bm25(spark, root, RANK_TERMS, k=RANK_K)


# "purge every document containing this term" — the predicate
# take-down (delete_where) whose delete set derives from the index's
# OWN posting rows (a leaked token, a poisoned marker)
PURGE_TERM = "dup"

_TEXT_IDX_PURGE_DIR: dict[tuple[str], object] = {}


def _ensure_term_purged_text_index(spark: SparkSession, sf_dir: str) -> str:
    """A session index exercising the PREDICATE take-down: the 3-batch
    incremental build, then ONE text_index.delete_where commit whose
    delete set is every live document matching ``term == PURGE_TERM``
    — derived from the pinned postings per attempt (filter + distinct,
    persisted for the commit's duration, never collected)."""
    key = (sf_dir,)
    tmp = _TEXT_IDX_PURGE_DIR.get(key)
    if tmp is None:
        tmp = _clone_base_index(spark, sf_dir, "text_index_purge_")
        text_index.delete_where(spark, tmp.name, F.col("term") == PURGE_TERM)
        _TEXT_IDX_PURGE_DIR[key] = tmp
    return _TEXT_IDX_PURGE_DIR[key].name


@register(
    "doc_search_after_term_purge",
    oracle=_bm25_oracle(
        where=(
            "WHERE NOT list_contains("
            + tokens_sql("lower(text)")
            + f", '{PURGE_TERM}')"
        )
    ),
)
def q_doc_search_after_term_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval AFTER a PREDICATE take-down
    (text_index.delete_where): every document whose postings match
    ``term == PURGE_TERM`` (~5% of the corpus) is logically deleted in
    ONE commit — the delete set derives from the index's OWN pinned
    posting rows (the leaked-token / poisoned-marker shape, where the
    corpus table can't express the predicate), computed once per
    attempt, persisted for the commit's duration, liveness-folded
    under the attempt's manifest meta, never collected. The oracle
    recomputes BM25 over the documents whose whitespace tokens do NOT
    contain the term, so a missed tombstone, a stale negative df, or
    an unadjusted N/avgdl all hash-mismatch. Closes the one engine
    mutation verb (delete_where) that had pytest-only coverage."""
    from ed_housing_data_pipeline_spark.functions.text import tokens  # noqa: PLC0415

    if _audit() and _TEXT_IDX_PURGE_DIR.get((sf_dir,)) is None:
        docs = t(spark, sf_dir, "documents").filter(
            ~F.array_contains(
                tokens(F.lower(F.col("text"))), F.lit(PURGE_TERM)
            )
        )
        return _audit_bm25_over(spark, docs.select("doc_id", "text"))
    root = _ensure_term_purged_text_index(spark, sf_dir)
    return text_index.search_bm25(spark, root, RANK_TERMS, k=RANK_K)


UPDATE_MOD = 89  # docs with doc_id % 89 == 0 get a content revision
UPDATE_SUFFIX = " zzupdated zzupdated"

_TEXT_IDX_UPD_DIR: dict[tuple[str], object] = {}


def _updated_docs_sql() -> str:
    return (
        "(SELECT doc_id, CASE WHEN doc_id % "
        f"{UPDATE_MOD} = 0 THEN text || '{UPDATE_SUFFIX}' ELSE text END "
        "AS text FROM documents) d"
    )


def _updated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % UPDATE_MOD == 0,
            F.concat(F.col("text"), F.lit(UPDATE_SUFFIX)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _ensure_updated_text_index(spark: SparkSession, sf_dir: str) -> str:
    """A third session index exercising the REVISION lifecycle: the
    3-batch incremental build, then ONE upsert_text_batch commit
    replacing every doc_id ≡ 0 (mod UPDATE_MOD) with revised content
    (original text + a marker suffix) — tombstone watermarks, negative
    stats for the old revisions, positive stats and fresh postings for
    the new, adjusted avgdl, all in one manifest flip."""
    key = (sf_dir,)
    tmp = _TEXT_IDX_UPD_DIR.get(key)
    if tmp is None:
        tmp = _clone_base_index(spark, sf_dir, "text_index_upd_")
        revised = _updated_docs(spark, sf_dir).filter(
            F.col("doc_id") % UPDATE_MOD == 0
        )
        text_index.upsert_text_batch(spark, tmp.name, revised)
        _TEXT_IDX_UPD_DIR[key] = tmp
    return _TEXT_IDX_UPD_DIR[key].name


@register(
    "doc_search_after_update",
    oracle=_bm25_oracle(docs_sql=_updated_docs_sql()),
)
def q_doc_search_after_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval AFTER a document REVISION wave (text_index.
    upsert_text_batch): ~1% of the corpus gets re-crawled content in
    ONE atomic commit — per revised doc, a sequence watermark kills
    the prior rows while the fresh postings/doclens (stamped with the
    same sequence) serve, negative+positive termstats keep corpus df
    exact for both the vanished and the arriving terms, and N/avgdl
    meta moves by the token delta. The oracle recomputes BM25 over
    the REVISED corpus, so a stale dl row (two revisions normalizing
    one doc), an unadjusted avgdl, or a resurrected old posting all
    hash-mismatch. At 100 TB a re-crawl wave costs O(batch + old
    postings of the batch), never an index rebuild."""
    from ed_housing_data_pipeline_spark.operators import text_index  # noqa: PLC0415

    if _audit() and _TEXT_IDX_UPD_DIR.get((sf_dir,)) is None:
        from ed_housing_data_pipeline_spark.operators.text_index import (  # noqa: PLC0415
            BM25_B,
            BM25_K1,
        )
        from ed_housing_data_pipeline_spark.functions.text import (  # noqa: PLC0415
            token_count,
        )

        docs = _updated_docs(spark, sf_dir)
        p = text_index.posting_table(docs).filter(
            F.col("term").isin(list(RANK_TERMS))
        )
        n = docs.agg(
            F.count(F.lit(1)).cast("double").alias("_n"),
            F.coalesce(F.sum(token_count(F.col("text"))), F.lit(0))
            .cast("double")
            .alias("_tot"),
        )
        stats = (
            p.groupBy("term")
            .agg(F.count(F.lit(1)).cast("double").alias("_df"))
            .crossJoin(F.broadcast(n))
            .withColumn(
                "_idf",
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("_df") + F.lit(0.5))
                    / (F.col("_df") + F.lit(0.5))
                ),
            )
            .withColumn("_avgdl", F.col("_tot") / F.col("_n"))
        )
        lens = text_index.posting_table(docs).groupBy("doc_id").agg(
            F.sum("tf").cast("bigint").alias("dl")
        )
        norm = F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("_avgdl")
        )
        contrib = F.col("_idf") * (
            F.col("tf") * F.lit(BM25_K1 + 1.0) / (F.col("tf") + norm)
        )
        return (
            p.join(F.broadcast(stats.select("term", "_idf", "_avgdl")), "term")
            .join(lens, "doc_id")
            .groupBy("doc_id")
            .agg(F.round(F.sum(contrib), 4).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(RANK_K)
        )
    root = _ensure_updated_text_index(spark, sf_dir)
    return text_index.search_bm25(spark, root, RANK_TERMS, k=RANK_K)


PHRASE3 = ("the", "table", "window")


@register(
    "doc_inverted_phrase3",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {tokens_sql("lower(text)")} AS ts FROM documents
    ), occ AS (
      SELECT doc_id,
             CAST(CASE WHEN len(ts) >= 3 THEN
               len(list_filter(generate_series(1, len(ts) - 2),
                               i -> ts[i] = '{PHRASE3[0]}'
                                AND ts[i+1] = '{PHRASE3[1]}'
                                AND ts[i+2] = '{PHRASE3[2]}'))
             ELSE 0 END AS BIGINT) AS n_occ
      FROM tok
    )
    SELECT doc_id, n_occ FROM occ WHERE n_occ > 0
    """,
)
def q_doc_inverted_phrase3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-word exact phrase through the positional index
    (operators/text_index.search_phrase_n): a left fold over the
    words carrying the matched prefix's END-position set — two keyed
    joins of term-filtered posting lists, each step an
    array_intersect of the shifted set. The oracle counts the same
    3-token adjacencies positionally. The n-ary generalization is the
    real retrieval surface (quoted multi-word queries); n − 1 tiny
    joins, never a text re-scan."""
    from ed_housing_data_pipeline_spark.operators import text_index  # noqa: PLC0415

    if _audit() and _TEXT_IDX_DIR.get((sf_dir,)) is None:
        p = _audit_postings(spark, sf_dir).filter(
            F.col("term").isin(list(PHRASE3))
        )
        cur = p.filter(F.col("term") == PHRASE3[0]).select(
            "doc_id", F.col("positions").alias("_m")
        )
        for w in PHRASE3[1:]:
            nxt = p.filter(F.col("term") == w).select(
                "doc_id", F.col("positions").alias("_p")
            )
            cur = (
                cur.join(nxt, "doc_id")
                .select(
                    "doc_id",
                    F.array_intersect(
                        F.transform("_m", lambda x: x + F.lit(1)), "_p"
                    ).alias("_m"),
                )
                .filter(F.size("_m") > 0)
            )
        return cur.select(
            "doc_id", F.size("_m").cast("bigint").alias("n_occ")
        )
    root = _ensure_text_index(spark, sf_dir)
    return _memo_search_plan(
        "phrase3", spark, root,
        lambda: text_index.search_phrase_n(spark, root, PHRASE3),
    )


@register(
    "doc_search_time_travel",
    oracle=f"""
    WITH third AS (
      SELECT CAST(floor((MAX(doc_id) + 1) / 3) AS BIGINT) AS hi
      FROM documents
    ), tok AS (
      SELECT doc_id, {tokens_sql("lower(text)")} AS ts FROM documents
      WHERE doc_id < GREATEST(1, (SELECT hi FROM third))
    )
    SELECT doc_id,
           CAST(len(list_filter(ts, x -> x = '{SEARCH_TERMS[0]}'))
              + len(list_filter(ts, x -> x = '{SEARCH_TERMS[1]}')) AS BIGINT)
             AS total_tf
    FROM tok
    WHERE list_contains(ts, '{SEARCH_TERMS[0]}')
      AND list_contains(ts, '{SEARCH_TERMS[1]}')
    """,
)
def q_doc_search_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conjunctive search AS OF the index's FIRST commit
    (manifest v1 = the bootstrap third of the corpus) — segmented-lake
    time travel exposed as a query: retained manifest blobs are
    immutable and pinned segments are never rewritten, so the
    historical read is byte-stable no matter how many ingests (or the
    streaming sink) have committed since. The oracle reproduces v1's
    corpus slice arithmetically (doc_id < max(1, (max+1) div 3), the
    bootstrap split _ensure_text_index makes). The audit-of-what-we-
    served-then query every governed 100 TB store needs."""
    from ed_housing_data_pipeline_spark.operators import text_index  # noqa: PLC0415

    if _audit() and _TEXT_IDX_DIR.get((sf_dir,)) is None:
        docs = t(spark, sf_dir, "documents")
        hi = docs.agg(
            F.greatest(
                F.lit(1), F.floor((F.max("doc_id") + 1) / 3).cast("bigint")
            ).alias("_hi")
        )
        p = (
            text_index.posting_table(docs)
            .join(F.broadcast(hi), F.col("doc_id") < F.col("_hi"))
            .filter(F.col("term").isin(list(SEARCH_TERMS)))
        )
        return (
            p.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("_k"),
                F.sum("tf").cast("bigint").alias("total_tf"),
            )
            .filter(F.col("_k") == len(set(SEARCH_TERMS)))
            .drop("_k")
        )
    root = _ensure_text_index(spark, sf_dir)
    from ed_housing_data_pipeline_spark.sources import lake  # noqa: PLC0415

    v1 = lake.segment_manifest_versions(spark, root)[0]
    return text_index.search_all_terms(spark, root, SEARCH_TERMS, at_version=v1)


PREFIX = "s"  # scan/slow/sort/spark/stream/small/... — a fat prefix class


@register(
    "doc_inverted_prefix",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {tokens_sql("lower(text)")} AS ts FROM documents
    ), m AS (
      SELECT doc_id,
             list_filter(ts, x -> x LIKE '{PREFIX}%') AS hits
      FROM tok
    )
    SELECT doc_id,
           CAST(len(list_distinct(hits)) AS BIGINT) AS n_terms,
           CAST(len(hits) AS BIGINT) AS total_tf
    FROM m WHERE len(hits) > 0
    """,
)
def q_doc_inverted_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix search through the persisted index
    (operators/text_index.search_prefix): the StartsWith predicate
    reaches the parquet scan (string min/max row-group pruning — the
    reason production term dictionaries are stored sorted), one
    groupBy(doc_id) folds matched posting rows into (distinct-term
    count, summed tf). The oracle filters the raw token lists with the
    same prefix. Blooms are equality-only by design; prefix classes
    are the zonemap-shaped complement."""
    from ed_housing_data_pipeline_spark.operators import text_index  # noqa: PLC0415

    if _audit() and _TEXT_IDX_DIR.get((sf_dir,)) is None:
        p = _audit_postings(spark, sf_dir).filter(
            F.col("term").startswith(PREFIX)
        )
        return p.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("tf").cast("bigint").alias("total_tf"),
        )
    root = _ensure_text_index(spark, sf_dir)
    return _memo_search_plan(
        "prefix", spark, root,
        lambda: text_index.search_prefix(spark, root, PREFIX),
    )
