"""Persisted inverted text index on the segmented lake.

The 100 TB text-search primitive a training-data pipeline needs: the
corpus's posting lists — (term, doc_id, tf, positions) — are PERSISTED
once as an append-only segmented component (sources/lake.append_segments,
the same commit protocol the LSH and ANN indexes ride), and every
search probes the pinned segments instead of re-tokenizing the corpus.

Scale shape:
- **Build** is one posexplode + one (term_h, doc_id) partial-agg
  shuffle per ingest batch — O(batch tokens), never a corpus pass.
  The shuffle keys on ``xxhash64(term)`` (8 bytes), not the term
  string, per the r8 shuffle-key A/B (PLANS.md).
- **Search** pushes ``term IN (...)`` into the parquet scan of the
  pinned segments (dictionary-encoded string column → row-group
  skipping), and bloom sidecars on ``term`` drop whole segments whose
  ingest batch never saw a probe term — driver-side, before Spark
  plans anything.
- **AND query** is one groupBy(doc_id) over the k filtered posting
  lists; **phrase query** is a doc_id equi-join of two posting lists
  with a position-set intersection (``array_intersect`` of shifted
  positions) — both tiny after the term filter, broadcast at small
  stats, shuffle-hash at scale.

Contract shared with the LSH/ANN index artifacts: each document's
postings live in exactly one ingest segment (batches partition the
corpus by doc_id), so per-(term, doc) rows never straddle segments and
merging search results across segments is a plain union.

The reference has no search surface (its query layer is
duckdb_viewer/view_gold.py:37-118); this module is part of the
beyond-reference large-corpus battery the build brief mandates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ed_housing_data_pipeline_spark.functions.text import tokens
from ed_housing_data_pipeline_spark.sources import lake

COMPONENT = "postings"
TERM_SEED = 42


def posting_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term_h, doc_id, term, tf, positions) posting rows of a corpus
    batch. Tokenization is the engine-wide whitespace ``tokens`` on
    lowercased text (identical to every doc_* oracle twin); positions
    are 0-based token offsets, sorted, unique per (term, doc). The
    aggregation keys on the 8-byte ``term_h`` with the term string
    carried as a payload column (bloom sidecars and the row-level
    ``term IN`` predicate want the exact string)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "term"),
    )
    return (
        tok.groupBy(
            F.xxhash64("term", F.lit(TERM_SEED)).alias("term_h"),
            "doc_id",
        )
        .agg(
            F.first("term").alias("term"),
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def bootstrap_text_index(
    spark, root: str, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> dict[str, list[int]]:
    """First commit of the index: one postings segment for the
    bootstrap corpus, bloom sidecar on ``term``, manifest v1."""
    return lake.append_segments(
        spark,
        root,
        appends={COMPONENT: posting_table(docs, id_col, text_col)},
        init=True,
        bloom_cols={COMPONENT: ["term"]},
    )


def append_text_batch(
    spark, root: str, batch: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> dict[str, list[int]]:
    """Fold an ingest batch into the index: O(batch) — one new
    postings segment + its bloom sidecar, one manifest flip. The
    accumulated index is never rewritten; readers see the old pin or
    the new one, never a partial write."""
    return lake.append_segments(
        spark,
        root,
        appends={COMPONENT: posting_table(batch, id_col, text_col)},
        bloom_cols={COMPONENT: ["term"]},
    )


def pinned_postings(spark, root: str, terms: Sequence[str]) -> DataFrame:
    """The manifest-pinned postings scan restricted (a) driver-side to
    segments whose term bloom may hold one of ``terms`` and (b)
    row-level to ``term IN terms`` — the IN predicate reaches the
    parquet scan (PushedFilters) so row groups without the probe terms
    never decode."""
    probe = sorted(set(terms))
    hits = lake.read_segments_bloom_pruned(spark, root, COMPONENT, "term", probe)
    return hits.filter(F.col("term").isin(probe))


def search_all_terms(spark, root: str, terms: Sequence[str]) -> DataFrame:
    """Documents containing EVERY term in ``terms`` (conjunctive /
    AND-of-terms search) as (doc_id, total_tf) where total_tf sums the
    matched terms' frequencies — the usual retrieval pre-rank score.
    One groupBy(doc_id) over the term-filtered posting union; HAVING
    count(distinct term) = k keeps conjunction exact even when a term
    repeats in ``terms``."""
    probe = sorted(set(terms))
    p = pinned_postings(spark, root, probe)
    # (term, doc_id) rows are UNIQUE index-wide (each doc's postings
    # live in exactly one ingest segment — the module contract), so a
    # plain count equals the distinct-term count without the second
    # shuffle a countDistinct expansion would pay.
    return (
        p.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("_k"),
            F.sum("tf").cast("bigint").alias("total_tf"),
        )
        .filter(F.col("_k") == len(probe))
        .drop("_k")
    )


def search_phrase(spark, root: str, first: str, second: str) -> DataFrame:
    """Documents containing the exact two-word phrase ``first second``
    (adjacent tokens) as (doc_id, n_occ). Classic positional-index
    phrase query: join the two posting lists on doc_id, count
    positions p of ``first`` with p+1 in ``second``'s position set —
    ``array_intersect`` of the shifted set, no explode, no re-scan of
    text. Works when first == second (self-join of the same list)."""
    p = pinned_postings(spark, root, [first, second])
    p1 = p.filter(F.col("term") == first).select(
        "doc_id", F.col("positions").alias("_p1")
    )
    p2 = p.filter(F.col("term") == second).select(
        "doc_id", F.col("positions").alias("_p2")
    )
    joined = p1.join(p2, "doc_id")
    n_occ = F.size(
        F.array_intersect(F.transform("_p1", lambda x: x + F.lit(1)), "_p2")
    ).cast("bigint")
    return (
        joined.select("doc_id", n_occ.alias("n_occ"))
        .filter(F.col("n_occ") > 0)
    )
