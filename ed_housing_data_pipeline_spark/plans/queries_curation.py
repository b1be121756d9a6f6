"""Corpus-curation queries: export, quality audits, mixture weights.

The ship-a-training-corpus tail of the LLM-data surface — sharded
JSONL export with an oracle-checked manifest, CCNet-style unigram-LM
surprisal, cross-doc duplicated-span coverage, temperature-scaled
source mixing weights. Split out of plans/queries_llm.py (which
re-exports these names for back-compat).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ed_housing_data_pipeline_spark.functions.text import (
    EMAIL_RE,
    PHONE_RE,
    normalize_text,
    token_count,
    tokens,
)
from ed_housing_data_pipeline_spark.operators import similarity as sim
from ed_housing_data_pipeline_spark.plans._base import (
    hash60_sql,
    norm_text_sql,
    t,
    tokens_sql,
)
from ed_housing_data_pipeline_spark.plans._caches import (
    SHINGLE_K,
    _audit,
    _own_caches,
)
from ed_housing_data_pipeline_spark.plans.queries_llm import _shingles_cte
from ed_housing_data_pipeline_spark.plans.registry import register


# ------------------------------------------------ sharded JSONL export
EXPORT_SHARDS = 8
_EXPORT_DOC_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


@register(
    "doc_export_shards",
    oracle=f"""
    SELECT CAST({hash60_sql("CAST(doc_id AS VARCHAR)")} % {EXPORT_SHARDS} AS INT)
               AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM({hash60_sql("COALESCE(text, '')")} % 1000003) AS BIGINT)
               AS text_csum
    FROM documents
    GROUP BY 1
    """,
)
def q_doc_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sharded JSONL export, verified end-to-end: write
    the corpus as ``{EXPORT_SHARDS}`` hash-keyed shard directories
    (sources/export.py — the ship-a-training-corpus sink), read the
    shards back, and return a per-shard manifest (doc count, char
    total, source count, and a modular text checksum that pins the
    text content THROUGH the JSON encode/decode roundtrip). The oracle
    recomputes the manifest relationally from the parquet corpus with
    the same portable hash, so shard membership, JSON fidelity, and
    the absence of dropped/duplicated rows are all hash-checked.

    Scale shape: shard assignment is row-local; the export's only
    shuffle is repartition-by-shard so each shard directory is one
    file. The manifest agg groups on {EXPORT_SHARDS} keys — map-side
    partials collapse it to nothing. Under AUDIT_LAZY_PLANS the same
    manifest plan is built over the shard-assigned corpus directly
    (plan audits run no write jobs)."""
    import tempfile

    from ed_housing_data_pipeline_spark.plans._base import hash60
    from ed_housing_data_pipeline_spark.sources import export as export_ops

    docs = sim.scale_out(t(spark, sf_dir, "documents"))

    def manifest(frame: DataFrame) -> DataFrame:
        return (
            frame.groupBy(F.col("shard").cast("int").alias("shard"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
                F.countDistinct("source").cast("bigint").alias("n_sources"),
                F.sum(
                    F.pmod(
                        hash60(F.coalesce(F.col("text"), F.lit(""))),
                        F.lit(1000003),
                    )
                )
                .cast("bigint")
                .alias("text_csum"),
            )
        )

    if _audit():
        return manifest(
            docs.withColumn(
                "shard",
                export_ops.shard_id(F.col("doc_id").cast("string"), EXPORT_SHARDS),
            )
        )
    with tempfile.TemporaryDirectory(prefix="jsonl_export_") as root:
        out = f"{root}/corpus"
        export_ops.export_jsonl_shards(
            docs,
            out,
            key=F.col("doc_id").cast("string"),
            n_shards=EXPORT_SHARDS,
            compression="gzip",
        )
        back = export_ops.read_jsonl_shards(spark, out, _EXPORT_DOC_SCHEMA)
        return manifest(back).localCheckpoint(eager=True)


# ------------------------------------- unigram LM surprisal (quality)
@register(
    "doc_unigram_surprisal",
    oracle=f"""
    WITH w AS (
        -- doc_id IS NOT NULL mirrors the engine's pre-filter exactly
        -- (r15 ADVICE #2): both sides now derive the corpus unigram
        -- statistics (vocab wc, n_total) over identified documents
        -- only, by construction — a null-doc_id row can never reach
        -- the per-doc left-join output on either side, but before
        -- this it WOULD have shifted every doc's avg_surprisal on the
        -- oracle side alone (latent: fixtures hold no null doc_ids).
        SELECT doc_id, UNNEST({tokens_sql("text")}) AS word
        FROM documents WHERE doc_id IS NOT NULL
    ),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
    vocab AS (SELECT word, SUM(tf) AS wc FROM tf GROUP BY 1),
    tot AS (SELECT SUM(wc) AS n_total FROM vocab),
    per AS (
        SELECT tf.doc_id,
               CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
               ROUND(
                   SUM(tf.tf * (-log2(CAST(vocab.wc AS DOUBLE)
                                      / CAST(tot.n_total AS DOUBLE))))
                   / SUM(tf.tf), 4) AS avg_surprisal
        FROM tf JOIN vocab USING (word), tot
        GROUP BY 1
    )
    SELECT d.doc_id, d.source, per.n_tokens, per.avg_surprisal
    FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    """,
)
def q_doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model surprisal per document — the
    perplexity-proxy quality filter (CCNet-style: docs whose tokens
    are improbable under the corpus's own unigram distribution score
    high and get routed to the tail bucket). ``avg_surprisal`` is the
    token-frequency-weighted mean of ``-log2 p(word)`` with ``p`` the
    corpus maximum-likelihood unigram estimate; token-free docs carry
    NULLs (no evidence, not "perfect score").

    Scale shape: explode → (doc, word) counts shrink the join input
    to one row per distinct pair; the vocab table is derived by one
    further map-side-combined agg and joined back on ``word`` (hash
    join — broadcast under small-SF stats, shuffle at vocab scale,
    either is the right plan); the corpus token total rides a 1-row
    broadcast cross join like the IDF/TF-IDF scalars."""
    base = t(spark, sf_dir, "documents")
    # ONE tokenize → tf chain feeds all three consumers (join probe,
    # vocab fold, corpus-total scalar): before this r15 rewrite the
    # plan tokenized + exploded the corpus THREE times (tf, vocab, and
    # the n_total scalar each rebuilt the whole chain — 11 exchanges);
    # now the tf aggregation's exchange is one runtime-reused AQE
    # stage (identical canonical subtrees — the explicit
    # isnotnull(doc_id) mirrors what the final left join infers on the
    # probe branch, and null-doc_id rows cannot reach the left-join
    # output). The word string is a key, never an output: shuffles
    # ride its xxhash64 (the raw-text DuckDB twin would flag a
    # collision instantly).
    docs = sim.scale_out(base.filter(F.col("doc_id").isNotNull()))
    w = docs.select(
        "doc_id", F.explode(tokens("text")).alias("word")
    ).select("doc_id", F.xxhash64("word").alias("word"))
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("word").agg(F.sum("tf").alias("wc"))
    # Σ tf ≡ Σ vocab.wc (total token occurrences) — same value, one
    # fewer aggregation hop, and the subtree stays reuse-identical
    total = tf.agg(F.sum("tf").alias("n_total"))
    surprisal = -F.log2(
        F.col("wc").cast("double") / F.col("n_total").cast("double")
    )
    per = (
        tf.join(vocab, "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * surprisal) / F.sum("tf"), 4
            ).alias("avg_surprisal"),
        )
    )
    # output spine: plain scan of (doc_id, source) — no scale_out
    # exchange for a projection this cheap
    return base.select("doc_id", "source").join(per, "doc_id", "left")


# --------------------------- cross-doc duplicated-span coverage audit
SPAN_GRAM_N = 5


@register(
    "doc_dup_span_coverage",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {tokens_sql("text")} AS w FROM documents),
    g AS (
        SELECT doc_id, w,
               UNNEST(CASE WHEN len(w) >= {SPAN_GRAM_N}
                           THEN generate_series(1, len(w) - {SPAN_GRAM_N} + 1)
                           ELSE []::BIGINT[] END) AS pos
        FROM tk
    ),
    gg AS (
        SELECT doc_id, pos,
               array_to_string(w[pos:pos + {SPAN_GRAM_N} - 1], ' ') AS gram
        FROM g
    ),
    dup AS (
        SELECT gram FROM gg GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hit AS (SELECT gg.doc_id, gg.pos FROM gg JOIN dup USING (gram)),
    cov AS (
        SELECT doc_id, COUNT(DISTINCT tp) AS n_covered
        FROM (
            SELECT doc_id,
                   UNNEST(generate_series(pos, pos + {SPAN_GRAM_N} - 1)) AS tp
            FROM hit
        )
        GROUP BY doc_id
    )
    SELECT tk.doc_id,
           CAST(len(tk.w) AS BIGINT) AS n_tokens,
           CAST(COALESCE(cov.n_covered, 0) AS BIGINT) AS n_covered,
           ROUND(CAST(COALESCE(cov.n_covered, 0) AS DOUBLE)
                 / NULLIF(len(tk.w), 0), 4) AS dup_coverage
    FROM tk LEFT JOIN cov USING (doc_id)
    """,
)
def q_doc_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-SPAN coverage — the exact-substring
    dedup audit (Lee et al., "Deduplicating Training Data Makes LMs
    Better"): for each doc, the fraction of its tokens covered by a
    {SPAN_GRAM_N}-gram that also appears verbatim in ANOTHER doc. High
    coverage = boilerplate/near-copy candidate even when MinHash
    whole-doc similarity stays under threshold (partial overlap).

    Scale shape: the gram table is a narrow transform (one row per
    token position); repeated grams come from one map-side-combined
    agg; the join back is a semi-join on the gram key, and coverage is
    an explode-×{SPAN_GRAM_N} + distinct count. Two shuffles total,
    no windows, no per-row Python — the suffix-array formulation's
    O(corpus) answer for fixed span length."""
    base = t(spark, sf_dir, "documents")
    n = SPAN_GRAM_N
    # n_tokens branch: a single cheap size(tokens) projection — no
    # scale_out repartition (at real scale the scan is already split;
    # locally the exchange only added a stage to a ~ms task)
    tk = base.select("doc_id", tokens("text").alias("w"))
    # gram branches: explicit isnotnull(doc_id) so BOTH subtrees below
    # canonicalize identically and the scan + repartition exchange is
    # computed once (ReusedExchange) — the final left join infers this
    # filter on the hit branch anyway, and null-doc_id rows are inert
    # in dup detection (min/max skip NULLs exactly as count distinct
    # does) and unreachable in the final doc_id equi-join.
    docs = sim.scale_out(base.filter(F.col("doc_id").isNotNull()))
    # the gram never materializes as a string (r15 opt, guide §2.3):
    # each TOKEN is xxhash64'd once, and a gram key is the xxhash64 of
    # its n consecutive token hashes — n×8 bytes hashed per position
    # instead of building + hashing a ~40-byte concat_ws string per
    # position (which re-hashed every token n times). Same key-only
    # role, same 2^-64 collision class; the DuckDB twin keys on the
    # raw gram text and would flag a collision instantly.
    tw = docs.select("doc_id", tokens("text").alias("w"))
    # ONE F.expr parse each instead of nested Column-API lambdas: the
    # lambda trees cost ~0.3s/call of py4j round-trips to assemble
    # (guide §7.3 — driver-side plan build is real latency); the SQL
    # strings parse once JVM-side. Semantics identical (xxhash64's SQL
    # default seed is the same 42; arr[i] is 0-based).
    tk_h = tw.select(
        "doc_id",
        F.size("w").alias("_nw"),
        F.expr("transform(w, x -> xxhash64(x))").alias("th"),
    )
    gram_hashes = ", ".join(f"th[i + {j}]" for j in range(n))
    gram_arr = F.expr(
        f"CASE WHEN _nw >= {n} THEN transform(sequence(0, _nw - {n}), "
        f"i -> xxhash64({gram_hashes})) "
        f"ELSE CAST(array() AS array<bigint>) END"
    )
    gg = tk_h.select("doc_id", F.posexplode(gram_arr).alias("pos", "gh"))
    # "appears in >= 2 distinct docs" needs only min(doc) != max(doc),
    # not an exact distinct count: ONE exchange with map-side partial
    # min/max instead of the two-exchange countDistinct expansion
    # (guide §2.4 — before: Exchange(gh, doc_id) + Exchange(gh); after:
    # Exchange(gh) whose payload is the per-map-partition distinct gh
    # set). Null doc_ids behave identically (skipped by min/max as by
    # count distinct; a gram seen only under NULL doc_id is dup in
    # neither formulation).
    dup = (
        gg.groupBy("gh")
        .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("gh")
    )
    hit = gg.join(dup, "gh", "left_semi")
    # covered-token count = |union of [pos, pos+n-1]| over the doc's
    # dup positions — computed as an interval-union fold over the
    # SORTED distinct positions (each gap contributes min(n, gap);
    # the first position contributes n) instead of explode×n +
    # distinct + count, which shuffled n× the rows through TWO more
    # exchanges (guide §2.3/§2.4). collect_set partially aggregates
    # map-side and a doc's position set is bounded by its own token
    # count, so per-group state is no wider than the token array the
    # scan already materializes.
    cov = (
        hit.groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("pos")).alias("_ps"))
        .select(
            "doc_id",
            F.expr(
                f"aggregate(_ps, "
                f"struct(CAST({-2 * n} AS BIGINT) AS prev, "
                f"CAST(0 AS BIGINT) AS acc), "
                f"(s, p) -> struct(CAST(p AS BIGINT) AS prev, "
                f"s.acc + least(CAST({n} AS BIGINT), "
                f"CAST(p AS BIGINT) - s.prev)), "
                f"s -> s.acc)"
            ).alias("n_covered"),
        )
    )
    return (
        tk.select("doc_id", F.size("w").cast("bigint").alias("n_tokens"))
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_covered"), F.lit(0)).cast("bigint").alias(
                "n_covered"
            ),
            F.round(
                F.coalesce(F.col("n_covered"), F.lit(0)).cast("double")
                / F.nullif(F.col("n_tokens"), F.lit(0)),
                4,
            ).alias("dup_coverage"),
        )
    )


# ------------------------------- source mixing weights (temperature)
MIXTURE_ALPHA = 0.7


@register(
    "doc_source_mixture_weights",
    oracle=f"""
    WITH s AS (
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(len({tokens_sql("text")})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT SUM(n_tokens) AS all_tokens,
               SUM(POW(CAST(n_tokens AS DOUBLE), {MIXTURE_ALPHA})) AS z
        FROM s
    )
    SELECT s.source, s.n_docs, s.n_tokens,
           ROUND(CAST(s.n_tokens AS DOUBLE)
                 / CAST(tot.all_tokens AS DOUBLE), 6) AS raw_share,
           ROUND(POW(CAST(s.n_tokens AS DOUBLE), {MIXTURE_ALPHA}) / tot.z, 6)
               AS temp_share
    FROM s, tot
    """,
)
def q_doc_source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data-mixing weights: raw token share and the
    temperature-flattened share ``t_s^α / Σ t^α`` (α={MIXTURE_ALPHA} —
    the standard upsample-the-tail mixture used when assembling a
    multi-source training corpus; α=1 recovers proportional, α=0
    uniform). One groupBy over the corpus (token counting fused into
    the scan), then a 2-scalar broadcast for the normalizers — output
    is one row per source, trivially parallel at any scale."""
    docs = sim.scale_out(t(spark, sf_dir, "documents"))
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).cast("bigint").alias("n_tokens"),
    )
    tot = s.agg(
        F.sum("n_tokens").alias("all_tokens"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), MIXTURE_ALPHA)).alias("z"),
    )
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.col("all_tokens").cast("double"),
            6,
        ).alias("raw_share"),
        F.round(
            F.pow(F.col("n_tokens").cast("double"), MIXTURE_ALPHA) / F.col("z"), 6
        ).alias("temp_share"),
    )




# --------------------------------------------------- PII scrub (text)
@register(
    "doc_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(COALESCE(text, ''),
                '{EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(COALESCE(text, ''),
                '{PHONE_RE}')) AS INTEGER) AS n_phones,
           md5(regexp_replace(regexp_replace(COALESCE(text, ''),
               '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
    FROM documents
    """,
)
def q_doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing battery: per-doc email/phone match counts plus the
    md5 of the redacted text (email-first replacement order). The
    patterns are RE2-safe so the identical regexes run in both engines
    — the md5 twin proves the *full redacted output* matches, not just
    the counts. Row-local narrow expressions; no shuffle."""
    from ed_housing_data_pipeline_spark.functions.text import pii_counts, redact_pii

    docs = sim.scale_out(t(spark, sf_dir, "documents"))
    n_em, n_ph = pii_counts("text")
    return docs.select(
        "doc_id",
        n_em.alias("n_emails"),
        n_ph.alias("n_phones"),
        F.md5(redact_pii("text")).alias("redacted_md5"),
    )



# ----------------------------------- cross-source contamination check
# Stop-shingle cap: a shingle in more than this many docs carries no
# overlap signal but fans the postings join out quadratically in its
# doc-frequency — the registered query runs WITH the guard on (the cap
# is deterministic, so the oracle mirrors it exactly).  4 is tuned to
# the sf0.01 distribution (max df there is 7) so the differential check
# exercises the filter; production tunes this to corpus size.
CONTAMINATION_MAX_DF = 4

CONTAMINATION_ORACLE = f"""
WITH {_shingles_cte()},
ex AS (
    SELECT s.doc_id, d.source, UNNEST(s.sh) AS g
    FROM sh s JOIN documents d ON d.doc_id = s.doc_id
),
kept AS (
    SELECT g FROM ex GROUP BY g HAVING COUNT(*) <= {CONTAMINATION_MAX_DF}
),
exk AS (SELECT e.doc_id, e.source, e.g FROM ex e JOIN kept k ON k.g = e.g),
posts AS (SELECT DISTINCT g, source FROM exk),
hits AS (
    SELECT DISTINCT e.doc_id
    FROM exk e JOIN posts p ON p.g = e.g AND p.source <> e.source
)
SELECT d.source, COUNT(*) AS n_docs, COUNT(h.doc_id) AS n_contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
GROUP BY d.source
"""


@register("doc_crosssource_contamination", oracle=CONTAMINATION_ORACLE)
def q_doc_crosssource_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination primitive: per source, how many docs share at
    least one 3-word shingle with a doc from a DIFFERENT source — the
    train/eval overlap check of LLM pipelines (here source buckets
    stand in for corpus vs benchmark).

    Scale shape: explode to a (shingle, source) postings table,
    distinct it (bounded by vocabulary × sources, one shuffle), then a
    LEFT SEMI join of exploded doc-shingles against other-source
    postings — never doc×doc. The ``max_doc_freq`` stop-shingle cap
    is ON (the 100 TB guard against pathological shingles like "for
    more information see"); it is deterministic, so the oracle mirrors
    it with the same doc-frequency HAVING pre-filter. The exploded
    postings table is scope-cached across its ~4 consumers and
    released after the checkpoint (``_own_caches``)."""
    docs = t(spark, sf_dir, "documents")
    return _own_caches(
        lambda scope: sim.crosssource_contamination(
            docs,
            "text",
            "doc_id",
            "source",
            shingle_k=SHINGLE_K,
            max_doc_freq=CONTAMINATION_MAX_DF,
            cache=scope,
        )
    )



# ------------------------------------- fuzzy near-dup (edit distance)
@register(
    "doc_fuzzy_pairs_levenshtein",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, n_chars,
               substr({norm_text_sql("text")},
                      1, 120) AS norm
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.norm, b.norm) AS BIGINT) AS edit_dist
    FROM d a
    JOIN d b
      ON a.lang = b.lang
     AND (a.n_chars // 32) = (b.n_chars // 32)
     AND a.doc_id < b.doc_id
    WHERE a.norm IS NOT NULL AND b.norm IS NOT NULL
      AND levenshtein(a.norm, b.norm) <= 12
    """,
)
def q_doc_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup with blocking: candidate pairs come from
    an equi-join on (lang, length-bucket) — never all-pairs — and the
    O(len²) levenshtein runs on a 120-char normalized prefix only
    inside blocks. At 100 TB the block keys shard the shuffle and the
    quadratic work stays bounded per block; a MinHash prefilter
    (doc_neardup_pairs) composes in front when blocks grow.

    The distance is computed over the UTF-8 BYTE sequence (the prefix
    re-encoded through ISO-8859-1 so each char is one byte): Spark's
    levenshtein counts codepoints while DuckDB's counts bytes, and the
    two disagree on any multibyte text — byte distance is the variant
    both engines can compute identically, so it is the registered
    semantic (found by the pathological-text differential sweep)."""
    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.expr("n_chars DIV 32").alias("len_bucket"),
        F.substring(normalize_text(F.col("text")), 1, 120).alias("norm"),
    ).filter(F.col("norm").isNotNull())
    a, b = d.alias("a"), d.alias("b")

    def _bytes(c: Column) -> Column:
        return F.decode(F.encode(c, "UTF-8"), "ISO-8859-1")

    dist = F.levenshtein(_bytes(F.col("a.norm")), _bytes(F.col("b.norm")))
    return (
        a.join(
            b,
            on=[
                F.col("a.lang") == F.col("b.lang"),
                F.col("a.len_bucket") == F.col("b.len_bucket"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .filter(dist <= 12)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            dist.cast("bigint").alias("edit_dist"),
        )
    )




# ----------------------------- count-min sketch word frequencies
def _cms_topk_oracle() -> str:
    from ed_housing_data_pipeline_spark.functions import (  # noqa: PLC0415
        sketches as sk,
    )
    from ed_housing_data_pipeline_spark.plans._base import (  # noqa: PLC0415
        hash60_sql,
        tokens_sql,
    )

    h = hash60_sql("word")
    return f"""
WITH w AS (
    SELECT w AS word
    FROM (SELECT unnest({tokens_sql("lower(text)")}) AS w FROM documents)
    WHERE length(w) >= 3
),
rows_ AS (SELECT UNNEST(range({sk.CMS_D})) AS row),
counters AS (
    SELECT r.row,
           CAST({sk.cms_pos_sql(h, "r.row")} AS BIGINT) AS pos,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM w CROSS JOIN rows_ r
    GROUP BY 1, 2
),
exact AS (
    SELECT word, COUNT(*) AS exact_n FROM w GROUP BY 1
    ORDER BY exact_n DESC, word ASC LIMIT 20
),
probe AS (
    SELECT e.word, e.exact_n, r.row,
           CAST({sk.cms_pos_sql(h, "r.row")} AS BIGINT) AS pos
    FROM exact e CROSS JOIN rows_ r
)
SELECT p.word,
       CAST(MAX(p.exact_n) AS BIGINT) AS exact_n,
       MIN(c.c) AS cms_n
FROM probe p JOIN counters c ON c.row = p.row AND c.pos = p.pos
GROUP BY p.word
"""


@register("doc_word_cms_topk", oracle=_cms_topk_oracle())
def q_doc_word_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch word frequencies next to the exact counts for
    the corpus's top-20 words: the d×w counter table builds in ONE
    grouped agg over (row, position) — additive integer state, so
    sketches of corpus shards merge by element-wise sum exactly like
    the rollup's partials — and each probe word reads back min over
    its d counters. The register arithmetic is the cross-engine
    construction (functions/sketches.py), so DuckDB rebuilds the
    identical counters and the whole sketch is hash-checked; the
    one-sided CMS guarantee (estimate >= truth, always) is pinned in
    tests/test_sketches.py. At 100 TB the counter table is d·w
    integers regardless of corpus size — the heavy-hitter shape that
    never shuffles per-word state."""
    from ed_housing_data_pipeline_spark.functions import (  # noqa: PLC0415
        sketches as sk,
    )
    from ed_housing_data_pipeline_spark.functions.text import (  # noqa: PLC0415
        hash60,
        tokens,
    )

    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("word")
    ).filter(F.length("word") >= 3)
    # ONE tokenize + word-count aggregation feeds BOTH the exact top-k
    # and the sketch (r15 opt): the counters sum per-WORD counts
    # (Σ count(word) grouped by (row, pos) ≡ COUNT(*) over occurrences
    # — identical integers), so the md5-based hash60 runs once per
    # DISTINCT word instead of once per occurrence, the heavy explode
    # crosses the CMS_D rows at vocabulary (not corpus) cardinality,
    # and the two consumers share the vocab aggregation's exchange
    # (AQE runtime stage reuse over identical subtrees).
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("exact_n"))
    h = hash60(F.col("word"))
    counters = (
        vocab.select(
            "exact_n", sk.cms_h1(h).alias("h1"), sk.cms_h2(h).alias("h2")
        )
        .select(
            "exact_n",
            "h1",
            "h2",
            F.explode(F.sequence(F.lit(0), F.lit(sk.CMS_D - 1))).alias("row"),
        )
        .withColumn(
            "pos", sk.cms_position(F.col("h1"), F.col("h2"), F.col("row"))
        )
        .groupBy("row", "pos")
        .agg(F.sum("exact_n").alias("c"))
    )
    exact = vocab.orderBy(
        F.col("exact_n").desc(), F.col("word").asc()
    ).limit(20)
    ph = hash60(F.col("word"))
    probe = exact.select(
        "word",
        "exact_n",
        sk.cms_h1(ph).alias("h1"),
        sk.cms_h2(ph).alias("h2"),
    ).select(
        "word",
        "exact_n",
        F.explode(F.sequence(F.lit(0), F.lit(sk.CMS_D - 1))).alias("row"),
        "h1",
        "h2",
    ).withColumn(
        "pos", sk.cms_position(F.col("h1"), F.col("h2"), F.col("row"))
    )
    return (
        F.broadcast(probe)
        .join(counters, on=["row", "pos"])
        .groupBy("word")
        .agg(
            F.max("exact_n").cast("bigint").alias("exact_n"),
            F.min("c").cast("bigint").alias("cms_n"),
        )
    )
