"""One-off A/B of the rarest-first conjunctive-search plan on a corpus
big enough to ENGAGE the production cost gate (r9 VERDICT #6: the
gate `_RAREST_MIN_CORPUS = 1M` exceeded every test corpus, so the
LeftSemi plan had only ever run under a monkeypatched gate).

Builds a deterministic 1.2M-doc synthetic corpus with a Zipf-shaped
vocabulary (inverse-CDF over a per-token xxhash64 uniform — rank 1
appears in ~most docs, the tail is rare), bootstraps the persisted
inverted index once, then times `search_all_terms` for a
frequent-AND-rare conjunction with the gate engaged vs disabled, and
prints the executed plan of the engaged run so the
BroadcastHashJoin LeftSemi shape is on record.

Run:  python scripts/bench_rarest_first.py [n_docs] [tokens_per_doc]
Appends nothing; results are copied into PLANS.md by hand.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rank_of(i, vocab: int):
    """Word rank of token i of the current row's doc: inverse-CDF of a
    Zipf-ish law (exponent ~1.1) over a per-(doc, i) xxhash64 uniform,
    capped at `vocab`. Deterministic, fully native."""
    u = (
        F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit(7)), F.lit(1_000_000))
        .cast("double")
        / 1_000_000.0
        + F.lit(5e-7)
    )
    return F.least(
        F.floor(F.pow(u, F.lit(-1.0 / 1.1))).cast("bigint"), F.lit(vocab)
    )


def corpus(spark, n_docs: int, toks: int, vocab: int = 200_000):
    """(doc_id, text): `toks` Zipf-drawn words per doc."""
    return (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .repartition(64)
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(toks)),
                    lambda i: F.concat(F.lit("w"), _rank_of(i, vocab)),
                ),
                " ",
            ).alias("text"),
        )
    )


def main() -> None:
    from ed_housing_data_pipeline_spark.operators import text_index

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    toks = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="rarest_ab_") as tmp:
        root = f"{tmp}/idx"
        t0 = time.time()
        text_index.bootstrap_text_index(spark, root, corpus(spark, n_docs, toks))
        print(f"build: {time.time() - t0:.1f}s n_docs={n_docs} toks={toks}")
        # Zipf tail: count(rank r) ~ N_tok * 1.1 * r^-2.1 — probe a
        # ladder of ranks and take the rarest that actually occurs
        ladder = [f"w{r}" for r in (30, 100, 300, 1000, 3000)]
        stats = {
            r.term: r.df
            for r in text_index.term_stats(spark, root, ["w1", *ladder]).collect()
        }
        print("dfs:", stats)
        rare = min(
            (t for t in ladder if stats.get(t)), key=lambda t: stats[t]
        )
        # frequent AND rare — the skewed conjunction the plan targets
        probe = ["w1", rare]
        print("probe:", probe, "df(rare)=", stats[rare], "df(w1)=", stats["w1"])

        def run(label: str) -> None:
            for attempt in range(3):
                t = time.time()
                out = text_index.search_all_terms(spark, root, probe)
                n = out.count()
                print(
                    f"{label} run{attempt}: {time.time() - t:.2f}s rows={n}"
                )
                if attempt == 0 and label == "engaged":
                    plan = out._jdf.queryExecution().executedPlan().toString()
                    keep = [
                        ln
                        for ln in plan.splitlines()
                        if "Join" in ln or "Exchange" in ln
                    ]
                    print("engaged-plan joins/exchanges:")
                    for ln in keep:
                        print("   ", ln.strip()[:120])

        run("engaged")  # corpus >= _RAREST_MIN_CORPUS: gate on
        orig = text_index._RAREST_MIN_CORPUS
        text_index._RAREST_MIN_CORPUS = 10**18  # gate off: plain plan
        try:
            run("plain")
        finally:
            text_index._RAREST_MIN_CORPUS = orig


if __name__ == "__main__":
    main()
