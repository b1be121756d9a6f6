"""Unit tests for functions/{text,numeric,vectors}.py — the scalar
expression layer, including the null/ANSI traps from SURVEY.md §2.5."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.functions.numeric import (
    coerce_double,
    horizontal_sum,
    null_if_zero,
    safe_div,
)
from ed_housing_data_pipeline_spark.functions.text import (
    bpe_ish_token_count,
    normalize_join_key,
    normalize_text,
    token_count,
    tokens,
    word_shingles,
)
from ed_housing_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)


def one(spark, col, value=None):
    """Evaluate a Column against a single-row, single-column frame."""
    df = spark.createDataFrame([(value,)], "c string" if value is None or isinstance(value, str) else None)
    return df.select(col.alias("out")).first()["out"]


# ------------------------------------------------------------------ text
def test_normalize_join_key_reference_county(spark):
    # The reference's canonical case: silver_to_gold.py:19-36
    assert one(spark, normalize_join_key("c"), "Fulton County, Georgia") == "fulton"
    assert one(spark, normalize_join_key("c"), "  DeKalb COUNTY ") == "dekalb"
    assert one(spark, normalize_join_key("c"), "Atlanta City") == "atlanta city"


def test_normalize_join_key_null_and_empty(spark):
    assert one(spark, normalize_join_key("c"), None) is None
    assert one(spark, normalize_join_key("c"), "   ") is None
    # reference order: outer strip happens BEFORE the suffix subs, so a
    # bare " County, Georgia" keeps its word (silver_to_gold.py:29-36)
    assert one(spark, normalize_join_key("c"), "  County, Georgia ") == "county"
    assert one(spark, normalize_join_key("c"), "Fulton County, Georgia ") == "fulton"


def test_normalize_text(spark):
    assert one(spark, normalize_text("c"), "  A \t b\nC ") == "a b c"
    assert one(spark, normalize_text("c"), "") is None
    assert one(spark, normalize_text("c"), None) is None


def test_tokens_empty_and_null(spark):
    assert one(spark, tokens("c"), None) == []
    assert one(spark, tokens("c"), "   ") == []
    assert one(spark, tokens("c"), " a  b ") == ["a", "b"]


def test_token_count(spark):
    assert one(spark, token_count("c"), "x y z") == 3
    assert one(spark, token_count("c"), None) == 0


def test_bpe_ish_token_count(spark):
    # "hello" -> hell|o, "," -> 1, "world" -> worl|d  => 5 pieces
    assert one(spark, bpe_ish_token_count("c"), "hello, world") == 5
    assert one(spark, bpe_ish_token_count("c"), "") == 0


def test_word_shingles(spark):
    assert one(spark, word_shingles("c", k=3), "a b c d") == ["a b c", "b c d"]
    # shorter than k: one whole-text shingle
    assert one(spark, word_shingles("c", k=3), "a b") == ["a b"]
    # NULL/empty -> EMPTY array, never [""] (dedup-poison guard)
    assert one(spark, word_shingles("c", k=3), None) == []
    assert one(spark, word_shingles("c", k=3), "  ") == []


# --------------------------------------------------------------- numeric
def test_coerce_double_ansi_safe(spark):
    # ANSI mode is ON in this session; plain cast would throw on "abc".
    df = spark.createDataFrame([("3.5",), ("abc",), (None,)], "c string")
    got = [r["out"] for r in df.select(coerce_double("c").alias("out")).collect()]
    assert got == [3.5, None, None]


def test_null_if_zero(spark):
    df = spark.createDataFrame([(0.0,), (5.0,)], "c double")
    got = [r["out"] for r in df.select(null_if_zero("c").alias("out")).collect()]
    assert got == [None, 5.0]


def test_safe_div_zero_denominator(spark):
    df = spark.createDataFrame([(10.0, 2.0), (10.0, 0.0)], "n double, d double")
    out = df.select(safe_div(F.col("n"), F.col("d"), scale=100.0).alias("out"))
    got = [r["out"] for r in out.collect()]
    assert got[0] == 500.0
    assert got[1] is None  # never Inf/NaN


def test_horizontal_sum_nulls_and_strings(spark):
    df = spark.createDataFrame(
        [("1.5", None, "2"), ("x", "3", None)], "a string, b string, c string"
    )
    out = df.select(horizontal_sum("a", "b", "c").alias("s"))
    got = [r["s"] for r in out.collect()]
    assert got == [3.5, 3.0]  # nulls and non-numerics count as 0


# --------------------------------------------------------------- vectors
def test_vector_math(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 2.0], [1.0, 2.0, 2.0]), ([1.0, 0.0, 0.0], [0.0, 1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    out = df.select(
        dot_product("a", "b").alias("dot"),
        l2_norm("a").alias("na"),
        cosine_similarity("a", "b").alias("cos"),
    ).collect()
    assert out[0]["dot"] == 9.0
    assert math.isclose(out[0]["na"], 3.0)
    assert math.isclose(out[0]["cos"], 1.0)
    assert out[1]["cos"] == 0.0


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 1.0])], "a array<double>, b array<double>"
    )
    assert df.select(cosine_similarity("a", "b").alias("c")).first()["c"] is None


def test_pii_redact_and_counts(spark):
    from ed_housing_data_pipeline_spark.functions import text as tx

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@example.co.uk or call (404) 555-0123 now"),
            (2, "no pii here"),
            (3, None),
        ],
        "id long, s string",
    )
    n_em, n_ph = tx.pii_counts("s")
    out = df.select(
        "id", n_em.alias("e"), n_ph.alias("p"), tx.redact_pii("s").alias("r")
    ).collect()
    r = {row["id"]: row for row in out}
    assert (r[1]["e"], r[1]["p"]) == (1, 1)
    assert "<EMAIL>" in r[1]["r"] and "<PHONE>" in r[1]["r"]
    assert "example" not in r[1]["r"] and "555" not in r[1]["r"]
    assert (r[2]["e"], r[2]["p"], r[2]["r"]) == (0, 0, "no pii here")
    assert (r[3]["e"], r[3]["p"], r[3]["r"]) == (0, 0, "")


def test_char_ngrams(spark):
    from ed_housing_data_pipeline_spark.functions.text import char_ngrams
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "Hello   World"),   # normalization collapses spaces
            (2, "hi"),              # shorter than n -> whole text
            (3, ""),                # empty -> []
            (4, None),              # NULL -> []
        ],
        "id long, t string",
    )
    got = {
        r["id"]: r["g"]
        for r in df.select("id", char_ngrams("t", n=5).alias("g")).collect()
    }
    norm = "hello world"
    assert got[1] == [norm[i : i + 5] for i in range(len(norm) - 4)]
    assert got[2] == ["hi"]
    assert got[3] == [] and got[4] == []
