"""Text column-expression helpers.

Native Column expressions for key normalization (reference
silver_to_gold.py:15-36 did this as a row-at-a-time Python function —
here it is a codegen'd regex chain, the Spark-first fast path) and for
the LLM-pipeline text ops (tokenization, shingling).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _py_strip(c: Column) -> Column:
    """Python ``str.strip()`` semantics: remove leading/trailing
    UNICODE whitespace. Spark's ``trim`` strips only ASCII spaces, so
    values like ``"Fulton\\u00a0"`` would keep their NBSP and miss the
    join key — caught by the property tests against the reference."""
    return F.regexp_replace(c, r"(?U)^\s+|\s+$", "")


def normalize_join_key(
    col: Column | str,
    strip_suffixes: tuple[str, ...] = (r",\s*georgia\b", r"\s+county\b"),
) -> Column:
    """Canonicalize a messy human name into a join key.

    Generalizes the reference's county normalizer (silver_to_gold.py:19-36):
    trim, strip configured suffix patterns (case-insensitive), trim,
    lowercase, empty→NULL. NULL propagates natively (the reference's
    None/NaN passthrough at silver_to_gold.py:26-31).

    Operation order matters and matches the reference exactly: the
    outer strip happens BEFORE the substitutions, so a value like
    ``" County"`` keeps its (now unprefixed-by-whitespace) word rather
    than collapsing to NULL — property-tested against the reference
    regexes in tests/test_property_based.py.
    """
    c = _py_strip(_c(col).cast("string"))
    for pat in strip_suffixes:
        c = F.regexp_replace(c, f"(?i){pat}", "")
    return F.nullif(F.lower(_py_strip(c)), F.lit(""))


def normalize_text(col: Column | str) -> Column:
    """Canonical form for exact-dedup: lowercase, collapse whitespace,
    strip. NULL stays NULL, empty string → NULL.

    Whitespace is ASCII ``\\s`` by REGEX on both ends — deliberately
    not ``trim()``: Spark's trim strips all ASCII control whitespace
    while DuckDB's strips spaces plus U+00A0 but not tabs/newlines, so
    any trim-based canonicalization diverges across engines on text
    containing tabs or unicode spaces (found by the pathological-text
    differential sweep). Non-ASCII spaces (NBSP etc.) are CONTENT
    under this definition, identically in both engines."""
    stripped = F.regexp_replace(
        F.lower(_c(col).cast("string")), r"^\s+|\s+$", ""
    )
    return F.nullif(F.regexp_replace(stripped, r"\s+", " "), F.lit(""))


def hash60(col: Column | str) -> Column:
    """Deterministic 60-bit bigint hash of a string column, portable
    across engines (md5-prefix construction: DuckDB computes the
    identical value as ``('0x' || substr(md5(x),1,15))::UBIGINT`` —
    see plans/_base.hash60_sql). 60 bits (15 hex chars) fits a signed
    bigint with headroom on both engines; collision-safe for MinHash/
    SimHash/sharding at any realistic cardinality. Non-negative by
    construction."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("bigint")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string>; empty/NULL/whitespace-
    only text → empty array. Split on ASCII ``\\s+`` then drop empty
    fragments — no ``trim()``, whose cross-engine semantics differ on
    tabs and unicode spaces (see :func:`normalize_text`); a run of
    leading/trailing whitespace only ever produces the empty fragments
    the filter removes, identically in Spark and DuckDB."""
    c = _c(col).cast("string")
    return F.when(c.isNull(), F.array().cast("array<string>")).otherwise(
        F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count (bigint)."""
    return F.size(tokens(col)).cast("bigint")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Rough subword-token estimate: count regex word pieces + runs of
    punctuation, the way BPE vocabularies split text. Native regexp_count."""
    c = _c(col).cast("string")
    return F.regexp_count(c, F.lit(r"[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]")).cast("bigint")


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles (n-grams joined by a single space) → array<string>.

    Built from native higher-order functions: split → transform over an
    index sequence → slice+join. Stays entirely JVM-side; this feeds
    MinHash/Jaccard dedup at scale, so no Python per row.
    Texts shorter than k words produce a single whole-text shingle;
    NULL/empty text produces an EMPTY array (not ``[""]``) so empty
    documents never hash as near-duplicates of each other.
    """
    arr = tokens(col)
    n = F.size(arr)
    empty = F.array().cast("array<string>")
    short = F.array(F.array_join(arr, " "))
    grams = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.array_join(F.slice(arr, i + F.lit(1), F.lit(k)), " "),
    )
    return F.when(n == 0, empty).when(n < F.lit(k), short).otherwise(grams)


def char_ngrams(col: Column | str, n: int = 8) -> Column:
    """Character n-grams over the NORMALIZED text (lowercased,
    whitespace-collapsed — :func:`normalize_text`) → array<string>.

    The character-level counterpart of :func:`word_shingles` for
    near-dup detection: robust to tokenization differences and
    whitespace-insensitive edits. Native sequence+substring higher-order
    expressions, fully JVM-side. Texts shorter than ``n`` chars yield
    the single whole-text gram; NULL/empty → EMPTY array (empty docs
    must never pair with each other).
    """
    norm = normalize_text(col)
    length = F.length(norm)
    grams = F.transform(
        F.sequence(F.lit(1), length - F.lit(n - 1)),
        lambda i: F.substring(norm, i, F.lit(n)),
    )
    return (
        F.when(norm.isNull(), F.array().cast("array<string>"))
        .when(length <= F.lit(n), F.array(norm))
        .otherwise(grams)
    )


# PII scrubbing — patterns kept RE2-compatible (no backreferences, no
# lookaround) so the exact same regex runs in Spark's Java engine and
# DuckDB's RE2 oracle. Deliberately high-recall/simple: production
# scrubbing layers more patterns, same shape.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_counts(col: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts; NULL text counts as 0."""
    c = F.coalesce(_c(col), F.lit(""))
    return (
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0))),
    )


def redact_pii(col: Column | str) -> Column:
    """Replace emails then phone-number-shaped spans with typed tags.
    Order matters (an email's digits could partially match the phone
    pattern once the local part is gone) and is fixed email-first on
    both engines. Narrow row-local expression — runs inside the scan
    stage at any scale."""
    c = F.coalesce(_c(col), F.lit(""))
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(c, PHONE_RE, "<PHONE>")
