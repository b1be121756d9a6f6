"""Vector math over ``array<float|double>`` columns.

Native higher-order functions (``zip_with`` + ``aggregate``) — the
embedding similarity operators stay JVM-side with no Arrow transfer.
At 100 TB these expressions run inside whole-stage codegen over the
parquet scan; a Pandas-UDF variant exists in operators/similarity.py
for batch-heavy rerank paths.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    # The aggregate/zip_with fold is the FAST path here, not just the
    # general one: a within-session A/B at sf0.1 (load-controlled)
    # put a 64-term unrolled `get(a,i)*get(b,i)` sum at ~3× the fold's
    # per-pair cost — the fold iterates the UnsafeArrayData once,
    # while per-element accessors re-enter the array 64 times. Keep
    # norms hoisted OUT of pair joins instead (see
    # operators.similarity._paired_cosine).
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    return dot_product(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
