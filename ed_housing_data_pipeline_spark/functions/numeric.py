"""Numeric column-expression helpers (SURVEY.md §2.5).

All pure native Column expressions — JVM-side, whole-stage-codegen'd,
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def coerce_double(col: Column | str) -> Column:
    """String→double with invalid→NULL.

    Uses ``try_cast``: Spark 4 runs with ANSI mode on by default, where
    a plain ``cast`` *throws* on malformed input. ``try_cast`` restores
    the pandas ``to_numeric(errors="coerce")`` semantics the reference
    relies on (bronze_to_silver.py:96-98) under both ANSI settings.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def null_if_zero(col: Column | str) -> Column:
    """0 → NULL, used to poison division (reference
    bronze_to_silver.py:111,157 ``.replace({0: pd.NA})``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(0))


def safe_div(numerator: Column, denominator: Column, scale: float = 1.0) -> Column:
    """``num / den * scale`` with den==0 → NULL (not ±Inf/NaN).

    Matches the reference's ratio pattern (bronze_to_silver.py:109-112,
    155-158). Explicit ``nullif`` because double division by literal
    zero in Spark yields NULL only for decimals; doubles need the guard.
    """
    return numerator / F.nullif(denominator, F.lit(0)) * F.lit(scale)


def horizontal_sum(*cols: Column | str, null_as_zero: bool = True) -> Column:
    """Row-wise sum across N columns, NULL treated as 0 (reference
    bronze_to_silver.py:109-110 ``fillna(0).sum(axis=1)``).

    Uses a fold over ``array(...)`` so it stays native for any arity.
    """
    arr = F.array(*[F.col(c) if isinstance(c, str) else c for c in cols])
    elem = (lambda x: F.coalesce(x, F.lit(0.0))) if null_as_zero else (lambda x: x)
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + elem(x.try_cast("double")))
