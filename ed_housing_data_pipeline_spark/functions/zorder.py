"""Z-order (Morton) interleaving for multi-column segment clustering.

One-column clustering (sort by A) makes zonemaps tight on A and
useless on B; interleaving the bits of A and B before range-slicing
gives every segment a bounded extent in BOTH columns, so a 2-D box
predicate prunes segments on both dimensions — the layout trick behind
Delta/Databricks Z-ORDER and space-filling-curve clustering in
Iceberg. The interleave is built as ONE parsed SQL string (the
engine's `_cent_sort_sql` pattern — no per-bit py4j Column round
trips) from shiftleft/shiftright/& primitives that exist in both
Spark SQL and DuckDB.

Inputs must be non-negative integers that fit in ``bits`` bits;
values wider than ``bits`` would alias distant rows into the same
z-prefix, silently destroying locality, so :func:`zorder2` guards the
range with a CASE that maps out-of-range inputs to NULL (callers see
the corruption instead of bad clustering).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def zorder2_sql(x_expr: str, y_expr: str, bits: int = 10) -> str:
    """SQL fragment interleaving the low ``bits`` bits of two
    non-negative integer expressions: x takes the even bit positions,
    y the odd. NULL if either input is NULL, negative, or >= 2**bits."""
    if not 1 <= bits <= 31:
        raise ValueError(f"zorder2_sql: bits must be in [1, 31], got {bits}")
    lim = 1 << bits
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({x_expr}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({y_expr}, {i}) & 1, {2 * i + 1})")
    z = " | ".join(terms)
    return (
        f"CASE WHEN ({x_expr}) IS NULL OR ({y_expr}) IS NULL "
        f"OR ({x_expr}) < 0 OR ({y_expr}) < 0 "
        f"OR ({x_expr}) >= {lim} OR ({y_expr}) >= {lim} "
        f"THEN NULL ELSE CAST({z} AS BIGINT) END"
    )


def zorder2(x_expr: str, y_expr: str, bits: int = 10) -> Column:
    """The interleave as a Column (inputs are SQL expression strings
    over the frame's columns, e.g. ``"CAST(o_custkey / 16 AS INT)"``)."""
    return F.expr(zorder2_sql(x_expr, y_expr, bits))


def zorder2_py(x: int, y: int, bits: int = 10) -> int:
    """Pure-Python reference for tests."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def deinterleave2_py(z: int, bits: int = 10) -> tuple[int, int]:
    """Inverse of :func:`zorder2_py` (tests: the interleave is a
    bijection on the [0, 2**bits) square)."""
    x = y = 0
    for i in range(bits):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y
