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

from collections.abc import Sequence

from pyspark.sql import Column, functions as F


def zorderN_sql(exprs: Sequence[str], bits: int = 10) -> str:
    """SQL fragment interleaving the low ``bits`` bits of N
    non-negative integer expressions (dimension j takes bit positions
    ``j, j+N, j+2N, …`` — the Morton order for any N). NULL if any
    input is NULL, negative, or >= 2**bits. ``N * bits`` must fit a
    BIGINT (≤ 63 total interleaved bits); 3-4 dimension clustering —
    date × key × region, the common real-world ask — fits comfortably
    at the default 10 bits/dim."""
    exprs = list(exprs)
    n = len(exprs)
    if n < 2:
        raise ValueError(f"zorderN_sql: need >= 2 dimensions, got {n}")
    if not 1 <= bits or n * bits > 63:
        raise ValueError(
            f"zorderN_sql: {n} dims x {bits} bits = {n * bits} "
            "interleaved bits; must be in [1, 63]"
        )
    lim = 1 << bits
    terms = []
    for i in range(bits):
        for j, e in enumerate(exprs):
            # the shift operand must be BIGINT: Spark's shiftleft on an
            # INT input masks the shift count & 31, so positions >= 31
            # would silently wrap onto the low bits (and 31 would set
            # the sign bit) — corrupt Morton codes with no error
            terms.append(
                f"shiftleft(shiftright(CAST(({e}) AS BIGINT), {i}) & 1, "
                f"{n * i + j})"
            )
    z = " | ".join(terms)
    guards = " OR ".join(
        f"({e}) IS NULL OR ({e}) < 0 OR ({e}) >= {lim}" for e in exprs
    )
    return f"CASE WHEN {guards} THEN NULL ELSE CAST({z} AS BIGINT) END"


def zorderN(exprs: Sequence[str], bits: int = 10) -> Column:
    """The N-dim interleave as a Column (inputs are SQL expression
    strings over the frame's columns)."""
    return F.expr(zorderN_sql(exprs, bits))


def zorder2_sql(x_expr: str, y_expr: str, bits: int = 10) -> str:
    """SQL fragment interleaving the low ``bits`` bits of two
    non-negative integer expressions: x takes the even bit positions,
    y the odd. NULL if either input is NULL, negative, or >= 2**bits.
    (The N=2 case of :func:`zorderN_sql`, kept as the common calling
    convention.)"""
    if not 1 <= bits <= 31:
        raise ValueError(f"zorder2_sql: bits must be in [1, 31], got {bits}")
    return zorderN_sql([x_expr, y_expr], bits)


def zorder2(x_expr: str, y_expr: str, bits: int = 10) -> Column:
    """The interleave as a Column (inputs are SQL expression strings
    over the frame's columns, e.g. ``"CAST(o_custkey / 16 AS INT)"``)."""
    return F.expr(zorder2_sql(x_expr, y_expr, bits))


def zorderN_py(vals: Sequence[int], bits: int = 10) -> int:
    """Pure-Python reference for tests."""
    n = len(vals)
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (n * i + j)
    return z


def deinterleaveN_py(z: int, n: int, bits: int = 10) -> tuple[int, ...]:
    """Inverse of :func:`zorderN_py` (tests: the interleave is a
    bijection on the [0, 2**bits)^n cube)."""
    out = [0] * n
    for i in range(bits):
        for j in range(n):
            out[j] |= ((z >> (n * i + j)) & 1) << i
    return tuple(out)


def zorder2_py(x: int, y: int, bits: int = 10) -> int:
    """Pure-Python reference for tests."""
    return zorderN_py([x, y], bits)


def deinterleave2_py(z: int, bits: int = 10) -> tuple[int, int]:
    """Inverse of :func:`zorder2_py` (tests: the interleave is a
    bijection on the [0, 2**bits) square)."""
    return deinterleaveN_py(z, 2, bits)
