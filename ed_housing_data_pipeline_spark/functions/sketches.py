"""Cross-engine-deterministic cardinality sketch (HyperLogLog).

Spark ships ``approx_count_distinct`` (HLL++), but its register hash
is engine-private — an oracle harness can't check it, and its sketch
bytes can't be compared across engines. This module builds HLL from
the repo's portable 60-bit md5-prefix hash (functions.text.hash60)
with INTEGER register algebra, so DuckDB computes the bit-identical
estimate from plain SQL (the oracle twin) and any engine can merge
the register tables (element-wise max — the sketch is associative,
the same property the rollup family exploits for partial states).

Layout of the 60-bit hash: low ``HLL_B`` bits pick the register, the
remaining ``60 - HLL_B`` bits feed the rank: rho = (leading zeros of
the high bits) + 1 = ``HLL_RHO_MAX - bit_length(h >> HLL_B)``, with
the all-zero case pinned to HLL_RHO_MAX. The indicator sum
``sum(2^-max_rho)`` is kept as a SCALED INTEGER (``2^rho_max``
numeraire: every term ``2^(rho_max-rho)`` is an exact bigint and the
256-register sum fits 63 bits) —
summation order can't perturb it, so Spark's partial aggregation and
DuckDB's single-threaded sum agree exactly; the single int→double
conversion at the end is deterministic on both engines.

Reference: Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm" (2007) — estimator
constant alpha_m and the linear-counting small-range correction."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

HLL_B = 8                      # register index bits
HLL_M = 1 << HLL_B             # 256 registers → ~6.5% standard error
HLL_RHO_MAX = 60 - HLL_B + 1   # rank when the high bits are all zero
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_SCALE = 1 << HLL_RHO_MAX  # numeraire: absent register = SCALE, rho=r → 2^(rho_max-r)


def hll_register(h: Column) -> Column:
    """Register index of a hash60 value (low bits)."""
    return F.pmod(h, F.lit(HLL_M))


def hll_rho(h: Column) -> Column:
    """Rank of a hash60 value: leading-zero count of the high bits
    plus one, via exact integer ops (bin() string length is
    bit_length on both engines — no float log2 boundary hazards)."""
    hi = F.shiftrightunsigned(h, HLL_B)
    return F.when(hi == 0, F.lit(HLL_RHO_MAX)).otherwise(
        F.lit(HLL_RHO_MAX) - F.length(F.bin(hi))
    )


def hll_indicator_term(max_rho: Column) -> Column:
    """One register's scaled-integer contribution to the indicator
    sum: ``2^(rho_max-rho)`` as an exact bigint (1 ≤ rho ≤ rho_max,
    so the exponent is in [0, rho_max-1] and pow(2.0, ·) is
    IEEE-exact)."""
    return F.pow(F.lit(2.0), F.lit(HLL_RHO_MAX) - max_rho).cast("bigint")


def hll_estimate(n_present: Column, sum_scaled: Column) -> Column:
    """The HLL estimate from per-group register stats: ``n_present``
    registers observed (absent registers contribute rho=0 → one full
    SCALE unit each), ``sum_scaled`` the integer indicator sum over
    observed registers. Applies the small-range linear-counting
    correction exactly as Flajolet et al. prescribe."""
    zeros = F.lit(HLL_M) - n_present
    s_num = zeros.cast("bigint") * F.lit(_SCALE) + sum_scaled
    s = s_num.cast("double") / F.lit(float(_SCALE))
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / s
    return F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(raw)


def hll_sql(group_expr: str, hash_expr: str, source_sql: str) -> str:
    """The DuckDB twin of the whole pipeline as a CTE chain: per
    ``group_expr``, the identical estimate (same hash, same integer
    register algebra, same constants) aliased ``hll_est``. Callers
    join/extend it for their output shape."""
    scale = _SCALE
    # every float literal is CAST(... AS DOUBLE): DuckDB types bare
    # decimal literals as DECIMAL and overflows multiplying them
    raw = (
        f"CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M * HLL_M} / "
        f"(CAST(({HLL_M} - n_present) * {scale}::BIGINT + sum_scaled AS DOUBLE)"
        f" / CAST({scale} AS DOUBLE))"
    )
    return f"""
hll_r AS (
    SELECT {group_expr} AS grp, ({hash_expr}) % {HLL_M} AS reg,
           CASE WHEN (({hash_expr}) >> {HLL_B}) = 0 THEN {HLL_RHO_MAX}
                ELSE {HLL_RHO_MAX} - length(bin(({hash_expr}) >> {HLL_B}))
           END AS rho
    FROM {source_sql}
),
hll_m AS (
    SELECT grp, reg, MAX(rho) AS mr FROM hll_r GROUP BY 1, 2
),
hll_s AS (
    SELECT grp,
           CAST(COUNT(*) AS BIGINT) AS n_present,
           CAST(SUM(CAST(pow(2.0, {HLL_RHO_MAX} - mr) AS BIGINT))
                AS BIGINT) AS sum_scaled
    FROM hll_m GROUP BY 1
),
hll AS (
    SELECT grp,
           CASE WHEN {raw} <= CAST({2.5 * HLL_M!r} AS DOUBLE)
                 AND ({HLL_M} - n_present) > 0
                THEN CAST({HLL_M} AS DOUBLE)
                     * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - n_present))
                ELSE {raw} END AS hll_est
    FROM hll_s
)"""


# ----------------------------- count-min sketch (frequency estimation)
# The frequency sibling of the HLL cardinality sketch, same
# determinism strategy: positions derive from the one portable 60-bit
# hash via Kirsch-Mitzenmacher double hashing (h1 + row*h2 mod w), so
# DuckDB rebuilds the identical d×w counter table in SQL. Counters are
# exact integers — merge is element-wise SUM (additive state, rollup-
# compatible) and the point estimate min_d(counter[d][pos_d(x)]) is
# NEVER an underestimate (the one-sided CMS guarantee tests can pin).
CMS_D = 4          # hash rows
CMS_W = 512        # counters per row → eps ≈ e/512 of total mass


def cms_h1(h: Column) -> Column:
    return F.pmod(h, F.lit(1 << 30))


def cms_h2(h: Column) -> Column:
    # odd: h2 must be invertible-ish so rows decorrelate
    return F.shiftrightunsigned(h, 30).bitwiseOR(F.lit(1))


def cms_position(h1: Column, h2: Column, row: Column) -> Column:
    """Counter index of a value in one hash row."""
    return F.pmod(h1 + row * h2, F.lit(CMS_W))


def cms_pos_sql(hash_expr: str, row_expr: str) -> str:
    """DuckDB fragment: the counter index of a hashed value in one
    hash row — the identical double-hash arithmetic."""
    return (
        f"((({hash_expr}) % {1 << 30}) + "
        f"({row_expr}) * ((({hash_expr}) >> 30) | 1)) % {CMS_W}"
    )


# ---------------------------------------------------------------------
# Equi-width histogram quantile sketch.
#
# The third mergeable sketch family (cardinality → HLL, frequency →
# count-min, rank/quantile → this): per-partition bin counts are exact
# bigints, merging is plain addition (the same algebra the rollup
# protocol stores as partial-agg segments), and a quantile is served
# from the cumulative distribution of the ≤O(range/width) bin table —
# never from the fact rows. Error is bounded by construction:
# |served - exact| ≤ bin width, deterministically on both engines
# (floor of an IEEE-double division agrees bit-for-bit in Spark and
# DuckDB on identical parquet doubles). Spark's own approx_percentile
# (Greenwald-Khanna) is the adaptive alternative, but like HLL++ its
# sketch state is engine-private — this layout is oracle-checkable and
# cross-engine mergeable.

def hist_bin(col: Column, width: float) -> Column:
    """Equi-width bin id of a numeric column: floor(x / width), NULL
    for NULL inputs (NULLs are not observations)."""
    return F.floor(col / F.lit(float(width))).cast("bigint")


def hist_bin_sql(expr: str, width: float) -> str:
    """DuckDB fragment computing the identical bin id."""
    return f"CAST(floor(({expr}) / {float(width)!r}) AS BIGINT)"
