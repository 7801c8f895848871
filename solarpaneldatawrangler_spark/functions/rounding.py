"""Engine-exact half-away-from-zero rounding for EXACT-RATIONAL
columns (r13, closing the rounding-tie class DESIGN.md §r12 measured).

Context: a hashed rounded column whose unrounded value is the exact
rational num/den (integer numerator over a positive integer
denominator) must NOT round through doubles — Spark's ``F.round`` is
BigDecimal HALF_UP on the exact binary value while DuckDB's ``ROUND``
multiplies by 10^dp in doubles, and near a decimal tie the two paths
can land on different sides (measured: the q52 clf_r divergence the
sf1.0 sweep caught in r12). ``operators.curation.hashed_linear_score_r6``
closed that one column; this module is the GENERAL helper so every
exact-rational column in the catalog rounds identically in any engine:

    round_half_away(num/den, dp)
      = sign(num) * floor((2*10^dp*|num| + den) / (2*den)) / 10^dp

computed in pure integer arithmetic on both sides — Spark in
decimal(38,0) (wide enough for every catalog numerator: the largest,
quality_score's 5*sw_num*chars + ... over 10*toks*chars, stays under
10^21 << 10^38), DuckDB in HUGEINT (int128). The floor division strips
the remainder with pmod first and divides the exact multiple, so the
decimal quotient is a whole number carried exactly at any magnitude
(the hashed_linear_score_r6 lesson: a double division is only exact
below 2^53).

The rounded result is returned as DOUBLE = integer/10^dp — exactly the
type/rendering the driver hashes today, so converting a column changes
its value ONLY on a true decimal tie (where the old double path was
engine-dependent).

Domain: the rounded integer quotient |num/den|*10^dp must stay under
2^53 (so the final integer→double render is exact and all three twins
agree bit-for-bit). Every catalog use is orders of magnitude inside
this: fractions in [0,1] at 6dp (q <= 1e6), longitude at 9dp
(q <= 3.6e11), cardinality estimates at 4dp (q <= ~1e13 at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def round_ratio_half_away(num: Column, den: Column, dp: int) -> Column:
    """Exact round-half-away-from-zero of the rational num/den at dp
    decimals, as a DOUBLE. ``num`` may be negative; ``den`` must be a
    positive integer column (callers guard with GREATEST(..., 1)).

    Two value-identical arithmetic paths, chosen per row (r13 bench:
    decimal ops in a scan-hot fraction cost ~25% on the q52 pinned
    workload): when 2*10^dp*|num| + den provably stays under 2^53
    (|num| and den each under 2^52/(2*10^dp)), everything runs in
    int64 and the final exact-multiple division runs in DOUBLE —
    exact, because an IEEE divide of a <2^53 exact multiple by its
    <2^53 divisor is the correctly-rounded integer quotient. Wider
    rows (huge docs, cardinality estimates) take the decimal(38,0)
    route. Both compute the same floor((2p|n|+d)/(2d))."""
    p = 10**dp
    lim = F.lit((1 << 52) // (2 * p))
    n_l = F.abs(num).cast("long")
    d_l = den.cast("long")
    # fast path: all-long, exact double divide
    a_l = F.lit(2 * p).cast("long") * n_l + d_l
    b_l = F.lit(2).cast("long") * d_l
    q_fast = ((a_l - F.pmod(a_l, b_l)) / b_l).cast("long")
    # wide path: decimal(38,0) — pmod strips the remainder, the exact
    # multiple divides to a whole-number decimal at any int128-ish
    # magnitude (a double division is only exact below 2^53)
    n_w = n_l.cast(_DEC)
    d_w = d_l.cast(_DEC)
    a_w = F.lit(2 * p).cast(_DEC) * n_w + d_w
    b_w = F.lit(2).cast(_DEC) * d_w
    q_wide = ((a_w - F.pmod(a_w, b_w)) / b_w).cast("long")
    q = F.when((n_l < lim) & (d_l < lim), q_fast).otherwise(q_wide)
    signed = F.when(num < 0, -q).otherwise(q)
    return signed.cast("double") / F.lit(float(p))


def round_ratio_half_away_sql(
    num_expr: str, den_expr: str, dp: int, *, assume_nonneg: bool = False
) -> str:
    """DuckDB twin of :func:`round_ratio_half_away` — same integer
    half-away rounding in HUGEINT, same final /10^dp double render.
    ``assume_nonneg=True`` skips the sign plumbing (count ratios are
    never negative) so composed SQL doesn't repeat a large num_expr."""
    p = 10**dp
    if assume_nonneg:
        return (
            f"(CAST((2*{p}*CAST(({num_expr}) AS HUGEINT)"
            f" + ({den_expr}))"
            f" // (2*CAST(({den_expr}) AS HUGEINT)) AS BIGINT))"
            f" / {p}.0"
        )
    return (
        f"((CASE WHEN ({num_expr}) < 0 THEN -1 ELSE 1 END)"
        f" * CAST((2*{p}*abs(CAST(({num_expr}) AS HUGEINT))"
        f" + ({den_expr}))"
        f" // (2*CAST(({den_expr}) AS HUGEINT)) AS BIGINT))"
        f" / {p}.0"
    )


def round_ratio_half_away_py(num: int, den: int, dp: int) -> float:
    """Python twin (for Arrow-batched UDF internals like the Gopher
    dup-n-gram coverage battery): identical integer arithmetic, exact
    at any magnitude (Python ints are unbounded)."""
    p = 10**dp
    q = (2 * p * abs(num) + den) // (2 * den)
    return (-q if num < 0 else q) / p
