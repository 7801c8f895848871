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

computed in pure integer arithmetic on both sides. Input domain
(r14, correcting the r13 docstring): the Spark helper ingests num/den
through ``.cast('long')`` — and quality_score builds its numerator in
int64 arithmetic upstream — so |num| and den must stay under 2^63.
Past that, Spark (non-ANSI) wraps silently while the DuckDB twin's
BIGINT ingest raises: callers own the bound. It is comfortable for
every catalog column — the largest numerator, quality_score's
5*a*d + 3*b*(d-c) + 2*b*d*e, needs a ~1.4 GB document to reach 2^63.
What the decimal(38,0) widening actually protects is the INTERMEDIATE
2*10^dp*|num| + den product (which overflows int64 ~10^3 earlier than
the inputs do); DuckDB's HUGEINT (int128) does the same job there.
The floor division strips the remainder with pmod first and divides
the exact multiple, so the decimal quotient is a whole number carried
exactly at any in-domain magnitude (the hashed_linear_score_r6
lesson: a double division is only exact below 2^53).

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

    Single decimal(38,0) arithmetic path (r14). r13 shipped a hybrid
    with a per-row int64 fast path claimed to save ~25% on scan-hot
    count ratios; the bench-context A/B (bench_out/r14_q52_ab.json,
    full q52 plan, warm + cache-off, interleaved best-of-5, value
    hashes identical) measured the opposite — the fast path never won:
      exec  (agg(sum(quality)) over sf0.1 docs, warm):
        decimal-only 0.425s  <  int64-only 0.431s  <  hybrid 0.470s
      plan build+analysis (the driver-side cost the pinned .count()
      workload actually times — its scan prunes to ReadSchema<>):
        decimal-only 0.142s  <  hybrid 0.203s
    The hybrid's dual expression tree + per-row CASE cost more than
    decimal arithmetic ever did, so the fast path is deleted. (An
    eval-once higher-order-function binding was also measured and
    rejected: lambda interpretation cost ~1.5x the duplicated
    sub-expressions it saved.)

    pmod strips the remainder first and the exact multiple divides to
    a whole-number decimal at any in-domain magnitude (a double
    division is only exact below 2^53) — floor((2p|n|+d)/(2d))."""
    p = 10**dp
    n_w = F.abs(num).cast("long").cast(_DEC)
    d_w = den.cast("long").cast(_DEC)
    a_w = F.lit(2 * p).cast(_DEC) * n_w + d_w
    b_w = F.lit(2).cast(_DEC) * d_w
    q = ((a_w - F.pmod(a_w, b_w)) / b_w).cast("long")
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
