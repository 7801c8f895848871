"""Exact-rational rounding helpers (functions/rounding.py, r13): the
three twins (Spark column, DuckDB SQL, Python int) must implement the
IDENTICAL round-half-away-from-zero rule — verified against an
independent Fraction-based formulation (floor + compare-to-half, not
the fused (2p|n|+d)//(2d) expression) across random and adversarial
inputs, including true decimal ties where double-path rounding is
engine-dependent (the class this module closes)."""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.rounding import (
    round_ratio_half_away,
    round_ratio_half_away_py,
    round_ratio_half_away_sql,
)


def expected(num: int, den: int, dp: int) -> float:
    """Independent reference: exact Fraction arithmetic, floor + half
    compare (half away from zero via |num|)."""
    p = 10**dp
    f = Fraction(abs(num)) * p / den
    q = f.numerator // f.denominator
    if f - q >= Fraction(1, 2):
        q += 1
    return (-q if num < 0 else q) / p


@given(
    num=st.integers(min_value=-(10**12), max_value=10**12),
    den=st.integers(min_value=1, max_value=10**9),
    dp=st.sampled_from([1, 4, 6, 9]),
)
@settings(max_examples=300, deadline=None)
def test_python_twin_matches_fraction(num, den, dp):
    assume((2 * 10**dp * abs(num) + den) // (2 * den) < 2**53)
    assert round_ratio_half_away_py(num, den, dp) == expected(num, den, dp)


# adversarial vector: true decimal ties (10^dp*num/den half-integer),
# near-ties one unit off, negatives, zero, and quality_score-scale
# magnitudes (num ~ 5e13, den ~ 1e14 — the widest catalog use)
ADVERSARIAL = [
    # (num, den, dp)
    (1, 128, 6),          # 0.0078125 -> tie at 6dp (dyadic)
    (1, 640, 6),          # 0.0015625 -> tie, NON-dyadic denominator
    (-1, 640, 6),         # negative tie: half AWAY -> -0.001563
    (3, 640, 6),          # 0.0046875 tie
    (1, 2000000, 6),      # 5e-7 -> tie at exactly half an ulp of 1e-6
    (1, 2000000 - 2, 6),  # just above the tie
    (1, 2000000 + 2, 6),  # just below the tie
    (0, 7, 6),
    (7, 7, 6),
    (1, 3, 6),            # repeating decimal
    (2, 3, 9),
    (123456789, 1000000000, 9),
    (5_0000_0000_0000, 10_0000_0000_0000, 6),   # 0.5 at card scale
    (49_999_999_999_999, 100_000_000_000_000, 6),
    (1023 * (1 << 32), 4_294_967_296, 4),        # kmv full-sketch shape
    ((1 << 52) + 1, (1 << 53), 6),               # huge dyadic tie-ish
]


def test_duckdb_twin_matches_fraction():
    con = duckdb.connect()
    for num, den, dp in ADVERSARIAL:
        sql = round_ratio_half_away_sql(str(num), str(den), dp)
        got = con.execute(f"SELECT {sql}").fetchone()[0]
        assert got == expected(num, den, dp), (num, den, dp, got)
        if num >= 0:
            sql = round_ratio_half_away_sql(
                str(num), str(den), dp, assume_nonneg=True
            )
            got = con.execute(f"SELECT {sql}").fetchone()[0]
            assert got == expected(num, den, dp), (num, den, dp, got)


@given(
    num=st.integers(min_value=-(10**12), max_value=10**12),
    den=st.integers(min_value=1, max_value=10**9),
    dp=st.sampled_from([1, 4, 6, 9]),
)
@settings(max_examples=60, deadline=None)
def test_duckdb_twin_matches_fraction_random(num, den, dp):
    # documented domain: the rounded quotient stays under 2^53 (every
    # catalog use is orders of magnitude inside; beyond it the final
    # int->double render itself rounds and the twins may disagree)
    assume((2 * 10**dp * abs(num) + den) // (2 * den) < 2**53)
    con = duckdb.connect()
    sql = round_ratio_half_away_sql(str(num), str(den), dp)
    assert con.execute(f"SELECT {sql}").fetchone()[0] == expected(num, den, dp)


def test_spark_column_matches_fraction(spark):
    rows = [(i, n, d, dp) for i, (n, d, dp) in enumerate(ADVERSARIAL)]
    df = spark.createDataFrame(rows, "i int, num long, den long, dp int")
    for dp in sorted({dp for _, _, dp in ADVERSARIAL}):
        sub = df.filter(F.col("dp") == dp).select(
            "i",
            round_ratio_half_away(F.col("num"), F.col("den"), dp).alias("r"),
        )
        got = {r.i: r.r for r in sub.collect()}
        for i, (n, d, dpx) in enumerate(ADVERSARIAL):
            if dpx == dp:
                assert got[i] == expected(n, d, dpx), (n, d, dpx, got[i])


def test_spark_wide_decimal_path(spark):
    """quality_score-scale numerators (2*10^6*num ~ 1e20 > int64) must
    round exactly through the decimal(38,0) path."""
    n, d = 49_999_999_999_999, 100_000_000_000_000  # 0.49999999999999
    df = spark.range(1).select(
        round_ratio_half_away(
            F.lit(n).cast("long"), F.lit(d).cast("long"), 6
        ).alias("r")
    )
    assert df.collect()[0].r == expected(n, d, 6) == 0.5


def test_exact_across_int64_magnitude_boundary(spark):
    """Probe pairs straddling the 2^52/(2*10^dp) magnitude where r13's
    deleted int64 fast path used to switch over (r14: single decimal
    path — bench_out/r14_q52_ab.json measured the hybrid slower in both
    build and exec, so the branch is gone; this keeps the boundary
    magnitudes, including exact .5 ties on each side, as a value
    regression net)."""
    dp = 6
    lim = (1 << 52) // (2 * 10**dp)
    cases = [
        (lim - 1, lim - 1, dp),          # fast, q at scale
        (lim - 3, 2 * (lim - 3), dp),    # fast, exact .5 tie
        (lim + 1, lim - 1, dp),          # wide via num
        (lim - 1, lim + 1, dp),          # wide via den
        (lim + 5, 2 * (lim + 5), dp),    # wide, exact .5 tie
        (3 * (lim + 9), 2_000_000 * (lim + 9), dp),  # wide, tie at 1.5e-6
    ]
    df = spark.createDataFrame(
        [(i, n, d) for i, (n, d, _) in enumerate(cases)],
        "i int, num long, den long",
    )
    got = {
        r.i: r.r
        for r in df.select(
            "i", round_ratio_half_away(F.col("num"), F.col("den"), dp).alias("r")
        ).collect()
    }
    for i, (n, d, dpx) in enumerate(cases):
        assert got[i] == expected(n, d, dpx), (n, d, got[i])


def test_null_propagation(spark):
    df = spark.range(1).select(
        round_ratio_half_away(
            F.lit(None).cast("long"), F.lit(7).cast("long"), 6
        ).alias("r")
    )
    assert df.collect()[0].r is None


def test_tie_is_engine_dependent_on_the_double_path():
    """The motivating failure: ROUND-via-doubles diverges from exact
    half-away on a non-dyadic tie, so the OLD path was engine-dependent
    — documents why the conversion exists."""
    con = duckdb.connect()
    exact = expected(1, 640, 6)  # 0.0015625 -> half-away = 0.001563
    assert exact == 0.001563
    dbl = con.execute("SELECT ROUND(1::DOUBLE / 640, 6)").fetchone()[0]
    py = round(1 / 640 * 1e6) / 1e6
    # at least one double path lands on the other side of the tie —
    # if BOTH ever agree with exact here, the guard still holds (the
    # class is about lack of a guarantee, not a constant failure)
    assert {dbl, py, exact} <= {0.001562, 0.001563}
