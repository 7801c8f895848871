"""Pin Spark's F.round(double) mechanism against engine upgrades
(r15, VERDICT item 4).

The q13 oracle (plans/relational_queries.py, the DECIMAL(38,18)
shortest-repr replay) is correct BECAUSE of an implementation detail
verified in r14: Spark rounds the SHORTEST round-trip decimal repr of
the double (java.math.BigDecimal.valueOf(double) semantics), then
setScale(dp, HALF_UP) — NOT the exact binary expansion. A future
Spark could change that silently; the margin harness would only
notice when re-run at audit time. This test is the cheap, always-on
tripwire: a FIXED vector of near-boundary doubles — chosen so the
shortest-repr model, the exact-binary-expansion model, and the old
double-rounding DECIMAL(28,14) oracle all disagree somewhere on it —
goes through the live engine's F.round and must match
tests.margin_harness.spark_round_double_model exactly. The same
vector also pins the DuckDB side of the oracle (the VARCHAR ->
DECIMAL(38,18) -> ROUND replay), so a DuckDB upgrade that changes
VARCHAR-cast repr or DECIMAL rounding trips here too.

No Spark-version gate — the BEHAVIOR is the pin. If this fails after
an upgrade, the q13 oracle (and this model) must be re-derived before
trusting the driver gate.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.margin_harness import spark_round_double_model

# Discriminating fixed vector. Annotated by which wrong model each
# entry catches: [exp] = exact-binary-expansion model diverges,
# [28,14] = the pre-r15 double-rounding oracle diverges, [tie] =
# representable exact tie (away-from-zero on both engines).
VECTOR: list[tuple[float, int]] = [
    # [exp] classic: 2.675 is binary ~2.67499999999999982, but its
    # shortest repr IS "2.675" -> HALF_UP at 2dp gives 2.68.
    (2.675, 2),
    (1.005, 2),      # [exp] same shape: binary ~1.00499999999999989
    (35.855, 2),     # [exp] binary ~35.85499999999999687
    (-2.675, 2),     # [exp] sign symmetry (HALF_UP = away from zero)
    # [28,14] 17-significant-digit shortest reprs whose 14-fractional
    # truncation pre-rounds ACROSS the .5 boundary.
    (12.049999999999999, 1),
    (0.049999999999999996, 1),
    (-12.049999999999999, 1),
    (3.0500000000000003, 1),   # just ABOVE the boundary -> 3.1
    # [tie] exact representable ties.
    (0.5, 0),
    (-0.5, 0),
    (2.5, 0),
    (0.25, 1),
    (-0.25, 1),
    (1.625, 2),
    # plain values / scale extremes
    (0.0, 0),
    (-0.0, 2),
    (123456789.987654, 3),
    (1e-9, 1),
    (9.999999999999999e15, 0),
    (0.1 + 0.2, 1),            # 0.30000000000000004
    (1.0 / 3.0, 4),
    (math.pi, 4),
    (-math.e, 3),
]


def _exact_expansion_model(x: float, dp: int) -> float:
    """The WRONG model (kept as the discriminator): HALF_UP on the
    exact binary expansion of the double."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def test_vector_discriminates_the_models():
    """The vector must be able to tell the models apart — otherwise a
    mechanism change could pass the pin by luck."""
    exp_diverges = sum(
        spark_round_double_model(x, dp) != _exact_expansion_model(x, dp)
        for x, dp in VECTOR
    )
    assert exp_diverges >= 4, (
        "fixed vector no longer discriminates shortest-repr from "
        "exact-expansion rounding"
    )


def test_spark_round_matches_shortest_repr_model(spark):
    rows = [(i, x, dp) for i, (x, dp) in enumerate(VECTOR)]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("i", T.IntegerType()),
                T.StructField("x", T.DoubleType()),
                T.StructField("dp", T.IntegerType()),
            ]
        ),
    )
    # one F.round column per distinct dp (F.round's scale is a
    # literal), picked per-row
    dps = sorted({dp for _, dp in VECTOR})
    picked = F.when(F.col("dp") == dps[0], F.round(F.col("x"), dps[0]))
    for dp in dps[1:]:
        picked = picked.when(F.col("dp") == dp, F.round(F.col("x"), dp))
    got = {
        r["i"]: r["v"]
        for r in df.select("i", picked.alias("v")).collect()
    }
    bad = []
    for i, (x, dp) in enumerate(VECTOR):
        want = spark_round_double_model(x, dp)
        if got[i] != want and not (math.isnan(got[i]) and math.isnan(want)):
            bad.append((repr(x), dp, got[i], want))
    assert not bad, (
        "Spark F.round(double) no longer matches the shortest-repr "
        f"HALF_UP model — q13's oracle is invalid until re-derived: {bad}"
    )


def test_duckdb_oracle_replay_matches_model():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    bad = []
    for x, dp in VECTOR:
        if abs(x) >= 1e20:  # documented precision bound of the replay
            continue
        (got,) = con.execute(
            "SELECT CAST(ROUND(CAST(CAST(CAST(? AS DOUBLE) AS VARCHAR)"
            " AS DECIMAL(38,18)), ?) AS DOUBLE)",
            [x, dp],
        ).fetchone()
        want = spark_round_double_model(x, dp)
        if got != want and not (math.isnan(got) and math.isnan(want)):
            bad.append((repr(x), dp, got, want))
    assert not bad, (
        "DuckDB shortest-repr replay diverged from the model — the "
        f"q13 oracle idiom needs re-derivation: {bad}"
    )
