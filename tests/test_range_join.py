"""Bin-bucketed interval join (operators/relational.range_join_binned):
pair-set parity against a driver-side brute-force reference over seeded
random data (the corpus_diff testing idiom), half-open boundary pins,
bin-width invariance, and the equi-join plan shape the rewrite exists
for. Cross-engine value parity is q65's 'range' oracle rows (the naive non-equi
SQL join) in test_oracle_queries."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.relational import range_join_binned


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _events(spark, micros):
    rows = [(i, m) for i, m in enumerate(micros)]
    return _mk(spark, rows, ["e_id", "us"]).select(
        "e_id", F.timestamp_micros(F.col("us")).alias("ts")
    )


def _intervals(spark, spans):
    rows = [(i, lo, hi) for i, (lo, hi) in enumerate(spans)]
    return _mk(spark, rows, ["w_id", "lo_us", "hi_us"]).select(
        "w_id",
        F.timestamp_micros(F.col("lo_us")).alias("lo"),
        F.timestamp_micros(F.col("hi_us")).alias("hi"),
    )


def _pairs(df):
    return {(r.w_id, r.e_id) for r in df.select("w_id", "e_id").collect()}


def test_matches_bruteforce_across_bin_widths(spark):
    """Seeded random events x random intervals (lengths from sub-bin to
    many-bin, including empty and inverted): the binned join's pair set
    equals the brute-force [lo, hi) reference at every bin width —
    correctness must not depend on the tuning knob."""
    rng = random.Random(82)
    base = 1_700_000_000_000_000  # a fixed epoch anchor, micros
    micros = [base + rng.randrange(0, 3_600_000_000) for _ in range(300)]
    spans = []
    for _ in range(40):
        lo = base + rng.randrange(0, 3_600_000_000)
        length = rng.choice(
            [0, -5_000_000, rng.randrange(1, 1_000_000),
             rng.randrange(1_000_000, 600_000_000)]
        )
        spans.append((lo, lo + length))
    expected = {
        (w, i)
        for w, (lo, hi) in enumerate(spans)
        for i, m in enumerate(micros)
        if lo <= m < hi
    }
    ev, iv = _events(spark, micros), _intervals(spark, spans)
    for bin_seconds in (1, 7, 60, 3600):
        got = _pairs(
            range_join_binned(ev, iv, "ts", "lo", "hi", bin_seconds)
        )
        assert got == expected, f"bin_seconds={bin_seconds}"


def test_half_open_boundaries_exact(spark):
    """ts == lo joins, ts == hi does not — including when the bounds sit
    exactly ON a bucket boundary (the off-by-one trap the hi-1-micro
    bucket bound exists for)."""
    w = 10_000_000  # 10 s bins
    lo, hi = 5 * w, 8 * w  # both exactly on bucket boundaries
    ev = _events(spark, [lo - 1, lo, hi - 1, hi, hi + 1])
    iv = _intervals(spark, [(lo, hi)])
    got = _pairs(range_join_binned(ev, iv, "ts", "lo", "hi", 10))
    assert got == {(0, 1), (0, 2)}


def test_plan_is_an_equi_join_on_the_bucket(spark):
    """The rewrite's whole point: the physical plan is a hash/sort-merge
    EQUI-join keyed on the bucket — never BroadcastNestedLoopJoin or a
    cartesian, which is what the raw non-equi predicate compiles to."""
    ev = _events(spark, [1_000_000 * i for i in range(50)])
    iv = _intervals(spark, [(0, 30_000_000), (10_000_000, 90_000_000)])
    joined = range_join_binned(ev, iv, "ts", "lo", "hi", 10)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "_rj_bin" in plan  # the join key is the bucket
    # and the naive phrasing really does demote, so the rewrite matters
    naive = iv.join(
        ev, (F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi"))
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert (
        "BroadcastNestedLoopJoin" in naive_plan
        or "CartesianProduct" in naive_plan
    )
