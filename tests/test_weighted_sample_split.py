"""A-ES weighted sampling (Efraimidis-Spirakis 2006) and the
deterministic train/valid/test split (operators/sampling.py r10b):
Python-reference parity, cross-engine SQL parity, merge property, and
the conservative null/non-positive-weight contract."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.sampling import (
    es_key,
    es_key_sql,
    split_assign,
    split_assign_sql,
    weighted_sample,
)


def _py_es_key(weight: float, doc_id: int, seed: str = "0", dp: int = 6):
    if weight is None or weight <= 0:
        return None
    h = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:8], 16)
    u = (h + 0.5) / 4294967296.0
    return round(-math.log(u) / weight, dp)


def _docs(spark, n=300):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 17 + 1).cast("double").alias("w"),
    )


def test_es_key_matches_python_reference(spark):
    rows = (
        _docs(spark)
        .select("doc_id", "w", es_key(F.col("w"), F.col("doc_id")).alias("k"))
        .collect()
    )
    for r in rows:
        assert r.k == pytest.approx(_py_es_key(r.w, r.doc_id), abs=0), r


def test_weighted_sample_is_bottom_k_and_deterministic(spark):
    docs = _docs(spark)
    got = [r.doc_id for r in weighted_sample(docs, F.col("w"), k=25).collect()]
    ref = sorted(
        ((_py_es_key(r.w, r.doc_id), r.doc_id) for r in docs.collect()),
    )[:25]
    assert got == [d for _k, d in ref]
    # rerun identical (no RNG state)
    again = [r.doc_id for r in weighted_sample(docs, F.col("w"), k=25).collect()]
    assert again == got


def test_weighted_sample_merge_property(spark):
    """Bottom-k of a union == bottom-k of per-shard bottom-k's — the
    property that lets shards sample independently then merge."""
    docs = _docs(spark, 400)
    direct = weighted_sample(docs, F.col("w"), k=20).select("doc_id", "es_key_r")
    a = weighted_sample(docs.filter(F.col("doc_id") % 2 == 0), F.col("w"), k=20)
    b = weighted_sample(docs.filter(F.col("doc_id") % 2 == 1), F.col("w"), k=20)
    merged = (
        a.select("doc_id", "es_key_r")
        .unionByName(b.select("doc_id", "es_key_r"))
        .orderBy("es_key_r", "doc_id")
        .limit(20)
    )
    assert merged.collect() == direct.collect()


def test_es_key_null_and_nonpositive_weights_never_sampled(spark):
    docs = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    got = {r.doc_id for r in weighted_sample(docs, F.col("w"), k=10).collect()}
    assert got == {1, 5}


def test_es_key_sql_parity(spark):
    spark_rows = {
        r.doc_id: r.k
        for r in _docs(spark)
        .select("doc_id", es_key(F.col("w"), F.col("doc_id")).alias("k"))
        .collect()
    }
    duck = duckdb.connect().execute(
        f"SELECT r AS doc_id, {es_key_sql('r % 17 + 1', 'r')} AS k "
        "FROM range(300) t(r)"
    ).fetchall()
    assert {d: k for d, k in duck} == spark_rows


def test_weight_monotonicity_in_inclusion(spark):
    """Heavier rows are sampled more often: with weight 10 vs 1 on
    disjoint halves, the heavy half should dominate a k=100 sample of
    1000 docs (deterministic check — fixed hash stream)."""
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, 10.0).otherwise(1.0).alias("w"),
    )
    got = weighted_sample(docs, F.col("w"), k=100).collect()
    heavy = sum(1 for r in got if r.doc_id < 500)
    assert heavy > 75  # E[heavy] ~ 91 under p proportional to w


def test_split_assign_fractions_and_determinism(spark):
    fr = {"train": 0.9, "valid": 0.05, "test": 0.05}
    docs = spark.range(4000).select(F.col("id").alias("doc_id"))
    got = docs.select(
        "doc_id", split_assign(F.col("doc_id"), fr).alias("split")
    )
    counts = {r["split"]: r["n"] for r in got.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert abs(counts["train"] / 4000 - 0.9) < 0.03
    assert abs(counts["valid"] / 4000 - 0.05) < 0.02
    assert abs(counts["test"] / 4000 - 0.05) < 0.02
    assert got.collect() == got.collect()  # pure function of the data


def test_split_assign_sql_parity(spark):
    fr = {"train": 0.9, "valid": 0.05, "test": 0.05}
    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    spark_rows = {
        r.doc_id: r.split
        for r in docs.select(
            "doc_id", split_assign(F.col("doc_id"), fr).alias("split")
        ).collect()
    }
    duck = duckdb.connect().execute(
        f"SELECT r, {split_assign_sql('r', fr)} FROM range(500) t(r)"
    ).fetchall()
    assert {d: s for d, s in duck} == spark_rows


def test_split_fractions_must_sum_to_one():
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(F.lit(1), {"train": 0.5, "test": 0.4})
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign_sql("r", {"train": 0.5, "test": 0.6})


def test_split_sql_handles_quoted_labels_and_single_label(spark):
    """Review-caught (the mixture_case_sql lesson, round 2): labels and
    seeds with embedded quotes must emit escaped SQL literals, and the
    degenerate {label: 1.0} input — which the Spark twin accepts —
    must emit parseable SQL (a WHEN-less CASE is a syntax error)."""
    con = duckdb.connect()
    sql = split_assign_sql("r", {"train": 1.0})
    assert con.execute(
        f"SELECT {sql} FROM range(3) t(r)"
    ).fetchall() == [("train",)] * 3

    fr = {"tr'ain": 0.5, "b": 0.5}
    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    spark_rows = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", split_assign(F.col("doc_id"), fr, seed="se'ed").alias("s")
        ).collect()
    }
    duck = con.execute(
        f"SELECT r, {split_assign_sql('r', fr, seed=chr(39).join(['se','ed']))}"
        " FROM range(200) t(r)"
    ).fetchall()
    assert {d: s for d, s in duck} == spark_rows
    assert "tr'ain" in set(spark_rows.values())


def test_es_key_sql_quoted_seed_parity(spark):
    con = duckdb.connect()
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5 + 1).cast("double").alias("w")
    )
    spark_rows = {
        r.doc_id: r.k
        for r in docs.select(
            "doc_id", es_key(F.col("w"), F.col("doc_id"), seed="o'seed").alias("k")
        ).collect()
    }
    duck = con.execute(
        f"SELECT r, {es_key_sql('r % 5 + 1', 'r', seed=chr(39).join(['o','seed']))}"
        " FROM range(50) t(r)"
    ).fetchall()
    assert {d: k for d, k in duck} == spark_rows


def test_weighted_sample_compiles_to_take_ordered(spark):
    """The selection must be TakeOrderedAndProject(k) — bounded state,
    never a global Sort of the corpus (the kmv_sketch plan contract)."""
    docs = _docs(spark, 1000)
    plan = (
        weighted_sample(docs, F.col("w"), k=25)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_balanced_shards_properties_and_sql_parity(spark):
    """Snake-draft balanced sharding (operators/packing.balanced_shards):
    equal shard row counts (within 1), shard weight-mass spread bounded
    by ~2x the max item weight (full blocks telescope to w_max - w_min;
    one partial block adds <= w_max), rank_col path parity with the
    window path, and the DuckDB replay via balanced_shards_sql."""
    import duckdb

    from solarpaneldatawrangler_spark.operators.packing import (
        balanced_shards,
        balanced_shards_sql,
    )

    n, shards = 1003, 8
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 211 + 1).cast("long").alias("w"),
    )
    got = balanced_shards(docs, shards, weight_col="w").collect()
    by_shard: dict[int, list[int]] = {}
    for r in got:
        by_shard.setdefault(r.bal_shard, []).append(r.w)
    assert set(by_shard) == set(range(shards))
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) - min(sizes) <= 1
    masses = [sum(v) for v in by_shard.values()]
    assert max(masses) - min(masses) <= 2 * 211, masses

    # rank_col path (map-only at scale) matches the window path
    from pyspark.sql import Window

    ranked = docs.withColumn(
        "r",
        F.row_number().over(Window.orderBy(F.col("w").desc(), "doc_id")) - 1,
    )
    via_rank = {
        r.doc_id: r.bal_shard
        for r in balanced_shards(
            ranked, shards, weight_col="w", rank_col="r"
        ).collect()
    }
    assert via_rank == {r.doc_id: r.bal_shard for r in got}

    # DuckDB replay
    duck = duckdb.connect().execute(
        "SELECT id, bal_shard FROM ("
        + balanced_shards_sql("(r * 37) % 211 + 1", "r", shards, "range(1003) t(r)")
        + ")"
    ).fetchall()
    assert {d: s for d, s in duck} == {r.doc_id: r.bal_shard for r in got}
