"""SemDeDup semantic deduplication (similarity.semantic_dedup_pairs /
semantic_dedup): cross-engine DuckDB oracle on the driver embeddings,
planted near-identical vectors, keep-set semantics, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.similarity import (
    ivf_centroids_for_dir,
    semantic_dedup,
    semantic_dedup_pairs,
)
from solarpaneldatawrangler_spark.sources.star import load_table
from tests.oracle_harness import compare, run_oracle

THRESHOLD = 0.4  # the corpus' planted near-dups sit around cos 0.4


def _semdedup_oracle_sql(cents: list[list[float]], threshold: float) -> str:
    """Replay the operator relationally: centroids as VALUES, assignment
    = argmax(v.c - |c|^2/2) with low-list tiebreak (q67's oracle idiom),
    pairs = within-list self-join, cut on ROUND(cosine, 4)."""
    values = ",\n".join(
        f"({l},{j + 1},{w!r})"
        for l, cent in enumerate(cents)
        for j, w in enumerate(cent)
    )
    return f"""
    WITH cent(l, j, w) AS (VALUES {values}),
    cn AS (SELECT l, SUM(w * w) AS n2 FROM cent GROUP BY l),
    dots AS (
        SELECT e.vec_id, c.l, SUM(CAST(e.embedding[c.j] AS DOUBLE) * c.w) AS dot
        FROM embeddings e JOIN cent c ON c.j <= len(e.embedding)
        GROUP BY e.vec_id, c.l
    ),
    sc AS (
        SELECT d.vec_id, d.l, ROW_NUMBER() OVER (
                   PARTITION BY d.vec_id
                   ORDER BY d.dot - cn.n2 / 2 DESC, d.l) AS rn
        FROM dots d JOIN cn USING (l)
    ),
    assigned AS (SELECT vec_id, l FROM sc WHERE rn = 1),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, CAST(a.l AS INT) AS list_id,
               ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                            CAST(eb.embedding AS DOUBLE[])), 4)
                   AS cos_r
        FROM assigned a
        JOIN assigned b ON a.l = b.l AND a.vec_id < b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
    )
    SELECT id_a, id_b, list_id, cos_r FROM pairs WHERE cos_r >= {threshold}
    """


def test_pairs_match_duckdb(spark, sf_dir):
    cents = ivf_centroids_for_dir(sf_dir)
    got = semantic_dedup_pairs(
        load_table(spark, sf_dir, "embeddings"), cents, threshold=THRESHOLD
    )
    assert got.count() > 0, "threshold finds no pairs — probe is vacuous"
    want = run_oracle(_semdedup_oracle_sql(cents, THRESHOLD), sf_dir)
    compare(got, want, "semantic_dedup_pairs")


def test_planted_near_identical_group(spark):
    # two near-identical copies of u (cos > 0.9999), one orthogonal v;
    # centroids pin u-likes and v to different lists
    dim = 8
    u = [1.0] + [0.0] * (dim - 1)
    u2 = [1.0, 1e-4] + [0.0] * (dim - 2)
    u3 = [1.0, 0.0, 1e-4] + [0.0] * (dim - 3)
    v = [0.0, 1.0] + [0.0] * (dim - 2)
    vecs = spark.createDataFrame(
        [(10, u), (11, u2), (12, u3), (20, v)],
        "vec_id long, embedding array<double>",
    )
    cents = [u, v]
    pairs = semantic_dedup_pairs(vecs, cents, threshold=0.999).collect()
    assert sorted((r.id_a, r.id_b) for r in pairs) == [
        (10, 11), (10, 12), (11, 12),
    ]
    kept = sorted(r.vec_id for r in semantic_dedup(vecs, cents, 0.999).collect())
    assert kept == [10, 20]  # min id per clique + the singleton


def test_keep_set_is_complement_of_drop_ids(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids_for_dir(sf_dir)
    pairs = semantic_dedup_pairs(emb, cents, threshold=THRESHOLD)
    drops = {r.id_b for r in pairs.select("id_b").distinct().collect()}
    kept = {r.vec_id for r in semantic_dedup(emb, cents, THRESHOLD).collect()}
    everything = {r.vec_id for r in emb.select("vec_id").collect()}
    assert kept == everything - drops
    assert kept | drops == everything


def test_oversized_cluster_fails_loudly(spark):
    vecs = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(5)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="max_cluster"):
        semantic_dedup_pairs(
            vecs, [[1.0, 0.0], [0.0, 1.0]], threshold=0.5, max_cluster=3
        ).collect()


def test_no_cartesian_product(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids_for_dir(sf_dir)
    plan = semantic_dedup_pairs(emb, cents, threshold=THRESHOLD)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_empty_input_yields_no_pairs(spark):
    vecs = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    assert semantic_dedup_pairs(vecs, [[1.0, 0.0], [0.0, 1.0]], 0.9).count() == 0
