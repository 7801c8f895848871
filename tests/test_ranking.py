"""BM25 ranking (operators/ranking.py): cross-engine DuckDB oracle on
the documents table, hand-computed reference, top-k plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.ranking import (
    bm25_scores,
    bm25_topk,
    idf_weights,
)
from solarpaneldatawrangler_spark.sources.star import load_table
from tests.oracle_harness import compare, run_oracle

TERMS = ["vector", "hash", "spark"]
_SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)"


def _bm25_oracle_sql(terms: list[str], k1: float = 1.2, b: float = 0.75) -> str:
    tf_cols = ",\n".join(
        f"len(list_filter(t, x -> x = '{t}')) AS tf_{i}" for i, t in enumerate(terms)
    )
    df_cols = ",\n".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * {k1 + 1.0} / (tf_{i} + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
        for i in range(len(terms))
    )
    return f"""
    WITH base AS (
        SELECT doc_id, len(t) AS dl, {tf_cols}
        FROM (SELECT doc_id, {_SQL_TOKS} AS t FROM documents)
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl, {df_cols} FROM base
    )
    SELECT doc_id, ROUND({score}, 6) AS bm25_r FROM base, stats
    """


def test_scores_match_duckdb(spark, sf_dir):
    got = bm25_scores(load_table(spark, sf_dir, "documents"), TERMS)
    assert got.filter(F.col("bm25_r") > 0).count() > 0
    want = run_oracle(_bm25_oracle_sql(TERMS), sf_dir)
    compare(got, want, "bm25_scores")


def test_hand_computed_tiny_corpus(spark):
    # 3 docs, query = ["fox"]: N=3, df=2, avgdl = (4+4+1)/3
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "fox fox fox fox"),
            (3, "hedgehog"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.bm25_r for r in bm25_scores(docs, ["fox"]).collect()}
    k1, b, avgdl = 1.2, 0.75, 3.0
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))

    def ref(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    assert rows[1] == pytest.approx(ref(1, 4), abs=1e-6)
    assert rows[2] == pytest.approx(ref(4, 4), abs=1e-6)
    assert rows[3] == 0.0
    # saturation: 4 occurrences score less than 4x one occurrence
    assert rows[2] < 4 * rows[1]


def test_duplicate_terms_deduped(spark):
    docs = spark.createDataFrame(
        [(1, "fox den"), (2, "den")], "doc_id long, text string"
    )
    once = {r.doc_id: r.bm25_r for r in bm25_scores(docs, ["fox"]).collect()}
    twice = {r.doc_id: r.bm25_r for r in bm25_scores(docs, ["fox", "FOX"]).collect()}
    assert once == twice


def test_topk_is_take_ordered(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    top = bm25_topk(docs, TERMS, k=5)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = top.collect()
    assert len(rows) == 5
    scores = [r.bm25_r for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_empty_terms_raise(spark, sf_dir):
    with pytest.raises(ValueError, match="empty term list"):
        bm25_scores(load_table(spark, sf_dir, "documents"), [])


def test_idf_weights_helper():
    w = idf_weights(100, {"rare": 1, "common": 99})
    assert w["rare"] > w["common"] > 0


def test_extras_key_collision_raises(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    from pyspark.sql import functions as F

    for bad in ("_dl", "_tf0", "doc_id", "bm25_r"):
        with pytest.raises(ValueError, match="collide"):
            bm25_scores(docs, ["a"], extras={bad: F.length("text")})
    # non-colliding extras still pass through
    out = bm25_scores(docs, ["a"], extras={"n_chars": F.length("text")})
    assert out.columns == ["doc_id", "n_chars", "bm25_r"]
