"""Bigram LM quality score (curation.bigram_lm_score): pure-Python
reference parity, unseen-context backoff on a held-out train corpus,
DuckDB oracle on the driver documents."""

from __future__ import annotations

import math
from collections import Counter

from solarpaneldatawrangler_spark.operators.curation import bigram_lm_score
from solarpaneldatawrangler_spark.sources.star import load_table
from tests.oracle_harness import compare, run_oracle

_SQL_TOKS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)"
)

_LM_ORACLE = rf"""
WITH btoks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
brows AS (
    SELECT doc_id, toks[CAST(u.i AS INT)] AS w1,
           toks[CAST(u.i AS INT) + 1] AS w2
    FROM btoks, LATERAL UNNEST(range(1, len(toks))) AS u(i)
),
bctx AS (SELECT w1, COUNT(*) AS c_ctx FROM brows GROUP BY w1),
bbig AS (SELECT w1, w2, COUNT(*) AS c_big FROM brows GROUP BY w1, w2),
bv AS (SELECT COUNT(DISTINCT t) AS v
       FROM (SELECT unnest(toks) AS t FROM btoks)),
bsc AS (
    SELECT r.doc_id,
           ROUND(ln(COALESCE(b.c_big, 0) + 1)
                 - ln(COALESCE(c.c_ctx, 0) + bv.v), 6) AS logp
    FROM brows r
    LEFT JOIN bbig b USING (w1, w2)
    LEFT JOIN bctx c USING (w1), bv
),
blm AS (
    SELECT doc_id,
           CAST(SUM(CAST(logp AS DECIMAL(27,6))) AS DOUBLE) AS lm_sum_r,
           COUNT(*) AS lm_n
    FROM bsc GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(l.lm_sum_r, 0.0) AS lm_sum_r,
       COALESCE(l.lm_n, 0) AS lm_n
FROM btoks t LEFT JOIN blm l USING (doc_id)
"""


def _py_lm(train_texts: list[str], score_texts: list[tuple[int, str]]):
    """Pure-Python reference of the add-one bigram LM contract."""
    def toks(t):
        return [w for w in t.lower().split() if w]

    big = Counter()
    ctx = Counter()
    vocab = set()
    for t in train_texts:
        ws = toks(t)
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
            ctx[a] += 1
    v = len(vocab)
    out = {}
    for doc_id, t in score_texts:
        ws = toks(t)
        pairs = list(zip(ws, ws[1:]))
        s = sum(
            round(math.log(big[(a, b)] + 1) - math.log(ctx[a] + v), 6)
            for a, b in pairs
        )
        out[doc_id] = (round(s, 6), len(pairs))
    return out


def test_lm_score_python_reference(spark):
    texts = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "a dog sat on a log"),
        (4, "solo"),
        (5, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    want = _py_lm([t for _, t in texts], texts)
    got = {
        r["doc_id"]: (round(r["lm_sum_r"], 6), r["lm_n"])
        for r in bigram_lm_score(df).collect()
    }
    assert got == want


def test_lm_score_heldout_train_backoff(spark):
    train = spark.createDataFrame(
        [(10, "alpha beta gamma")], "doc_id int, text string"
    )
    score = spark.createDataFrame(
        [(1, "zeta eta")], "doc_id int, text string"
    )
    rows = bigram_lm_score(score, train=train).collect()
    # unseen context: P = (0+1)/(0+V) with V=3 -> ln(1) - ln(3)
    assert rows[0]["lm_n"] == 1
    assert abs(rows[0]["lm_sum_r"] - round(-math.log(3), 6)) < 1e-9


def test_lm_score_duckdb_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = bigram_lm_score(docs)
    compare(got, run_oracle(_LM_ORACLE, sf_dir), "bigram_lm")
