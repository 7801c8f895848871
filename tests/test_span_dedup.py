"""Exact-substring span removal (dedup.remove_duplicate_spans): hand
semantic cases, DuckDB oracle on a derived duplicated corpus, plan
shape (no Window, no cartesian)."""

from __future__ import annotations

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.dedup import (
    duplicate_span_occurrences,
    remove_duplicate_spans,
)
from solarpaneldatawrangler_spark.sources.star import load_table
from tests.oracle_harness import compare, run_oracle

_SQL_TOKS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)"
)

# the sf0.01 documents are template-generated; a derived corpus where
# doc i's text is followed by doc i+7's guarantees every source text
# occurs as a token span in two docs (the paragraph-dedup test idiom)
_SPAN_ORACLE = rf"""
WITH built AS (
    SELECT a.doc_id,
           a.text || ' ' || COALESCE(b.text, '') AS text
    FROM documents a LEFT JOIN documents b ON b.doc_id = a.doc_id + 7
),
norm AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM built),
g AS (
    SELECT n.doc_id, CAST(u.p AS BIGINT) AS pos,
           ('0x' || substr(md5(array_to_string(
               list_slice(n.toks, CAST(u.p AS INT), CAST(u.p AS INT) + 7),
               ' ')), 1, 8))::BIGINT AS h
    FROM norm n, LATERAL UNNEST(range(1, len(n.toks) - 8 + 2)) AS u(p)
    WHERE len(n.toks) >= 8
),
dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2),
st AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
dcounts AS (SELECT doc_id, COUNT(*) AS n_dup_grams FROM st GROUP BY doc_id),
tok_rows AS (
    SELECT n.doc_id, CAST(u.i AS BIGINT) AS i,
           n.toks[CAST(u.i AS INT)] AS tok
    FROM norm n, LATERAL UNNEST(range(1, len(n.toks) + 1)) AS u(i)
),
keep AS (
    SELECT t.* FROM tok_rows t
    WHERE NOT EXISTS (SELECT 1 FROM st
                      WHERE st.doc_id = t.doc_id
                        AND st.pos <= t.i AND t.i < st.pos + 8)
),
rebuilt AS (
    SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
           COUNT(*) AS n_kept
    FROM keep GROUP BY doc_id
)
SELECT n.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(len(n.toks) AS INT) AS n_tokens,
       CAST(len(n.toks) - COALESCE(r.n_kept, 0) AS INT) AS n_removed,
       COALESCE(d.n_dup_grams, 0) AS n_dup_grams
FROM norm n
LEFT JOIN rebuilt r USING (doc_id)
LEFT JOIN dcounts d USING (doc_id)
"""


def _hand_docs(spark):
    rows = [
        (1, "A b c d e f g h x y"),
        (2, "z z a b C d e f g h"),
        (3, "p q r s t u v w p q r s t u v w"),
        (4, "one two THREE"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_span_removal_hand_case(spark):
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(_hand_docs(spark), k=8).collect()
    }
    # docs 1 and 2 share the 8-gram "a b c d e f g h" (case-folded)
    assert out[1]["clean_text"] == "x y"
    assert (out[1]["n_removed"], out[1]["n_dup_grams"]) == (8, 1)
    assert out[2]["clean_text"] == "z z"
    assert (out[2]["n_removed"], out[2]["n_dup_grams"]) == (8, 1)
    # doc 3 repeats its 8-gram INTERNALLY: both occurrences removed
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_removed"], out[3]["n_dup_grams"]) == (16, 2)
    # doc 4 is shorter than k: untouched (but canonicalized to lowercase)
    assert out[4]["clean_text"] == "one two three"
    assert (out[4]["n_removed"], out[4]["n_dup_grams"]) == (0, 0)


def test_span_occurrences_count_within_doc_repeats(spark):
    occ = duplicate_span_occurrences(_hand_docs(spark), k=8).collect()
    by_doc = {}
    for r in occ:
        by_doc.setdefault(r["id"], []).append(r["pos"])
    assert sorted(by_doc[1]) == [1]
    assert sorted(by_doc[2]) == [3]
    assert sorted(by_doc[3]) == [1, 9]


def test_span_removal_duckdb_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    other = docs.select(
        (F.col("doc_id") - 7).alias("doc_id"), F.col("text").alias("_t2")
    )
    built = docs.join(other, "doc_id", "left").select(
        "doc_id",
        F.concat_ws(" ", F.col("text"), F.coalesce("_t2", F.lit(""))).alias(
            "text"
        ),
    )
    got = remove_duplicate_spans(built, k=8, reproducible=True)
    compare(got, run_oracle(_SPAN_ORACLE, sf_dir), "span_dedup")


def test_span_removal_plan_shape(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = remove_duplicate_spans(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the gram stage (tokenize + per-doc lead window + hash) is
    # checkpointed and so runs ONCE: the final plan reads the shared
    # checkpoint twice (count side + join-back side) instead of
    # containing two Window subtrees; and no per-FINGERPRINT window
    # exists anywhere (that would be the hot-gram skew trap)
    assert plan.count("ExistingRDD") == 2
    assert plan.count("Window") == 0


def test_span_removal_interval_merge_semantics(spark):
    """The r8 interval-merge coverage must be semantically identical to
    the naive per-start exists: overlapping, adjacent, touching and
    isolated duplicated grams all merge/split correctly."""
    # docs 1,2 share a 12-token run -> overlapping 8-gram starts 1..5
    # merge into ONE interval [1, 13); tail survives. doc 3 has two
    # ISOLATED shared 8-grams separated by > k unique tokens -> two
    # disjoint intervals with the separator kept.
    shared = " ".join(f"s{i}" for i in range(12))
    blockA = " ".join(f"a{i}" for i in range(8))
    blockB = " ".join(f"b{i}" for i in range(8))
    rows = [
        (1, shared + " t1 t2 t3"),
        (2, "u1 u2 " + shared),
        (3, blockA + " gap1 gap2 gap3 gap4 gap5 gap6 gap7 gap8 gap9 " + blockB),
        (4, blockA + " x1 " + blockB),
    ]
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            spark.createDataFrame(rows, "doc_id int, text string"), k=8
        ).collect()
    }
    assert out[1]["clean_text"] == "t1 t2 t3"
    assert out[1]["n_removed"] == 12
    assert out[2]["clean_text"] == "u1 u2"
    assert out[3]["clean_text"] == "gap1 gap2 gap3 gap4 gap5 gap6 gap7 gap8 gap9"
    assert out[3]["n_removed"] == 16
    # doc 4's separator is INSIDE neither 8-gram but the two intervals
    # [1,9) and [10,18) leave exactly it
    assert out[4]["clean_text"] == "x1"


def test_span_removal_pathological_fully_duplicated_doc(spark):
    """r7 worst case: a 10k-token doc whose EVERY 8-gram is duplicated
    (two identical docs). The merged coverage is ONE interval, so this
    completes in O(tokens) instead of ~10^8 lambda steps."""
    import time

    text = " ".join(f"w{i % 37}x{i}" for i in range(10_000))
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id int, text string"
    )
    t0 = time.perf_counter()
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, k=8).collect()}
    dt = time.perf_counter() - t0
    for d in (1, 2):
        assert out[d]["clean_text"] == ""
        assert out[d]["n_tokens"] == 10_000
        assert out[d]["n_removed"] == 10_000
        assert out[d]["n_dup_grams"] == 9_993
    # generous wall bound: the quadratic path took minutes; the merged
    # path is sub-second compute inside a few-second Spark job
    assert dt < 60, f"pathological doc took {dt:.1f}s"
