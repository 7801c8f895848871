"""Lexical relevance ranking (BM25) for corpus curation and retrieval.

Keyword-relevance scoring over a document corpus — the standard lever
for (a) retrieving training-data slices by topic, (b) quality-weighting
documents against a target-domain query, and (c) building hard-negative
mining sets for embedding training. The reference engine has no ranking
surface; this is part of the SURVEY §2.12 training-data extension.

Scale design: for a FIXED query term list (the practical case — queries
are human-sized), every per-document quantity (per-term tf, doc length)
is a pure array expression computed inside the scan, so the corpus
never shuffles. Corpus statistics (N, avgdl, per-term df) reduce to ONE
global aggregate row — a map-side-combined partial agg — broadcast back
with a literal cross join. Two jobs' worth of work in one lazy plan:
scan → 1-row agg → broadcast join → score expression. No explode, no
per-token shuffle, no UDFs.

An inverted-index design (explode tokens, shuffle by term) only wins
when the term vocabulary is the variable, e.g. all-pairs doc-to-doc
scoring; for query scoring it moves ~dl rows per document where this
moves zero.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.text import tokens


def _tf(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda t: t == F.lit(term)))


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 6,
    extras: dict[str, Column] | None = None,
) -> DataFrame:
    """BM25 relevance of every document against a bag-of-terms query.

    Returns (id, bm25_r) for ALL documents (zero-match docs score 0.0)
    — callers chain .filter / bm25_topk. Scores use the Lucene/
    Robertson-Sparck-Jones idf form ln(1 + (N - df + .5)/(df + .5)),
    which is strictly positive, so a term present in most documents
    degrades gracefully instead of flipping the score negative.

    Terms are matched as whole lowercase whitespace tokens (the same
    tokenizer as token_count/q51, so stats line up across the text
    operators). Duplicate query terms are deduped — BM25's saturation
    already models within-query repetition poorly, and deduping keeps
    the score independent of query phrasing.

    ``extras`` maps output column name -> Column over ``docs``'s raw
    columns; each rides the same scan and comes out next to ``bm25_r``.
    This is how q51_token_stats carries its token statistics and the
    BM25 probe in ONE documents pass instead of a scan + re-scan join.
    """
    if not terms:
        raise ValueError("bm25_scores: empty term list")
    seen: dict[str, None] = {}
    for t in terms:
        seen.setdefault(t.lower(), None)
    uniq = list(seen)

    # tokenize ONCE as a shared attribute: inlining tokens(text) into
    # every per-term tf would re-run the split per term (the q66
    # CollapseProject lesson — measured 300x there)
    extras = extras or {}
    reserved = (
        {"id", "_toks", "_dl", "_n", "_avgdl", "bm25_r", id_col}
        | {f"_tf{i}" for i in range(len(uniq))}
        | {f"_df{i}" for i in range(len(uniq))}
    )
    bad = sorted(set(extras) & reserved)
    if bad:
        raise ValueError(
            f"bm25_scores: extras keys {bad} collide with internal/output "
            "column names — rename them (a collision would silently "
            "produce ambiguous columns)"
        )
    base = docs.select(
        F.col(id_col).alias("id"),
        tokens(F.col(text_col)).alias("_toks"),
        *[c.alias(n) for n, c in extras.items()],
    ).select(
        "id",
        *extras,
        F.size("_toks").alias("_dl"),
        *[_tf(F.col("_toks"), t).alias(f"_tf{i}") for i, t in enumerate(uniq)],
    )
    # ONE global stats row (partial-agg'd map-side), broadcast back: the
    # scoring join is a literal BroadcastNestedLoopJoin of a 1-row side,
    # i.e. free — the corpus side never moves
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(uniq))
        ],
    )
    scored = base.join(F.broadcast(stats))
    # _avgdl guard: if every document tokenizes empty, _dl/_avgdl would
    # be 0/0 = NaN and poison every score; the documented contract is
    # 0.0 for zero-match docs, so the length-norm term degrades to
    # k1*(1-b). Operand order inside the branch stays (b*dl)/avgdl —
    # the exact sequence the SQL oracle computes.
    norm = F.lit(k1) * (
        F.lit(1.0 - b)
        + F.when(
            F.col("_avgdl") > 0, F.lit(b) * F.col("_dl") / F.col("_avgdl")
        ).otherwise(F.lit(0.0))
    )
    score: Column = F.lit(0.0)
    for i in range(len(uniq)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
        )
        tf = F.col(f"_tf{i}")
        score = score + idf * tf * F.lit(k1 + 1.0) / (tf + norm)
    return scored.select(
        F.col("id").alias(id_col),
        *extras,
        F.round(score, round_dp).alias("bm25_r"),
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k documents by BM25 with deterministic id tiebreak — compiles
    to TakeOrderedAndProject (per-partition local top-k, k rows per
    partition to the driver), never a global sort."""
    id_col = kwargs.get("id_col", "doc_id")
    return (
        bm25_scores(docs, terms, **kwargs)
        .orderBy(F.desc("bm25_r"), F.asc(id_col))
        .limit(k)
    )


def idf_weights(n_docs: int, dfs: dict[str, int]) -> dict[str, float]:
    """Driver-side helper mirroring the in-plan idf — for logging which
    query terms actually discriminate (df ~ N means idf ~ ln(1+~0.5/N))."""
    return {
        t: math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for t, df in dfs.items()
    }
