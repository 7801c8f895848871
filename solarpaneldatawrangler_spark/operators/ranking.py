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


def tfidf_keywords(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    round_dp: int = 6,
    materialize_tf: bool = True,
) -> DataFrame:
    """Per-document top-k keywords by tf-idf — the classic corpus-wide
    keyword extractor (topic tagging, slice discovery, index terms).

    Score = tf * ln((N + 1) / (df + 1)), rounded to ``round_dp`` BEFORE
    ranking so every engine ranks identical doubles; ties break on the
    term string ascending. Returns one row per document that has at
    least one (non-stopword) token: (id, kw, kw_score_r) with ``kw``
    the top-k terms joined by '|' in rank order and ``kw_score_r`` the
    winning score. ``stopwords`` drops the given terms before counting
    (keyword extraction is pointless over 'the'/'and').

    Unlike bm25_scores (fixed human-sized query -> corpus never moves),
    the vocabulary IS the variable here, so this is the inverted-index
    shape: explode to (doc, term), aggregate. 100 TB plan:
    - tf: groupBy(id, term) on the exploded rows — map-side combinable,
      so a hot term collapses per map task before the shuffle
    - df: groupBy(term) over the already-distinct (id, term) rows —
      ditto; 'the'-scale terms arrive as one partial row per task
    - score join tf x df on term (scalar-key hash join; AQE handles
      the residual probe-side skew of stop-term buckets)
    - top-k: window row_number partitioned by id, then groupBy(id) —
      the groupBy reuses the window's hash partitioning (one shuffle),
      and Spark pushes a partial WindowGroupLimit (per-partition top-k)
      BELOW it, so at most ~k rows per (task, doc) cross the wire —
      both plan-asserted in tests
    Three scalar-key shuffles; the text column itself never moves (only
    tokens do). ``materialize_tf=True`` lazily checkpoints the tf
    relation: df/N/score all branch off tf, and without materialization
    Catalyst re-executes the explode+agg subtree once per branch (fine
    at small SF, 3x the scan cost at 100 TB — same tradeoff as the
    checkpointed MinHash shingles, dedup.py).
    """
    if k < 1:
        raise ValueError("tfidf_keywords: k must be >= 1")
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    if stopwords:
        toks = toks.filter(~F.col("term").isin([s.lower() for s in stopwords]))
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("_tf"))
    if materialize_tf:
        tf = tf.localCheckpoint(eager=False)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n = tf.agg(F.count_distinct("id").alias("_n"))
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .select(
            "id",
            "term",
            F.round(
                F.col("_tf")
                * F.log((F.col("_n") + F.lit(1.0)) / (F.col("_df") + F.lit(1.0))),
                round_dp,
            ).alias("_score"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy(F.desc("_score"), F.asc("term"))
    ranked = scored.select(
        "id", "term", "_score", F.row_number().over(w).alias("_rk")
    ).filter(F.col("_rk") <= k)
    return ranked.groupBy("id").agg(
        F.concat_ws(
            "|",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_rk", "term"))),
                lambda s: s["term"],
            ),
        ).alias("kw"),
        F.max(F.when(F.col("_rk") == 1, F.col("_score"))).alias("kw_score_r"),
    ).select(F.col("id").alias(id_col), "kw", "kw_score_r")


def idf_weights(n_docs: int, dfs: dict[str, int]) -> dict[str, float]:
    """Driver-side helper mirroring the in-plan idf — for logging which
    query terms actually discriminate (df ~ N means idf ~ ln(1+~0.5/N))."""
    return {
        t: math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for t, df in dfs.items()
    }
