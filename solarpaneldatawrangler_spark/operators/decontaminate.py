"""Benchmark decontamination for training corpora (SURVEY.md §2.12
extension): flag/drop documents that share fingerprinted content with an
evaluation benchmark — the standard guard against test-set leakage into
training data (the GPT-3/PaLM-style n-gram overlap check, done with
winnowing fingerprints instead of raw n-grams so short paraphrase-
resistant matches still hit; winnowing guarantees any shared substring
of length >= w+k-1 produces a shared fingerprint).

Composition, not new machinery: both sides run the existing
``winnowing_fingerprints`` operator (operators/dedup.py, q66's
oracle-checked plan), then a broadcast semi-structure on fp_hash.

Scale shape (100 TB corpus, MB-scale benchmark — the real geometry):
- the corpus side pays winnowing's ONE per-doc window shuffle; the
  following groupBy(id) reuses that exchange (same hash partitioning)
- the benchmark side is tiny by contract (eval suites are MBs): its
  distinct fingerprint set BROADCASTS, so no corpus shuffle is added
  by the join — contamination scoring rides the corpus scan
- no all-pairs anything: doc x benchmark contact happens only through
  equi-join on fp_hash
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.rounding import (
    round_ratio_half_away,
)
from solarpaneldatawrangler_spark.operators.dedup import winnowing_fingerprints


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    doc_fps: DataFrame | None = None,
) -> DataFrame:
    """Per-document contamination: (doc_id, n_fps, n_shared, shared_frac).

    ``n_fps`` counts the doc's distinct winnowing fingerprints,
    ``n_shared`` how many also occur anywhere in the benchmark,
    ``shared_frac`` their ratio (0.0 for fingerprint-less short docs).
    Every input doc gets a row — callers threshold on n_shared or
    shared_frac without special-casing docs too short to fingerprint.

    ``doc_fps``: a precomputed (id, fp_pos, fp_hash) relation for the
    corpus (winnowing_fingerprints output, e.g. persisted once and
    reused across many benchmarks / the near-dup pass) — at 100 TB the
    corpus fingerprint pass is the dominant cost, so computing it once
    and scoring N eval suites against it is the intended shape.
    """
    per_doc = _per_doc_overlap(
        docs, benchmark, k, w, id_col, text_col, bench_text_col, doc_fps
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_fps", F.lit(0)).alias("n_fps"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.coalesce("shared_frac", F.lit(0.0)).alias("shared_frac"),
        )
    )


def _per_doc_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int,
    w: int,
    id_col: str,
    text_col: str,
    bench_text_col: str,
    doc_fps: DataFrame | None,
) -> DataFrame:
    """(id_col, n_fps, n_shared, shared_frac) for every doc holding at
    least one fingerprint — the shared core. contamination_scores
    left-joins this back onto the corpus ids to add zero rows (its
    every-doc-gets-a-row contract); decontaminate thresholds it
    DIRECTLY — a doc absent here can never be flagged, so the
    corpus-wide ids join would be pure overhead there."""
    if doc_fps is None:
        doc_fps = winnowing_fingerprints(
            docs.select(F.col(id_col), F.col(text_col)),
            text_col=text_col,
            id_col=id_col,
            k=k,
            w=w,
            reproducible=True,
        )
    # benchmark rows need DISTINCT ids (the winnowing window partitions
    # by id — shared ids would chain k-grams across unrelated rows);
    # only the fingerprint HASH set is consumed downstream, so the
    # synthesized ids never need to be stable across runs
    bench_fps = (
        winnowing_fingerprints(
            benchmark.select(
                F.monotonically_increasing_id().alias("_bid"),
                F.col(bench_text_col),
            ),
            text_col=bench_text_col,
            id_col="_bid",
            k=k,
            w=w,
            reproducible=True,
        )
        .select("fp_hash")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )

    # winnowing's window already hash-partitioned by id; BOTH groupBys
    # below reuse that exchange (hash partitioning on `id` satisfies a
    # clustered distribution on (id, fp_hash) — a subset of the keys),
    # and the broadcast hash join adds no shuffle. The two-step
    # dedup-then-count replaces count_distinct x2, whose Expand doubles
    # every fingerprint row through the aggregation (measured 25s ->
    # 10s on the 55k-doc scale smoke): fingerprints repeat per doc only
    # across positions, so distinct (id, fp_hash) first, then plain
    # counts — zero extra exchanges, no Expand.
    per_doc = (
        doc_fps.join(F.broadcast(bench_fps), "fp_hash", "left")
        .groupBy("id", "fp_hash")
        .agg(F.max("_hit").alias("_hit"))
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.count("_hit").alias("n_shared"),
        )
    )
    return per_doc.withColumn(
        "shared_frac",
        # integer-exact 6dp (r13): n_shared/n_fps is an exact count
        # ratio; n_fps >= 1 here
        round_ratio_half_away(F.col("n_shared"), F.col("n_fps"), 6),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    min_shared: int = 1,
    min_shared_frac: float | None = None,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    doc_fps: DataFrame | None = None,
) -> DataFrame:
    """Drop documents sharing >= ``min_shared`` winnowing fingerprints
    with the benchmark; returns the surviving docs unchanged. The doc
    side of the threshold join is ids-only (16 bytes/row), never text.

    ``min_shared_frac`` thresholds on shared_frac (shared/total
    fingerprints) INSTEAD — the robust form when corpus and benchmark
    draw on shared vocabulary (absolute counts rise with doc length;
    the fraction separates "contains the benchmark item" from "uses the
    same common phrases")."""
    if min_shared_frac is not None and min_shared_frac <= 0:
        raise ValueError("min_shared_frac must be > 0 (0 would drop everything)")
    if min_shared_frac is None and min_shared < 1:
        raise ValueError("min_shared must be >= 1 (0 would drop everything)")
    scores = _per_doc_overlap(
        docs, benchmark, k, w, id_col, text_col, bench_text_col, doc_fps
    )
    if min_shared_frac is not None:
        cond = F.col("shared_frac") >= min_shared_frac
    else:
        cond = F.col("n_shared") >= min_shared
    contaminated = scores.filter(cond).select(id_col)
    return docs.join(contaminated, id_col, "left_anti")
