"""Corpus-curation pipeline: the text twin of pipeline.run_pipeline.

Composes the §2.12 extension operators into the standard
training-data flow — exact dedup → near-dup removal → quality gate →
language gate → stratified downsample — as one lazy DataFrame chain
(materialized once at the sink; every stage is the already-tested
operator, so the pipeline adds composition, not new semantics).

Every stage is deterministic (min-id representatives, hash-bucket
sampling), so reruns and retries keep the SAME documents — the
property that makes incremental corpus builds reproducible.

Scale shape: exact dedup is one shuffle on a 32-byte fingerprint;
near-dup is the bucketed MinHash-LSH path (never all-pairs); quality /
language gates are scan-stage expressions; sampling is a pure filter.
The only driver-side value is the stage-count report (6 scalars).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.text import quality_score
from solarpaneldatawrangler_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
)
from solarpaneldatawrangler_spark.operators.sampling import stratified_hash_sample


@dataclass(frozen=True)
class CurationReport:
    n_input: int
    n_after_exact_dedup: int
    n_after_near_dedup: int
    n_after_quality: int
    n_after_language: int
    n_output: int


def drop_near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    **minhash_kwargs,
) -> DataFrame:
    """Remove every doc that has a near-duplicate with a SMALLER id
    (the standard keep-first rule): survivors are exactly the docs that
    are nobody's later copy. Deterministic, order-independent, and
    one anti-join over the LSH-bucketed pair relation."""
    pairs = minhash_near_dup_pairs(
        docs,
        text_col=text_col,
        id_col=id_col,
        jaccard_threshold=jaccard_threshold,
        **minhash_kwargs,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    language: str | None = None,
    lang_col: str = "lang",
    sample_rates: dict[str, float] | None = None,
    stratum_col: str = "source",
    jaccard_threshold: float = 0.8,
    with_report: bool = True,
) -> tuple[DataFrame, CurationReport | None]:
    """Run the full curation chain; returns (survivors, report).

    ``with_report=False`` skips the per-stage counts (each is one extra
    action) and returns the survivors as a single lazy plan.
    """
    n_input = docs.count() if with_report else -1

    # 1. exact dedup: keep the min-id representative per fingerprint.
    # NO broadcast hint: the keep-set is one id per distinct document,
    # i.e. it grows with the corpus — a hash semi-join on id is the
    # scale-correct default (AQE upgrades it to broadcast when small)
    keep = exact_dedup(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    exact = docs.join(keep, id_col, "left_semi")
    n_exact = exact.count() if with_report else -1

    # 2. near-dup removal (MinHash-LSH bucketed candidates)
    near = drop_near_duplicates(
        exact, text_col, id_col, jaccard_threshold, reproducible=True
    )
    n_near = near.count() if with_report else -1

    # 3. quality gate (scan-stage expression)
    qual = near.filter(quality_score(F.col(text_col)) >= min_quality)
    n_qual = qual.count() if with_report else -1

    # 4. language gate
    lang = qual if language is None else qual.filter(F.col(lang_col) == language)
    n_lang = lang.count() if with_report else -1

    # 5. stratified downsample (deterministic hash buckets)
    out = (
        lang
        if not sample_rates
        else stratified_hash_sample(
            lang, stratum_col, sample_rates, id_col=id_col
        )
    )
    n_out = out.count() if with_report else -1

    report = (
        CurationReport(n_input, n_exact, n_near, n_qual, n_lang, n_out)
        if with_report
        else None
    )
    return out, report
