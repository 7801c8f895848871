"""DSIR importance resampling (operators/dsir.py): planted-
distribution separation through the scoring path, distributed-vs-
pyarrow trainer consistency (the IVF idiom), Gumbel-top-k determinism.
The full-corpus DuckDB replay is q72 in the catalog sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.dsir import (
    dsir_gumbel_key,
    dsir_log_weight,
    dsir_ratios_for_dir,
    dsir_select,
    train_dsir,
)


def _corpora(spark):
    """Target vocabulary = sciency words; raw = mostly spammy words
    plus a few target-like docs the selection should find."""
    target = spark.createDataFrame(
        [
            (i, "theorem lemma proof corollary axiom derivation "
                f"equation integral t{i}")
            for i in range(30)
        ],
        "doc_id long, text string",
    )
    raw_rows = [
        (100 + i, f"buy cheap pills now click here winner prize w{i}")
        for i in range(40)
    ] + [
        (200 + i, "theorem proof equation axiom integral lemma "
                  f"derivation corollary r{i}")
        for i in range(5)
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    return target, raw


def test_weights_separate_planted_distributions(spark):
    target, raw = _corpora(spark)
    ratios = train_dsir(target, raw, n_buckets=256)
    scored = raw.select(
        "doc_id", dsir_log_weight(F.col("text"), ratios).alias("w")
    ).collect()
    spam = [r.w for r in scored if r.doc_id < 200]
    sci = [r.w for r in scored if r.doc_id >= 200]
    assert min(sci) > max(spam), (max(spam), min(sci))


def test_select_is_gumbel_topk_and_deterministic(spark):
    target, raw = _corpora(spark)
    ratios = train_dsir(target, raw, n_buckets=256)
    a = dsir_select(raw, ratios, k=5, seed="s1")
    b = dsir_select(raw.repartition(7), ratios, k=5, seed="s1")
    ids_a = [r.doc_id for r in a.select("doc_id").collect()]
    ids_b = [r.doc_id for r in b.select("doc_id").collect()]
    assert sorted(ids_a) == sorted(ids_b)  # partitioning-invariant
    # the five target-like raw docs dominate the importance weights
    assert set(ids_a) == {200, 201, 202, 203, 204}
    # a different seed may pick a different set (Gumbel noise is real),
    # but keys remain deterministic per (seed, id)
    k1 = raw.select(
        dsir_gumbel_key(F.lit(0.0), F.col("doc_id"), "s1").alias("k")
    ).collect()
    k2 = raw.select(
        dsir_gumbel_key(F.lit(0.0), F.col("doc_id"), "s1").alias("k")
    ).collect()
    assert [r.k for r in k1] == [r.k for r in k2]


def test_dir_trainer_matches_spark_trainer(spark, sf_dir):
    """dsir_ratios_for_dir (pyarrow, what the oracle embeds) must
    equal train_dsir (Spark) on the same target/raw split — the
    ivf/bpe train-path-consistency contract."""
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = train_dsir(
        docs.filter(F.col("doc_id") % 7 == 0), docs, n_buckets=512
    )
    want = dsir_ratios_for_dir(sf_dir, n_buckets=512, target_mod=7)
    assert got == want


def test_empty_and_null_text(spark):
    ratios = [0.5] * 64
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "one")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.w, r.n)
        for r in df.select(
            "doc_id",
            dsir_log_weight(F.col("text"), ratios).alias("w"),
            F.size(
                __import__(
                    "solarpaneldatawrangler_spark.operators.dsir",
                    fromlist=["dsir_features"],
                ).dsir_features(F.col("text"), 64)
            ).alias("n"),
        ).collect()
    }
    assert got[1] == (0.0, 0)
    # null text: tokens(null) is null -> features null -> weight null
    # (the gopher null-propagation contract); q72 runs on non-null docs
    assert got[2][0] is None
    assert got[3] == (0.5, 1)  # one unigram, no bigram


def test_log_weight_validates_table(spark):
    with pytest.raises(ValueError, match="log_ratios"):
        dsir_log_weight(F.lit("x"), [0.1, 0.2], n_buckets=4)


def test_curate_corpus_dsir_stage(spark):
    """curate_corpus(dsir_target=..., dsir_keep=k): the survivors are
    the k docs closest to the target distribution, reported."""
    from solarpaneldatawrangler_spark.pipeline_text import curate_corpus

    target, raw = _corpora(spark)
    out, report = curate_corpus(
        raw,
        min_quality=0.0,
        dsir_target=target,
        dsir_keep=5,
        dsir_n_buckets=256,
        with_report=True,
    )
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert ids == [200, 201, 202, 203, 204]
    assert report.n_after_dsir == 5


def test_pandas_path_value_identical_to_expr(spark, sf_dir):
    """The int64-micro-unit NumPy path must produce BIT-IDENTICAL
    weights to the DECIMAL expression fold on real corpus text (both
    compute the same exact rational, rounded once to double)."""
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ratios = dsir_ratios_for_dir(sf_dir, n_buckets=512)
    both = docs.select(
        "doc_id",
        dsir_log_weight(F.col("text"), ratios).alias("we"),
        dsir_log_weight(F.col("text"), ratios, impl="pandas").alias("wp"),
    ).collect()
    assert len(both) > 0
    for r in both:
        assert r.we == r.wp, r.doc_id  # exact, not approx
    with pytest.raises(ValueError, match="impl"):
        dsir_log_weight(F.col("text"), ratios, impl="numpy")


def test_select_compiles_to_take_ordered(spark):
    """The Gumbel-top-k selection must be TakeOrderedAndProject
    (bounded k), never a global Sort."""
    target, raw = _corpora(spark)
    ratios = train_dsir(target, raw, n_buckets=256)
    plan = (
        dsir_select(raw, ratios, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
