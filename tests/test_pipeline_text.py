"""End-to-end corpus-curation pipeline: planted exact + near duplicates
must be removed, gates must filter, sampling must be deterministic, and
the report must reconcile with the survivor frame."""

from __future__ import annotations

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.pipeline_text import curate_corpus, drop_near_duplicates
from solarpaneldatawrangler_spark.sources.star import load_table


def _planted_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    # exact copies (same text, higher ids) + near copies (prefix tweak)
    exact_copies = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang", "source"
    )
    near_copies = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xq")).alias("text"),
        "lang",
        "source",
    )
    return docs.unionByName(exact_copies).unionByName(near_copies)


def test_curate_corpus_end_to_end(spark, sf_dir):
    corpus = _planted_corpus(spark, sf_dir)
    out, rep = curate_corpus(
        corpus,
        min_quality=0.2,
        language="en",
        sample_rates={"src1": 1.0, "src2": 1.0, "src3": 0.5},
        jaccard_threshold=0.7,
    )
    rows = out.collect()

    # report reconciles and shrinks monotonically
    assert rep.n_input == corpus.count()
    assert (
        rep.n_input
        >= rep.n_after_exact_dedup
        >= rep.n_after_near_dedup
        >= rep.n_after_quality
        >= rep.n_after_language
        >= rep.n_output
        == len(rows)
    )
    # every planted exact copy removed (the min-id original survives it)
    ids = {r.doc_id for r in rows}
    assert not any(i >= 1_000_000 for i in ids)
    # gates hold on the survivors
    assert all(r.lang == "en" for r in rows)
    assert {r.source for r in rows} <= {"src1", "src2", "src3"}
    # deterministic: rerun selects the identical documents
    out2, _ = curate_corpus(
        corpus,
        min_quality=0.2,
        language="en",
        sample_rates={"src1": 1.0, "src2": 1.0, "src3": 0.5},
        jaccard_threshold=0.7,
        with_report=False,
    )
    assert {r.doc_id for r in out2.collect()} == ids


def test_drop_near_duplicates_removes_planted_twins(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(twins)
    kept = drop_near_duplicates(corpus, jaccard_threshold=0.9, reproducible=True)
    ids = {r.doc_id for r in kept.collect()}
    # every twin (larger id of an identical pair) is gone; originals stay
    assert not (ids & {i + 500_000 for i in range(50)})
    assert set(range(50)) <= {i for i in ids if i < 1000} | ids


def test_transitive_near_dup_keeps_one_per_cluster(spark):
    """Chain case (a~c, b~c, a!~b): pairwise keep-first retains BOTH a
    and b (only c is anybody's later copy), transitive clustering keeps
    exactly the min id of the whole chain. 16 single-row bands make the
    LSH candidate recall effectively 1 at jaccard ~0.58 so the chain's
    edges are guaranteed to surface; the verify stage prunes the rest."""
    words = [f"tok{i:03d}" for i in range(1, 49)]
    mk = lambda lo, hi: " ".join(words[lo - 1:hi])  # noqa: E731
    docs = [
        (1, mk(1, 32)),    # ~ doc3 (jaccard .579), !~ doc2 (.304)
        (2, mk(17, 48)),   # ~ doc3 (jaccard .579)
        (3, mk(9, 40)),    # the chain's middle link
        (50, "completely different standalone document text here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    kw = dict(jaccard_threshold=0.5, num_hashes=16, bands=16, reproducible=True)
    pairwise = {r.doc_id for r in drop_near_duplicates(df, **kw).collect()}
    assert pairwise == {1, 2, 50}
    transitive = {
        r.doc_id for r in drop_near_duplicates(df, transitive=True, **kw).collect()
    }
    assert transitive == {1, 50}


def test_curate_report_counts_with_transitive_and_cap(spark, sf_dir):
    """curate_corpus with transitive clustering + hot-bucket cap still
    reconciles its report, and the checkpointed report path selects the
    same survivors as the lazy path."""
    corpus = _planted_corpus(spark, sf_dir)
    out, rep = curate_corpus(
        corpus,
        min_quality=0.2,
        jaccard_threshold=0.7,
        transitive_near_dup=True,
        near_dup_max_bucket=1000,
    )
    ids = {r.doc_id for r in out.collect()}
    assert rep.n_output == len(ids)
    assert rep.n_input >= rep.n_after_exact_dedup >= rep.n_after_near_dedup
    out2, _ = curate_corpus(
        corpus,
        min_quality=0.2,
        jaccard_threshold=0.7,
        transitive_near_dup=True,
        near_dup_max_bucket=1000,
        with_report=False,
    )
    assert {r.doc_id for r in out2.collect()} == ids


def test_curate_corpus_decontam_and_repetition_stages(spark, sf_dir):
    """The optional round-4 stages: a benchmark built FROM two corpus
    docs must knock exactly those docs out, and a repetition ceiling
    must drop a planted boilerplate doc; default-off runs report -1
    for both stages."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    ).filter(F.col("doc_id") < 100)
    leak_ids = {3, 17}
    benchmark = docs.filter(F.col("doc_id").isin(list(leak_ids))).select(
        F.col("doc_id").alias("bid"), "text"
    )
    boiler = spark.createDataFrame(
        [(9_000_001, "menu item\n" * 40, "en", "src1")],
        "doc_id long, text string, lang string, source string",
    )
    corpus = docs.unionByName(boiler)

    out, rep = curate_corpus(
        corpus,
        min_quality=0.0,
        benchmark=benchmark,
        decontam_min_shared_frac=0.8,
        max_repetition=0.5,
        jaccard_threshold=0.99,
    )
    ids = {r.doc_id for r in out.collect()}
    assert leak_ids.isdisjoint(ids)
    assert 9_000_001 not in ids
    # the stages are ordered: near-dup >= decontam >= repetition
    assert (
        rep.n_after_near_dedup
        >= rep.n_after_decontam
        >= rep.n_after_repetition
        >= rep.n_after_quality
    )
    assert rep.n_after_decontam == rep.n_after_near_dedup - len(leak_ids)
    assert rep.n_after_repetition == rep.n_after_decontam - 1

    # default-off keeps prior behavior and marks the stages not-run
    _, rep_off = curate_corpus(corpus, min_quality=0.0, jaccard_threshold=0.99)
    assert rep_off.n_after_decontam == -1 and rep_off.n_after_repetition == -1


def test_curate_corpus_paragraph_and_temperature_stages(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    # plant a shared boilerplate paragraph in front of every 5th doc: the
    # paragraph stage must strip all but its first occurrence, and those
    # docs must SURVIVE with their remaining (original) text
    boiler = "all rights reserved contact us for licensing details"
    corpus = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(boiler + "\n\n"), F.col("text")),
        ).otherwise(F.col("text")),
    )
    out, rep = curate_corpus(
        corpus,
        min_quality=0.0,
        dedup_paragraphs=True,
        temperature_alpha=0.5,
        temperature_frac=0.5,
    )
    rows = out.collect()
    assert rep.n_after_paragraph > 0
    assert rep.n_output == len(rows)
    # at most ONE surviving doc still contains the boilerplate line
    assert sum(boiler in r.text for r in rows) <= 1
    # boilerplate-carrying docs survived with their own content intact
    survived = [r for r in rows if r.doc_id % 5 == 0 and boiler not in r.text]
    assert survived, "paragraph stage dropped every boilerplate doc"
    assert all(len(r.text) > 0 for r in rows)
    # mixture: both strata present and determinism across reruns
    out2, _ = curate_corpus(
        corpus,
        min_quality=0.0,
        dedup_paragraphs=True,
        temperature_alpha=0.5,
        temperature_frac=0.5,
        with_report=False,
    )
    assert sorted(r.doc_id for r in rows) == sorted(
        r.doc_id for r in out2.collect()
    )


def test_curate_corpus_rejects_conflicting_sampling(spark, sf_dir):
    import pytest

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    with pytest.raises(ValueError, match="not both"):
        curate_corpus(
            docs,
            sample_rates={"src1": 0.5},
            temperature_alpha=0.5,
            with_report=False,
        )


def test_curate_corpus_urlgate_classifier_scrub_shards(spark, sf_dir):
    """Round-7 gates through the pipeline: URL blocklist drops citing
    docs first, the classifier gate filters, PII is scrubbed from the
    RELEASED text only, and the shard permutation is appended."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    # every 10th doc cites a blocklisted subdomain; every 3rd doc
    # carries a planted email that the scrub stage must redact
    corpus = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.col("text"), F.lit(" via https://ads.track.example.com/x")),
        ).when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" mail bob@example.org now")),
        ).otherwise(F.col("text")),
    )
    out, rep = curate_corpus(
        corpus,
        min_quality=0.0,
        blocked_hosts=["example.com"],
        min_classifier_score=0.4,
        scrub_pii=True,
        n_shards=4,
        shard_seed="t",
    )
    rows = out.collect()

    # URL gate ran first and dropped exactly the citing docs
    assert rep.n_after_urlgate == corpus.count() - corpus.filter(
        F.col("doc_id") % 10 == 0
    ).count()
    assert all(r.doc_id % 10 != 0 for r in rows)
    # classifier gate shrank (or held) the quality survivors
    assert 0 < rep.n_after_classifier <= rep.n_after_quality
    # released text is scrubbed: no raw email survives, markers do
    assert all("bob@example.org" not in r.text for r in rows)
    assert any("<EMAIL>" in r.text for r in rows if r.doc_id % 3 == 0)
    # shard columns present, positions contiguous per shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # determinism: rerun without report keeps the same docs and order
    out2, _ = curate_corpus(
        corpus,
        min_quality=0.0,
        blocked_hosts=["example.com"],
        min_classifier_score=0.4,
        scrub_pii=True,
        n_shards=4,
        shard_seed="t",
        with_report=False,
    )
    assert sorted((r.doc_id, r.shard, r.shard_pos) for r in rows) == sorted(
        (r.doc_id, r.shard, r.shard_pos) for r in out2.collect()
    )


def test_curate_corpus_span_and_lm_stages(spark, sf_dir):
    """Round-7 additions: exact-substring span removal rewrites
    surviving text (planted shared 8-gram disappears from every copy)
    and the bigram-LM floor drops gibberish docs the heuristic quality
    score can't see."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    n_docs = docs.count()
    # every 7th doc carries the SAME 8-token boilerplate suffix; a
    # handful of docs are token-salad (every token unique corpus-wide,
    # so every bigram backs off to the uniform floor)
    corpus = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" click here to subscribe to our newsletter today"),
            ),
        ).otherwise(F.col("text")),
    )
    out, rep = curate_corpus(
        corpus,
        min_quality=0.0,
        remove_spans=True,
        min_lm_score=-6.5,
    )
    rows = out.collect()
    assert rep.n_after_spans > 0
    # the planted boilerplate 8-gram was cut from EVERY doc
    assert all("subscribe to our newsletter" not in r.text for r in rows)
    # the LM gate is a real filter but not a massacre on template docs
    assert 0 < rep.n_after_lm <= rep.n_after_classifier or (
        rep.n_after_classifier == -1 and 0 < rep.n_after_lm <= rep.n_after_quality
    )
    # report reconciles: output equals the last enabled gate chain
    assert rep.n_output <= rep.n_after_lm <= rep.n_after_quality <= n_docs


def test_curate_corpus_markup_boilerplate_weighted_stages(spark, sf_dir):
    """Round-7b gates: strip_html rewrites tag soup before dedup;
    boilerplate_min_df deletes EVERY copy of a pervasive paragraph
    (unlike dedup_paragraphs' keep-first); temperature_weight_col
    budgets the mixture by tokens and stays deterministic."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    banner = "accept all cookies to continue reading this site"
    corpus = docs.withColumn(
        "text",
        F.concat(
            F.lit("<div><p>"),
            F.when(
                F.col("doc_id") % 4 == 0, F.lit(banner + "\n\n")
            ).otherwise(F.lit("")),
            F.col("text"),
            F.lit("</p>&amp;</div>"),
        ),
    ).withColumn("n_tokens", F.size(F.split(F.trim("text"), r"\s+")))
    # dedup_paragraphs=True ALONGSIDE boilerplate_min_df pins the stage
    # ORDER: boilerplate df must be measured before dedup collapses
    # every fingerprint to one copy (df=1 everywhere -> silent no-op)
    out, rep = curate_corpus(
        corpus,
        min_quality=0.0,
        strip_html=True,
        boilerplate_min_df=3,
        dedup_paragraphs=True,
        temperature_alpha=0.5,
        temperature_frac=0.5,
        temperature_weight_col="n_tokens",
    )
    rows = out.collect()
    assert rep.n_after_boilerplate > 0
    assert rep.n_output == len(rows)
    # markup is gone from every survivor; the released text is visible
    # text plus the single-pass-decoded entity
    assert all("<div>" not in r.text and "</p>" not in r.text for r in rows)
    # the banner was in ~125 docs >= min_df: every copy removed
    assert not any(banner in r.text for r in rows)
    # banner carriers survived with their own content
    assert any(r.doc_id % 4 == 0 for r in rows)
    # weighted mixture is deterministic across reruns
    out2, _ = curate_corpus(
        corpus,
        min_quality=0.0,
        strip_html=True,
        boilerplate_min_df=3,
        dedup_paragraphs=True,
        temperature_alpha=0.5,
        temperature_frac=0.5,
        temperature_weight_col="n_tokens",
        with_report=False,
    )
    assert sorted(r.doc_id for r in rows) == sorted(
        r.doc_id for r in out2.collect()
    )


def test_lm_floor_passes_docs_without_bigram_evidence(spark):
    """A one-token doc has lm_n == 0 — no bigram evidence. The LM floor
    must pass it (absence of evidence is not a low score); word-count
    gates are the tool for dropping tiny docs."""
    rows = [(1, "single"), (2, "a perfectly ordinary sentence with words")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out, _ = curate_corpus(
        docs,
        min_quality=0.0,
        jaccard_threshold=0.99,
        min_lm_score=-50.0,  # effectively no-op floor
        with_report=False,
    )
    assert {r.doc_id for r in out.collect()} == {1, 2}


def test_curate_corpus_mix_stage(spark, sf_dir):
    """mix_weights appends the stride-scheduling mix_key over the
    stratum column, matching a direct mixture_order call on the same
    survivors — and composes with the shard stage."""
    from solarpaneldatawrangler_spark.operators.mixing import mixture_order

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    weights = {"src0": 4, "src1": 2}
    out, _ = curate_corpus(
        docs, min_quality=0.0, n_shards=2, mix_weights=weights,
        with_report=False,
    )
    rows = out.select("doc_id", "source", "mix_key").collect()
    assert rows and all(r.mix_key is not None for r in rows)

    survivors = out.select("doc_id", "source")
    direct = {
        (r.doc_id, r.mix_key)
        for r in mixture_order(survivors, weights).collect()
    }
    assert {(r.doc_id, r.mix_key) for r in rows} == direct


def test_curate_corpus_split_stage(spark, sf_dir):
    """split_fractions appends the deterministic split label AFTER the
    dedup stages (the leakage-safe ordering), matching a direct
    split_assign on the same survivors, and composes with shards+mix."""
    from solarpaneldatawrangler_spark.operators.sampling import split_assign

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    fr = {"train": 0.8, "valid": 0.1, "test": 0.1}
    out, _ = curate_corpus(
        docs, min_quality=0.0, n_shards=2,
        split_fractions=fr, with_report=False,
    )
    rows = out.select("doc_id", "split").collect()
    assert rows and set(r.split for r in rows) <= {"train", "valid", "test"}
    direct = {
        (r.doc_id, r.s)
        for r in out.select(
            "doc_id", split_assign(F.col("doc_id"), fr).alias("s")
        ).collect()
    }
    assert {(r.doc_id, r.split) for r in rows} == direct
