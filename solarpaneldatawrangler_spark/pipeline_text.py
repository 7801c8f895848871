"""Corpus-curation pipeline: the text twin of pipeline.run_pipeline.

Composes the §2.12 extension operators into the standard
training-data flow — [URL blocklist] → exact dedup → near-dup removal
→ [benchmark decontamination] → [paragraph-level dedup] →
[exact-substring span removal] → [repetition gate] → quality gate →
[classifier gate] → [bigram-LM gate] → language gate → stratified or
temperature downsample → [PII scrub] → [training shards] →
[domain-mix keys] — as one lazy DataFrame chain
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
    # -1 = stage not enabled (benchmark / max_repetition not passed)
    n_after_decontam: int = -1
    n_after_repetition: int = -1
    n_after_paragraph: int = -1
    n_after_urlgate: int = -1
    n_after_classifier: int = -1
    n_after_spans: int = -1
    n_after_lm: int = -1
    n_after_boilerplate: int = -1
    n_after_gopher: int = -1
    n_after_rep_battery: int = -1
    n_after_dsir: int = -1
    n_after_c4: int = -1


def drop_near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    transitive: bool = False,
    **minhash_kwargs,
) -> DataFrame:
    """Remove near-duplicates, keeping one deterministic representative.

    ``transitive=False`` (pairwise keep-first): drop every doc that has
    a near-dup with a SMALLER id — one anti-join over the LSH-bucketed
    pair relation. Simple and cheap, but a content CHAIN (a~b, b~c,
    a!~c) can retain more than one member: with edges (a,c),(b,c) only
    c is anybody's later copy, so both a and b survive one cluster.

    ``transitive=True``: form duplicate CLUSTERS = connected components
    of the near-dup pair graph (min-id label), keep exactly the min-id
    doc per cluster. This is the standard corpus-dedup semantics
    (near-dup treated as an equivalence by closure); costs the CC loop
    (O(log diameter) join+agg rounds) over the PAIR graph only — near-
    dup pairs, not the corpus, so the loop input is tiny in practice.
    """
    pairs = minhash_near_dup_pairs(
        docs,
        text_col=text_col,
        id_col=id_col,
        jaccard_threshold=jaccard_threshold,
        **minhash_kwargs,
    )
    if transitive:
        from solarpaneldatawrangler_spark.operators.clustering import (
            connected_components_edges,
        )

        comp = connected_components_edges(pairs, "id_a", "id_b")
        losers = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
    else:
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
    transitive_near_dup: bool = False,
    near_dup_max_bucket: int | None = None,
    benchmark: DataFrame | None = None,
    decontam_min_shared: int = 5,
    decontam_min_shared_frac: float | None = None,
    max_repetition: float | None = None,
    gopher_repetition_gate: bool = False,
    gopher_gate: bool = False,
    gopher_min_words: int = 50,
    gopher_max_words: int = 100_000,
    strip_html: bool = False,
    c4_clean_lines: bool = False,
    c4_min_line_words: int = 5,
    c4_min_sentences: int = 3,
    dedup_paragraphs: bool = False,
    boilerplate_min_df: int | None = None,
    remove_spans: bool = False,
    span_k: int = 8,
    min_lm_score: float | None = None,
    dsir_target: DataFrame | None = None,
    dsir_keep: int | None = None,
    dsir_n_buckets: int = 1 << 12,
    dsir_seed: str = "0",
    dsir_impl: str = "expr",
    dsir_threshold: float | None = None,
    temperature_alpha: float | None = None,
    temperature_frac: float = 0.5,
    temperature_weight_col: str | None = None,
    blocked_hosts: list[str] | None = None,
    min_classifier_score: float | None = None,
    classifier_weights: list[float] | None = None,
    classifier_n_buckets: int = 1 << 18,
    classifier_bias: float = 0.0,
    scrub_pii: bool = False,
    n_shards: int | None = None,
    shard_seed: str = "0",
    mix_weights: dict[str, int] | None = None,
    mix_default_weight: int = 1,
    split_fractions: dict[str, float] | None = None,
    split_seed: str = "split",
    with_report: bool = True,
) -> tuple[DataFrame, CurationReport | None]:
    """Run the full curation chain; returns (survivors, report).

    ``with_report=False`` skips the per-stage counts (each is one extra
    action) and returns the survivors as a single lazy plan; with the
    report on, the near-dup survivors are localCheckpointed so the
    expensive MinHash-LSH stage executes ONCE instead of once per
    downstream stage count.

    ORDERING CONTRACT: exact dedup runs BEFORE near-dup on purpose —
    identical docs share every LSH band, so a flood of exact copies
    makes band buckets quadratic; removing them first keeps buckets
    sized by genuine near-duplicates. ``near_dup_max_bucket`` then caps
    whatever pathological buckets remain (see minhash_near_dup_pairs);
    ``transitive_near_dup`` upgrades keep-first pair semantics to
    one-representative-per-duplicate-CLUSTER via connected components.

    ``dedup_paragraphs=True`` inserts corpus-level paragraph dedup
    AFTER doc-level dedup/decontamination (so boilerplate is stripped
    from each surviving doc once, not per copy) and BEFORE the
    repetition/quality gates (which then judge the CLEANED text); docs
    whose every paragraph was a duplicate drop out. ``temperature_alpha``
    replaces the explicit ``sample_rates`` downsample with n^alpha
    mixture rebalancing (mutually exclusive with sample_rates).

    Round-7 gates: ``blocked_hosts`` inserts the URL/domain blocklist
    FIRST (the cheapest drop — pure codegen — runs before any shuffle
    so blocked docs never reach the dedup stages);
    ``min_classifier_score`` adds the hashed-linear (fastText-arch)
    classifier gate beside the quality gate (pass trained
    ``classifier_weights`` for a real model); ``remove_spans`` inserts
    exact-substring span removal after paragraph dedup (coarse
    boilerplate first, then fine-grained repeated spans — both rewrite
    text the later gates judge; NOTE remove_spans CANONICALIZES every
    surviving doc — remove_duplicate_spans reconstructs text as
    lowercased tokens joined by single spaces, so case and line
    structure are gone from the released text even for span-free
    docs); ``min_lm_score`` adds the CCNet-style
    bigram-LM mean-log-prob floor, trained on the post-dedup survivors
    so junk doesn't dominate its own scoring model (docs with fewer
    than two tokens carry no bigram evidence and PASS the floor — the
    word-count gates are the tool for dropping tiny docs); ``scrub_pii`` rewrites
    the surviving text through the PII redaction chain LAST (scrub
    once, on released docs only); ``n_shards`` appends deterministic
    (shard, shard_pos) training-shard assignment; ``mix_weights``
    appends the stride-scheduling ``mix_key`` (operators.mixing) over
    ``stratum_col`` as the final step — sorting the release by
    (mix_key, stratum, id) IS the weighted training order;
    ``split_fractions`` (r10) appends the deterministic train/valid/
    test label AFTER every dedup stage, so near-duplicates cannot
    straddle the train/eval boundary (operators.sampling.split_assign
    — the q55 'leak' audit measures exactly that leakage on raw
    corpora).

    Round-7b gates: ``strip_html`` rewrites the text through
    functions.text.strip_markup right after the URL gate (the gate needs
    the raw hrefs; everything downstream — fingerprints, tokens, quality
    — should judge visible text, not tag soup); ``boilerplate_min_df``
    inserts remove_boilerplate_paragraphs BEFORE paragraph dedup —
    document frequency must be measured on the raw corpus, because once
    dedup keeps a single copy per fingerprint every paragraph's df is 1
    and the threshold could never fire; so the boilerplate pass deletes
    every copy of >= min_df-doc paragraphs first, then dedup keeps the
    first copy of the remaining genuine repeats;
    ``temperature_weight_col`` switches the temperature mixture from a
    document budget to a weight (token) budget; ``gopher_gate`` applies
    the published Gopher rule battery (functions.text.gopher_pass)
    beside the repetition gate.

    Round-8 gates: ``dsir_target`` + ``dsir_keep`` insert DSIR
    importance selection (Xie et al. 2023) after the language gate —
    fit hashed-n-gram target-vs-survivors ratios, keep the
    Gumbel-top-k best-matching ``dsir_keep`` docs deterministically
    (``dsir_impl`` picks the scorer: 'expr' = the exact-decimal
    expression fold, 'pandas' = the bit-identical int64-micro-unit
    numpy path, measured ~6x faster — r9, so the production path the
    bench uses is reachable from the pipeline too; ``dsir_threshold``
    switches selection from top-k to the streaming `log-weight >= t`
    filter — no global order, corpus-sized keeps — in which case
    ``dsir_keep`` is ignored);
    ``c4_clean_lines`` applies the C4 cleaning battery
    (Raffel et al. 2020 §2.2) right after markup strip — line-level
    keep rules REWRITE each doc and the page-level gates drop docs —
    so dedup fingerprints and later gates judge the cleaned text,
    matching the paper's ordering; ``gopher_repetition_gate`` applies the FULL 13-rule
    Gopher repetition battery (Rae et al. Table A1 thresholds) —
    the expression signals plus the dup-5..10-gram union char-coverage
    rules (one Arrow-batched pass) — superseding the simpler
    ``max_repetition`` two-signal gate when both are set (both run;
    max_repetition first).
    """
    if temperature_alpha is not None and sample_rates:
        raise ValueError(
            "pass either sample_rates (explicit per-stratum rates) or "
            "temperature_alpha (n^alpha mixture), not both"
        )
    n_input = docs.count() if with_report else -1

    # 0. URL blocklist (optional): the cheapest gate — a pure codegen
    # predicate against the literal blocklist — so it runs before any
    # shuffle and blocked docs never reach the dedup stages
    if blocked_hosts:
        from solarpaneldatawrangler_spark.operators.curation import (
            doc_url_flags,
        )

        docs = (
            doc_url_flags(docs, blocked_hosts, text_col=text_col)
            .filter(~F.col("url_blocked"))
            .drop("n_urls", "url_host", "url_blocked")
        )
    n_urlgate = docs.count() if (with_report and blocked_hosts) else -1

    # 0b. markup strip (optional, scan-stage rewrite): AFTER the URL
    # gate (it reads raw hrefs), BEFORE any fingerprinting — dedup and
    # the quality gates must judge visible text, not tag soup
    if strip_html:
        from solarpaneldatawrangler_spark.functions.text import strip_markup

        docs = docs.withColumn(text_col, strip_markup(F.col(text_col)))

    # 0c. C4 line cleaning + document gates (optional, r8): rewrite
    # each doc to its C4-surviving lines (terminal punctuation, >=
    # c4_min_line_words words, no 'javascript'), then drop docs the
    # C4 page rules reject ('{', 'lorem ipsum', < c4_min_sentences
    # sentences in the CLEANED text). Runs after markup strip (judge
    # visible text) and before fingerprinting, like the paper's
    # pipeline; scan-stage expressions, zero shuffle
    if c4_clean_lines:
        from solarpaneldatawrangler_spark.functions.text import (
            c4_kept_lines,
        )

        # the kept-lines array is computed once as an alias serving
        # both the gates and the rewrite. Predicate pushdown may still
        # substitute it into the filter condition (Catalyst has no
        # cost guard there, unlike CollapseProject), so the worst case
        # is two evaluations per row — the filter on every doc, the
        # rewrite only on survivors — which already beats the
        # per-flag-copy cost of extracting from a struct literal
        # (SimplifyExtractValueOps duplicates the expression per
        # field; see q71 for the pure-projection single-eval idiom)
        t = F.coalesce(F.col(text_col), F.lit(""))
        step = docs.withColumn(
            "_c4kept", c4_kept_lines(F.col(text_col), c4_min_line_words)
        )
        cleaned = F.array_join(F.col("_c4kept"), "\n")
        n_sent = F.size(
            F.regexp_extract_all(cleaned, F.lit(r"[.!?]+"), F.lit(0))
        )
        docs = (
            step.filter(
                ~F.contains(t, F.lit("{"))
                & ~F.contains(F.lower(t), F.lit("lorem ipsum"))
                & (n_sent >= c4_min_sentences)
            )
            .withColumn(text_col, cleaned)
            .drop("_c4kept")
        )
    n_c4 = docs.count() if (with_report and c4_clean_lines) else -1

    # 1. exact dedup: keep the min-id representative per fingerprint.
    # NO broadcast hint: the keep-set is one id per distinct document,
    # i.e. it grows with the corpus — a hash semi-join on id is the
    # scale-correct default (AQE upgrades it to broadcast when small)
    keep = exact_dedup(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    exact = docs.join(keep, id_col, "left_semi")
    n_exact = exact.count() if with_report else -1

    # 2. near-dup removal (MinHash-LSH bucketed candidates; exact dedup
    # above already removed the identical-doc floods — the hot-bucket
    # precondition)
    near = drop_near_duplicates(
        exact,
        text_col,
        id_col,
        jaccard_threshold,
        transitive=transitive_near_dup,
        reproducible=True,
        max_bucket=near_dup_max_bucket,
    )
    if with_report:
        # the counts below each re-execute their full upstream chain;
        # checkpointing the near-dup survivors bounds that to ONE run
        # of the LSH stage (n_qual/n_lang/n_out re-run only the cheap
        # scan-stage gates over the checkpointed frame)
        near = near.localCheckpoint()
    n_near = near.count() if with_report else -1

    # 3. benchmark decontamination (optional): runs AFTER dedup so the
    # winnowing pass fingerprints each surviving doc once, not every
    # copy. Broadcast benchmark side — adds no corpus shuffle.
    if benchmark is not None:
        from solarpaneldatawrangler_spark.operators.decontaminate import (
            decontaminate,
        )

        clean = decontaminate(
            near, benchmark,
            min_shared=decontam_min_shared,
            min_shared_frac=decontam_min_shared_frac,
            id_col=id_col, text_col=text_col,
        )
        if with_report:
            # same reasoning as the near-dup checkpoint: the winnowing
            # fingerprint pass is the dominant cost, and every
            # downstream stage count would re-execute it otherwise
            clean = clean.localCheckpoint()
    else:
        clean = near
    n_decontam = clean.count() if (with_report and benchmark is not None) else -1

    # 3b0. boilerplate paragraph removal (optional): delete EVERY copy
    # of paragraphs present in >= min_df distinct docs; docs reduced to
    # nothing drop out. MUST run BEFORE paragraph dedup: document
    # frequency has to be measured on the raw corpus — after dedup
    # keeps one copy per fingerprint, every paragraph's df is exactly 1
    # and no threshold could ever fire (the stage would be a silent
    # no-op).
    if boilerplate_min_df is not None:
        from solarpaneldatawrangler_spark.operators.dedup import (
            remove_boilerplate_paragraphs,
        )

        debp = (
            remove_boilerplate_paragraphs(
                clean, min_df=boilerplate_min_df,
                text_col=text_col, id_col=id_col, materialize=True,
            )
            .filter(F.col("n_kept") > 0)
            .select(F.col(id_col), F.col("text").alias(text_col))
        )
        clean = clean.drop(text_col).join(debp, id_col)
        if with_report:
            clean = clean.localCheckpoint()
    n_bp = clean.count() if (with_report and boilerplate_min_df is not None) else -1

    # 3b. paragraph-level dedup (optional): rewrite each surviving doc
    # with corpus-wide duplicate paragraphs removed; docs left with no
    # paragraphs drop out. Runs before the repetition/quality gates so
    # they judge the cleaned text.
    if dedup_paragraphs:
        from solarpaneldatawrangler_spark.operators.dedup import paragraph_dedup

        kept_text = (
            paragraph_dedup(clean, text_col=text_col, id_col=id_col,
                            materialize=True)
            .filter(F.col("n_kept") > 0)
            .select(F.col(id_col), F.col("text").alias(text_col))
        )
        clean = clean.drop(text_col).join(kept_text, id_col)
        if with_report:
            # text was rewritten through three shuffles; bound the
            # downstream stage counts to one execution of them
            clean = clean.localCheckpoint()
    n_para = clean.count() if (with_report and dedup_paragraphs) else -1

    # 3c. exact-substring span removal (optional): cut duplicated token
    # k-gram spans (Lee et al. ExactSubstr) out of every copy; docs
    # whose every token was duplicated drop out. After paragraph dedup
    # (coarse first), before the gates (they judge the cleaned text).
    if remove_spans:
        from solarpaneldatawrangler_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        respanned = (
            remove_duplicate_spans(
                clean, text_col=text_col, id_col=id_col, k=span_k
            )
            .filter(F.col("clean_text") != "")
            .select(F.col(id_col), F.col("clean_text").alias(text_col))
        )
        clean = clean.drop(text_col).join(respanned, id_col)
        if with_report:
            clean = clean.localCheckpoint()
    n_spans = clean.count() if (with_report and remove_spans) else -1

    # 4. repetition gate (optional, scan-stage expressions): drops
    # boilerplate-heavy / degenerate-generation docs by the Gopher
    # signals
    if max_repetition is not None:
        from solarpaneldatawrangler_spark.functions.text import (
            duplicate_line_fraction,
            repeated_ngram_fraction,
        )

        norep = clean.filter(
            (duplicate_line_fraction(F.col(text_col)) <= max_repetition)
            & (repeated_ngram_fraction(F.col(text_col), 2) <= max_repetition)
        )
    else:
        norep = clean
    n_norep = (
        norep.count() if (with_report and max_repetition is not None) else -1
    )

    # 4a'. full Gopher REPETITION battery (optional, r8): all 13
    # Table A1 repetition rules at the paper's thresholds — the seven
    # expression signals (line/paragraph dup count+char fractions,
    # top-2/3/4-gram char fractions) plus the six dup-5..10-gram union
    # char-coverage rules from the Arrow UDF (computed ONCE per row —
    # the struct is projected, then each field thresholds it)
    if gopher_repetition_gate:
        from solarpaneldatawrangler_spark.functions.text import (
            GOPHER_REP_THRESHOLDS,
            gopher_repetition_flags,
        )
        from solarpaneldatawrangler_spark.operators.curation import (
            GOPHER_DUP_NGRAM_NS,
            gopher_dup_ngram_char_fracs,
        )

        flagged = norep.withColumn(
            "_repf", gopher_repetition_flags(F.col(text_col))
        ).withColumn("_repd", gopher_dup_ngram_char_fracs(F.col(text_col)))
        cond = F.lit(True)
        for fl in (
            "dup_line_ok", "dup_para_ok", "dup_line_char_ok",
            "dup_para_char_ok", "top2_ok", "top3_ok", "top4_ok",
        ):
            cond = cond & F.col(f"_repf.{fl}")
        for n in GOPHER_DUP_NGRAM_NS:
            cond = cond & (
                F.col(f"_repd.d{n}")
                <= GOPHER_REP_THRESHOLDS[f"dup_{n}gram_char"]
            )
        norep = flagged.filter(cond).drop("_repf", "_repd")
    n_rep_battery = (
        norep.count() if (with_report and gopher_repetition_gate) else -1
    )

    # 4b. Gopher rule battery (optional, scan-stage): the published
    # heuristic gate, eight flags since r8 (word-count bounds, mean
    # word length, per-class hash/ellipsis symbol ratios,
    # bullet/ellipsis line ratios, alpha-word fraction, stop-word
    # presence) — functions.text.gopher_pass
    if gopher_gate:
        from solarpaneldatawrangler_spark.functions.text import gopher_pass

        norep = norep.filter(
            gopher_pass(F.col(text_col), gopher_min_words, gopher_max_words)
        )
    n_gopher = norep.count() if (with_report and gopher_gate) else -1

    # 5. quality gate (scan-stage expression)
    qual = norep.filter(quality_score(F.col(text_col)) >= min_quality)
    n_qual = qual.count() if with_report else -1

    # 5b. classifier gate (optional, scan-stage): hashed-linear
    # (fastText-architecture) score with sigmoid squash — trained
    # weights when given, deterministic pseudo-weights otherwise
    if min_classifier_score is not None:
        from solarpaneldatawrangler_spark.operators.curation import (
            hashed_linear_score,
        )

        qual = qual.filter(
            hashed_linear_score(
                F.col(text_col),
                weights=classifier_weights,
                n_buckets=classifier_n_buckets,
                bias=classifier_bias,
                sigmoid=True,
            )
            >= min_classifier_score
        )
    n_clf = (
        qual.count() if (with_report and min_classifier_score is not None) else -1
    )

    # 5c. LM perplexity-proxy gate (optional): mean bigram log-prob
    # floor — the CCNet-style fluency cut. The LM trains on the docs
    # that reached this stage (post-dedup, post-boilerplate), so the
    # model isn't dominated by the very junk it's meant to score down.
    if min_lm_score is not None:
        from solarpaneldatawrangler_spark.operators.curation import (
            bigram_lm_score,
        )

        lm = bigram_lm_score(qual, text_col=text_col, id_col=id_col)
        # lm_n == 0 (a sub-2-token doc) is ABSENCE of evidence, not a
        # low score: a floor must not drop what it cannot measure, so
        # those docs pass (the word-count gates are the right tool for
        # dropping tiny docs)
        qual = qual.join(
            lm.filter(
                (F.col("lm_n") == 0)
                | (F.col("lm_sum_r") / F.col("lm_n") >= min_lm_score)
            ).select(id_col),
            id_col,
            "left_semi",
        )
    n_lm = qual.count() if (with_report and min_lm_score is not None) else -1

    # 6. language gate
    lang = qual if language is None else qual.filter(F.col(lang_col) == language)
    n_lang = lang.count() if with_report else -1

    # 6b. DSIR selection (optional, r8): keep the dsir_keep surviving
    # docs whose hashed-n-gram distribution best matches the TARGET
    # corpus (Gumbel-top-k over deterministic importance weights) —
    # runs after the drop gates (fit and select over cleaned
    # survivors), before the mixture downsample, mirroring the
    # paper's select-then-train flow
    if dsir_target is not None:
        if dsir_keep is None and dsir_threshold is None:
            raise ValueError(
                "dsir_target requires dsir_keep (top-k) or "
                "dsir_threshold (streaming weight filter)"
            )
        from solarpaneldatawrangler_spark.operators.dsir import (
            dsir_select,
            dsir_select_threshold,
            train_dsir,
        )

        ratios = train_dsir(
            dsir_target, lang, text_col=text_col, n_buckets=dsir_n_buckets
        )
        if dsir_threshold is not None:
            # threshold mode: pure scan-side filter — no global order,
            # the deployment shape when the keep itself is corpus-sized
            lang = dsir_select_threshold(
                lang, ratios, dsir_threshold, text_col=text_col,
                impl=dsir_impl,
            ).drop("dsir_w")
        else:
            lang = dsir_select(
                lang, ratios, k=dsir_keep, text_col=text_col, id_col=id_col,
                seed=dsir_seed, impl=dsir_impl,
            ).drop("dsir_w", "dsir_key")
    n_dsir = lang.count() if (with_report and dsir_target is not None) else -1

    # 7. downsample: explicit per-stratum rates OR n^alpha temperature
    # rebalancing (both deterministic hash-bucket membership)
    if temperature_alpha is not None:
        from solarpaneldatawrangler_spark.operators.sampling import (
            temperature_resample,
        )

        out = temperature_resample(
            lang, stratum_col, alpha=temperature_alpha,
            target_frac=temperature_frac, id_col=id_col,
            weight_col=temperature_weight_col,
        )
    elif sample_rates:
        out = stratified_hash_sample(
            lang, stratum_col, sample_rates, id_col=id_col
        )
    else:
        out = lang
    n_out = out.count() if with_report else -1

    # 8. PII scrub (optional): rewrite the RELEASED text only — scrub
    # runs once, after every drop gate, never on docs that won't ship
    if scrub_pii:
        from solarpaneldatawrangler_spark.functions.text import redact_pii

        out = out.withColumn(text_col, redact_pii(F.col(text_col)))

    # 9. training shards (optional): deterministic (shard, shard_pos)
    # permutation — the reproducible training order
    if n_shards is not None:
        from solarpaneldatawrangler_spark.operators.curation import (
            shuffle_shards,
        )

        out = shuffle_shards(out, id_col=id_col, n_shards=n_shards,
                             seed=shard_seed)

    # 10. domain-mix keys (optional): stride-scheduling position in the
    # weighted source interleave — the consumer's ORDER BY column.
    # append_mix_key adds the column in place (the shuffle_shards
    # pattern); a join-back would execute the whole curation lineage
    # twice (review-caught)
    if mix_weights is not None:
        from solarpaneldatawrangler_spark.operators.mixing import (
            append_mix_key,
        )

        out = append_mix_key(
            out, mix_weights, default_weight=mix_default_weight,
            source_col=stratum_col, id_col=id_col,
        )

    # 11. split labels (optional, r10): the deterministic train/valid/
    # test carve, appended LAST — after every dedup stage — so near-
    # duplicates can no longer straddle the train/eval boundary (the
    # leakage the q55 'leak' audit measures on raw corpora). Scan-side
    # column, zero shuffle.
    if split_fractions is not None:
        from solarpaneldatawrangler_spark.operators.sampling import (
            split_assign,
        )

        out = out.withColumn(
            "split",
            split_assign(F.col(id_col), split_fractions, seed=split_seed),
        )

    report = (
        CurationReport(
            n_input, n_exact, n_near, n_qual, n_lang, n_out,
            n_after_decontam=n_decontam, n_after_repetition=n_norep,
            n_after_paragraph=n_para, n_after_urlgate=n_urlgate,
            n_after_classifier=n_clf, n_after_spans=n_spans,
            n_after_lm=n_lm, n_after_boilerplate=n_bp,
            n_after_gopher=n_gopher,
            n_after_rep_battery=n_rep_battery,
            n_after_dsir=n_dsir,
            n_after_c4=n_c4,
        )
        if with_report
        else None
    )
    return out, report
