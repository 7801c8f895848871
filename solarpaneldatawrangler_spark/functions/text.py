"""Text-analysis column expressions for large-scale training-data
pipelines (SURVEY.md §2.12): tokenization, n-gram shingles, quality
scoring, language-ID heuristics, fingerprinting.

Everything here is a pure Catalyst expression (JVM-side, codegen'd) —
no Python UDFs in the hot path. At 100 TB these run inside the scan
stage with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.rounding import (
    round_ratio_half_away,
    round_ratio_half_away_sql,
)

# Small multilingual stopword marker sets for the n-gram language-ID
# heuristic. Deliberately tiny and deterministic — this is a heuristic
# scorer, not a model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this",
]


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string> of non-empty lowercase tokens."""
    return F.filter(
        F.split(F.lower(text), r"\s+"), lambda t: F.length(t) > 0
    )


def let(expr: Column, body) -> Column:
    """Expression-level let-binding: evaluate ``expr`` ONCE per row and
    pass it to ``body`` as a bound lambda variable —
    ``transform(array(expr), x -> body(x))[0]``.

    Why this exists (r16, the q52 post-mortem): a Column subtree
    embedded inside a higher-order-function lambda body is re-evaluated
    on EVERY lambda invocation — Catalyst neither hoists loop-invariant
    subtrees out of HOF lambdas nor CSEs across invocations. word_ngrams
    built ``transform(sequence(1, m), i -> slice(<whole tokenize
    subtree>, i, n))``, re-tokenizing the document once per n-gram:
    O(m^2) per document, measured textbook-quadratic (2x tokens -> 4x
    wall) and 90% of q52's entire execution cost at sf0.1. Binding the
    subtree as a lambda variable makes inner references O(1) variable
    lookups. HOFs stay interpreted either way — this changes asymptotic
    shape, not codegen."""
    return F.transform(F.array(expr), body)[0]


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish token segmentation: split into word pieces, numbers, and
    punctuation runs (a GPT-2-style pre-tokenizer regex, simplified).
    Token COUNT over this is the standard cheap proxy for LLM token cost.
    """
    return F.filter(
        F.split(text, r"(?=[A-Za-z])(?<![A-Za-z])|(?=[0-9])(?<![0-9])|(?=[^A-Za-z0-9\s])|\s+"),
        lambda t: F.length(t) > 0,
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Character n-gram shingles of the lowercased text → array<string>.

    Built with sequence+transform (pure expressions): substrings of
    length n at every offset.
    """
    # let-bound (r16): lower(text) inside the per-offset lambda would
    # re-lowercase the whole document once per character — O(len^2)
    def body(t: Column) -> Column:
        count = F.length(t) - F.lit(n - 1)
        # guard: sequence(1, 0) would produce a DESCENDING range
        return F.when(
            count >= 1,
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: t.substr(i, F.lit(n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let(F.lower(text), body)


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles joined with a space → array<string> (distinct).
    Defined as the distinct of word_ngrams so the shingle-construction
    logic (tokenization, sequence guard) lives in ONE place."""
    return F.array_distinct(word_ngrams(text, k))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    return let(
        tokens(text),
        lambda toks: F.size(
            F.filter(toks, lambda t: F.array_contains(sw, t))
        ).cast("double")
        / F.greatest(F.size(toks), F.lit(1)).cast("double"),
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric or whitespace."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped).cast("double") / F.greatest(
        F.length(text), F.lit(1)
    ).cast("double")


def mean_word_length(text: Column) -> Column:
    return let(
        tokens(text),
        lambda toks: F.aggregate(
            toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
        )
        / F.greatest(F.size(toks), F.lit(1)).cast("double"),
    )


def quality_score(text: Column) -> Column:
    """Composite document quality in [0,1]: rewards stopword presence and
    moderate word length, penalizes punctuation soup. Deterministic,
    expression-only — the shape of a Gopher/C4-style quality rule.

    r13 (exact-rational closure, DESIGN.md rounding policy): the score
    is the exact rational (5*a*d + 3*b*(d-c) + 2*b*d*e) / (10*b*d)
    with a = stopword count, b = max(token count, 1), c = punct chars,
    d = max(char count, 1), e = the word-length gate — so the 6dp
    rounding runs in pure integer arithmetic (round_ratio_half_away),
    identical in any engine; the gate itself is the integer compare
    2*b <= sum_token_chars <= 12*b (equivalent to the old double
    mwl in [2,12] everywhere the division is representable, and exact
    at the boundary where it is not).

    r16-opt (guide §4.1 "prefer built-ins"): every token statistic here
    is a COUNT, so the token array never needs to exist — a = tokens
    equal to a stopword = regexp_count over full-token matches, b =
    token count = regexp_count of \\S+ runs (a token IS a maximal
    non-whitespace run of the lowercased text), sum_token_chars =
    non-whitespace char count = length minus whitespace. That removes
    every higher-order function: HOFs evaluate INTERPRETED (lambda
    bodies walk the expression tree per element, and a let() binding
    drags the whole arithmetic into interpreted land with it), while
    this form is one whole-stage-codegen'd expression. Measured at
    sf0.1 (noop sink, interleaved best-of-6): let-bound HOF 0.69-0.75 s
    -> 0.41 s, values bit-identical at sf0.001/0.01/0.1
    (tests/test_quality_codegen_equivalence.py pins equivalence on
    adversarial texts; the DuckDB oracle still replays the token-array
    form, so the gate cross-checks the rewrite every run)."""
    low = F.lower(text)
    # full-token stopword match: token boundaries are string edges or
    # whitespace; lookarounds are zero-width so each matched token is
    # consumed exactly once and matches cannot overlap
    stopword_alt = "|".join(EN_STOPWORDS)
    a = F.regexp_count(
        low, F.lit(rf"(?<=^|\s)(?:{stopword_alt})(?=\s|$)")
    ).cast("long")
    b = F.greatest(F.regexp_count(low, F.lit(r"\S+")), F.lit(1)).cast("long")
    c = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")).cast("long")
    d = F.greatest(F.length(text), F.lit(1)).cast("long")
    sum_len = F.length(F.regexp_replace(low, r"\s+", "")).cast("long")
    e = F.when(
        (sum_len >= 2 * b) & (sum_len <= 12 * b), F.lit(1).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    num = (
        F.lit(5).cast("long") * a * d
        + F.lit(3).cast("long") * b * (d - c)
        + F.lit(2).cast("long") * b * d * e
    )
    return round_ratio_half_away(num, F.lit(10).cast("long") * b * d, 6)


# the Gopher quality-filter rule set (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", Appendix A) — the standard published
# heuristic gate battery for web text, re-expressed as pure Catalyst
# expressions. Thresholds are the paper's.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_BULLETS = ["•", "‣", "- ", "* "]


def gopher_flags(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
) -> Column:
    """Struct of the Gopher rules (eight flags), one boolean each (True = rule
    satisfied): word-count bounds, mean word length in [3, 10],
    symbol-to-word ratio <= 0.1 for '#' and for ellipsis EACH (the
    paper applies the 0.1 bound per symbol class, so these are two
    flags), <= 90% of lines
    bullet-led, <= 30% of lines ellipsis-ended, >= 80% of words contain
    a letter, >= 2 distinct Gopher stop words present.

    All expression-only (runs inside the scan, zero shuffle, zero
    Python at any scale); every rule is list/regexp arithmetic both
    Java regex and RE2 agree on, so the battery is DuckDB-replayable
    (tests oracle it). Word = lowercase whitespace token (the corpus
    tokenizer contract); bullets are a prefix match on the trimmed
    non-empty lines; ellipsis is '...' or the Unicode character."""
    toks = tokens(text)
    n = F.size(toks)
    nz = F.greatest(n, F.lit(1)).cast("double")
    mwl = mean_word_length(text)
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = F.size(
        F.regexp_extract_all(text, F.lit(r"\.\.\.|…"), F.lit(0))
    )
    lines = nonempty_lines(text)
    nl = F.greatest(F.size(lines), F.lit(1)).cast("double")
    is_bullet = lambda l: (  # noqa: E731
        F.startswith(l, F.lit(GOPHER_BULLETS[0]))
        | F.startswith(l, F.lit(GOPHER_BULLETS[1]))
        | F.startswith(l, F.lit(GOPHER_BULLETS[2]))
        | F.startswith(l, F.lit(GOPHER_BULLETS[3]))
    )
    bullet_frac = F.size(F.filter(lines, is_bullet)).cast("double") / nl
    ell_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: F.endswith(l, F.lit("...")) | F.endswith(l, F.lit("…")),
            )
        ).cast("double")
        / nl
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / nz
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    return F.struct(
        ((n >= min_words) & (n <= max_words)).alias("words_ok"),
        ((mwl >= 3.0) & (mwl <= 10.0)).alias("mwl_ok"),
        ((n_hash.cast("double") / nz) <= 0.1).alias("hash_ok"),
        ((n_ellipsis.cast("double") / nz) <= 0.1).alias("ellipsis_sym_ok"),
        (bullet_frac <= 0.9).alias("bullet_ok"),
        (ell_frac <= 0.3).alias("ellipsis_ok"),
        (alpha_frac >= 0.8).alias("alpha_ok"),
        (stop_hits >= 2).alias("stopword_ok"),
    )


def gopher_flags_sql(
    min_words: int = 50, max_words: int = 100_000, text_expr: str = "text"
) -> str:
    """DuckDB replay of every gopher_flags rule (same tokenizer, same
    per-class thresholds) as a list of aliased boolean columns over
    ``text_expr`` (default the ``text`` column — parameterized like the
    sibling c4_*_sql / dsir_features_sql builders so the rules replay
    over derived texts too) — the shared SQL builder consumed by both
    the pytest replay and the q53 driver-oracle merge, so Spark and the
    oracle can never drift apart silently."""
    toks = (
        f"list_filter(string_split_regex(lower({text_expr}), '\\s+'),"
        " t -> len(t) > 0)"
    )
    lines = (
        f"list_filter(list_transform(string_split_regex({text_expr}, '\\n'), "
        "l -> regexp_replace(l, '^\\s+|\\s+$', '', 'g')), l -> len(l) > 0)"
    )
    sw = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"
    bullets = " OR ".join(
        f"starts_with(l, '{b}')" for b in GOPHER_BULLETS
    )
    return f"""
        len({toks}) BETWEEN {min_words} AND {max_words} AS words_ok,
        CASE WHEN len({toks}) = 0 THEN FALSE ELSE
            (CAST(list_aggregate(list_transform({toks}, t -> len(t)), 'sum')
                  AS DOUBLE) / len({toks}))
                BETWEEN 3.0 AND 10.0 END AS mwl_ok,
        CAST(length({text_expr}) - length(replace({text_expr}, '#', ''))
             AS DOUBLE)
            / GREATEST(len({toks}), 1) <= 0.1 AS hash_ok,
        CAST(len(regexp_extract_all({text_expr}, '\\.\\.\\.|…')) AS DOUBLE)
            / GREATEST(len({toks}), 1) <= 0.1 AS ellipsis_sym_ok,
        CAST(len(list_filter({lines}, l -> {bullets}))
             AS DOUBLE) / GREATEST(len({lines}), 1) <= 0.9 AS bullet_ok,
        CAST(len(list_filter({lines},
                 l -> ends_with(l, '...') OR ends_with(l, '…')))
             AS DOUBLE) / GREATEST(len({lines}), 1) <= 0.3 AS ellipsis_ok,
        CAST(len(list_filter({toks}, t -> regexp_matches(t, '[a-z]')))
             AS DOUBLE) / GREATEST(len({toks}), 1) >= 0.8 AS alpha_ok,
        len(list_intersect(list_distinct({toks}), {sw})) >= 2
            AS stopword_ok
    """


def gopher_pass(
    text: Column, min_words: int = 50, max_words: int = 100_000
) -> Column:
    """True iff the document satisfies every Gopher rule — the combined
    gate curate_corpus applies under ``gopher_gate=True``."""
    f = gopher_flags(text, min_words, max_words)
    out = F.lit(True)
    for rule in (
        "words_ok", "mwl_ok", "hash_ok", "ellipsis_sym_ok",
        "bullet_ok", "ellipsis_ok", "alpha_ok", "stopword_ok",
    ):
        out = out & f[rule]
    return out


def lang_marker_score(text: Column, lang: str) -> Column:
    """Count of marker-word occurrences for a language (token matches)."""
    toks = tokens(text)
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def _ngrams_of(toks: Column, n: int) -> Column:
    """n-gram array from an ALREADY-BOUND token array (a lambda
    variable or attribute — never a recomputable subtree: the slice
    inside the lambda touches ``toks`` once per gram, so an embedded
    tokenize subtree would re-execute per gram, the q52 O(m^2))."""
    count = F.size(toks) - F.lit(n - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Word n-grams WITH multiplicity (word_shingles = this,
    distincted) → array<string>. The repetition signals below need the
    duplicates. Tokenization is let-bound (r16): it runs once per row,
    not once per gram."""
    return let(tokens(text), lambda toks: _ngrams_of(toks, n))


def nonempty_lines(text: Column) -> Column:
    """Trimmed non-empty lines → array<string> (with multiplicity).
    Trimming is full-whitespace (regexp, matching Python str.strip) —
    F.trim strips ASCII spaces only, so CRLF files' trailing \\r and
    tab-only 'blank' lines would otherwise count as content lines."""
    return F.filter(
        F.transform(
            F.split(text, r"\n"),
            lambda l: F.regexp_replace(l, r"^\s+|\s+$", ""),
        ),
        lambda l: F.length(l) > 0,
    )


def dup_fraction_of_array(arr: Column) -> Column:
    """(total - distinct) / total repetition fraction of an ALREADY-
    BOUND array (an attribute/column reference or lambda variable —
    never a recomputable subtree: ``arr`` is referenced three times, so
    a computed argument would evaluate three times per row). r17:
    extracted so q52 can project the line/paragraph arrays once and
    derive both the count and char fractions from the same column."""
    return F.when(
        F.size(arr) >= 1,
        round_ratio_half_away(
            (F.size(arr) - F.size(F.array_distinct(arr))).cast("long"),
            F.size(arr).cast("long"),
            6,
        ),
    ).otherwise(F.lit(0.0))


def duplicate_line_fraction(text: Column) -> Column:
    """Gopher repetition signal: fraction of non-empty lines that are
    repeats of an earlier line (1 - distinct/total; 0 for line-less
    docs). Boilerplate-heavy scrapes (nav menus, cookie banners) score
    high. Pure expressions — runs inside the scan at 100 TB."""
    # exact-rational 6dp rounding (r13): (total - distinct) / total in
    # pure integer arithmetic, engine-identical at decimal ties.
    # let-bound (r16): the line-split subtree was re-evaluated per
    # reference (3x per row) before the binding
    return let(nonempty_lines(text), dup_fraction_of_array)


def paragraphs_array(text: Column) -> Column:
    """Trimmed non-empty paragraphs → array<string> (with
    multiplicity). Paragraph = blank-line-separated block, the SAME
    split as operators.dedup._split_paragraphs (PARA_SEP_RE twin kept
    literal here to avoid a functions→operators import cycle), so the
    repetition signals and paragraph dedup agree on what a paragraph
    is. Trim matches nonempty_lines' full-whitespace regexp."""
    return F.filter(
        F.transform(
            F.split(text, r"\n[ \t\n\f\r\x0B]*\n"),
            lambda p: F.regexp_replace(p, r"^\s+|\s+$", ""),
        ),
        lambda p: F.length(p) > 0,
    )


def duplicate_paragraph_fraction(text: Column) -> Column:
    """Gopher repetition signal: fraction of non-empty paragraphs that
    are repeats of an earlier paragraph (1 - distinct/total; 0 for
    paragraph-less docs)."""
    return let(paragraphs_array(text), dup_fraction_of_array)


def dup_char_fraction_of_array(arr: Column) -> Column:
    """Char-fraction twin of dup_fraction_of_array over an ALREADY-
    BOUND array: 1 - chars(distinct)/chars(all). Both sums are
    aggregate folds with O(1) lambdas over collection arguments —
    inlining-safe (the span-dedup CollapseProject lesson: lambdas here
    never reference an O(doc) subtree)."""
    tot = F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    dis = F.aggregate(
        F.array_distinct(arr),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x),
    )
    return F.when(
        tot >= 1, round_ratio_half_away(tot - dis, tot, 6)
    ).otherwise(F.lit(0.0))


def _dup_char_fraction(arr: Column) -> Column:
    """let-bound (r16) wrapper of dup_char_fraction_of_array: ``arr``
    is referenced multiple times (total + distinct folds), so a
    computed subtree argument would otherwise evaluate per
    reference."""
    return let(arr, dup_char_fraction_of_array)


def duplicate_line_char_fraction(text: Column) -> Column:
    """Gopher repetition signal: fraction of line characters inside
    duplicated lines (every occurrence beyond the first counts)."""
    return _dup_char_fraction(nonempty_lines(text))


def duplicate_paragraph_char_fraction(text: Column) -> Column:
    """Gopher repetition signal: paragraph-character twin of
    duplicate_line_char_fraction."""
    return _dup_char_fraction(paragraphs_array(text))


def top_ngram_char_fraction(text: Column, n: int = 2) -> Column:
    """Gopher repetition signal: characters claimed by the most
    frequent word n-gram — occurrences(g*) x len(g*) over the canonical
    single-spaced token join's length. Overlapping occurrences are NOT
    merged (matching the published gate's arithmetic), so degenerate
    text ("the the the ...") can exceed 1; the gate only compares
    against a threshold.

    Shape (r16): the token array is let-bound — evaluated once per
    row, shared by the gram build, the fold, and the denominator
    (before the binding, the tokenize subtree inlined into the gram
    transform re-ran per gram: O(m^2) per doc, 90% of q52's execution
    at sf0.1). Then one O(m log m) sort of the gram array and ONE
    aggregate fold carrying (prev gram, current run length, best
    score) — the fold lambda touches only its element and the
    accumulator, never an O(doc) subtree (the span-dedup lesson).
    Ties on count resolve to the LONGEST character claim (max over
    runs of count x len), which is the quantity the rule thresholds."""

    def body(toks: Column) -> Column:
        gs = F.sort_array(_ngrams_of(toks, n))
        # acc: (prev gram value, run length, best count*len so far)
        init = F.struct(
            F.lit(None).cast("string").alias("v"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        )

        def step(acc, g):
            run = F.when(
                acc["v"].isNotNull() & (acc["v"] == g), acc["run"] + 1
            ).otherwise(F.lit(1).cast("long"))
            return F.struct(
                g.alias("v"),
                run.alias("run"),
                F.greatest(acc["best"], run * F.length(g)).alias("best"),
            )

        best = F.aggregate(gs, init, step)["best"]
        denom = F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ) + F.greatest(F.size(toks) - 1, F.lit(0))
        return F.when(
            denom >= 1, round_ratio_half_away(best, denom, 6)
        ).otherwise(F.lit(0.0))

    return let(tokens(text), body)


# Rae et al. 2021 Table A1 thresholds for the repetition battery:
# (signal, threshold) — a document PASSES a rule when its fraction is
# <= the threshold.
GOPHER_REP_THRESHOLDS: dict[str, float] = {
    "dup_line": 0.30,
    "dup_para": 0.30,
    "dup_line_char": 0.20,
    "dup_para_char": 0.20,
    "top_2gram_char": 0.20,
    "top_3gram_char": 0.18,
    "top_4gram_char": 0.16,
    "dup_5gram_char": 0.15,
    "dup_6gram_char": 0.14,
    "dup_7gram_char": 0.13,
    "dup_8gram_char": 0.12,
    "dup_9gram_char": 0.11,
    "dup_10gram_char": 0.10,
}


def gopher_repetition_flags(text: Column) -> Column:
    """Struct of the scan-side Gopher REPETITION rules (Rae et al. 2021
    Table A1) — the companion battery to gopher_flags: duplicate
    line/paragraph fractions (count and character) and top-2/3/4-gram
    character fractions, each thresholded per the paper (True = rule
    satisfied). The dup-5..10-gram character-coverage rules need a
    per-doc hash map (union coverage) and live in
    operators.curation.gopher_dup_ngram_char_fracs — compose both for
    the paper's full 13-rule repetition gate."""
    return F.struct(
        (duplicate_line_fraction(text)
         <= GOPHER_REP_THRESHOLDS["dup_line"]).alias("dup_line_ok"),
        (duplicate_paragraph_fraction(text)
         <= GOPHER_REP_THRESHOLDS["dup_para"]).alias("dup_para_ok"),
        (duplicate_line_char_fraction(text)
         <= GOPHER_REP_THRESHOLDS["dup_line_char"]).alias("dup_line_char_ok"),
        (duplicate_paragraph_char_fraction(text)
         <= GOPHER_REP_THRESHOLDS["dup_para_char"]).alias("dup_para_char_ok"),
        (top_ngram_char_fraction(text, 2)
         <= GOPHER_REP_THRESHOLDS["top_2gram_char"]).alias("top2_ok"),
        (top_ngram_char_fraction(text, 3)
         <= GOPHER_REP_THRESHOLDS["top_3gram_char"]).alias("top3_ok"),
        (top_ngram_char_fraction(text, 4)
         <= GOPHER_REP_THRESHOLDS["top_4gram_char"]).alias("top4_ok"),
    )


# --- C4 cleaning battery (Raffel et al. 2020, "Exploring the Limits
# --- of Transfer Learning...", §2.2) ----------------------------------------

# a line survives C4 cleaning iff it ends in terminal punctuation
# (period, exclamation, question mark, or closing quote — the paper's
# rule), carries at least 5 words, and does not mention javascript
C4_TERMINAL_RE = "[.!?\"']$"


def c4_kept_lines(text: Column, min_words: int = 5) -> Column:
    """Lines kept by the C4 line-level cleaning rules: trimmed
    non-empty lines ending in terminal punctuation, with at least
    ``min_words`` whitespace words, not containing 'javascript'
    (case-insensitive). Pure expressions; the inner word count's
    collection argument derives only from the line element, so lambdas
    stay O(line) (the CollapseProject inlining rule). Null text is
    normalized to '' (the repo's null-text contract), matching the
    COALESCE in the SQL replay."""
    return F.filter(
        nonempty_lines(F.coalesce(text, F.lit(""))),
        lambda l: l.rlike(C4_TERMINAL_RE)
        & (
            F.size(
                F.filter(
                    F.split(l, r"\s+"), lambda w: F.length(w) > 0
                )
            )
            >= min_words
        )
        & ~F.contains(F.lower(l), F.lit("javascript")),
    )


def c4_clean(text: Column, min_words: int = 5) -> Column:
    """The C4-cleaned document: surviving lines re-joined with
    newlines ('' when every line is dropped)."""
    return F.array_join(c4_kept_lines(text, min_words), "\n")


def c4_doc_flags(
    text: Column, min_words: int = 5, min_sentences: int = 3
) -> Column:
    """Struct of the C4 document-level gates over the RAW text plus
    stats of the cleaned text: ``has_brace`` ('{' — the code-page
    rule), ``has_lorem`` ('lorem ipsum', case-insensitive),
    ``n_kept_lines``, ``n_sentences`` (terminal-punctuation runs in
    the cleaned text — the paper's >= 3-sentence rule, with sentence
    boundaries approximated by [.!?]+ runs), and ``c4_ok`` (all gates
    pass). Scan-side, zero shuffle, DuckDB-replayable
    (c4_flags_sql)."""
    kept = c4_kept_lines(text, min_words)
    cleaned = F.array_join(kept, "\n")
    n_sent = F.size(
        F.regexp_extract_all(cleaned, F.lit(r"[.!?]+"), F.lit(0))
    )
    has_brace = F.contains(F.coalesce(text, F.lit("")), F.lit("{"))
    has_lorem = F.contains(
        F.lower(F.coalesce(text, F.lit(""))), F.lit("lorem ipsum")
    )
    return F.struct(
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        F.size(kept).alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        (
            ~has_brace & ~has_lorem & (n_sent >= min_sentences)
        ).alias("c4_ok"),
    )


def c4_kept_lines_sql(text_expr: str, min_words: int = 5) -> str:
    """DuckDB replay of c4_kept_lines over an arbitrary text expr."""
    lines = lines_sql(f"COALESCE({text_expr}, '')")
    return (
        f"list_filter({lines}, l -> "
        "regexp_matches(l, '[.!?\"'']$') AND "
        "len(list_filter(string_split_regex(l, '\\s+'), w -> len(w) > 0))"
        f" >= {min_words} AND NOT contains(lower(l), 'javascript'))"
    )


def c4_flags_sql(text_expr: str, min_words: int = 5, min_sentences: int = 3) -> str:
    """DuckDB replay of c4_doc_flags as aliased columns."""
    kept = c4_kept_lines_sql(text_expr, min_words)
    cleaned = f"array_to_string({kept}, chr(10))"
    n_sent = f"len(regexp_extract_all({cleaned}, '[.!?]+'))"
    has_brace = f"contains(COALESCE({text_expr}, ''), '{{')"
    has_lorem = f"contains(lower(COALESCE({text_expr}, '')), 'lorem ipsum')"
    return f"""
        {has_brace} AS has_brace,
        {has_lorem} AS has_lorem,
        len({kept}) AS n_kept_lines,
        {n_sent} AS n_sentences,
        (NOT {has_brace} AND NOT {has_lorem}
         AND {n_sent} >= {min_sentences}) AS c4_ok
    """


def lines_sql(text_expr: str) -> str:
    """DuckDB replay of nonempty_lines over an arbitrary text expr."""
    return (
        f"list_filter(list_transform(string_split_regex({text_expr}, "
        "'\\n'), l -> regexp_replace(l, '^\\s+|\\s+$', '', 'g')), "
        "l -> len(l) > 0)"
    )


def paragraphs_sql(text_expr: str) -> str:
    """DuckDB replay of paragraphs_array (same PARA_SEP split)."""
    return (
        f"list_filter(list_transform(string_split_regex({text_expr}, "
        "'\\n[ \\t\\n\\f\\r\\x0B]*\\n'), "
        "l -> regexp_replace(l, '^\\s+|\\s+$', '', 'g')), l -> len(l) > 0)"
    )


def dup_fraction_sql(arr_expr: str) -> str:
    """DuckDB replay of the (total - distinct) / total repetition
    fraction — integer-exact 6dp rounding (r13), matching the Spark
    side's round_ratio_half_away."""
    num = f"len({arr_expr}) - len(list_distinct({arr_expr}))"
    r = round_ratio_half_away_sql(num, f"len({arr_expr})", 6, assume_nonneg=True)
    return f"(CASE WHEN len({arr_expr}) >= 1 THEN {r} ELSE 0.0 END)"


def dup_char_fraction_sql(arr_expr: str) -> str:
    """DuckDB replay of _dup_char_fraction (integer-exact 6dp, r13)."""
    tot = f"list_sum(list_transform({arr_expr}, x -> len(x)))"
    dis = f"list_sum(list_transform(list_distinct({arr_expr}), x -> len(x)))"
    r = round_ratio_half_away_sql(f"({tot}) - ({dis})", tot, 6, assume_nonneg=True)
    return f"(CASE WHEN COALESCE({tot}, 0) >= 1 THEN {r} ELSE 0.0 END)"


def top_ngram_char_fraction_sql(text_expr: str, n: int) -> str:
    """DuckDB replay of top_ngram_char_fraction: max over n-gram runs
    of count x len(gram), over the canonical single-spaced join's
    length — as a scalar subquery usable per documents row."""
    toks = (
        f"list_filter(string_split_regex(lower({text_expr}), '\\s+'),"
        " t -> len(t) > 0)"
    )
    num = f"""COALESCE((
        SELECT MAX(cnt * len(g)) FROM (
            SELECT array_to_string(list_slice(t.toks, CAST(u.i AS INT),
                       CAST(u.i AS INT) + {n - 1}), ' ') AS g,
                   COUNT(*) AS cnt
            FROM (SELECT {toks} AS toks) t,
                 LATERAL UNNEST(range(1, len(t.toks) - {n} + 2)) AS u(i)
            GROUP BY g
        )), 0)"""
    den = (
        f"GREATEST(list_sum(list_transform({toks}, x -> len(x)))"
        f" + GREATEST(len({toks}) - 1, 0), 1)"
    )
    # integer-exact 6dp (r13) — matches the Spark fold's rounding; the
    # Spark side emits 0.0 for token-less docs, where num=0/den=1 -> 0.0
    return round_ratio_half_away_sql(num, den, 6, assume_nonneg=True)


def quality_score_sql(text_expr: str, toks_expr: str, sw_list: str) -> str:
    """DuckDB replay of quality_score (integer-exact 6dp, r13): the
    same (5*a*d + 3*b*(d-c) + 2*b*d*e) / (10*b*d) rational with the
    same integer word-length gate, rounded via the shared HUGEINT
    helper. ``toks_expr`` / ``sw_list`` are the caller's canonical
    tokenizer / stopword-list SQL (they live with the oracle builders,
    not here, to keep one tokenizer contract per query)."""
    a = f"len(list_filter({toks_expr}, t -> list_contains({sw_list}, t)))"
    b = f"GREATEST(len({toks_expr}), 1)"
    c = f"length(regexp_replace({text_expr}, '[A-Za-z0-9\\s]', '', 'g'))"
    d = f"GREATEST(length({text_expr}), 1)"
    s = f"COALESCE(list_sum(list_transform({toks_expr}, t -> len(t))), 0)"
    e = f"(CASE WHEN ({s}) >= 2*({b}) AND ({s}) <= 12*({b}) THEN 1 ELSE 0 END)"
    num = f"5*({a})*({d}) + 3*({b})*(({d}) - ({c})) + 2*({b})*({d})*{e}"
    return round_ratio_half_away_sql(
        num, f"10*({b})*({d})", 6, assume_nonneg=True
    )


def repeated_ngram_fraction(text: Column, n: int = 2) -> Column:
    """Gopher repetition signal: fraction of word n-grams that are
    repeats (1 - distinct/total). Degenerate generated text ("the the
    the ...") scores near 1; normal prose near 0."""
    gs = word_ngrams(text, n)
    return F.when(
        F.size(gs) >= 1,
        round_ratio_half_away(
            (F.size(gs) - F.size(F.array_distinct(gs))).cast("long"),
            F.size(gs).cast("long"),
            6,
        ),
    ).otherwise(F.lit(0.0))


# PII patterns, deliberately conservative (favor precision — corpus
# curation redacts what it is SURE about and leaves ambiguous spans to
# heavier NER passes): RFC-ish emails, international/US phone shapes
# with separators, dotted-quad IPv4.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "PHONE": r"(?<![0-9])(?:\+?[0-9]{1,3}[-. ])?(?:\([0-9]{3}\)[-. ]?|[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}(?![0-9])",
    "IP": r"(?<![0-9.])(?:[0-9]{1,3}\.){3}[0-9]{1,3}(?![0-9.])",
}


# RE2-safe variants (word boundaries instead of lookarounds): slightly
# coarser at digit/dot edges, but they run IDENTICALLY as Java regex
# (Spark) and in DuckDB's RE2 — so the redaction output itself is
# DuckDB-oracle-checkable (the q52 merge hashes the redacted text).
PII_PATTERNS_RE2: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IP": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def redact_pii(
    text: Column,
    kinds: list[str] | None = None,
    patterns: dict[str, str] | None = None,
) -> Column:
    """Replace PII spans with ``<KIND>`` markers — the standard scrub
    gate before training-data release. Pure regexp_replace chain
    (codegen, runs inside the scan). The default patterns use
    lookarounds for boundary precision (Java/Python regex; NOT RE2 —
    so their oracle is a Python ``re`` reference); pass
    ``patterns=PII_PATTERNS_RE2`` for the cross-engine-exact variant
    DuckDB can replay. ``kinds`` selects/reorders (default: all, in
    dict order — EMAIL before PHONE so an address's digits aren't
    half-eaten by the phone pattern first)."""
    pats = patterns if patterns is not None else PII_PATTERNS
    out = text
    for kind in kinds or list(pats):
        out = F.regexp_replace(out, pats[kind], f"<{kind}>")
    return out


def pii_count(
    text: Column,
    kinds: list[str] | None = None,
    patterns: dict[str, str] | None = None,
) -> Column:
    """Total PII matches (the redaction-audit metric)."""
    pats = patterns if patterns is not None else PII_PATTERNS
    total = F.lit(0)
    for kind in kinds or list(pats):
        total = total + F.size(
            F.regexp_extract_all(text, F.lit(pats[kind]), F.lit(0))
        )
    return total


# HTML/markup stripping: the first gate of any web-corpus pipeline
# (CCNet/RefinedWeb/FineWeb all start from extracted-then-cleaned HTML).
# Every pattern is RE2-safe (no lookarounds, no backreferences) so the
# exact same pattern strings run as Java regex in Spark and in DuckDB's
# RE2 — the stripped text itself is oracle-checkable. Ordered chain:
# script/style blocks (their CONTENT is code, not prose), comments,
# then tags; tags are replaced with a space (not "") so "a</p><p>b"
# cannot weld into "ab".
MARKUP_BLOCK_RES: list[str] = [
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
]
MARKUP_TAG_RE = r"</?[A-Za-z][^>]*>"

# closing block-level tags (and <br>) become PARAGRAPH BREAKS, not
# spaces: downstream paragraph operators (paragraph_dedup,
# remove_boilerplate_paragraphs) split on blank lines, and a stripper
# that welds every block into one line would erase the structure they
# key on
MARKUP_BLOCK_BREAK_RE = (
    r"(?i)</(p|div|h[1-6]|li|ul|ol|table|tr|blockquote)>|<br */?>"
)

# whitespace classes spelled EXPLICITLY rather than via \s/\S: Java's
# \s includes vertical tab (\x0B), RE2's does not, so `[^\S\n]` or a
# `\s`-based trim would silently disagree between Spark and the DuckDB
# oracle on real-world web text. The explicit lists below mean the
# same characters in both engines.
MARKUP_HWS_RE = r"[ \t\f\r\x0B]+"  # horizontal whitespace runs
MARKUP_TRIM_RE = r"^[ \t\n\f\r\x0B]+|[ \t\n\f\r\x0B]+$"  # edge trim

# single-pass entity unescape, &amp; deliberately LAST: "&amp;lt;"
# decodes to the literal text "&lt;" (one level, like html.unescape's
# single pass), never double-decodes into "<"
MARKUP_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def strip_markup(text: Column) -> Column:
    """Strip HTML/XML markup down to its visible text: drop
    script/style/comment blocks, turn closing block tags into paragraph
    breaks, replace remaining tags with spaces, unescape the common
    entities (one pass, ``&amp;`` last), then normalize whitespace
    PARAGRAPH-PRESERVINGLY — horizontal runs collapse to one space,
    newline runs cap at two (a blank line), edges trim. The output
    feeds paragraph_dedup / remove_boilerplate_paragraphs directly.

    Pure regexp_replace/replace chain — codegen, runs inside the scan,
    zero shuffle at any scale. A regex-level cleaner by design (no DOM,
    no malformed-nesting recovery): the deterministic, cross-engine-
    replayable 95% case, not a jusText/trafilatura replacement."""
    out = text
    for pat in MARKUP_BLOCK_RES:
        out = F.regexp_replace(out, pat, " ")
    out = F.regexp_replace(out, MARKUP_BLOCK_BREAK_RE, "\n\n")
    out = F.regexp_replace(out, MARKUP_TAG_RE, " ")
    for ent, rep in MARKUP_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, MARKUP_HWS_RE, " ")  # horizontal ws -> space
    out = F.regexp_replace(out, r" ?\n ?", "\n")  # no spaces hugging newlines
    out = F.regexp_replace(out, r"\n{3,}", "\n\n")  # cap blank runs at one
    return F.regexp_replace(out, MARKUP_TRIM_RE, "")  # trim incl. newlines


def markup_tag_count(text: Column) -> Column:
    """Number of HTML tags (open or close) — the cheap 'is this page
    markup-heavy' signal used to route documents to the stripper."""
    return F.size(F.regexp_extract_all(text, F.lit(MARKUP_TAG_RE), F.lit(0)))


def strip_markup_sql(col_expr: str = "text") -> str:
    """DuckDB replay of strip_markup, built from the SAME pattern
    constants (oracle drift breaks here, not silently): nested
    regexp_replace('g') + replace chain + the paragraph-preserving
    whitespace normalization (newlines spelled chr(10))."""
    expr = col_expr
    for pat in MARKUP_BLOCK_RES:
        expr = f"regexp_replace({expr}, '{pat}', ' ', 'g')"
    expr = (
        f"regexp_replace({expr}, '{MARKUP_BLOCK_BREAK_RE}', "
        "chr(10) || chr(10), 'g')"
    )
    expr = f"regexp_replace({expr}, '{MARKUP_TAG_RE}', ' ', 'g')"
    for ent, rep in MARKUP_ENTITIES:
        r = rep.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{r}')"
    expr = f"regexp_replace({expr}, '{MARKUP_HWS_RE}', ' ', 'g')"
    expr = f"regexp_replace({expr}, ' ?\\n ?', chr(10), 'g')"
    expr = f"regexp_replace({expr}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    return f"regexp_replace({expr}, '{MARKUP_TRIM_RE}', '', 'g')"


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalized
    lowercased text. Stable across engines (md5 is standard), so it
    doubles as an exact-dedup key.
    """
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(normalized)


def md5_long(s: Column) -> Column:
    """First 32 bits of md5(s) as a non-negative bigint.

    Cross-engine-reproducible token hash (DuckDB:
    ('0x'||substr(md5(s),1,8))::BIGINT) used by the oracle-checkable
    MinHash variant. The production path uses xxhash64 (faster, JVM).
    """
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def sql_str_literal(s: str) -> str:
    """A SQL string literal with embedded single quotes doubled
    (o'reilly -> 'o''reilly') — the ONE escaping rule every *_sql
    builder that interpolates caller-provided names/labels/seeds must
    use; an unescaped arm is malformed SQL or, worse, a semantically
    different expression than the Spark twin (review-caught in
    mixture_case_sql, then again in split_assign_sql)."""
    return "'" + s.replace("'", "''") + "'"


def norm_toks_sql(text_expr: str = "text") -> str:
    """DuckDB fragment: whitespace tokens of lowercased text with NULL
    normalized to '' first — the sketch/HLL item relation. ONE
    definition shared by every plan module (the shared-builder idiom);
    a second spelling of this fragment is how hash surfaces silently
    drift apart."""
    return (
        f"list_filter(string_split_regex(lower(COALESCE({text_expr}, '')),"
        " '\\s+'), w -> len(w) > 0)"
    )


def norm_text_sql(text_expr: str = "text") -> str:
    """DuckDB fragment: whitespace-normalized lowercased text, NULL ->
    '' — the exact-dedup / corpus-diff / KMV content normalization
    (the Spark twin is functions.text.fingerprint's input)."""
    return (
        f"regexp_replace(trim(lower(COALESCE({text_expr}, ''))),"
        " '\\s+', ' ', 'g')"
    )
