"""Pin the HOF let-binding shape (r16, the q52 O(m^2) post-mortem).

A Column subtree embedded inside a higher-order-function lambda body is
re-evaluated on EVERY lambda invocation — Catalyst neither hoists
loop-invariant subtrees out of HOF lambdas nor CSEs across
invocations. word_ngrams built ``transform(sequence(1, m), i ->
slice(<tokenize subtree>, i, n))``: the document re-tokenized once per
n-gram, O(m^2) per doc, measured textbook-quadratic (2x tokens -> 4x
wall) and 90% of q52's execution at sf0.1 (68.6s -> 21.1s after the
fix; bench_out/r16_q52_attr.json). functions.text.let() binds such a
subtree as a lambda variable so inner references are O(1) lookups.

These tests pin the SHAPE, not timings: the analyzed plan of each
fixed function must contain its expensive subtree exactly once — a
refactor that re-inlines it (dropping the let) fails here without
needing a flaky wall-clock ratio assertion.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.text import (
    char_ngrams,
    duplicate_line_fraction,
    duplicate_paragraph_fraction,
    mean_word_length,
    quality_score,
    stopword_ratio,
    top_ngram_char_fraction,
    word_ngrams,
)


def _plan(spark, col) -> str:
    df = spark.createDataFrame([("a b c",)], "text string")
    return df.select(col.alias("x"))._jdf.queryExecution().analyzed().toString()


def test_tokenize_subtree_appears_once_in_token_functions(spark):
    spark.conf.set("spark.sql.debug.maxToStringFields", "10000")
    t = F.col("text")
    for name, col in {
        "word_ngrams": word_ngrams(t, 2),
        "top_ngram_char_fraction": top_ngram_char_fraction(t, 3),
        "stopword_ratio": stopword_ratio(t),
        "mean_word_length": mean_word_length(t),
    }.items():
        n = _plan(spark, col).count("split(lower(")
        assert n == 1, (
            f"{name}: tokenize subtree appears {n}x in the expression "
            "— the let-binding was dropped (each extra occurrence "
            "re-tokenizes per row or, inside a lambda, per element)"
        )


def test_quality_score_is_tokenizer_free(spark):
    """r16-opt: quality_score's token statistics are pure counts, so it
    was rewritten to regexp_count/length codegen — no token array, no
    HOF, no let(). A reappearing split() means someone reintroduced the
    interpreted form (measured ~1.8x slower at sf0.1)."""
    p = _plan(spark, quality_score(F.col("text")))
    assert p.count("split(") == 0, p
    assert "lambdafunction" not in p.lower(), p


def test_line_and_paragraph_splits_appear_once(spark):
    t = F.col("text")
    for name, col in [
        ("duplicate_line_fraction", duplicate_line_fraction(t)),
        ("duplicate_paragraph_fraction", duplicate_paragraph_fraction(t)),
    ]:
        n = _plan(spark, col).count("split(text")
        assert n == 1, f"{name}: line/para split appears {n}x"


def test_char_ngrams_lowercases_once(spark):
    n = _plan(spark, char_ngrams(F.col("text"), 3)).count("lower(")
    assert n == 1, f"char_ngrams: lower() appears {n}x"


def test_bigram_pairs_tokenize_once(spark):
    """The bigram-LM feeder shape (operators.curation bigram rows):
    element_at(toks, i) per pair re-ran tokenize per bigram before
    r16 — quadratic in document length."""
    from solarpaneldatawrangler_spark.functions.text import let, tokens

    pairs = let(
        tokens(F.col("text")),
        lambda toks: F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    )
    n = _plan(spark, pairs).count("split(lower(")
    assert n == 1


def test_let_semantics(spark):
    """let(expr, body) must equal body(expr) in VALUE for a pure
    expression — binding changes cost shape only."""
    from solarpaneldatawrangler_spark.functions.text import let

    df = spark.createDataFrame(
        [("a b c d",), ("",), (None,)], "text string"
    )
    got = df.select(
        let(F.split(F.col("text"), " "), lambda a: F.size(a)).alias("n")
    ).collect()
    want = df.select(F.size(F.split(F.col("text"), " ")).alias("n")).collect()
    assert [r.n for r in got] == [r.n for r in want]
