"""r16-opt: quality_score was rewritten from a let-bound HOF form
(token array + filter/aggregate lambdas, interpreted) to pure
whole-stage-codegen regexp counting — a = full-token stopword matches,
b = \\S+ runs, sum_token_chars = non-whitespace chars. This file pins
VALUE equivalence against the old token-array form on adversarial
texts, so the 1.8x speedup can never silently change a score.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.rounding import (
    round_ratio_half_away,
)
from solarpaneldatawrangler_spark.functions.text import (
    EN_STOPWORDS,
    quality_score,
    tokens,
)


def _quality_score_hof_reference(text):
    """The pre-r16-opt token-array form, verbatim (kept here as the
    equivalence reference)."""
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    toks = tokens(text)
    a = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("long")
    b = F.greatest(F.size(toks), F.lit(1)).cast("long")
    c = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")).cast("long")
    d = F.greatest(F.length(text), F.lit(1)).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    e = F.when(
        (sum_len >= 2 * b) & (sum_len <= 12 * b), F.lit(1).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    num = (
        F.lit(5).cast("long") * a * d
        + F.lit(3).cast("long") * b * (d - c)
        + F.lit(2).cast("long") * b * d * e
    )
    return round_ratio_half_away(num, F.lit(10).cast("long") * b * d, 6)


ADVERSARIAL = [
    None,
    "",
    " ",
    "\t\n  \r ",
    "the",
    "THE",  # lowercasing must happen before stopword matching
    "the the the the",
    "athe thea at he",  # substrings of stopwords are not stopwords
    "a an and",  # overlapping alternation prefixes (a vs an vs and)
    "an a",  # alternation order must not matter for full-token match
    "word",
    "x",
    "supercalifragilisticexpialidocious " * 5,  # fails the mwl gate
    "a b c d e f g h i j",  # passes the mwl gate at the low boundary
    "!!! ??? ;;; :::",  # punctuation soup
    "the  quick\tbrown\nfox  ",  # mixed whitespace runs
    "line one\nline two\nthe end",
    "tab\tseparated\tthe\tvalues",
    "unicode … ellipsis — dash é accents the",
    "digits 123 456 the 789",
    "trailing space the ",
    " leading the",
    "a" * 3000,  # one giant token
    ("the quick brown fox jumps over the lazy dog " * 50).strip(),
]


def test_quality_score_codegen_matches_hof_reference(spark):
    df = spark.createDataFrame([(t,) for t in ADVERSARIAL], "text string")
    got = df.select(
        quality_score(F.col("text")).alias("new"),
        _quality_score_hof_reference(F.col("text")).alias("old"),
    ).collect()
    for i, r in enumerate(got):
        assert r.new == r.old, (
            f"row {i} ({ADVERSARIAL[i]!r:.60}): codegen {r.new} != "
            f"HOF reference {r.old}"
        )


def test_quality_score_codegen_matches_on_testdata(spark):
    """Whole-corpus equivalence at sf0.01 — the same rows the driver's
    oracle gate hashes."""
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    bad = (
        docs.select(
            quality_score(F.col("text")).alias("new"),
            _quality_score_hof_reference(F.col("text")).alias("old"),
        )
        .filter(
            ~(
                (F.col("new") == F.col("old"))
                | (F.col("new").isNull() & F.col("old").isNull())
            )
        )
        .count()
    )
    assert bad == 0
