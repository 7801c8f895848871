"""r17-opt equivalence pins for the q52/q53/q57 hot-path rewrites
(guide §4.1/§4.2, measured in bench_out/r17_q52_decomp_testdata_sf1.json):

1. gopher_rep_battery_fracs (ONE fused Arrow pass) vs the two forms it
   replaces in q52 — the Catalyst top_ngram_char_fraction expression
   (n=2,3) and the gopher_dup_ngram_char_fracs UDF (n=5..10);
2. char_ngram_set_jaccard_r6 (JVM-lowered text + Python set ops) vs
   q57's old array form (array_distinct(char_ngrams) +
   array_intersect/array_union + integer 6dp rounding);
3. dsir_workload's closed-form dsir_n (2m-1 over the token count) vs
   size(dsir_features) — the md5-per-feature build it replaces;
4. q53's shared-projection gopher rules + marker scores vs the
   gopher_flags struct / lang_marker_score originals.

Each pin runs on adversarial texts AND the sf0.01 corpus rows the
driver's oracle gate hashes, so the rewrites can never silently change
a value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.rounding import (
    round_ratio_half_away,
)
from solarpaneldatawrangler_spark.functions.text import (
    char_ngrams,
    gopher_flags,
    lang_marker_score,
    top_ngram_char_fraction,
)
from solarpaneldatawrangler_spark.operators.curation import (
    gopher_dup_ngram_char_fracs,
    gopher_rep_battery_fracs,
)
from solarpaneldatawrangler_spark.operators.dedup import (
    char_ngram_set_jaccard_r6,
)

ADVERSARIAL = [
    None,
    "",
    " ",
    "\t\n  \r ",
    "x",
    "ab",
    "abc",
    "one two",
    "the the the the the",
    "a b a b a b a b",  # repeated 2-grams
    "x y z x y z x y z",  # repeated 3-grams
    "one two three four five one two three four five",  # dup 5-gram
    " ".join(["w%d" % (i % 7) for i in range(40)]),  # dup 5..10-grams
    "line\nline\nline\nother",
    "para one\n\npara one\n\npara two",
    "unicode … ellipsis — dash é accents",
    "mixed  \t whitespace\truns the\nend",
    "a" * 50,
    ("lorem ipsum dolor sit amet " * 20).strip(),
    "CASE folding MiXeD Case TEXT case",
    "nbsp is not java whitespace",
    "ccc",  # len == n boundary for 3-grams
    "cc",  # len < n
]

PAIRS = [(a, b) for a in ADVERSARIAL for b in ADVERSARIAL[::3]]


def _old_array_jaccard(ta, tb):
    """q57's pre-r17 adjacent-arm kernel, verbatim."""
    ga = F.array_distinct(char_ngrams(ta, 3))
    gb = F.array_distinct(char_ngrams(tb, 3))
    return round_ratio_half_away(
        F.size(F.array_intersect(ga, gb)).cast("long"),
        F.greatest(F.size(F.array_union(ga, gb)), F.lit(1)).cast("long"),
        6,
    )


def test_fused_battery_matches_components_adversarial(spark):
    df = spark.createDataFrame([(t,) for t in ADVERSARIAL], "text string")
    got = df.select(
        gopher_rep_battery_fracs(F.col("text")).alias("f"),
        top_ngram_char_fraction(F.col("text"), 2).alias("top2"),
        top_ngram_char_fraction(F.col("text"), 3).alias("top3"),
        gopher_dup_ngram_char_fracs(F.col("text")).alias("d"),
    ).collect()
    for i, r in enumerate(got):
        # the fused UDF normalizes NULL text to '' (the UDF-half
        # convention); the Catalyst top-gram form yields NULL there —
        # q52's rtext is concat_ws-derived and never null, so the pin
        # applies to non-null inputs
        if ADVERSARIAL[i] is None:
            assert r.f.top2 == 0.0 and r.f.top3 == 0.0
            continue
        assert r.f.top2 == r.top2, f"row {i}: top2 {r.f.top2} != {r.top2}"
        assert r.f.top3 == r.top3, f"row {i}: top3 {r.f.top3} != {r.top3}"
        for n in (5, 6, 7, 8, 9, 10):
            a, b = getattr(r.f, f"d{n}"), getattr(r.d, f"d{n}")
            assert a == b, f"row {i}: d{n} {a} != {b}"


def test_fused_battery_matches_components_on_q52_rtext(spark):
    """Corpus equivalence over the EXACT derived rtext q52 feeds it."""
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    rtext = F.concat_ws(
        " ",
        F.col("text"),
        F.col("text").substr(
            F.lit(1), F.floor(F.length("text") / 2).cast("int")
        ),
    )
    checks = [
        (F.col("f.top2") == F.col("top2")),
        (F.col("f.top3") == F.col("top3")),
    ] + [
        (F.col(f"f.d{n}") == F.col(f"d.d{n}")) for n in (5, 6, 7, 8, 9, 10)
    ]
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    bad = (
        docs.select(
            gopher_rep_battery_fracs(rtext).alias("f"),
            top_ngram_char_fraction(rtext, 2).alias("top2"),
            top_ngram_char_fraction(rtext, 3).alias("top3"),
            gopher_dup_ngram_char_fracs(rtext).alias("d"),
        )
        .filter(~cond)
        .count()
    )
    assert bad == 0


def test_char3_jaccard_matches_array_form_adversarial(spark):
    df = spark.createDataFrame(PAIRS, "ta string, tb string")
    got = df.select(
        char_ngram_set_jaccard_r6(
            F.lower(F.col("ta")), F.lower(F.col("tb")), 3
        ).alias("new"),
        _old_array_jaccard(F.col("ta"), F.col("tb")).alias("old"),
    ).collect()
    for i, r in enumerate(got):
        assert r.new == r.old, (
            f"pair {i} ({PAIRS[i][0]!r:.30} / {PAIRS[i][1]!r:.30}): "
            f"{r.new} != {r.old}"
        )


def test_char3_jaccard_matches_array_form_on_adjacent_corpus(spark):
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    sh = docs.select(
        "doc_id",
        F.col("text").alias("t"),
        F.lower(F.col("text")).alias("lt"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    bad = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            char_ngram_set_jaccard_r6(
                F.col("a.lt"), F.col("b.lt"), 3
            ).alias("new"),
            _old_array_jaccard(F.col("a.t"), F.col("b.t")).alias("old"),
        )
        .filter(~(F.col("new") == F.col("old")))
        .count()
    )
    assert bad == 0


def test_dsir_n_closed_form_matches_feature_count(spark):
    from solarpaneldatawrangler_spark.functions.text import tokens
    from solarpaneldatawrangler_spark.operators.dsir import dsir_features

    df = spark.createDataFrame([(t,) for t in ADVERSARIAL], "text string")
    got = (
        df.select(
            "text",
            F.size(tokens(F.col("text"))).cast("long").alias("_m"),
            F.size(dsir_features(F.col("text"), 512))
            .cast("long")
            .alias("old"),
        )
        .select(
            "text",
            "old",
            F.when(F.col("_m") >= 1, 2 * F.col("_m") - 1)
            .otherwise(F.col("_m"))
            .alias("new"),
        )
        .collect()
    )
    for r in got:
        assert r.new == r.old, f"{r.text!r:.40}: {r.new} != {r.old}"


def test_hashed_linear_r6_pandas_matches_expr(spark):
    from solarpaneldatawrangler_spark.operators.curation import (
        hashed_linear_score_r6,
    )

    df = spark.createDataFrame([(t,) for t in ADVERSARIAL], "text string")
    got = df.select(
        hashed_linear_score_r6(F.col("text")).alias("old"),
        hashed_linear_score_r6(F.col("text"), impl="pandas").alias("new"),
    ).collect()
    for i, r in enumerate(got):
        assert r.new == r.old, f"row {i} ({ADVERSARIAL[i]!r:.40}): {r.new} != {r.old}"

    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    bad = (
        docs.select(
            hashed_linear_score_r6(F.col("text")).alias("old"),
            hashed_linear_score_r6(F.col("text"), impl="pandas").alias("new"),
        )
        .filter(~(F.col("new") == F.col("old")))
        .count()
    )
    assert bad == 0


def test_q53_shared_rules_match_struct_form(spark):
    """The q53 restructure's per-rule columns and marker scores equal
    the gopher_flags struct / lang_marker_score originals."""
    from solarpaneldatawrangler_spark.functions.text import (
        GOPHER_BULLETS,
        GOPHER_STOPWORDS,
        LANG_MARKERS,
        nonempty_lines,
        tokens,
    )

    texts = ADVERSARIAL + [
        "• bullet one\n- bullet two\nplain line",
        "ends with ellipsis...\nand … here\nplain",
        "the be to of and that have with " * 8,  # all gopher stopwords
        ("word " * 60).strip(),  # words_ok boundary region
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    t = F.col("text")
    bound = df.select(
        "text",
        tokens(t).alias("_toks"),
        nonempty_lines(t).alias("_lines"),
    )
    toks_c, lines_c = F.col("_toks"), F.col("_lines")
    ntok = F.size(toks_c)
    nz = F.greatest(ntok, F.lit(1)).cast("double")
    nl = F.greatest(F.size(lines_c), F.lit(1)).cast("double")
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = F.size(
        F.regexp_extract_all(t, F.lit(r"\.\.\.|…"), F.lit(0))
    )
    is_bullet = lambda l: (  # noqa: E731
        F.startswith(l, F.lit(GOPHER_BULLETS[0]))
        | F.startswith(l, F.lit(GOPHER_BULLETS[1]))
        | F.startswith(l, F.lit(GOPHER_BULLETS[2]))
        | F.startswith(l, F.lit(GOPHER_BULLETS[3]))
    )
    mwl = (
        F.aggregate(
            toks_c, F.lit(0.0), lambda acc, tk: acc + F.length(tk).cast("double")
        )
        / nz
    )
    new = bound.select(
        "text",
        ((ntok >= 50) & (ntok <= 100_000)).alias("n_words_ok"),
        ((mwl >= 3.0) & (mwl <= 10.0)).alias("n_mwl_ok"),
        ((n_hash.cast("double") / nz) <= 0.1).alias("n_hash_ok"),
        ((n_ellipsis.cast("double") / nz) <= 0.1).alias("n_ellipsis_sym_ok"),
        (
            (F.size(F.filter(lines_c, is_bullet)).cast("double") / nl) <= 0.9
        ).alias("n_bullet_ok"),
        (
            (
                F.size(
                    F.filter(
                        lines_c,
                        lambda l: F.endswith(l, F.lit("..."))
                        | F.endswith(l, F.lit("…")),
                    )
                ).cast("double")
                / nl
            )
            <= 0.3
        ).alias("n_ellipsis_ok"),
        (
            (
                F.size(F.filter(toks_c, lambda tk: tk.rlike("[a-z]"))).cast(
                    "double"
                )
                / nz
            )
            >= 0.8
        ).alias("n_alpha_ok"),
        (
            F.size(
                F.array_intersect(
                    F.array_distinct(toks_c),
                    F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
                )
            )
            >= 2
        ).alias("n_stopword_ok"),
        *[
            F.size(
                F.filter(
                    toks_c,
                    (
                        lambda m: (
                            lambda tk: F.array_contains(m, tk)
                        )
                    )(F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])),
                )
            ).alias(f"n_s_{lang}")
            for lang in ("en", "es", "fr", "de")
        ],
    )
    old = df.select(
        "text",
        gopher_flags(t).alias("_g"),
        *[
            lang_marker_score(t, lang).alias(f"o_s_{lang}")
            for lang in ("en", "es", "fr", "de")
        ],
    )
    rows_new = {r.text: r for r in new.collect()}
    rows_old = {r.text: r for r in old.collect()}
    rules = [
        "words_ok", "mwl_ok", "hash_ok", "ellipsis_sym_ok",
        "bullet_ok", "ellipsis_ok", "alpha_ok", "stopword_ok",
    ]
    for text in rows_new:
        rn, ro = rows_new[text], rows_old[text]
        for rule in rules:
            assert getattr(rn, f"n_{rule}") == getattr(ro._g, rule), (
                f"{text!r:.40} {rule}: "
                f"{getattr(rn, f'n_{rule}')} != {getattr(ro._g, rule)}"
            )
        for lang in ("en", "es", "fr", "de"):
            assert getattr(rn, f"n_s_{lang}") == getattr(ro, f"o_s_{lang}")
