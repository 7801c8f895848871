"""The C4 cleaning battery (Raffel et al. 2020 §2.2): line-level
keep/drop hand cases, document gates, and the null/empty contract.
The full-corpus DuckDB replay is q71 in the catalog sweep
(tests/test_oracle_queries.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.text import (
    c4_clean,
    c4_doc_flags,
    c4_kept_lines,
)


def _flags(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            c4_doc_flags(F.col("text")).alias("g"),
            c4_clean(F.col("text")).alias("clean"),
        ).select("doc_id", "g.*", "clean").collect()
    }


def test_line_rules(spark):
    text = "\n".join(
        [
            "this sentence has enough words and ends properly.",  # kept
            "short one.",  # dropped: < 5 words
            "this line has plenty of words but no terminal punctuation",  # dropped
            "a line that talks about JavaScript frameworks in detail.",  # dropped
            'he said "plenty of words quoted правда"',  # kept: closing quote IS terminal
            "does this question have enough words to pass?",  # kept
        ]
    )
    got = _flags(spark, [(1, text)])[1]
    assert got["n_kept_lines"] == 3
    assert got["clean"].splitlines() == [
        "this sentence has enough words and ends properly.",
        'he said "plenty of words quoted правда"',
        "does this question have enough words to pass?",
    ]
    # sentence count over the CLEANED text: one '.' + one '?'
    assert got["n_sentences"] == 2
    assert not got["c4_ok"]  # needs >= 3 sentences


def test_doc_gates(spark):
    base = "\n".join(
        [
            "first full sentence with plenty of words here.",
            "second full sentence with plenty of words too!",
            "third full sentence with enough words as well?",
        ]
    )
    got = _flags(
        spark,
        [
            (1, base),
            (2, base + "\nfunction f() { return 1; }"),
            (3, base + "\nLorem Ipsum dolor sit amet."),
            (4, None),
            (5, ""),
        ],
    )
    assert got[1]["c4_ok"] and got[1]["n_sentences"] == 3
    assert got[2]["has_brace"] and not got[2]["c4_ok"]
    assert got[3]["has_lorem"] and not got[3]["c4_ok"]
    for d in (4, 5):
        assert not got[d]["c4_ok"]
        assert got[d]["n_kept_lines"] == 0
        assert got[d]["clean"] == ""


def test_terminal_quote_counts(spark):
    # the paper's terminal set includes closing quotes
    text = 'she finished with plenty of words saying "done here now."'
    got = _flags(spark, [(1, text + "\n" + text + "\n" + text)])[1]
    assert got["n_kept_lines"] == 3


def test_multiple_punct_is_one_sentence_run(spark):
    text = "wait for it with plenty of words here!!!"
    got = _flags(spark, [(1, "\n".join([text] * 3))])[1]
    # '!!!' per line is a single [.!?]+ run
    assert got["n_sentences"] == 3
    assert got["c4_ok"]


def test_curate_corpus_c4_stage(spark):
    """curate_corpus(c4_clean_lines=True): docs are rewritten to their
    C4-kept lines before dedup, and the page gates drop brace /
    lorem-ipsum / too-few-sentence docs."""
    from solarpaneldatawrangler_spark.pipeline_text import curate_corpus

    def body(i):
        return "\n".join(
            f"document {i} sentence number {j} with plenty of words w{i}x{j}."
            for j in range(4)
        )

    rows = [(i, body(i) + "\nnoise line without punct", "en") for i in range(4)]
    rows += [
        (10, body(10) + "\ncode { block }", "en"),      # brace -> dropped
        (11, "only two sentences here with words.\nsecond one right here.", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out, _ = curate_corpus(
        docs, min_quality=0.0, c4_clean_lines=True, with_report=False
    )
    got = {r.doc_id: r.text for r in out.collect()}
    assert set(got) == set(range(4))
    for i, t in got.items():
        assert "noise line" not in t and t.count("\n") == 3


def test_c4_stage_reports_count(spark):
    from solarpaneldatawrangler_spark.pipeline_text import curate_corpus

    rows = [
        (i, "\n".join(
            f"doc {i} sentence {j} with plenty of words w{i}x{j}."
            for j in range(4)
        ), "en")
        for i in range(3)
    ] + [(10, "too { short", "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    _, report = curate_corpus(
        docs, min_quality=0.0, c4_clean_lines=True, with_report=True
    )
    assert report.n_after_c4 == 3
