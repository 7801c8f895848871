"""The Gopher REPETITION battery (Rae et al. 2021 Table A1), both
halves: the expression-only signals (duplicate line/paragraph count +
character fractions, top-2/3/4-gram character fractions) and the
pandas-UDF dup-5..10-gram character-coverage fractions — hand cases
pinning each signal's arithmetic, and DuckDB replays over the real
corpus."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.text import (
    GOPHER_REP_THRESHOLDS,
    duplicate_line_char_fraction,
    duplicate_line_fraction,
    duplicate_paragraph_char_fraction,
    duplicate_paragraph_fraction,
    gopher_repetition_flags,
    top_ngram_char_fraction,
)
from solarpaneldatawrangler_spark.operators.curation import (
    gopher_dup_ngram_char_fracs,
    gopher_dup_ngram_sql,
)


def test_line_and_paragraph_fraction_hand_cases(spark):
    rows = [
        # 4 lines, 3 distinct ("a b" repeats) -> dup_line 1/4
        (1, "a b\nc d e f\na b\nx y"),
        # paragraphs: [P, Q, P] -> dup_para 1/3
        (2, "para one here\n\nsecond block\n\npara one here"),
        (3, "no repeats at all"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            duplicate_line_fraction(F.col("text")).alias("lf"),
            duplicate_line_char_fraction(F.col("text")).alias("lcf"),
            duplicate_paragraph_fraction(F.col("text")).alias("pf"),
            duplicate_paragraph_char_fraction(F.col("text")).alias("pcf"),
        ).collect()
    }
    assert got[1]["lf"] == 0.25
    # lines: "a b"(3) x2, "c d e f"(7), "x y"(3): dup chars 3 of 16
    assert got[1]["lcf"] == pytest.approx(1 - 13 / 16, abs=1e-6)
    assert got[2]["pf"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    # paras 13+12+13 chars, distinct 13+12
    assert got[2]["pcf"] == pytest.approx(1 - 25 / 38, abs=1e-6)
    assert (got[3]["lf"], got[3]["pf"]) == (0.0, 0.0)
    assert (got[4]["lf"], got[4]["lcf"], got[4]["pf"], got[4]["pcf"]) == (
        0.0, 0.0, 0.0, 0.0,
    )


def test_top_ngram_char_fraction_hand_cases(spark):
    rows = [
        # "w w w w w": top 2-gram "w w" occurs 4x, len 3; canonical
        # text len = 9 -> 12/9 (can exceed 1 for degenerate text)
        (1, "w w w w w"),
        # all-distinct bigrams: top count 1 -> len(top gram)/len(text)
        (2, "alpha beta gamma"),
        (3, "tiny"),  # shorter than n -> 0
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: r.f
        for r in df.select(
            "doc_id", top_ngram_char_fraction(F.col("text"), 2).alias("f")
        ).collect()
    }
    assert got[1] == pytest.approx(12 / 9, abs=1e-6)
    # "alpha beta"(10) vs "beta gamma"(10), count 1 each -> 10/16
    assert got[2] == pytest.approx(10 / 16, abs=1e-6)
    assert got[3] == 0.0
    assert got[4] == 0.0


def test_dup_ngram_char_fracs_hand_cases(spark):
    base = " ".join(f"u{i}" for i in range(20))
    rows = [
        # doc 1: a 5-token block repeated -> its tokens covered at n=5,
        # nothing duplicated at longer n (the 6-gram spans the unique
        # separator)
        (1, "a1 a2 a3 a4 a5 sep1 a1 a2 a3 a4 a5 sep2 " + base),
        (2, base),  # no repeats
        (3, "short text"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: r.d
        for r in df.select(
            "doc_id", gopher_dup_ngram_char_fracs(F.col("text")).alias("d")
        ).collect()
    }
    # doc 1 tokens: 2x(a1..a5)=10 tokens of 2 chars, sep1/sep2 (4
    # chars each), base: u0..u19 (2,2,2,2,2,2,2,2,2,2,3x10) = 20+8+64
    d1 = got[1]
    covered = 20  # both copies of the 5-gram, 10 tokens x 2 chars
    total = 20 + 8 + (2 * 10 + 3 * 10)
    assert d1["d5"] == pytest.approx(covered / total, abs=1e-6)
    assert d1["d6"] == 0.0 and d1["d10"] == 0.0
    assert all(v == 0.0 for v in got[2].asDict().values())
    assert all(v == 0.0 for v in got[3].asDict().values())
    assert all(v == 0.0 for v in got[4].asDict().values())


def test_repetition_flags_thresholds(spark):
    """The struct applies the paper's thresholds per signal."""
    clean = " ".join(f"w{i}" for i in range(60))
    spam = "buy now " * 40
    df = spark.createDataFrame(
        [(1, clean), (2, spam)], "doc_id int, text string"
    )
    got = {
        r.doc_id: r.g.asDict()
        for r in df.select(
            "doc_id", gopher_repetition_flags(F.col("text")).alias("g")
        ).collect()
    }
    assert all(got[1].values()), got[1]
    assert not got[2]["top2_ok"], got[2]  # "buy now" dominates
    assert set(got[1]) == {
        "dup_line_ok", "dup_para_ok", "dup_line_char_ok",
        "dup_para_char_ok", "top2_ok", "top3_ok", "top4_ok",
    }
    assert GOPHER_REP_THRESHOLDS["top_2gram_char"] == 0.20


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


def test_dup_ngram_fracs_match_duckdb(spark, sf_dir):
    """Full-corpus replay of the UDF half on a DERIVED repetitious
    corpus (text + its first half, so coverage is non-trivial)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rtext = F.concat_ws(
        " ",
        F.col("text"),
        F.col("text").substr(
            F.lit(1), F.floor(F.length("text") / 2).cast("int")
        ),
    )
    got = (
        docs.select(
            "doc_id", gopher_dup_ngram_char_fracs(rtext).alias("d")
        )
        .select("doc_id", "d.*")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sql = gopher_dup_ngram_sql(
        "text || ' ' || substr(text, 1, CAST(FLOOR(length(text) / 2) AS INT))"
    ).replace("FROM documents", "FROM documents", 1)
    want = (
        _duck(sf_dir)
        .execute(f"SELECT * FROM ({sql}) ORDER BY doc_id")
        .fetchdf()
    )
    assert len(got) == len(want) > 0
    for c in ["d5", "d6", "d7", "d8", "d9", "d10"]:
        assert got[c].tolist() == pytest.approx(want[c].tolist(), abs=2e-6), c
    # the derived corpus must actually exercise coverage
    assert got["d5"].max() > 0.3


def test_expression_signals_match_duckdb(spark, sf_dir):
    """DuckDB replay of the expression half over a derived multi-line
    corpus (driver documents are single-line)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lt = F.concat(
        F.col("text"), F.lit("\n"), F.col("text"), F.lit("\n\n"),
        F.col("text").substr(F.lit(1), F.lit(25)),
    )
    got = (
        docs.select(
            "doc_id",
            duplicate_line_fraction(lt).alias("lf"),
            duplicate_line_char_fraction(lt).alias("lcf"),
            duplicate_paragraph_fraction(lt).alias("pf"),
            duplicate_paragraph_char_fraction(lt).alias("pcf"),
            top_ngram_char_fraction(lt, 3).alias("t3"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    lt_sql = "text || chr(10) || text || chr(10) || chr(10) || substr(text, 1, 25)"
    lines = (
        f"list_filter(list_transform(string_split_regex({lt_sql}, '\\n'), "
        "l -> regexp_replace(l, '^\\s+|\\s+$', '', 'g')), l -> len(l) > 0)"
    )
    paras = (
        f"list_filter(list_transform(string_split_regex({lt_sql}, "
        "'\\n[ \\t\\n\\f\\r\\x0B]*\\n'), "
        "l -> regexp_replace(l, '^\\s+|\\s+$', '', 'g')), l -> len(l) > 0)"
    )
    toks = (
        f"list_filter(string_split_regex(lower({lt_sql}), '\\s+'),"
        " t -> len(t) > 0)"
    )
    def dupf(arr):
        return (f"ROUND(CASE WHEN len({arr}) >= 1 THEN 1.0 - "
                f"CAST(len(list_distinct({arr})) AS DOUBLE) / len({arr}) "
                "ELSE 0.0 END, 6)")
    def dupcf(arr):
        return (
            "ROUND(CASE WHEN COALESCE(list_sum(list_transform("
            f"{arr}, x -> len(x))), 0) >= 1 THEN 1.0 - "
            f"CAST(list_sum(list_transform(list_distinct({arr}), x -> len(x)))"
            f" AS DOUBLE) / list_sum(list_transform({arr}, x -> len(x))) "
            "ELSE 0.0 END, 6)"
        )
    top3 = f"""
      ROUND(COALESCE((
        SELECT MAX(cnt * len(g)) FROM (
            SELECT array_to_string(list_slice(t.toks, CAST(u.i AS INT),
                       CAST(u.i AS INT) + 2), ' ') AS g, COUNT(*) AS cnt
            FROM (SELECT {toks} AS toks) t,
                 LATERAL UNNEST(range(1, len(t.toks) - 1)) AS u(i)
            GROUP BY g
        )) , 0) / GREATEST(
            list_sum(list_transform({toks}, x -> len(x)))
              + GREATEST(len({toks}) - 1, 0), 1), 6)
    """
    want = (
        _duck(sf_dir)
        .execute(
            f"SELECT doc_id, {dupf(lines)} AS lf, {dupcf(lines)} AS lcf, "
            f"{dupf(paras)} AS pf, {dupcf(paras)} AS pcf, {top3} AS t3 "
            "FROM documents ORDER BY doc_id"
        )
        .fetchdf()
    )
    assert len(got) == len(want) > 0
    for c in ["lf", "lcf", "pf", "pcf", "t3"]:
        assert got[c].tolist() == pytest.approx(want[c].tolist(), abs=2e-6), c
    assert got["lf"].min() > 0.0  # the derivation plants dup lines


def test_curate_corpus_repetition_gate(spark):
    """curate_corpus(gopher_repetition_gate=True) drops the planted
    repetitious docs, keeps clean ones, reports the stage count, and
    evaluates the Arrow UDF struct once (a single ArrowEvalPython in
    the plan)."""
    from solarpaneldatawrangler_spark.pipeline_text import curate_corpus

    rows = [
        # mutually distinct clean docs (shared words would trip the
        # near-dup stage, not the repetition gate under test)
        (
            i,
            " ".join(f"word{i}x{j}" for j in range(40)),
            "en",
        )
        for i in range(6)
    ] + [
        # heavy 6-gram repetition: trips the dup-ngram coverage rules
        (100, ("repeat this exact six gram block " * 12) + "x", "en"),
        # line repetition
        (101, "\n".join(["the same line of text here"] * 10), "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out, report = curate_corpus(
        docs,
        min_quality=0.0,
        gopher_repetition_gate=True,
        with_report=True,
    )
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert kept == set(range(6))
    assert report.n_after_rep_battery == 6

    # plan: the six d-field thresholds must share ONE Arrow UDF eval
    out2, _ = curate_corpus(
        docs, min_quality=0.0, gopher_repetition_gate=True, with_report=False
    )
    plan = out2._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
