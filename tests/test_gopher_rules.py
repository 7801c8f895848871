"""The Gopher quality-filter rule battery (Rae et al. 2021 Appendix A):
hand cases pinning each rule's trigger, a DuckDB replay of the whole
eight-flag struct (hash and ellipsis symbol classes gated separately, per the paper) over the real corpus, and the curate_corpus gate."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.text import (
    gopher_flags,
    gopher_flags_sql,
    gopher_pass,
)

_RULES = [
    "words_ok", "mwl_ok", "hash_ok", "ellipsis_sym_ok", "bullet_ok",
    "ellipsis_ok", "alpha_ok", "stopword_ok",
]


def test_gopher_flags_match_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        docs.select("doc_id", gopher_flags(F.col("text")).alias("g"))
        .select("doc_id", *[F.col(f"g.{r}").alias(r) for r in _RULES])
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            f"SELECT doc_id, {gopher_flags_sql()} FROM "
            f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        )
        .fetchdf()
    )
    for r in _RULES:
        assert got[r].tolist() == want[r].tolist(), f"rule {r} diverges"


def test_gopher_rules_hand_cases(spark):
    """One document per rule, failing exactly that rule (all others
    satisfied), plus a clean passing document."""
    base = (
        "the quick brown fox jumps to think about life and liberty that "
        "we have found with plenty of honest ordinary simple words here "
        "making sense every single day through winter spring summer fall "
        "while people gather reading stories told softly under warm "
        "evening light beside rivers flowing gently toward distant seas"
    )  # 50 words, all rules pass
    rows = [
        (0, base),
        (1, "the be to of and that have with short text"),  # < 50 words
        (2, " ".join(["the", "of", "and"] + ["a" * 40] * 50)),  # mwl > 10
        (3, base + " " + "#" * 40),  # symbol ratio (hash) — but adds a token
        (4, "\n".join("- " + w for w in base.split())),  # all lines bullets
        (5, "\n".join(w + "..." for w in base.split())),  # all lines ellipsis
        (6, base + " " + " ".join(str(i) for i in range(60))),  # numeric flood
        (7, base.replace("the", "xx").replace("to", "yy")
            .replace("and", "zz").replace("that", "qq")
            .replace("have", "rr").replace("with", "ss")
            .replace("of", "tt")),  # no Gopher stop words
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: {k: r.g[k] for k in _RULES}
        for r in df.select(
            "doc_id", gopher_flags(F.col("text")).alias("g")
        ).collect()
    }
    assert all(got[0].values()), got[0]
    assert not got[1]["words_ok"]
    assert not got[2]["mwl_ok"]
    assert not got[3]["hash_ok"]
    assert got[3]["ellipsis_sym_ok"]  # per-class: hash flood alone trips only hash_ok
    assert not got[4]["bullet_ok"]
    assert not got[5]["ellipsis_ok"]
    assert not got[6]["alpha_ok"]
    assert not got[7]["stopword_ok"]
    # the pass gate is the conjunction
    passes = {
        r.doc_id: r.p
        for r in df.select(
            "doc_id", gopher_pass(F.col("text")).alias("p")
        ).collect()
    }
    assert passes[0] is True
    assert all(passes[i] is False for i in (1, 3, 4, 5, 6, 7))


def test_gopher_empty_doc_fails_not_crashes(spark):
    df = spark.createDataFrame([(1, ""), (2, None)], "doc_id int, text string")
    rows = {r.doc_id: r.p for r in df.select(
        "doc_id", gopher_pass(F.col("text")).alias("p")).collect()}
    assert rows[1] is False
    assert rows[2] is None  # null text propagates null, filter drops it


def test_curate_corpus_gopher_gate(spark, sf_dir):
    from solarpaneldatawrangler_spark.pipeline_text import curate_corpus
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    junk = spark.createDataFrame(
        [(9_000_100, "### ### ###", "en", "src1")],
        "doc_id long, text string, lang string, source string",
    )
    out, rep = curate_corpus(
        docs.unionByName(junk),
        min_quality=0.0,
        jaccard_threshold=0.99,
        gopher_gate=True,
        gopher_min_words=5,  # the synthetic docs are short-ish
    )
    ids = {r.doc_id for r in out.collect()}
    assert 9_000_100 not in ids
    assert rep.n_after_gopher >= 0
    assert rep.n_after_gopher >= rep.n_after_quality >= rep.n_output
    # default-off reports -1
    _, rep_off = curate_corpus(
        docs, min_quality=0.0, jaccard_threshold=0.99
    )
    assert rep_off.n_after_gopher == -1


def test_gopher_sql_builder_empty_and_null_text_parity(spark):
    """The shared SQL builder must agree with Spark on the edge rows
    the corpus replay can't reach: empty/whitespace-only text gives
    every flag a non-NULL False-ish verdict (mwl_ok was NULL in DuckDB
    before r8's CASE guard), while NULL text stays NULL in both."""
    rows = [(1, ""), (2, "   \n  "), (3, None)]
    got = {
        r.doc_id: {k: r.g[k] for k in _RULES}
        for r in spark.createDataFrame(rows, "doc_id int, text string")
        .select("doc_id", gopher_flags(F.col("text")).alias("g"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, ''), (2, '   ' || chr(10) || '  '), (3, NULL)"
        ") AS t(doc_id, text)"
    )
    want = {
        int(r[0]): dict(zip(_RULES, r[1:]))
        for r in con.execute(
            f"SELECT doc_id, {gopher_flags_sql()} FROM documents"
        ).fetchall()
    }
    for d in (1, 2, 3):
        for rule in _RULES:
            g, w = got[d][rule], want[d][rule]
            assert (g is None) == (w is None), (d, rule, g, w)
            if g is not None:
                assert bool(g) == bool(w), (d, rule, g, w)
    assert got[1]["mwl_ok"] is False and want[1]["mwl_ok"] is not None


def test_gopher_flags_sql_text_expr_over_derived_text(spark):
    """The shared SQL builder parameterizes its text expression (r9,
    like the sibling c4_*_sql builders): replaying the rules over a
    DERIVED text must match Spark's gopher_flags over the same
    derivation."""
    import duckdb
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.functions.text import (
        gopher_flags,
        gopher_flags_sql,
    )

    rows = [
        (1, "the and with this that from " + " ".join(f"w{i}" for i in range(60))),
        (2, "short"),
        (3, "### markdown " + "# " * 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, raw string")
    derived = F.concat(F.col("raw"), F.lit(" suffix and that"))
    got = {
        r["doc_id"]: tuple(r[c] for c in r.asDict() if c != "doc_id")
        for r in df.select(
            "doc_id", gopher_flags(derived, min_words=5).alias("f")
        ).select("doc_id", "f.*").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") v(doc_id, raw)"
    )
    sql = gopher_flags_sql(
        min_words=5, text_expr="(raw || ' suffix and that')"
    )
    want = {
        int(r[0]): tuple(bool(x) for x in r[1:])
        for r in con.execute(f"SELECT doc_id, {sql} FROM t").fetchall()
    }
    assert got == want
