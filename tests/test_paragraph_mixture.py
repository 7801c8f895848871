"""Paragraph-level dedup (dedup.paragraph_dedup) and temperature
mixture resampling (sampling.temperature_resample): DuckDB oracles on
the driver documents table, hand-built semantic cases, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.dedup import paragraph_dedup
from solarpaneldatawrangler_spark.operators.sampling import (
    temperature_rates,
    temperature_resample,
)
from solarpaneldatawrangler_spark.sources.star import load_table
from tests.oracle_harness import compare, run_oracle

# the driver documents are single-line and duplicate-free at sf0.01, so
# the cross-engine probe runs on a DERIVED two-paragraph corpus built
# identically in both engines: doc i = text_i + blank line + text_{i+7},
# which makes every source text occur as a paragraph in two docs
_PARA_ORACLE = r"""
WITH built AS (
    SELECT a.doc_id,
           a.text || chr(10) || chr(10) || COALESCE(b.text, '') AS text
    FROM documents a LEFT JOIN documents b ON b.doc_id = a.doc_id + 7
),
paras0 AS (
    SELECT doc_id,
           generate_subscripts(l, 1) - 1 AS pos,
           unnest(l) AS para
    FROM (SELECT doc_id,
                 string_split_regex(text, '\n\s*\n') AS l
          FROM built)
),
paras AS (
    SELECT doc_id, pos, para,
           md5(regexp_replace(trim(lower(para)), '\s+', ' ', 'g')) AS fp
    FROM paras0
    WHERE regexp_replace(trim(lower(para)), '\s+', ' ', 'g') <> ''
),
ranked AS (
    SELECT doc_id, pos, para, fp,
           ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
    FROM paras
),
rebuilt AS (
    SELECT doc_id,
           COUNT(*) AS n_kept,
           string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text
    FROM ranked WHERE rn = 1
    GROUP BY doc_id
),
totals AS (SELECT doc_id, COUNT(*) AS n_paras FROM paras GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(r.text, '') AS text,
       COALESCE(r.n_kept, 0) AS n_kept,
       COALESCE(t.n_paras, 0) - COALESCE(r.n_kept, 0) AS n_dropped
FROM built d
LEFT JOIN totals t USING (doc_id)
LEFT JOIN rebuilt r USING (doc_id)
"""


def _built_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b = docs.select(
        (F.col("doc_id") - 7).alias("doc_id"), F.col("text").alias("_t2")
    )
    return docs.join(b, "doc_id", "left").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit("\n\n"), F.coalesce("_t2", F.lit(""))
        ).alias("text"),
    )


def test_paragraph_dedup_matches_duckdb(spark, sf_dir):
    got = paragraph_dedup(_built_corpus(spark, sf_dir))
    assert got.filter(F.col("n_dropped") > 0).count() > 0, (
        "built corpus has no duplicate paragraphs — probe is vacuous"
    )
    want = run_oracle(_PARA_ORACLE, sf_dir)
    compare(got, want, "paragraph_dedup")


def test_paragraph_dedup_hand_case(spark):
    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"alpha one\n\n{boiler}\n\nbeta"),
            (2, f"{boiler}\n\ngamma"),
            (3, f"  {boiler.upper()}  "),  # normalizes to the same para
            (4, "\n\n"),  # only whitespace paragraphs
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert rows[1].text == f"alpha one\n\n{boiler}\n\nbeta"
    assert (rows[1].n_kept, rows[1].n_dropped) == (3, 0)
    assert rows[2].text == "gamma"  # boilerplate copy dropped
    assert (rows[2].n_kept, rows[2].n_dropped) == (1, 1)
    assert rows[3].text == ""  # its only para is a dup (case/ws-insensitive)
    assert (rows[3].n_kept, rows[3].n_dropped) == (0, 1)
    assert (rows[4].text, rows[4].n_kept, rows[4].n_dropped) == ("", 0, 0)


def test_paragraph_dedup_keeps_first_occurrence_only(spark):
    docs = spark.createDataFrame(
        [(10, "x\n\ny"), (20, "y\n\nx"), (30, "y")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.text for r in paragraph_dedup(docs).collect()}
    assert rows == {10: "x\n\ny", 20: "", 30: ""}


def test_paragraph_dedup_plan_shape(spark, sf_dir):
    plan = (
        paragraph_dedup(load_table(spark, sf_dir, "documents"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # keeper selection must be an aggregate (map-side combinable), not a
    # window funnelling every hot-fingerprint copy through one partition
    assert "Window" not in plan


def _mixture_oracle(alpha: float, target_frac: float) -> str:
    return f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    norm AS (SELECT SUM(n) AS total, SUM(pow(n, {alpha})) AS z FROM counts),
    rates AS (
        SELECT source,
               ROUND(LEAST(1.0, {target_frac} * total * pow(n, {alpha}) / z / n), 9)
                   AS rate
        FROM counts, norm
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          / 4294967296.0 < r.rate
    """


@pytest.mark.parametrize("alpha,frac", [(0.5, 0.5), (0.3, 0.25), (1.0, 0.8)])
def test_temperature_resample_matches_duckdb(spark, sf_dir, alpha, frac):
    docs = load_table(spark, sf_dir, "documents")
    got = temperature_resample(
        docs, "source", alpha=alpha, target_frac=frac
    ).select("doc_id", "source")
    assert got.count() > 0
    want = run_oracle(_mixture_oracle(alpha, frac), sf_dir)
    compare(got, want, f"temperature_resample_{alpha}_{frac}")


def test_temperature_flattens_toward_uniform(spark):
    # 9000-row majority stratum vs 1000-row minority: at alpha=0.3 the
    # kept-set ratio must be far flatter than the 9:1 input ratio
    df = spark.range(10000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 9000, F.lit("web")).otherwise(F.lit("books"))
            .alias("source"),
    )
    kept = (
        temperature_resample(df, "source", alpha=0.3, target_frac=0.4)
        .groupBy("source").count().collect()
    )
    by = {r["source"]: r["count"] for r in kept}
    assert 0 < by["web"] / by["books"] < 4, by
    # natural proportions at alpha=1: ratio stays ~9:1
    kept1 = (
        temperature_resample(df, "source", alpha=1.0, target_frac=0.4)
        .groupBy("source").count().collect()
    )
    by1 = {r["source"]: r["count"] for r in kept1}
    assert by1["web"] / by1["books"] > 6, by1


def test_temperature_rates_cap_and_determinism(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 990, F.lit("big")).otherwise(F.lit("tiny"))
            .alias("source"),
    )
    rates = {
        r["source"]: r["_rate"]
        for r in temperature_rates(df, "source", 0.2, 0.5).collect()
    }
    assert rates["tiny"] == 1.0  # capped: the tiny stratum keeps everything
    assert 0.0 < rates["big"] < 1.0
    a = sorted(
        r.doc_id
        for r in temperature_resample(df, "source", 0.2, 0.5).collect()
    )
    b = sorted(
        r.doc_id
        for r in temperature_resample(
            df.repartition(7), "source", 0.2, 0.5
        ).collect()
    )
    assert a == b  # membership independent of partitioning


def test_temperature_resample_rejects_bad_params(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    with pytest.raises(ValueError):
        temperature_resample(df, "source", alpha=0.5, target_frac=0.0)
    with pytest.raises(ValueError):
        temperature_resample(df, "source", alpha=0.0)
    with pytest.raises(ValueError):
        temperature_resample(df, "source", target_frac=1.5)


# --- document chunking (packing.chunk_documents) ---------------------------

_CHUNK_ORACLE = r"""
WITH toked AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> len(t) > 0) AS toks
    FROM documents
),
starts AS (
    SELECT doc_id, toks, len(toks) AS n,
           unnest(list_filter(generate_series(0, len(toks) - 1, {stride}),
                              s -> s = 0 OR s + {overlap} < len(toks))) AS start
    FROM toked WHERE len(toks) > 0
),
numbered AS (
    SELECT doc_id, toks, start,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start) - 1 AS chunk_id
    FROM starts
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(toks[start + 1 : start + {maxtok}]) AS INT) AS n_chunk_tokens,
       array_to_string(toks[start + 1 : start + {maxtok}], ' ') AS text
FROM numbered
"""


def test_chunk_documents_matches_duckdb(spark, sf_dir):
    from solarpaneldatawrangler_spark.operators.packing import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    got = chunk_documents(docs, max_tokens=40, overlap=8)
    assert got.filter(F.col("chunk_id") > 0).count() > 0, (
        "no doc produced a second chunk — probe is vacuous"
    )
    want = run_oracle(
        _CHUNK_ORACLE.format(stride=32, overlap=8, maxtok=40), sf_dir
    )
    compare(got, want, "chunk_documents")


def test_chunk_documents_hand_case(spark):
    from solarpaneldatawrangler_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks
            (2, "a b"),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r.doc_id, r.chunk_id, r.n_chunk_tokens, r.text)
        for r in chunk_documents(docs, max_tokens=6, overlap=2).collect()
    )
    # doc 1: stride 4 -> candidate starts 0, 4, 8; start 8 is dropped
    # (8 + overlap 2 = 10, not < 10: its tokens t8,t9 are already fully
    # covered by the start-4 chunk, so it would add nothing new)
    assert rows == [
        (1, 0, 6, "t0 t1 t2 t3 t4 t5"),
        (1, 1, 6, "t4 t5 t6 t7 t8 t9"),
        (2, 0, 2, "a b"),
    ]
    # every token index appears in some chunk (coverage invariant)
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=4)


def test_chunk_documents_no_shuffle(spark, sf_dir):
    from solarpaneldatawrangler_spark.operators.packing import chunk_documents

    plan = (
        chunk_documents(load_table(spark, sf_dir, "documents"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # map-only: chunking never shuffles


def test_temperature_rate_table_pure_python():
    from solarpaneldatawrangler_spark.operators.sampling import (
        temperature_rate_table,
    )

    rows = temperature_rate_table([("big", 990), ("tiny", 10)], 0.2, 0.5)
    by = {s: (n, r) for s, n, r in rows}
    assert by["tiny"] == (10, 1.0)  # capped
    assert 0.0 < by["big"][1] < 1.0
    # deterministic under input order; None strata sort last, don't crash
    assert rows == temperature_rate_table([("tiny", 10), ("big", 990)], 0.2, 0.5)
    rows2 = temperature_rate_table([(None, 5), ("a", 5)], 1.0, 0.5)
    assert [s for s, _, _ in rows2] == ["a", None]
