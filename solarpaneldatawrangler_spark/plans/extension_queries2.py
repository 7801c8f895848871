"""Third query batch: as-of join, embedding-cosine near-dup, BPE-ish
token counting — the remaining training-data-pipeline operators
(SURVEY §2.12 + common OLAP patterns)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.relational import asof_join_last
from solarpaneldatawrangler_spark.plans.catalog import register
from solarpaneldatawrangler_spark.sources.star import load_table


# --- as-of join (backward, inclusive) ---------------------------------------

@register(
    "q65_asof_join",
    oracle="""
    SELECT p.event_id,
           (SELECT MAX(e.ts) FROM events e
            WHERE e.user_id = p.user_id AND e.event_type = 'error'
              AND e.ts <= p.ts) AS last_error_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="Backward as-of join: each purchase gets the latest prior error "
    "timestamp for the same user. Implemented as the union-tag single-"
    "window plan (operators.relational.asof_join_last) — one shuffle on "
    "user_id, no range join; oracle is the correlated-subquery "
    "definition of as-of semantics.",
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    joined = asof_join_last(
        purchases, errors.withColumn("err_ts", F.col("ts")),
        ts_col="ts", by=["user_id"], value_cols=["err_ts"],
    )
    return joined.select("event_id", F.col("err_ts_asof").alias("last_error_ts"))


# --- embedding-cosine near-dup dedup (LSH-bucketed, the scale path) ---------

def _neardup_oracle_sql() -> str:
    """DuckDB replay of the LSH-bucketed near-dup: identical hyperplane
    constants (VALUES), identical sign-bit signatures, identical
    candidate equi-join and rounded-cosine threshold — the oracle checks
    the SCALE PATH itself, not an all-pairs stand-in."""
    from solarpaneldatawrangler_spark.plans.extension_queries import planes_values_sql

    values = planes_values_sql(n_tables=6, n_planes=8, dim=64)
    return f"""
    WITH planes(t, i, j, w) AS (VALUES {values}),
    comps AS (
        SELECT e.vec_id, p.t, p.i, SUM(CAST(e.embedding[p.j] AS DOUBLE) * p.w) AS dot
        FROM embeddings e
        JOIN planes p ON p.j <= len(e.embedding)
        GROUP BY e.vec_id, p.t, p.i
    ),
    sigs AS (
        SELECT vec_id, t,
               CAST(SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS sig
        FROM comps GROUP BY vec_id, t
    ),
    cands AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM sigs a JOIN sigs b
          ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
    ),
    scored AS (
        SELECT c.id_a, c.id_b,
               ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                            CAST(eb.embedding AS DOUBLE[])), 4) AS cos_r
        FROM cands c
        JOIN embeddings ea ON ea.vec_id = c.id_a
        JOIN embeddings eb ON eb.vec_id = c.id_b
    )
    SELECT id_a, id_b, cos_r FROM scored WHERE cos_r >= 0.4
    """


@register(
    "q63_embedding_neardup",
    oracle=_neardup_oracle_sql(),
    doc="Embedding-cosine near-duplicate pairs via sign-LSH bucketing "
    "(8 planes x 6 tables) + exact cosine verify — the 100 TB path: "
    "candidate pairs come from a hash-partitioned self-EQUI-join on "
    "(table, signature), never the all-pairs theta-join "
    "(BroadcastNestedLoopJoin plan-asserted absent). Cosine rounded to "
    "4dp before the threshold so float summation order can't flip "
    "membership; the deterministic hyperplanes are replayed in SQL as a "
    "VALUES table so DuckDB reproduces buckets, candidates, and the "
    "final pair set exactly.",
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.similarity import lsh_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_neardup_pairs(
        emb, threshold=0.4, dim=64, n_planes=8, n_tables=6
    )


# --- BPE-ish token counting --------------------------------------------------

@register(
    "q64_bpe_token_count",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
           len(list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)) AS n_ws_tokens
    FROM documents
    """,
    doc="Token counting for LLM-cost estimation: GPT-2-pre-tokenizer-style "
    "segmentation (letter runs / digit runs / punctuation) vs whitespace "
    "tokens, via regexp_extract_all — RE2-compatible pattern so any "
    "engine reproduces it. Pure expressions in the scan stage.",
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return docs.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(tokens(F.col("text"))).alias("n_ws_tokens"),
    )


# --- winnowing rolling-hash fingerprints ------------------------------------

_WINNOW_ORACLE = """
    WITH norm AS (
        SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
        FROM documents
    ),
    grams AS (
        SELECT n.doc_id, u.pos,
               ('0x' || substr(md5(substr(n.t, CAST(u.pos AS INT), 5)), 1, 8))::BIGINT
                   AS h
        FROM norm n,
             LATERAL UNNEST(generate_series(1, length(n.t) - 5 + 1)) AS u(pos)
    ),
    sel AS (
        SELECT doc_id, pos,
               MIN(h * 2097152 - pos) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
               ) AS skey
        FROM grams
    )
    SELECT DISTINCT
           doc_id AS id,
           (skey + 2097151) // 2097152 AS fp_hash,
           ((skey + 2097151) // 2097152) * 2097152 - skey AS fp_pos
    FROM sel
    WHERE pos >= 4
"""


@register(
    "q66_winnow_fingerprint",
    oracle=_WINNOW_ORACLE,
    doc="Winnowing rolling-hash document fingerprints (Schleimer et al. "
    "SIGMOD'03, the MOSS primitive): md5 k-gram hashes (k=5), sliding "
    "window of 4, keep each window's minimum (rightmost on ties), "
    "dedupe. The (hash, -pos) pair packs into one BIGINT so MIN() gives "
    "the rightmost-min rule as plain integer arithmetic — bit-identical "
    "in any engine. One explode + one per-doc window shuffle; the "
    "dedup partial-aggregates under the same partitioning.",
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.operators.dedup import winnowing_fingerprints

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return winnowing_fingerprints(docs, k=5, w=4, reproducible=True)
