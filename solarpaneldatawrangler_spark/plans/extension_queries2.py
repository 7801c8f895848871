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


# --- embedding-cosine near-dup dedup ----------------------------------------

@register(
    "q63_embedding_neardup",
    oracle="""
    WITH pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS cos_r
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_r FROM pairs WHERE cos_r >= 0.4
    """,
    doc="Embedding-cosine near-duplicate pairs, exact (all-pairs) variant "
    "as the correctness baseline — cosine rounded to 4dp before the "
    "threshold so float summation order can't flip membership. The scale "
    "path for this operator is LSH-bucketed candidates + exact verify "
    "(operators.similarity.lsh_bucketed_topk idiom); at sf0.01 the "
    "all-pairs form doubles as the oracle.",
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarpaneldatawrangler_spark.functions.vectors import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos_r", F.round(cosine(F.col("_va"), F.col("_vb")), 4))
        .filter(F.col("cos_r") >= 0.4)
        .select("id_a", "id_b", "cos_r")
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
