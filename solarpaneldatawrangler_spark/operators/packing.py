"""Sequence packing for LLM training pipelines (SURVEY.md §2.12
extension): assign documents to fixed-budget training sequences
("packs") of at most ``max_tokens`` tokens — the step between a curated
corpus and a tokenized training shard (GPT-3 appendix B / T5 packing).

Greedy next-fit is inherently sequential, so the parallel shape is
SHARD-THEN-PACK: documents hash into ``n_shards`` independent streams
(deterministic pmod of the id), each shard packs its docs in id order
inside one applyInPandas group. Shards trade global optimality for
parallelism — each is a deterministic, restartable unit, which is the
property a 1000-executor tokenization job actually needs (FAISS-style
bounded coordination, no global sequential scan). Within a shard the
result is exactly the single-threaded greedy next-fit.

One shuffle total (the groupBy(shard) exchange); token counting is a
pure Catalyst expression computed before the shuffle, so only
(id, n_tokens, shard) rows move — never document text.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.text import token_count

PACK_SHARD_BITS = 40  # pack_id = shard << 40 | seq; 2^40 packs/shard


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
    n_shards: int = 1,
) -> DataFrame:
    """Greedy next-fit packing: (id, n_tokens, shard, pack_id,
    pack_offset) — pack_offset is the doc's starting token within its
    pack. Docs are packed in ascending id order within each shard; a
    pack closes when the next doc would overflow ``max_tokens``. A
    single doc longer than ``max_tokens`` gets a pack of its own (the
    downstream tokenizer truncates or splits it — flagged by
    n_tokens > max_tokens, never silently dropped).

    ``count_col`` supplies precomputed token counts; otherwise
    whitespace ``token_count(text_col)`` (the cheap proxy) is used.
    ``n_shards=1`` reproduces the global sequential greedy exactly; at
    scale pick ~the cluster's parallelism.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    n_tok = (
        F.col(count_col).cast("long")
        if count_col is not None
        else token_count(F.col(text_col)).cast("long")
    )
    # null text (raw scrapes) counts as 0 tokens instead of arriving in
    # pandas as NaN and crashing int(); null ids would form a None group
    # key — fail loudly in the UDF below instead of a cryptic TypeError
    slim = docs.select(
        F.col(id_col).cast("long").alias("_id"),
        F.coalesce(n_tok, F.lit(0)).alias("n_tokens"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )

    out_schema = (
        f"{id_col} long, n_tokens long, shard int, pack_id long, pack_offset long"
    )

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (shard,) = key
        if shard is None or pdf["_id"].isna().any():
            raise ValueError(
                f"pack_sequences: null {id_col} in input — assign ids "
                "before packing (pack order and pack_id derive from them)"
            )
        pdf = pdf.sort_values("_id")
        seqs, offs = [], []
        seq, acc = 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if acc > 0 and acc + t > max_tokens:
                seq, acc = seq + 1, 0
            seqs.append((int(shard) << PACK_SHARD_BITS) | seq)
            offs.append(acc)
            acc += t
        return pd.DataFrame(
            {
                id_col: pdf["_id"],
                "n_tokens": pdf["n_tokens"],
                "shard": int(shard),
                "pack_id": seqs,
                "pack_offset": offs,
            }
        )

    return slim.groupBy("shard").applyInPandas(pack, out_schema)


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    pretraining complement of pack_sequences (packing joins short docs;
    chunking splits long ones to the model's context window, the
    sliding-window convention of BERT/RAG ingestion).

    Returns (id_col, chunk_id, n_chunk_tokens, text): chunk_id is the
    0-based window index, chunks start every ``max_tokens - overlap``
    tokens, each carries up to ``max_tokens`` tokens, and a trailing
    window that would contribute no NEW tokens beyond the overlap is
    not emitted (start == 0 or start + overlap < n_tokens). Chunk text
    is the whitespace-token join (single spaces — tokenization is not
    reversible; the contract is token-level, matching token_count).
    Docs that tokenize empty produce no rows.

    Plan shape: everything is array expressions on the scan — tokenize
    once, generate the (filtered) start sequence, ONE posexplode to a
    row per chunk, slice + join per row. No shuffle at all: chunking
    10^9 docs is a map-only job.
    """
    if overlap < 0 or overlap >= max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    from solarpaneldatawrangler_spark.functions.text import tokens

    toked = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        id_col,
        "_toks",
        F.size("_toks").alias("_n"),
    )
    starts = F.filter(
        F.when(
            F.col("_n") > 0,
            F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride)),
        ).otherwise(F.array().cast("array<int>")),
        lambda s: (s == 0) | (s + F.lit(overlap) < F.col("_n")),
    )
    chunks = toked.select(
        id_col,
        "_toks",
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, max_tokens)
    return chunks.select(
        id_col,
        "chunk_id",
        F.size(piece).alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("text"),
    )


def balanced_shards(
    df: DataFrame,
    n_shards: int,
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    rank_col: str | None = None,
    out_col: str = "bal_shard",
) -> DataFrame:
    """Snake-draft (boustrophedon) WEIGHT-BALANCED shard assignment —
    the equal-work layout hash sharding lacks: rank rows by
    (weight desc, id), then deal rank r to shard r%N on even rounds
    and N-1-(r%N) on odd rounds. Every shard gets the same row count
    (within 1), and because ranks are globally weight-sorted, each
    full pair-of-rounds hands every shard one heavy + one light item
    from a narrow weight band — total shard-mass spread telescopes to
    <= (w_max - w_min) from full blocks plus one partial block,
    i.e. <= 2 * w_max (property-tested). The guarantee data-parallel
    training readers need: no straggler shard, deterministically.

    Plan: the assignment is pure arithmetic on the rank. With
    ``rank_col`` (an ordinal ingest already carries — the
    mixture_order contract) the whole operator is MAP-ONLY; otherwise
    one global window computes the rank (fine to ~10^8 rows; at true
    corpus scale precompute the ordinal with a range-partitioned
    sort-and-write). Adds ``out_col``; engine-exact (ties broken by
    id, integer arithmetic only), replayed in SQL by
    ``balanced_shards_sql``.
    """
    if rank_col is not None:
        r = F.col(rank_col).cast("long")
    else:
        from pyspark.sql import Window

        r = (
            F.row_number().over(
                Window.orderBy(F.col(weight_col).desc(), F.col(id_col))
            )
            - 1
        ).cast("long")
    pos = r % n_shards
    rnd = F.floor(r / n_shards).cast("long")
    shard = F.when(rnd % 2 == 0, pos).otherwise(n_shards - 1 - pos)
    return df.withColumn(out_col, shard.cast("int"))


def balanced_shards_sql(
    weight_expr: str, id_expr: str, n_shards: int, from_clause: str
) -> str:
    """DuckDB replay of ``balanced_shards`` (window-rank path) as a
    CTE body: (id, r, bal_shard) — the shared-builder idiom."""
    return f"""
    SELECT {id_expr} AS id,
           ROW_NUMBER() OVER (ORDER BY {weight_expr} DESC, {id_expr}) - 1
               AS r,
           CAST(CASE WHEN ((ROW_NUMBER() OVER (ORDER BY {weight_expr} DESC,
                            {id_expr}) - 1) // {n_shards}) % 2 = 0
                THEN (ROW_NUMBER() OVER (ORDER BY {weight_expr} DESC,
                      {id_expr}) - 1) % {n_shards}
                ELSE {n_shards - 1} - (ROW_NUMBER() OVER (ORDER BY
                     {weight_expr} DESC, {id_expr}) - 1) % {n_shards}
                END AS INT) AS bal_shard
    FROM {from_clause}
    """
