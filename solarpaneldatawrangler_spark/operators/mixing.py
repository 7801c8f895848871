"""Deterministic data mixing for LLM training pipelines (SURVEY.md
§2.12 extension): interleave corpus sources into one training order at
target mixture weights — the "domain mixing" step between a curated
corpus and the training shards (GPT-3 §2.2 / Pile §2 / LLaMA §2 all
train on weighted source mixtures).

The schedule is stride scheduling (Waldspurger & Weihl, OSDI 1994):
source s with integer weight w_s emits its i-th document at virtual
time (2i+1) / (2*w_s); merging all sources by ascending time yields an
interleave where every prefix holds each source within O(1) documents
of its target share — no RNG, no epoch boundary artifacts, fully
reproducible. Times are kept EXACT as integers by scaling with
L = lcm(all weights): mix_key = (2i+1) * (L / w_s). Equal keys (ties
between sources) break on (source, id) — total order, engine-portable.

Plan shape: the weight lookup is a literal CASE on the scan; the only
shuffle is the per-source window that assigns i (row_number over id).
At 100 TB that window is skew-bound by the largest source, so the
operator accepts a precomputed ``rank_col`` (the per-source ordinal a
bookkeeping ingest usually already has) — with it the whole operator
is map-only: no shuffle at all, 10^9 docs/source is fine. The output
carries mix_key, not a global ordinal: materializing the ordinal is
the writer's range-partitioned sort+zip (the z-order/layout idiom),
and every consumer only needs ORDER BY (mix_key, source, id).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mixture_order(
    docs: DataFrame,
    weights: dict[str, int],
    default_weight: int = 1,
    source_col: str = "source",
    id_col: str = "doc_id",
    rank_col: str | None = None,
) -> DataFrame:
    """Assign each document its stride-scheduling position in the mixed
    training stream: (id_col, source_col, src_rank, weight, mix_key).
    Sorting by (mix_key, source_col, id_col) IS the training order;
    src_rank is the document's 0-based per-source ordinal (by id_col
    ascending, or ``rank_col`` verbatim when supplied).

    ``weights`` maps source name -> positive integer weight; unlisted
    sources get ``default_weight``. With ``rank_col`` (a precomputed
    0-based per-source ordinal) the plan is map-only — the 100 TB path;
    without it one window shuffle on source_col assigns the ordinal.
    """
    r, w, key = _mix_exprs(
        weights, default_weight, source_col, id_col, rank_col
    )
    return docs.select(
        F.col(id_col),
        F.col(source_col),
        r.alias("src_rank"),
        w.alias("weight"),
        key.alias("mix_key"),
    )


def append_mix_key(
    docs: DataFrame,
    weights: dict[str, int],
    default_weight: int = 1,
    source_col: str = "source",
    id_col: str = "doc_id",
    rank_col: str | None = None,
) -> DataFrame:
    """mixture_order's in-place form: appends only ``mix_key``, keeping
    every input column — the shape pipelines want (curate_corpus's mix
    stage). No join: the key is a plain column expression (plus the
    one per-source window when rank_col is absent), so the input plan
    executes once."""
    _, _, key = _mix_exprs(
        weights, default_weight, source_col, id_col, rank_col
    )
    return docs.withColumn("mix_key", key)


def _mix_exprs(
    weights: dict[str, int],
    default_weight: int,
    source_col: str,
    id_col: str,
    rank_col: str | None,
):
    """(src_rank, weight, mix_key) column expressions shared by
    mixture_order and append_mix_key."""
    vals = set(weights.values()) | {default_weight}
    if any((not isinstance(v, int)) or v < 1 for v in vals):
        # sort by repr: vals may mix types, and a plain sorted() would
        # raise TypeError inside the raise, masking this message
        raise ValueError(
            f"weights must be positive ints, got {sorted(vals, key=repr)}"
        )
    lcm = math.lcm(*vals)

    w = F.lit(default_weight)
    stride = F.lit(lcm // default_weight)
    for name in sorted(weights):
        hit = F.col(source_col) == name
        w = F.when(hit, F.lit(weights[name])).otherwise(w)
        stride = F.when(hit, F.lit(lcm // weights[name])).otherwise(stride)

    if rank_col is not None:
        r = F.col(rank_col).cast("long")
    else:
        r = (
            F.row_number().over(
                Window.partitionBy(source_col).orderBy(id_col)
            )
            - 1
        ).cast("long")
    key = (F.lit(2) * r + 1) * stride.cast("long")
    return r, w.cast("int"), key


def mixture_case_sql(
    weights: dict[str, int],
    default_weight: int = 1,
    source_expr: str = "source",
) -> tuple[str, str, int]:
    """The (weight_case, stride_case, lcm) SQL fragments replaying
    mixture_order's literal weight lookup — shared by the q85 oracle so
    the Spark CASE chain and the SQL CASE can never drift."""
    from solarpaneldatawrangler_spark.functions.text import (
        sql_str_literal as q,
    )

    lcm = math.lcm(*(set(weights.values()) | {default_weight}))
    w_arms = " ".join(
        f"WHEN {q(name)} THEN {weights[name]}" for name in sorted(weights)
    )
    s_arms = " ".join(
        f"WHEN {q(name)} THEN {lcm // weights[name]}"
        for name in sorted(weights)
    )
    w_case = f"CASE {source_expr} {w_arms} ELSE {default_weight} END"
    s_case = f"CASE {source_expr} {s_arms} ELSE {lcm // default_weight} END"
    return w_case, s_case, lcm
