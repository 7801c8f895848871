#!/usr/bin/env python
"""Scale-headroom smoke: drive the scale-critical operators at 10-100x
the bench data volume on local[32] and print throughput. Not part of the
default pytest suite (run manually: python scripts/scale_smoke.py).

The point: demonstrate the plan SHAPES survive volume — generation is
distributed (no driver materialization), shuffles stay bounded, and
runtime scales ~linearly. Numbers land in DESIGN.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from solarpaneldatawrangler_spark.operators.clustering import connected_components  # noqa: E402
from solarpaneldatawrangler_spark.operators.dedup import (  # noqa: E402
    minhash_near_dup_pairs,
)
from solarpaneldatawrangler_spark.operators.grid import (  # noqa: E402
    dilate,
    enumerate_grid,
    gc_retention,
)
from solarpaneldatawrangler_spark.operators.similarity import brute_force_topk  # noqa: E402
from solarpaneldatawrangler_spark.session import get_spark  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {out:,} rows in {dt:.1f}s ({out/dt/1e6:.2f} M rows/s)", flush=True)
    return dt


def main():
    spark = get_spark("scale-smoke")

    # G3: 40 city-scale bboxes -> 100M cells total, generated distributed
    bboxes = spark.range(40).select(
        F.col("id").alias("name"),
        (F.col("id") * 3000).alias("xmin"),
        (F.col("id") * 3000 + 2499).alias("xmax"),
        F.lit(0).alias("ymin"),
        F.lit(999).alias("ymax"),
    )
    timed("G3 enumerate_grid 100M cells", lambda: enumerate_grid(bboxes).count())

    # G10+J5: 10M tiles, 100k positives -> dilation + anti-join
    tiles = spark.range(10_000_000).select(
        (F.col("id") % 4000).alias("column"), (F.col("id") / 4000).cast("long").alias("row")
    )
    pos = tiles.filter(F.pmod(F.xxhash64("column", "row"), 100) == 0)
    timed("J5 gc_retention 10M tiles / ~100k positives",
          lambda: gc_retention(tiles, pos).count())

    # G1: connected components, ~5M cells at ~1.2% density in a 20k x 20k
    # grid — solar-farm-like sparsity; dense-random grids (>15% fill)
    # form giant components whose diameter drives iteration count, which
    # is a label-propagation worst case, not a realistic tile workload
    cells = spark.range(5_000_000).select(
        (F.pmod(F.xxhash64("id"), 20_000)).alias("column"),
        (F.pmod(F.xxhash64("id", "id"), 20_000)).alias("row"),
    ).dropDuplicates(["column", "row"])
    timed("G1 connected_components ~5M cells (1.2% density)",
          lambda: connected_components(cells).count())

    # MinHash near-dup at 55k docs (10x sf0.1)
    import pyspark.sql.functions as FF
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big = docs
    for i in range(1, 10):
        big = big.unionByName(
            docs.select((FF.col("doc_id") + 100000 * i).alias("doc_id"),
                        "text", "lang", "source", "n_chars")
        )
    big = big.select("doc_id", "text")
    timed("minhash_near_dup 55k docs",
          lambda: minhash_near_dup_pairs(big, jaccard_threshold=0.5).count())

    # ANN brute force: 50k corpus x 100 queries x 64 dims
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    bigc = emb
    for i in range(1, 10):
        bigc = bigc.unionByName(
            emb.select((FF.col("vec_id") + 100000 * i).alias("vec_id"), "embedding", "label")
        )
    queries = emb.filter(FF.col("vec_id") < 100)
    timed("ANN brute-force 50k corpus x 100 queries",
          lambda: brute_force_topk(bigc, queries, k=10).count())

    # J6 bucketed spatial contains-join: 100k polygons x 5M points, both
    # sides far past broadcast range — the grid-cell equi-join path
    from solarpaneldatawrangler_spark.operators.spatial import (
        grid_bucketed_contains_join,
    )

    k = F.col("id")
    x0 = (k % 1000 * 10).cast("double")
    y0 = (F.floor(k / 1000) * 10).cast("double")
    w = (3 + k % 4).cast("double")
    polys = spark.range(100_000).select(
        F.col("id").alias("poly_id"),
        F.array(
            F.array(x0, y0), F.array(x0 + w, y0), F.array(x0 + w, y0 + w),
            F.array(x0, y0 + w), F.array(x0, y0),
        ).alias("ring"),
    )
    pts = spark.range(5_000_000).select(
        F.col("id").alias("pt_id"),
        (F.pmod(F.xxhash64("id"), 10_000_000) / 1000.0).alias("longitude"),
        (F.pmod(F.xxhash64("id", "id"), 1_000_000) / 1000.0).alias("latitude"),
    )
    timed("J6 grid_bucketed_contains 100k polys x 5M points",
          lambda: grid_bucketed_contains_join(polys, pts, cell_size=10.0).count())

    # LSH embedding near-dup at 20k vectors (vs all-pairs 200M pairs)
    from solarpaneldatawrangler_spark.operators.similarity import lsh_neardup_pairs

    bigv = emb
    for i in range(1, 10):
        bigv = bigv.unionByName(
            emb.select((FF.col("vec_id") + 100000 * i).alias("vec_id"), "embedding", "label")
        )
    timed("LSH embedding near-dup 20k vectors",
          lambda: lsh_neardup_pairs(bigv, threshold=0.4).count())

    # IVF ANN at the same 50k corpus: assignment is one narrow stage,
    # probes broadcast, corpus never shuffles
    from solarpaneldatawrangler_spark.operators.similarity import (
        ivf_topk,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(bigc, n_lists=32)
    timed("IVF ANN 50k corpus x 100 queries (nprobe=8/32)",
          lambda: ivf_topk(bigc, queries, k=10, nprobe=8, centroids=cents).count())

    # winnowing fingerprints at 55k docs (~16M gram rows): one exchange
    # end-to-end (pre-explode id shuffle feeds window AND dedup)
    from solarpaneldatawrangler_spark.operators.dedup import winnowing_fingerprints

    timed("winnowing fingerprints 55k docs",
          lambda: winnowing_fingerprints(big).count())

    # full curation chain at 55k docs (exact + near dedup + gates)
    from solarpaneldatawrangler_spark.pipeline_text import curate_corpus

    big_full = docs
    for i in range(1, 10):
        big_full = big_full.unionByName(
            docs.select((FF.col("doc_id") + 100000 * i).alias("doc_id"),
                        "text", "lang", "source", "n_chars")
        )
    timed("curate_corpus 55k docs (no report)",
          lambda: curate_corpus(
              big_full.select("doc_id", "text", "lang", "source"),
              language="en", with_report=False,
          )[0].count())

    # benchmark decontamination at 55k docs vs a 550-doc "benchmark":
    # two winnowing passes + broadcast fp_hash join, corpus-side groupBy
    # reuses the winnowing exchange. Throughput probe only — the
    # templated synthetic docs all exceed any overlap threshold
    # (semantics: tests/test_curation_ops.py)
    from solarpaneldatawrangler_spark.operators.decontaminate import decontaminate

    bench = big.filter(FF.col("doc_id") % 100 == 0).select(
        FF.col("doc_id").alias("bid"), "text"
    )
    timed("decontaminate 55k docs vs 550-doc benchmark",
          lambda: decontaminate(big, bench, min_shared_frac=0.8).count())

    # sequence packing at 1M synthetic docs into 32 shards: the only
    # shuffle moves (id, n_tokens); the greedy runs per shard
    from solarpaneldatawrangler_spark.operators.packing import pack_sequences

    synth = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.transform(F.sequence(F.lit(1), (F.pmod(F.col("id"), 200) + 10).cast("int")),
                             lambda i: F.lit("tok"))
        ).alias("text"),
    )
    timed("pack_sequences 1M docs / 32 shards",
          lambda: pack_sequences(synth, max_tokens=2048, n_shards=32).count())

    # paragraph-level dedup at 55k two-paragraph docs (~110k paragraph
    # rows, every source text occurring twice): explode -> map-side
    # keeper agg -> join -> reassembly
    from solarpaneldatawrangler_spark.operators.dedup import paragraph_dedup

    pair = big.select((FF.col("doc_id") - 7).alias("doc_id"),
                      FF.col("text").alias("_t2"))
    built = big.join(pair, "doc_id", "left").select(
        "doc_id",
        FF.concat(FF.col("text"), FF.lit("\n\n"),
                  FF.coalesce("_t2", FF.lit(""))).alias("text"),
    )
    timed("paragraph_dedup 55k two-para docs",
          lambda: paragraph_dedup(built).count())

    # temperature mixture resample at 10M rows / 20 strata: the corpus
    # never shuffles — one tiny agg broadcast back, filter in the scan
    from solarpaneldatawrangler_spark.operators.sampling import temperature_resample

    mix = spark.range(10_000_000).select(
        F.col("id").alias("doc_id"),
        FF.concat(FF.lit("s"), (FF.pmod(FF.col("id") * 2654435761, 97) % 20)
                  .cast("string")).alias("source"),
    )
    timed("temperature_resample 10M rows / 20 strata",
          lambda: temperature_resample(mix, "source", 0.5, 0.5).count())


if __name__ == "__main__":
    main()
