"""r17 A/B: bench-mode cache layout (id-hash repartitioned vs raw
1-partition scan layout) for the documents/embeddings headline units —
interleaved in ONE session (A,B,A,B,...) so ambient-load drift hits
both arms equally. noop-sink timings, best-of-N per arm.

Usage: python scripts/r17_cache_layout_ab.py [sf_dir] [rounds]
Writes bench_out/r17_cache_layout_ab.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def main() -> None:
    from pyspark.sql import functions as F

    from solarpaneldatawrangler_spark.functions.text import quality_score
    from solarpaneldatawrangler_spark.operators.dedup import (
        exact_dedup,
        minhash_near_dup_pairs,
    )
    from solarpaneldatawrangler_spark.operators.similarity import (
        brute_force_topk,
    )
    from solarpaneldatawrangler_spark.session import get_spark

    spark = get_spark("r17-cache-layout-ab")
    n = spark.sparkContext.defaultParallelism

    docs_raw = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    docs_part = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .repartition(n, "doc_id")
        .cache()
    )
    emb_raw = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    emb_part = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .repartition(n, "vec_id")
        .cache()
    )
    for d in (docs_raw, docs_part, emb_raw, emb_part):
        d.count()  # materialize caches before any timing

    def q50(docs):
        return exact_dedup(docs)

    def q52(docs):
        return docs.select("doc_id", quality_score(F.col("text")).alias("q"))

    def q55(docs):
        planted = docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
        return minhash_near_dup_pairs(
            docs.unionByName(planted),
            num_hashes=16, bands=4, shingle_k=3,
            jaccard_threshold=0.5, reproducible=True,
        )

    def q58(emb):
        return brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=50)

    units = [
        ("q50_exact_dedup", q50, docs_raw, docs_part),
        ("q52_quality_scan", q52, docs_raw, docs_part),
        ("q55_minhash_pairs", q55, docs_raw, docs_part),
        ("q58_bruteforce", q58, emb_raw, emb_part),
    ]
    out = {"sf_dir": SF_DIR, "rounds": ROUNDS, "raw_s": {}, "part_s": {},
           "parts": n, "loads": {}}
    for name, fn, raw, part in units:
        best_raw = best_part = float("inf")
        for _ in range(ROUNDS):
            for arm, src in (("raw", raw), ("part", part)):
                spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
                df = fn(src)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if arm == "raw":
                    best_raw = min(best_raw, dt)
                else:
                    best_part = min(best_part, dt)
        out["raw_s"][name] = round(best_raw, 3)
        out["part_s"][name] = round(best_part, 3)
        out["loads"][name] = [round(x, 2) for x in os.getloadavg()]
        print(
            f"# {name}: raw={best_raw:.3f} part={best_part:.3f} "
            f"load={out['loads'][name]}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    path = os.path.join(REPO, "bench_out", "r17_cache_layout_ab.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
